package graft

import graft.functions.{Portable, TextFunctions => T}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Expression-level invariants (the reference's ExpressionEvaluationSuite
  * analog): hash/sketch ranges, similarity bounds, and the pinned 1.3
  * null-not-error semantics (Divide null-on-/0, Cast null-on-bad). */
class ExpressionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val words = Seq("alpha beta gamma delta", "alpha beta gamma", "zeta",
    "the quick brown fox jumps over the lazy dog", "a b c d e f g h i j")
  private lazy val df = words.toDF("text").cache()

  test("stableHash64 is non-negative and fits in 60 bits") {
    val hashes = df.select(Portable.stableHash64(col("text")).as("h"))
      .as[Long].collect()
    assert(hashes.forall(h => h >= 0 && h < (1L << 60)))
  }

  test("stableHash64 is deterministic across evaluations") {
    val a = df.select(Portable.stableHash64(col("text"))).as[Long].collect()
    val b = df.select(Portable.stableHash64(col("text"))).as[Long].collect()
    assert(a.toSeq === b.toSeq)
  }

  test("simhash stays within its 16-bit range") {
    val sigs = df.select(T.simhash(col("text")).as("s")).as[Long].collect()
    assert(sigs.forall(s => s >= 0 && s < 65536))
  }

  test("jaccard is bounded and jaccard(x, x) == 1") {
    val j = df.select(
      T.jaccard(T.charNgrams(col("text")), T.charNgrams(col("text"))).as("j"))
      .as[Double].collect()
    assert(j.forall(_ === 1.0))
  }

  test("cosine(x, x) ~= 1 for non-zero vectors") {
    val vecs = Seq(Array(1.0f, 2.0f, 3.0f), Array(0.5f, -1.5f, 2.5f)).toDF("v")
    val c = vecs.select(T.cosine(col("v"), col("v")).as("c")).as[Double].collect()
    assert(c.forall(x => math.abs(x - 1.0) < 1e-9))
  }

  test("minhash is monotone under superset-with-shared-shingles") {
    // signature of a doc equals min over its shingles: adding shingles can
    // only lower (or keep) each minhash value.
    val a = Seq("x y z w v").toDF("text")
      .select(Portable.minhashValue(Portable.shingles3(col("text")), 0)).as[Long].head()
    val b = Seq("x y z w v extra tokens here").toDF("text")
      .select(Portable.minhashValue(Portable.shingles3(col("text")), 0)).as[Long].head()
    assert(b <= a)
  }

  test("divide by zero yields null, not an error (1.3 semantics)") {
    val r = Seq((1.0, 0.0)).toDF("a", "b")
      .select((col("a") / col("b")).as("q")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("bad casts yield null, not an error (1.3 semantics)") {
    val r = Seq("not-a-number").toDF("s")
      .select(col("s").cast("int").as("i")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("three-valued logic and null propagation match 1.3 semantics") {
    val r = spark.sql(
      """SELECT CAST(NULL AS BOOLEAN) AND false AS and_f,
        |       CAST(NULL AS BOOLEAN) OR true AS or_t,
        |       CAST(NULL AS BOOLEAN) AND true AS and_t,
        |       concat('a', CAST(NULL AS STRING)) AS concat_null,
        |       concat_ws('-', 'a', CAST(NULL AS STRING), 'b') AS cws_skips,
        |       greatest(1, CAST(NULL AS INT), 3) AS greatest_ignores,
        |       1 + CAST(NULL AS INT) AS arith_null
        |""".stripMargin).collect()(0)
    assert(r.getBoolean(0) === false, "null AND false = false")
    assert(r.getBoolean(1) === true, "null OR true = true")
    assert(r.isNullAt(2), "null AND true = null")
    assert(r.isNullAt(3), "concat propagates null")
    assert(r.getString(4) === "a-b", "concat_ws skips nulls")
    assert(r.getInt(5) === 3, "greatest ignores nulls")
    assert(r.isNullAt(6), "arithmetic propagates null")
  }

  test("aggregates over empty groups: sum null, count zero") {
    val r = spark.sql(
      "SELECT sum(x) AS s, count(x) AS c, avg(x) AS a FROM (SELECT 1 AS x) WHERE x > 99")
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getLong(1) === 0L)
    assert(r.isNullAt(2))
  }

  test("shingles of a 2-token document are empty; minhash of empty is null") {
    val r = df.filter(col("text") === "zeta").limit(1)
      .select(Portable.shingles3(col("text")).as("sh"))
    assert(r.select(size(col("sh"))).as[Int].head() === 0)
    assert(r.select(Portable.minhashValue(col("sh"), 0)).collect()(0).isNullAt(0))
  }

  test("deterministic sample keeps a stable subset (scalacheck-generated keys)") {
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    val samples = Iterator.continually(gen.sample).flatten.take(5).toSeq
    for (keys <- samples) {
      val d = keys.toDF("k")
      val once = d.filter(Portable.deterministicSample(col("k"), 50)).as[Long].collect().toSet
      val twice = d.filter(Portable.deterministicSample(col("k"), 50)).as[Long].collect().toSet
      assert(once === twice)
      assert(once.subsetOf(keys.toSet))
    }
  }
}
