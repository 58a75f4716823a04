package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom-Catalyst surface: Hamming64 native expression correctness
  * (interpreted + codegen paths agree) and the SimplifySelfHamming
  * optimizer rule folding graft_hamming64(x, x) to a literal 0. */
class CatalystExtensionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("graft_hamming64 computes popcount of xor") {
    Engine.configure(spark)
    val rows = Seq((255L, 240L), (0L, 0L), (1L, -1L)).toDF("a", "b")
      .selectExpr("graft_hamming64(a, b) AS h").as[Int].collect()
    assert(rows.toSeq === Seq(4, 0, 63))
  }

  test("graft_hamming64 is null-safe") {
    val r = Seq((Some(1L), Option.empty[Long])).toDF("a", "b")
      .selectExpr("graft_hamming64(a, b) AS h").collect()(0)
    assert(r.isNullAt(0))
  }

  test("SimplifySelfHamming folds hamming(x, x) to literal 0") {
    Engine.configure(spark)
    val df = Seq(42L).toDF("x").selectExpr("graft_hamming64(x, x) AS h")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_hamming64"), optimized)
    assert(df.as[Int].collect().toSeq === Seq(0))
  }

  test("graft_hamming64 rejects non-bigint inputs at analysis") {
    val e = intercept[Exception] {
      Seq(("a", "b")).toDF("a", "b").selectExpr("graft_hamming64(a, b)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }

  test("graft_cosine matches the composable zip_with form on equal-length input") {
    Engine.configure(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b")
    val native = df.selectExpr("graft_cosine(a, b) AS c").as[Double].collect()(0)
    val composed = df.select(
      (aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x) /
        (sqrt(aggregate(transform(col("a"), x => x.cast("double") * x.cast("double")),
          lit(0.0), (acc, x) => acc + x)) *
         sqrt(aggregate(transform(col("b"), x => x.cast("double") * x.cast("double")),
           lit(0.0), (acc, x) => acc + x)))).as("c")).as[Double].collect()(0)
    assert(native === composed)
  }

  test("graft_cosine null-propagates on ragged lengths and null elements") {
    Engine.configure(spark)
    // ragged: 3 vs 2 elements → NULL (mirrors zip_with null propagation)
    val ragged = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .selectExpr("graft_cosine(a, b) AS c").collect()(0)
    assert(ragged.isNullAt(0))
    // null element → NULL
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val withNull = spark.createDataFrame(
      java.util.Arrays.asList(Row(Seq[Any](1.0f, null), Seq[Any](1.0f, 2.0f))), schema)
      .selectExpr("graft_cosine(a, b) AS c").collect()(0)
    assert(withNull.isNullAt(0))
  }
}
