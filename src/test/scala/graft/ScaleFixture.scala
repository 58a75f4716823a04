package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Third scale point for the ScaleGrowthSpec fences (r13 verdict #2):
  * two-point (sf0.01 → sf0.1) growth checks cannot distinguish linear
  * from n·log n or from small-quadratic-with-offset. The driver ships no
  * sf0.3, so this fixture DERIVES one deterministically from sf0.1 —
  * three replicas with disjoint key ranges (offset 10^7 = 2^7·5^7,
  * divisible by every modulus the FENCED queries take over these
  * tables: 2, 4, 10, 50 — NOT by 211 or 997, so the dynpart/%997 rows
  * must not be pointed at this fixture without changing the offset):
  *
  *   - customer/orders: key-offset copies. FK structure, NULL-stripe
  *     fractions (c_custkey % 50 = 7 etc.) and group moduli are
  *     preserved exactly, so the null-safe join fences see a genuine 3×
  *     corpus.
  *   - documents: doc_id-offset copies with the TEXT of replicas 1 and 2
  *     Caesar-shifted (translate over [a-z]; spaces/digits untouched).
  *     Token structure, lengths and per-replica gram statistics are
  *     identical to sf0.1, but the three replicas occupy (mostly)
  *     disjoint gram spaces — so containment/BM25 see a 3×-bigger corpus
  *     of the same generative character, NOT 3 exact copies of every doc
  *     (exact replication would triple every gram's df and multiply
  *     same-source pair groups ~9×, turning the fence's "answer" term
  *     quadratic in the replica count — a fixture artifact, not a
  *     property of the engine under test).
  *
  * Staged once per source fingerprint via the shared Staging protocol
  * (atomic rename; concurrent JVMs converge on one copy).
  */
object ScaleFixture {

  val Offset = 10000000L

  private def shift(c: org.apache.spark.sql.Column, by: Int): org.apache.spark.sql.Column = {
    val abc = "abcdefghijklmnopqrstuvwxyz"
    translate(c, abc, abc.drop(by) + abc.take(by))
  }

  /** Stage (if absent) and return the sf0.3-equivalent directory. */
  def dir(spark: SparkSession, src: String = "/root/testdata/sf0.1"): String = {
    // every replicated source participates in the staging key — a
    // regenerated customer.parquet must re-stage even when documents/
    // orders are untouched (review finding r14)
    val fp = Seq("documents", "customer", "orders")
      .map(t => Staging.fingerprint(s"$src/$t.parquet")).mkString("_")
    val dest = java.nio.file.Paths.get(s"/tmp/graft_scale/sf0p3_$fp")
    Staging.once(dest) { t =>
      def replicate(name: String, keyCols: Seq[String],
          textShift: Boolean): Unit = {
        val base = Engine.table(spark, src, name)
        val reps = (0 to 2).map { r =>
          val keyed = keyCols.foldLeft(base) { (df, k) =>
            df.withColumn(k, col(k) + lit(r * Offset)) }
          if (textShift && r > 0)
            keyed.withColumn("text", shift(col("text"), 5 * r))
          else keyed
        }
        reps.reduce(_ unionAll _).write.mode(SaveMode.Overwrite)
          .parquet(s"$t/$name.parquet")
      }
      replicate("documents", Seq("doc_id"), textShift = true)
      replicate("customer", Seq("c_custkey"), textShift = false)
      replicate("orders", Seq("o_orderkey", "o_custkey"), textShift = false)
    }
    dest.toString
  }
}
