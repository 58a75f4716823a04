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
}
