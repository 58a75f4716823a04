package graft

import graft.functions.SkewGuard
import org.scalatest.funsuite.AnyFunSuite

/** The hot-bucket guard must drop degenerate LSH buckets (the 100 TB
  * O(n²) failure mode) while passing bounded buckets through untouched —
  * dedup query outputs at test SF must be identical with the guard on. */
class SkewGuardSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("hot buckets are dropped, cold buckets survive") {
    import spark.implicits._
    val df = (Seq.fill(50)(("hot", 1)) ++ Seq(("cold", 2), ("cold2", 3))).toDF("k", "v")
    val out = SkewGuard.dropHotBuckets(df, Seq("k"), maxBucket = 10)
    assert(out.count() === 2)
    assert(out.select("k").as[String].collect().toSet === Set("cold", "cold2"))
  }

  test("identity (no plan change) when every bucket is under the threshold") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = SkewGuard.dropHotBuckets(df, Seq("k"), maxBucket = 10)
    assert(out.count() === 3)
    assert(out eq df, "guard must be a no-op fast path when nothing is hot")
  }

  test("multi-column bucket keys guard on the composite key") {
    import spark.implicits._
    val df = (Seq.fill(20)(("b0", "s0", 1)) ++ Seq(("b0", "s1", 2), ("b1", "s0", 3)))
      .toDF("band", "sig", "doc")
    val out = SkewGuard.dropHotBuckets(df, Seq("band", "sig"), maxBucket = 5)
    assert(out.count() === 2)
  }
}
