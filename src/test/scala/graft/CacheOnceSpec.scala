package graft

import graft.functions.CacheOnce
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CacheOnce's two contracts: equivalent plans REUSE the persisted
  * DataFrame (the bench warm-up guarantee), and an in-place fixture
  * regeneration is detected by the filesystem fingerprint and
  * RECOMPUTES — never serves stale data (the enforcement added after
  * round 6, where the contract was only a comment). */
class CacheOnceSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("sameResult reuse returns the already-persisted DataFrame") {
    import spark.implicits._
    val dir = s"/tmp/graft_cacheonce/reuse_${System.nanoTime()}"
    Seq(1L, 2L, 3L).toDF("v").write.parquet(dir)
    val a = CacheOnce.swap("spec_cacheonce_reuse", spark.read.parquet(dir).select(col("v")))
    val b = CacheOnce.swap("spec_cacheonce_reuse", spark.read.parquet(dir).select(col("v")))
    assert(a eq b, "equivalent plan did not reuse the persisted DataFrame")
    assert(b.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("in-place fixture regeneration recomputes instead of serving stale cache") {
    import spark.implicits._
    val dir = s"/tmp/graft_cacheonce/regen_${System.nanoTime()}"
    Seq(1L, 2L, 3L).toDF("v").write.parquet(dir)
    val first = CacheOnce.swap("spec_cacheonce_regen", spark.read.parquet(dir).select(col("v")))
    assert(first.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // regenerate at the SAME path — the round-6 hazard: the new plan is
    // sameResult (plan equality compares root paths), so only the
    // filesystem fingerprint distinguishes the corpora
    Seq(10L, 20L).toDF("v").write.mode("overwrite").parquet(dir)
    val second = CacheOnce.swap("spec_cacheonce_regen", spark.read.parquet(dir).select(col("v")))
    assert(second.as[Long].collect().sorted.toSeq == Seq(10L, 20L),
      "regenerated fixture was served from the stale cache")
  }

  test("regeneration nested inside a partition subdirectory is detected") {
    import spark.implicits._
    val dir = s"/tmp/graft_cacheonce/nested_${System.nanoTime()}"
    Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("v", "part")
      .write.partitionBy("part").parquet(dir)
    val first = CacheOnce.swap("spec_cacheonce_nested",
      spark.read.parquet(dir).select(col("v")))
    assert(first.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // dynamic overwrite of ONE partition: the root dir's direct children
    // (partition dirs) keep their names; only files nested inside
    // part=a change — the hazard that motivated walking below the root
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try Seq((10L, "a")).toDF("v", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val second = CacheOnce.swap("spec_cacheonce_nested",
      spark.read.parquet(dir).select(col("v")))
    assert(second.as[Long].collect().sorted.toSeq == Seq(3L, 10L),
      "nested partition regeneration was served from the stale cache")
  }
}
