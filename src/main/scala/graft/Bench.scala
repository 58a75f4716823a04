package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the bench-flagged headline queries (BDB-analog
  * set — scan-agg, star join, top-k, window, dedup, ANN) at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Protocol mirrors the reference's trial policy (README.md:75-80: first
  * trial discarded as warm-up): one warm-up pass, then two timed trials
  * per query — plus a third when the best is still over 2 s OR the two
  * trials disagree by >25% (the signature of GC/cache-pressure variance
  * that inflated three sub-second rows in round 6: best-of-2 keeps the
  * noisy draw when both draws are noisy) — best-of-trials reported.
  * Results are fully materialized through the noop sink so projection
  * work isn't pruned away by a count().
  *
  * Output carries the full `total` plus `core8`, the sum over the fixed
  * 8-query set benched since round 4, so round-over-round comparisons
  * survive additions to the bench list.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.withHive(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(q: queries.Q): Double = {
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val qs = SparkEntry.benchQueries
    qs.foreach { q => try runOnce(q) catch { case _: Throwable => () } } // warm-up
    val results = qs.map { q =>
      val t = try {
        val t1 = runOnce(q)
        val t2 = runOnce(q)
        val best2 = math.min(t1, t2)
        // the extra trial for slow/noisy rows must not discard two valid
        // timings if it fails transiently — fall back to best2
        if (best2 > 2.0 || math.abs(t1 - t2) > 0.25 * best2)
          math.min(best2, try runOnce(q) catch { case _: Throwable => best2 })
        else best2
      } catch { case _: Throwable => -1.0 }
      q.name -> t
    }
    val qsJson = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // the 8 queries benched in every round since r4 — the stable
    // round-over-round comparison core
    val core8Names = Set("q1_agg", "join_star", "topk", "win_running_sum",
      "text_tokens", "text_tfidf", "dedup_minhash_lsh", "sim_topk_brute")
    val core8 = results.filter(r => core8Names(r._1) && r._2 >= 0).map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","core8":$core8,"queries":$qsJson,"sf":"$sfDir"}"""
    // The JSON travels on TWO channels: a file (sbt prefixes stdout with
    // [info] and interleaves WARNs, which broke the driver's parse in r1)
    // and stdout printed AFTER spark.stop() so it is the final clean line.
    val outFiles = Seq(
      sys.env.get("SPARK_GRAFT_BENCH_OUT"),
      if (args.nonEmpty) Some(args(0)) else None,
      Some("bench.json"), Some("/tmp/graft_bench.json")).flatten.distinct
    outFiles.foreach { f =>
      try {
        val w = new java.io.PrintWriter(new java.io.File(f))
        try w.println(line) finally w.close()
      } catch { case _: Throwable => () }
    }
    spark.stop()
    println(line)
  }
}
