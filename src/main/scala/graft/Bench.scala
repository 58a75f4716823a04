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
  *
  * SELF-DIAGNOSING artifact (r7 postmortem: a driver run landed 2-3×
  * slower than two controlled runs of identical code, and only an
  * out-of-band re-run could adjudicate): the JSON now carries
  * (a) `trials` — EVERY trial timing per query, not just the best, so
  * uniform inflation across trials (machine load) is distinguishable
  * from one noisy draw (GC); and (b) `calib_pre` / `calib_post` — a
  * fixed pure-CPU xorshift loop timed in this same JVM before the
  * warm-ups and after the last trial. The loop's cost is
  * machine-invariant at fixed clock (≈0.284 s on the round-8 build
  * machine, pre/post agreeing to 3 digits on a quiet run); a calib
  * reading inflated vs other rounds means the HOST was loaded and the
  * row times should be discounted by the same factor. Pre+post
  * brackets contention that arrives mid-run.
  */
object Bench {

  // sink defeats dead-code elimination of the calibration loop
  @volatile private var calSink: Long = 0L

  /** Best-of-3 of a fixed 2^27-iteration xorshift64 loop — pure CPU,
    * zero allocation, identical work every round/machine. */
  private def calibrate(): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      var x = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < (1 << 27)) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      calSink = x
      (System.nanoTime() - t0) / 1e9
    }
    (1 to 3).map(_ => once()).min
  }
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

    // One full measurement pass bracketed by calibration readings.
    // Each row also carries its CacheOnce attribution (r11 verdict #4):
    // which shared signature tables the trials touched, whether the swap
    // was a reuse, and the keys' block-manager state BEFORE the trials —
    // so a 0.4-vs-1.6 s spread on cache-sharing rows (text_tf feeds both
    // text_tfidf and text_bm25_topk) is decidable from the artifact.
    def measure(): (Double, Double, Seq[(String, Double, Seq[Double], String, Boolean)]) = {
      val pre = calibrate()
      // (best, all trials, cache attribution, rising flag) per query
      val rs: Seq[(String, Double, Seq[Double], String, Boolean)] = qs.map { q =>
        val preSnap = functions.CacheOnce.storageSnapshot()
        functions.CacheOnce.drainEvents(): Unit
        val (t, trials, rising) = try {
          val t1 = runOnce(q)
          val t2 = runOnce(q)
          val best2 = math.min(t1, t2)
          // the extra trial for slow/noisy rows must not discard two valid
          // timings if it fails transiently — fall back to best2
          val (best, ts) =
            if (best2 > 2.0 || math.abs(t1 - t2) > 0.25 * best2) {
              val t3 = try Some(runOnce(q)) catch { case _: Throwable => None }
              (math.min(best2, t3.getOrElse(best2)), Seq(t1, t2) ++ t3)
            } else (best2, Seq(t1, t2))
          // RISING-curve diagnostic (r13 verdict #3): min-of-trials
          // assumes later trials are never systematically slower (the
          // JIT-warm-up model) — q1_agg's inverted 0.39→0.70→0.81 curve
          // in BENCH_r13 showed in-run degradation (GC/neighbor
          // pressure) that the calibration bracket cannot see and that
          // biases min toward one lucky first draw. A row whose trials
          // RISE >1.5× first→last reports the MEDIAN of its trials
          // instead of the min, and is named in the artifact's "rising"
          // list so the curve is adjudicable downstream. The flag is
          // computed ONCE here and carried in the tuple — the JSON list
          // and the median decision can never disagree.
          val rising = ts.size >= 2 && ts.last > 1.5 * ts.head
          if (rising) {
            val sorted = ts.sorted
            val med =
              if (sorted.size % 2 == 1) sorted(sorted.size / 2)
              else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
            (med, ts, rising)
          } else (best, ts, rising)
        } catch { case _: Throwable => (-1.0, Seq.empty[Double], false) }
        val ev = functions.CacheOnce.drainEvents()
        val cache = if (ev.isEmpty) "" else {
          val touched = ev.map(_._1).distinct.sorted
          val swapMiss = ev.exists(!_._2)
          // cache_hit = the trials re-used tables that were ALREADY fully
          // materialized; false means this row paid (part of) the build
          val hit = !swapMiss &&
            touched.forall(k => preSnap.get(k).exists(_._1 >= 0.999))
          val keys = touched.map { k =>
            val (f, m, dk) = preSnap.getOrElse(k, (0.0, 0L, 0L))
            // Locale.ROOT: the f-interpolator's %.3f obeys the JVM default
            // locale — a comma-decimal locale would render 0,997 and
            // corrupt the JSON both downstream channels parse
            val frac = String.format(java.util.Locale.ROOT, "%.3f", Double.box(f))
            s""""$k":{"pre_frac":$frac,"pre_mem":$m,"pre_disk":$dk}"""
          }.mkString(",")
          s"""{"cache_hit":$hit,"swap_miss":$swapMiss,"keys":{$keys}}"""
        }
        (q.name, t, trials, cache, rising)
      }
      (pre, calibrate(), rs)
    }

    // QUIETNESS GATE (r10 postmortem: the driver artifact shipped a
    // load-contaminated reading — calib_post 24% over calib_pre with
    // monotonically ascending trials — while quiet runs of identical
    // code existed the same day). If pre/post calibration disagree by
    // >10% the host was loaded mid-run: re-measure ONCE, then report
    // whichever attempt is quieter and self-certify via "quiet".
    def loaded(pre: Double, post: Double): Boolean =
      math.abs(post - pre) > 0.10 * math.min(pre, post)
    val first = measure()
    val (calibPre, calibPost, results, attempts) =
      if (loaded(first._1, first._2)) {
        val second = measure()
        val pick = if (loaded(second._1, second._2) &&
          math.abs(first._2 - first._1) <= math.abs(second._2 - second._1)) first
        else second
        (pick._1, pick._2, pick._3, 2)
      } else (first._1, first._2, first._3, 1)
    val quiet = !loaded(calibPre, calibPost)

    // bench_3x (r14 verdict #5): the three-point fences check LOGICAL
    // volumes; constant-factor scale-killers (a stage whose parallelism
    // doesn't grow, driver-side planning blowup) only show in seconds.
    // Run every bench row once against the derived 3× corpus (one
    // warm-up + one timed pass — the 3× plans are cold in this JVM,
    // and an unwarmed reading would measure codegen compilation, not
    // scaling) and report the wall ratio vs the row's reported sf0.1
    // time. Rows over 4.5× (3× data × log-factor headroom) are named
    // in "bench_3x_over" for BENCHNOTES root-causing — reported, not
    // crashed, so one noisy draw cannot kill the whole artifact.
    // Emitted only for the standard sf0.1 run; SPARK_GRAFT_BENCH_3X=0
    // skips (dev iteration).
    def bench3x(): String = try {
      if (!sfDir.endsWith("sf0.1") ||
        sys.env.get("SPARK_GRAFT_BENCH_3X").contains("0")) ""
      else {
        val dir3 = ScaleFixture.dir(spark, sfDir)
        def once3(q: queries.Q): Double = {
          val t0 = System.nanoTime()
          q.fn(spark, dir3).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val base = results.collect { case (k, v, _, _, _) if v > 0 => k -> v }.toMap
        val rows = qs.map { q =>
          // warm-up + best-of-2 timed: the main rows report best-of-2/3,
          // so a single 3× draw would compare a noisy reading against a
          // best — one GC hiccup could flag a phantom >4.5× outlier
          val t = try { once3(q); math.min(once3(q), once3(q)) }
          catch { case _: Throwable => -1.0 }
          (q.name, t, base.get(q.name).map(b => t / b))
        }
        val times = rows.map { case (k, t, _) => "\"" + k + "\":" + t }
          .mkString("{", ",", "}")
        val ratios = rows.collect { case (k, t, Some(r)) if t >= 0 =>
          "\"" + k + "\":" + math.rint(r * 100) / 100 }.mkString("{", ",", "}")
        val over = rows.collect { case (k, t, Some(r)) if t >= 0 && r > 4.5 =>
          "\"" + k + "\"" }.mkString("[", ",", "]")
        s""""bench_3x":$times,"bench_3x_ratio":$ratios,"bench_3x_over":$over,"""
      }
    } catch { case _: Throwable => "" }

    // dedup_containment variance diagnostics (r10 task 5): its 1.5-4.4 s
    // trial spread is draw-dependent; emitting the candidate-pair count
    // (largest equi-join output) and the verify-stage input rows
    // (topmost equi-join output — the pairs the graft_overlap64 verify
    // actually scores) makes draw-variance vs code-regression decidable
    // from the artifact alone.
    def containmentDiag(): String = try {
      import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
      val df = SparkEntry.queries("dedup_containment")(spark, sfDir)
      // collect() (not a noop write) so execution flows through THIS
      // DataFrame's QueryExecution — a write plans its own, leaving
      // df.queryExecution's metrics at zero (the r11 bug)
      df.collect()
      val joinRows = plans.PlanWalk.nodes(df.queryExecution.executedPlan).collect {
        case j: SortMergeJoinExec => j.metrics.get("numOutputRows")
        case j: ShuffledHashJoinExec => j.metrics.get("numOutputRows")
        case j: BroadcastHashJoinExec => j.metrics.get("numOutputRows")
      }.flatten.map(_.value)
      val candidates = joinRows.foldLeft(0L)(math.max)
      val verifyRows = joinRows.headOption.getOrElse(0L) // pre-order: topmost join
      s""""containment_diag":{"candidates":$candidates,"verify_rows":$verifyRows},"""
    } catch { case _: Throwable => "" }
    val diag = containmentDiag()
    val diag3x = bench3x()
    val qsJson = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val trialsJson = results
      .map { case (k, _, ts, _, _) => "\"" + k + "\":" + ts.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    // only rows that touch a CacheOnce table carry an attribution entry
    val cacheJson = results
      .collect { case (k, _, _, c, _) if c.nonEmpty => "\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    // rows whose trial curve ROSE >1.5× first→last (reported as median
    // of trials, not min) — the SAME flag measure() decided with, so
    // the list and the reported numbers cannot disagree
    val risingJson = results
      .collect { case (k, _, _, _, r) if r => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // the 8 queries benched in every round since r4 — the stable
    // round-over-round comparison core
    val core8Names = Set("q1_agg", "join_star", "topk", "win_running_sum",
      "text_tokens", "text_tfidf", "dedup_minhash_lsh", "sim_topk_brute")
    val core8 = results.filter(r => core8Names(r._1) && r._2 >= 0).map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","core8":$core8,""" +
      s""""calib_pre":$calibPre,"calib_post":$calibPost,""" +
      s""""quiet":$quiet,"attempts":$attempts,$diag$diag3x""" +
      s""""queries":$qsJson,"trials":$trialsJson,"rising":$risingJson,""" +
      s""""cache":$cacheJson,"sf":"$sfDir"}"""
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
