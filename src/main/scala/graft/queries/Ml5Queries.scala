package graft.queries

import graft.Engine.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Registry.sql

/** MLlib parity, wave 5 — ITERATIVE CONVERGENCE as a declared
  * capability: the reference's learners all run driver-side iteration
  * loops over a cached distributed dataset (mllib/.../optimization/
  * GradientDescent.scala:166's `for (i <- 1 to numIterations)`,
  * clustering/KMeans.scala's Lloyd loop, graphx Pregel), re-caching the
  * invariant input once and shipping a small model back and forth. The
  * prior waves proved single steps (ml_streaming_kmeans_update, two-step
  * ml_als_alternate); this wave runs a REAL multi-iteration loop in ONE
  * declared query, with a per-iteration deterministic oracle.
  *
  * Exactness contract: features quantized to integer cents, centroid
  * updates via integer division (`DIV` / DuckDB `//` — identical
  * truncation on non-negative values), so every iteration's model is an
  * exact BIGINT on both engines — no float drift can accumulate across
  * iterations. Scale posture: each iteration is one scan of the CACHED
  * points (never re-read from parquet) + a K-row partial agg; the model
  * travels as a broadcast 1-row cross join.
  */
object Ml5Queries {

  private val K = 4
  /** Convergence loop bounds: halt when no centroid moves ≥ Eps cents
    * ($15k — reached at iteration 5 on this corpus at both test SFs, so
    * the break genuinely fires mid-loop), hard cap MaxIter. */
  private val MaxIter = 8L
  private val Eps = 1500000L

  /** One-row pivot of the (k, c) centroid table to columns cc0..cc3 —
    * the broadcastable model the assignment expression closes over. */
  private def pivotRow(cent: DataFrame): DataFrame = {
    val cols = (0 until K).map(k => max(when(col("k") === k, col("c"))).as(s"cc$k"))
    cent.groupBy().agg(cols.head, cols.tail: _*)
  }

  /** Nearest-centroid index in 1-D by |x − c_k|, ties to the LOWEST k
    * (the first satisfied branch) — exact integer arithmetic, so the
    * argmin is deterministic on both engines. */
  private def argminK = {
    val d = (0 until K).map(k => abs(col("x") - col(s"cc$k")))
    when(d(0) <= d(1) && d(0) <= d(2) && d(0) <= d(3), 0L)
      .when(d(1) <= d(2) && d(1) <= d(3), 1L)
      .when(d(2) <= d(3), 2L)
      .otherwise(3L)
  }

  val all: Seq[Q] = Seq(

    // Three full Lloyd iterations of 1-D k-means on o_totalprice (cents),
    // K=4, seeds c_k = 50k·(k+1) dollars (the ml_streaming_kmeans_update
    // grid). Each iteration: assign every CACHED point to its nearest
    // centroid (broadcast 1-row model), partial-agg (count, sum) per
    // cluster, update c_k = sum DIV count with the previous centroid
    // kept on an empty cluster. Output is the full iteration TRACE —
    // (iter, k, cluster size, centroid) for iter 1..3 — so the oracle
    // verifies every step of the loop, not just the fixpoint.
    Q("ml_kmeans_iterate",
      (s, d) => {
        import s.implicits._
        val pts = table(s, d, "orders")
          .select(round(col("o_totalprice") * 100).cast("long").as("x"))
        // the loop invariant: cache ONCE, every iteration re-reads this
        val cached = graft.functions.CacheOnce.swap("ml_kmeans_pts", pts)
        var cent: DataFrame = (0 until K)
          .map(k => (k.toLong, 5000000L * (k + 1))).toDF("k", "c")
        val trace = (1 to 3).map { it =>
          val stats = cached.crossJoin(broadcast(pivotRow(cent)))
            .withColumn("k", argminK)
            .groupBy(col("k"))
            .agg(count(lit(1)).as("m"), sum(col("x")).as("s"))
          val next = cent.select(col("k"), col("c").as("c_prev"))
            .join(stats, Seq("k"), "left")
            .select(col("k"),
              coalesce(col("m"), lit(0L)).as("m"),
              coalesce(expr("CAST(s DIV m AS BIGINT)"), col("c_prev")).as("c"))
          cent = next.select(col("k"), col("c"))
          next.select(lit(it.toLong).as("iter"), col("k"), col("m"), col("c"))
        }
        trace.reduce(_ unionByName _)
      },
      Some {
        // the oracle unrolls the identical three iterations as chained
        // CTEs — integer-exact at every step, so it verifies the whole
        // trajectory bit-for-bit
        val assign = (i: Int) =>
          s"""a$i AS (SELECT x, CASE
                WHEN abs(x-cc0) <= abs(x-cc1) AND abs(x-cc0) <= abs(x-cc2) AND abs(x-cc0) <= abs(x-cc3) THEN 0
                WHEN abs(x-cc1) <= abs(x-cc2) AND abs(x-cc1) <= abs(x-cc3) THEN 1
                WHEN abs(x-cc2) <= abs(x-cc3) THEN 2 ELSE 3 END AS k
              FROM pts, p${i - 1}),
              s$i AS (SELECT k, count(*) AS m, CAST(sum(x) AS BIGINT) AS s
                      FROM a$i GROUP BY k),
              c$i AS (SELECT c${i - 1}.k,
                        coalesce(s$i.m, 0) AS m,
                        coalesce(s$i.s // s$i.m, c${i - 1}.c) AS c
                      FROM c${i - 1} LEFT JOIN s$i ON c${i - 1}.k = s$i.k)"""
        val pivot = (i: Int) =>
          s"""p$i AS (SELECT max(CASE WHEN k=0 THEN c END) AS cc0,
                        max(CASE WHEN k=1 THEN c END) AS cc1,
                        max(CASE WHEN k=2 THEN c END) AS cc2,
                        max(CASE WHEN k=3 THEN c END) AS cc3 FROM c$i)"""
        sql(s"""WITH pts AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x
                             FROM orders),
                c0 AS (SELECT CAST(unnest([0,1,2,3]) AS BIGINT) AS k,
                              CAST(unnest([5000000,10000000,15000000,20000000]) AS BIGINT) AS c),
                ${pivot(0)}, ${assign(1)}, ${pivot(1)}, ${assign(2)},
                ${pivot(2)}, ${assign(3)}
                SELECT CAST(1 AS BIGINT) AS iter, k, m, c FROM c1
                UNION ALL SELECT CAST(2 AS BIGINT), k, m, c FROM c2
                UNION ALL SELECT CAST(3 AS BIGINT), k, m, c FROM c3""")
      }),

    // CONVERGENCE-TERMINATED iteration (the reference's actual loop
    // shape: GradientDescent.scala:166 halts on a convergence check,
    // Pregel on vote-to-halt — not a fixed trip count). Same integer
    // Lloyd step as ml_kmeans_iterate, but the loop runs until
    // max_k |c_new − c_prev| < Eps (a DATA-DEPENDENT stop decided on the
    // driver from a K-row collect per iteration, exactly like the
    // reference's learners) or MaxIter. Output is the executed-iteration
    // trace including the stop evidence: per-iteration delta and the
    // converged flag — the oracle unrolls all MaxIter steps in SQL,
    // derives the same first-convergence iteration, and must agree on
    // WHICH iterations ran, not just their centroids.
    //
    // Scale posture: per iteration one scan of the CACHED points (same
    // persisted table as ml_kmeans_iterate) + a K-row partial agg +
    // a K-row collect; the model is driver-resident. Inherently runs
    // jobs at declaration (the stop is data-dependent), so this row is
    // excluded from the zero-jobs contract like the stat_* rows.
    Q("ml_kmeans_converge",
      (s, d) => {
        import s.implicits._
        val pts = table(s, d, "orders")
          .select(round(col("o_totalprice") * 100).cast("long").as("x"))
        val cached = graft.functions.CacheOnce.swap("ml_kmeans_pts", pts)
        var cent: Map[Long, Long] =
          (0 until K).map(k => k.toLong -> 5000000L * (k + 1)).toMap
        val trace = Seq.newBuilder[(Long, Long, Long, Long, Long, Boolean)]
        var it = 1L
        var done = false
        while (it <= MaxIter && !done) {
          val cdf = cent.toSeq.toDF("k", "c")
          val stats = cached.crossJoin(broadcast(pivotRow(cdf)))
            .withColumn("k", argminK)
            .groupBy(col("k"))
            .agg(count(lit(1)).as("m"), sum(col("x")).as("s"))
            .collect()
            .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
          val next = (0 until K).map { ki =>
            val k = ki.toLong
            stats.get(k) match {
              // x ≥ 0 so Long '/' truncation == SQL DIV == DuckDB '//'
              case Some((m, sum)) => (k, m, sum / m)
              case None => (k, 0L, cent(k)) // empty cluster keeps its centroid
            }
          }
          val delta = next.map { case (k, _, c) => math.abs(c - cent(k)) }.max
          done = delta < Eps
          next.foreach { case (k, m, c) => trace += ((it, k, m, c, delta, done)) }
          cent = next.map { case (k, _, c) => k -> c }.toMap
          it += 1
        }
        trace.result().toDF("iter", "k", "m", "c", "delta", "converged")
      },
      Some {
        // every CTE is MATERIALIZED: the chain references c_i from four
        // places (next assign, delta, trace row, stp) and DuckDB inlines
        // plain CTEs per reference — 8 unrolled iterations would
        // re-execute the whole prefix exponentially without it
        val assign = (i: Int) =>
          s"""a$i AS MATERIALIZED (SELECT x, CASE
                WHEN abs(x-cc0) <= abs(x-cc1) AND abs(x-cc0) <= abs(x-cc2) AND abs(x-cc0) <= abs(x-cc3) THEN 0
                WHEN abs(x-cc1) <= abs(x-cc2) AND abs(x-cc1) <= abs(x-cc3) THEN 1
                WHEN abs(x-cc2) <= abs(x-cc3) THEN 2 ELSE 3 END AS k
              FROM pts, p${i - 1}),
              s$i AS MATERIALIZED (SELECT k, count(*) AS m, CAST(sum(x) AS BIGINT) AS s
                      FROM a$i GROUP BY k),
              c$i AS MATERIALIZED (SELECT c${i - 1}.k,
                        coalesce(s$i.m, 0) AS m,
                        coalesce(s$i.s // s$i.m, c${i - 1}.c) AS c
                      FROM c${i - 1} LEFT JOIN s$i ON c${i - 1}.k = s$i.k),
              d$i AS MATERIALIZED (SELECT CAST(max(abs(cur.c - prev.c)) AS BIGINT) AS delta
                      FROM c$i cur JOIN c${i - 1} prev ON cur.k = prev.k)"""
        val pivot = (i: Int) =>
          s"""p$i AS MATERIALIZED (SELECT max(CASE WHEN k=0 THEN c END) AS cc0,
                        max(CASE WHEN k=1 THEN c END) AS cc1,
                        max(CASE WHEN k=2 THEN c END) AS cc2,
                        max(CASE WHEN k=3 THEN c END) AS cc3 FROM c$i)"""
        val n = MaxIter.toInt
        val chain = (1 to n).map(i => s"${pivot(i - 1)}, ${assign(i)}").mkString(",\n")
        val deltas = (1 to n)
          .map(i => s"SELECT CAST($i AS BIGINT) AS iter, delta FROM d$i")
          .mkString(" UNION ALL ")
        val rows = (1 to n).map(i =>
          s"""SELECT CAST($i AS BIGINT) AS iter, k, m, c,
                (SELECT delta FROM d$i) AS delta,
                (SELECT delta FROM d$i) < $Eps AS converged FROM c$i""")
          .mkString(" UNION ALL ")
        sql(s"""WITH pts AS MATERIALIZED (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x
                             FROM orders),
                c0 AS MATERIALIZED (SELECT CAST(unnest([0,1,2,3]) AS BIGINT) AS k,
                              CAST(unnest([5000000,10000000,15000000,20000000]) AS BIGINT) AS c),
                $chain,
                ds AS MATERIALIZED ($deltas),
                stp AS (SELECT coalesce(min(iter), $MaxIter) AS j FROM ds WHERE delta < $Eps)
                SELECT iter, k, m, c, delta, converged
                FROM ($rows) t WHERE iter <= (SELECT j FROM stp)""")
      }),

    // CLASSIFIER EVALUATION: the confusion matrix and the derived
    // precision / recall / F1 for a threshold classifier (predict F when
    // o_totalprice > 200k vs the true flag) — the report every model
    // card needs next to ml_auc's ranking metric. Ratios travel as
    // floor(1e6·r) integers over exact tp/fp/fn/tn counts.
    Q("ml_prf_metrics",
      (s, d) => table(s, d, "orders")
        .select((col("o_totalprice") > 200000.0).cast("int").as("pred"),
          (col("o_orderstatus") === lit("F")).cast("int").as("truth"))
        .agg(
          sum(when(col("pred") === 1 && col("truth") === 1, 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred") === 1 && col("truth") === 0, 1L).otherwise(0L)).as("fp"),
          sum(when(col("pred") === 0 && col("truth") === 1, 1L).otherwise(0L)).as("fn"),
          sum(when(col("pred") === 0 && col("truth") === 0, 1L).otherwise(0L)).as("tn"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          expr("CAST(floor(1000000.0 * tp / (tp + fp)) AS BIGINT)").as("prec_micro"),
          expr("CAST(floor(1000000.0 * tp / (tp + fn)) AS BIGINT)").as("rec_micro"),
          expr("CAST(floor(2000000.0 * tp / (2 * tp + fp + fn)) AS BIGINT)").as("f1_micro")),
      Some(sql("""WITH c AS (SELECT
               CAST(sum(CASE WHEN o_totalprice > 200000.0 AND o_orderstatus = 'F'
                        THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN o_totalprice > 200000.0 AND o_orderstatus <> 'F'
                        THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN o_totalprice <= 200000.0 AND o_orderstatus = 'F'
                        THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(sum(CASE WHEN o_totalprice <= 200000.0 AND o_orderstatus <> 'F'
                        THEN 1 ELSE 0 END) AS BIGINT) AS tn
             FROM orders)
           SELECT tp, fp, fn, tn,
             CAST(floor(CAST(1000000.0 AS DOUBLE) * tp / (tp + fp)) AS BIGINT) AS prec_micro,
             CAST(floor(CAST(1000000.0 AS DOUBLE) * tp / (tp + fn)) AS BIGINT) AS rec_micro,
             CAST(floor(CAST(2000000.0 AS DOUBLE) * tp / (2 * tp + fp + fn)) AS BIGINT) AS f1_micro
           FROM c"""))),

    // ROC CURVE POINTS: cumulative TP/FP per score threshold (predict
    // positive when the price bucket ≥ t), descending over the bucket
    // grid — the curve ml_auc summarizes. The window runs over the
    // ~dozen DISTINCT bucket rows (score-grid metadata, not data rows);
    // rates travel as floor(1e6·r) integers over exact counts.
    Q("ml_roc_points",
      (s, d) => {
        val bucketed = table(s, d, "orders")
          .select(floor(col("o_totalprice") / 100000.0).cast("long").as("b"),
            (col("o_orderstatus") === lit("F")).cast("long").as("pos"))
          .groupBy(col("b"))
          .agg(sum(col("pos")).as("p"), (count(lit(1)) - sum(col("pos"))).as("np"))
        val w = Window.orderBy(col("b").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        bucketed
          .select(col("b").as("threshold"),
            sum(col("p")).over(w).as("tp"), sum(col("np")).over(w).as("fp"))
          .crossJoin(broadcast(table(s, d, "orders").agg(
            sum(when(col("o_orderstatus") === lit("F"), 1L).otherwise(0L)).as("tot_p"),
            sum(when(col("o_orderstatus") =!= lit("F"), 1L).otherwise(0L)).as("tot_n"))))
          .select(col("threshold"), col("tp"), col("fp"),
            expr("CAST(floor(CAST(1000000.0 AS DOUBLE) * tp / tot_p) AS BIGINT)").as("tpr_micro"),
            expr("CAST(floor(CAST(1000000.0 AS DOUBLE) * fp / tot_n) AS BIGINT)").as("fpr_micro"))
      },
      Some(sql("""WITH b AS (SELECT CAST(floor(o_totalprice / 100000.0) AS BIGINT) AS b,
                    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
                  FROM orders),
                g AS (SELECT b, CAST(sum(pos) AS BIGINT) AS p,
                        count(*) - CAST(sum(pos) AS BIGINT) AS np
                      FROM b GROUP BY b),
                c AS (SELECT b AS threshold,
                        CAST(sum(p) OVER (ORDER BY b DESC) AS BIGINT) AS tp,
                        CAST(sum(np) OVER (ORDER BY b DESC) AS BIGINT) AS fp
                      FROM g),
                tot AS (SELECT CAST(sum(pos) AS BIGINT) AS tot_p,
                          count(*) - CAST(sum(pos) AS BIGINT) AS tot_n FROM b)
                SELECT threshold, tp, fp,
                  CAST(floor(CAST(1000000.0 AS DOUBLE) * tp / tot_p) AS BIGINT) AS tpr_micro,
                  CAST(floor(CAST(1000000.0 AS DOUBLE) * fp / tot_n) AS BIGINT) AS fpr_micro
                FROM c CROSS JOIN tot"""))),

    // CALIBRATION / RELIABILITY DIAGRAM: per predicted-probability
    // decile, mean predicted probability vs observed positive rate and
    // the gap between them — the diagnostic that tells whether a
    // classifier's scores can be read as probabilities. The "model
    // score" is a deterministic hash-derived milli-probability so the
    // query replays bit-identically; everything is integer-scaled
    // micro-units (float means would be partial-order-dependent).
    Q("ml_calibration_bins",
      (s, d) => table(s, d, "orders")
        .select((col("o_orderkey") * 2654435761L % 1000L).as("score_milli"),
          (col("o_orderstatus") === lit("F")).cast("long").as("pos"))
        .groupBy(floor(col("score_milli") / 100L).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("score_milli")).as("sp"), sum(col("pos")).as("np"))
        .select(col("bin"), col("n"),
          expr("CAST(floor(CAST(1000000.0 AS DOUBLE) * sp / (1000.0 * n)) AS BIGINT)")
            .as("mean_pred_micro"),
          expr("CAST(floor(CAST(1000000.0 AS DOUBLE) * np / n) AS BIGINT)")
            .as("obs_rate_micro"))
        .withColumn("gap_micro",
          abs(col("mean_pred_micro") - col("obs_rate_micro"))),
      Some(sql("""WITH t AS (SELECT o_orderkey * 2654435761 % 1000 AS score_milli,
                    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
                  FROM orders),
                g AS (SELECT CAST(floor(score_milli / 100) AS BIGINT) AS bin,
                        count(*) AS n,
                        CAST(sum(score_milli) AS BIGINT) AS sp,
                        CAST(sum(pos) AS BIGINT) AS np
                      FROM t GROUP BY 1)
                SELECT bin, n,
                  CAST(floor(CAST(1000000.0 AS DOUBLE) * sp / (1000.0 * n)) AS BIGINT)
                    AS mean_pred_micro,
                  CAST(floor(CAST(1000000.0 AS DOUBLE) * np / n) AS BIGINT)
                    AS obs_rate_micro,
                  abs(CAST(floor(CAST(1000000.0 AS DOUBLE) * sp / (1000.0 * n)) AS BIGINT)
                    - CAST(floor(CAST(1000000.0 AS DOUBLE) * np / n) AS BIGINT))
                    AS gap_micro
                FROM g"""))),

    // KOLMOGOROV-SMIRNOV separation statistic: max over score
    // thresholds of |CDF_pos − CDF_neg| — the one-number answer to "do
    // positives and negatives live on different score ranges", the
    // companion of ml_auc/ml_roc_points. Same bounded bucket grid as
    // the ROC row (a global window over ~50 buckets, not the corpus);
    // integer-scaled, argmax tie-broken to the smallest threshold.
    Q("ml_ks_stat",
      (s, d) => {
        val g = table(s, d, "orders")
          .select(floor(col("o_totalprice") / 10000.0).cast("long").as("t"),
            (col("o_orderstatus") === lit("F")).cast("long").as("pos"))
          .groupBy(col("t"))
          .agg(sum(col("pos")).as("p"), (count(lit(1)) - sum(col("pos"))).as("np"))
        val w = Window.orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val c = g.select(col("t"),
            sum(col("p")).over(w).as("cp"), sum(col("np")).over(w).as("cn"))
          .crossJoin(broadcast(table(s, d, "orders").agg(
            sum(when(col("o_orderstatus") === lit("F"), 1L).otherwise(0L)).as("tot_p"),
            sum(when(col("o_orderstatus") =!= lit("F"), 1L).otherwise(0L)).as("tot_n"))))
          .select(col("t"),
            abs(expr("CAST(floor(CAST(1000000.0 AS DOUBLE) * cp / tot_p) AS BIGINT)")
              - expr("CAST(floor(CAST(1000000.0 AS DOUBLE) * cn / tot_n) AS BIGINT)"))
              .as("diff_micro"))
        c.agg(max(col("diff_micro")).as("ks_micro"),
          min_by(col("t"), struct(-col("diff_micro"), col("t"))).as("at_threshold"))
      },
      Some(sql("""WITH b AS (SELECT CAST(floor(o_totalprice / 10000.0) AS BIGINT) AS t,
                    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
                  FROM orders),
                g AS (SELECT t, CAST(sum(pos) AS BIGINT) AS p,
                        count(*) - CAST(sum(pos) AS BIGINT) AS np
                      FROM b GROUP BY t),
                c AS (SELECT t,
                        CAST(sum(p) OVER (ORDER BY t) AS BIGINT) AS cp,
                        CAST(sum(np) OVER (ORDER BY t) AS BIGINT) AS cn
                      FROM g),
                tot AS (SELECT CAST(sum(pos) AS BIGINT) AS tot_p,
                          count(*) - CAST(sum(pos) AS BIGINT) AS tot_n FROM b),
                diffs AS (SELECT t,
                    abs(CAST(floor(CAST(1000000.0 AS DOUBLE) * cp / tot_p) AS BIGINT)
                      - CAST(floor(CAST(1000000.0 AS DOUBLE) * cn / tot_n) AS BIGINT))
                      AS diff_micro
                  FROM c CROSS JOIN tot)
                SELECT max(diff_micro) AS ks_micro,
                  (SELECT min(t) FROM diffs
                   WHERE diff_micro = (SELECT max(diff_micro) FROM diffs))
                    AS at_threshold
                FROM diffs"""))),

    // PRECISION-RECALL CURVE points — the imbalanced-class companion of
    // ml_roc_points (precision against recall per descending score
    // threshold over the same bounded bucket grid); integer-scaled so
    // no float compare.
    Q("ml_pr_curve",
      (s, d) => {
        val g = table(s, d, "orders")
          .select(floor(col("o_totalprice") / 100000.0).cast("long").as("b"),
            (col("o_orderstatus") === lit("F")).cast("long").as("pos"))
          .groupBy(col("b"))
          .agg(sum(col("pos")).as("p"), count(lit(1)).as("n"))
        val w = Window.orderBy(col("b").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        g.select(col("b").as("threshold"),
            sum(col("p")).over(w).as("tp"), sum(col("n")).over(w).as("pred_pos"))
          .crossJoin(broadcast(table(s, d, "orders").agg(
            sum(when(col("o_orderstatus") === lit("F"), 1L).otherwise(0L)).as("tot_p"))))
          .select(col("threshold"), col("tp"),
            expr("CAST(floor(CAST(1000000.0 AS DOUBLE) * tp / pred_pos) AS BIGINT)")
              .as("precision_micro"),
            expr("CAST(floor(CAST(1000000.0 AS DOUBLE) * tp / tot_p) AS BIGINT)")
              .as("recall_micro"))
      },
      Some(sql("""WITH b AS (SELECT CAST(floor(o_totalprice / 100000.0) AS BIGINT) AS b,
                    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
                  FROM orders),
                g AS (SELECT b, CAST(sum(pos) AS BIGINT) AS p, count(*) AS n
                      FROM b GROUP BY b),
                c AS (SELECT b AS threshold,
                        CAST(sum(p) OVER (ORDER BY b DESC) AS BIGINT) AS tp,
                        CAST(sum(n) OVER (ORDER BY b DESC) AS BIGINT) AS pred_pos
                      FROM g),
                tot AS (SELECT CAST(sum(pos) AS BIGINT) AS tot_p FROM b)
                SELECT threshold, tp,
                  CAST(floor(CAST(1000000.0 AS DOUBLE) * tp / pred_pos) AS BIGINT)
                    AS precision_micro,
                  CAST(floor(CAST(1000000.0 AS DOUBLE) * tp / tot_p) AS BIGINT)
                    AS recall_micro
                FROM c CROSS JOIN tot"""))),

    // POPULATION STABILITY INDEX — the drift monitor between a
    // reference window and a live window: Σ (p−q)·ln(p/q) over value
    // buckets, the number that pages the ML-ops rotation when feature
    // distributions move. The two periods are the event-time halves of
    // the corpus; Laplace +1 smoothing keeps empty buckets finite. Per
    // bucket contributions AND the total, micro-scaled at the end only
    // (the ln products are deterministic closed forms of exact counts).
    Q("ml_psi_drift",
      (s, d) => {
        val sq = s; import sq.implicits._
        val half = table(s, d, "events")
          .agg(min(unix_micros(col("ts"))).as("mn"), max(unix_micros(col("ts"))).as("mx"))
        val bucketed = table(s, d, "events")
          .crossJoin(broadcast(half))
          .select(floor(col("value") / 10.0).cast("long").as("b"),
            (unix_micros(col("ts")) * 2 <= col("mn") + col("mx")).as("is_ref"))
          .groupBy(col("b"))
          .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("p_n"),
            sum(when(!col("is_ref"), 1L).otherwise(0L)).as("q_n"))
        val tot = bucketed.agg(
          (sum(col("p_n")) + count(lit(1))).as("p_tot"),
          (sum(col("q_n")) + count(lit(1))).as("q_tot"))
        bucketed.crossJoin(broadcast(tot))
          .select(col("b"), col("p_n"), col("q_n"),
            expr("""CAST(floor(1000000.0 * ((p_n + 1.0) / p_tot - (q_n + 1.0) / q_tot)
                    * ln(((p_n + 1.0) / p_tot) / ((q_n + 1.0) / q_tot)) + 0.5) AS BIGINT)""")
              .as("psi_term_micro"))
      },
      Some(sql("""WITH half AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                                FROM events),
                  bk AS (SELECT CAST(floor(value / 10.0) AS BIGINT) AS b,
                           epoch_us(ts) * 2 <= mn + mx AS is_ref
                         FROM events CROSS JOIN half),
                  g AS (SELECT b,
                          CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS p_n,
                          CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS q_n
                        FROM bk GROUP BY b),
                  tot AS (SELECT CAST(sum(p_n) + count(*) AS BIGINT) AS p_tot,
                            CAST(sum(q_n) + count(*) AS BIGINT) AS q_tot FROM g)
                  SELECT b, p_n, q_n,
                    CAST(floor(1000000.0 * ((p_n + 1.0) / p_tot - (q_n + 1.0) / q_tot)
                      * ln(((p_n + 1.0) / p_tot) / ((q_n + 1.0) / q_tot)) + 0.5) AS BIGINT)
                      AS psi_term_micro
                  FROM g CROSS JOIN tot"""))),

    // TWO-PROPORTION Z-TEST (A/B readout): purchase-rate difference
    // between the event-time halves, z = (p1−p2)/√(p̂(1−p̂)(1/n1+1/n2))
    // from exact counts — the experiment-analysis query every product
    // pipeline ends in. Micro-scaled z and rates; one scan + a 2-row
    // aggregate.
    Q("ml_ab_ztest",
      (s, d) => {
        val half = table(s, d, "events")
          .agg(min(unix_micros(col("ts"))).as("mn"), max(unix_micros(col("ts"))).as("mx"))
        table(s, d, "events")
          .crossJoin(broadcast(half))
          .select((unix_micros(col("ts")) * 2 <= col("mn") + col("mx")).as("is_a"),
            (col("event_type") === lit("purchase")).cast("long").as("conv"))
          .groupBy()
          .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n1"),
            sum(when(col("is_a"), col("conv")).otherwise(0L)).as("x1"),
            sum(when(!col("is_a"), 1L).otherwise(0L)).as("n2"),
            sum(when(!col("is_a"), col("conv")).otherwise(0L)).as("x2"))
          .select(col("n1"), col("x1"), col("n2"), col("x2"),
            expr("""CAST(floor(1000000.0 * (CAST(x1 AS DOUBLE)/n1 - CAST(x2 AS DOUBLE)/n2)
                    / sqrt((CAST(x1+x2 AS DOUBLE)/(n1+n2)) * (1.0 - CAST(x1+x2 AS DOUBLE)/(n1+n2))
                           * (1.0/n1 + 1.0/n2))) AS BIGINT)""").as("z_micro"))
      },
      Some(sql("""WITH half AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                                FROM events),
                  t AS (SELECT epoch_us(ts) * 2 <= mn + mx AS is_a,
                          CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
                        FROM events CROSS JOIN half),
                  g AS (SELECT
                          CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                          CAST(sum(CASE WHEN is_a THEN conv ELSE 0 END) AS BIGINT) AS x1,
                          CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n2,
                          CAST(sum(CASE WHEN is_a THEN 0 ELSE conv END) AS BIGINT) AS x2
                        FROM t)
                  SELECT n1, x1, n2, x2,
                    CAST(floor(1000000.0 * (CAST(x1 AS DOUBLE)/n1 - CAST(x2 AS DOUBLE)/n2)
                      / sqrt((CAST(x1+x2 AS DOUBLE)/(n1+n2)) * (1.0 - CAST(x1+x2 AS DOUBLE)/(n1+n2))
                             * (1.0/n1 + 1.0/n2))) AS BIGINT) AS z_micro
                  FROM g"""))),

    // REGRESSION EVAL METRICS — MAE and RMSE of a deterministic
    // hash-derived "prediction" against the event value, in exact
    // integer cents (the residual sums are exact; only the final
    // sqrt/division is floated then micro-floored) — the eval pair
    // every regression pipeline reports next to ml_auc's ranking pair.
    Q("ml_mae_rmse",
      (s, d) => table(s, d, "events")
        .select(round(col("value") * 100.0).cast("long").as("y"),
          (col("event_id") * 2654435761L % 5000L).as("yhat"))
        .agg(count(lit(1)).as("n"),
          sum(abs(col("y") - col("yhat"))).as("abs_err"),
          sum((col("y") - col("yhat")) * (col("y") - col("yhat"))).as("sq_err"))
        .select(col("n"),
          expr("CAST(floor(1000000.0 * abs_err / n) AS BIGINT)").as("mae_cents_micro"),
          expr("CAST(floor(1000000.0 * sqrt(CAST(sq_err AS DOUBLE) / n)) AS BIGINT)")
            .as("rmse_cents_micro")),
      Some(sql("""WITH t AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS y,
                      event_id * 2654435761 % 5000 AS yhat
                    FROM events),
                  g AS (SELECT count(*) AS n,
                      CAST(sum(abs(y - yhat)) AS BIGINT) AS abs_err,
                      CAST(sum((y - yhat) * (y - yhat)) AS BIGINT) AS sq_err
                    FROM t)
                  SELECT n,
                    CAST(floor(1000000.0 * abs_err / n) AS BIGINT) AS mae_cents_micro,
                    CAST(floor(1000000.0 * sqrt(CAST(sq_err AS DOUBLE) / n)) AS BIGINT)
                      AS rmse_cents_micro
                  FROM g""")))
  )
}
