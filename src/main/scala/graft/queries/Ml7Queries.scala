package graft.queries

import graft.Engine.{events, table}
import graft.functions.Portable
import org.apache.spark.sql.functions._
import Registry.sql

/** MLlib parity, wave 7 (round 10) — the remaining evaluation and
  * fitting surfaces of the reference's mllib tree (BinaryClassification
  * Metrics.scala, MulticlassMetrics.scala, ClusteringEvaluator,
  * IsotonicRegression, CrossValidator): proper scoring rules (Brier +
  * log loss), Welch's t, Cohen's kappa, simplified silhouette,
  * isotonic regression via minimax joins, k-fold OLS cross-validation
  * by leave-fold-out subtraction, and the Benford first-digit audit.
  * Scores/labels derive deterministically from the portable hash so
  * every metric is reproducible; counts and squared errors are exact
  * integers, transcendentals (ln, sqrt) appear only in the final
  * rounded projection.
  */
object Ml7Queries {

  /** Deterministic "model score" in exact thousandths {1..999}. */
  private def scoreK = (Portable.stableHash64(col("event_id")) % 999L + 1L)
  private def scoreKSql = s"(${Portable.stableHash64Sql("event_id")} % 999 + 1)"

  val all: Seq[Q] = Seq(

    // PROPER SCORING RULES: Brier score as an EXACT integer (scores are
    // thousandths, so 1e6·Brier = Σ(k−1000y)² DIV n), log loss from the
    // same rows with ln only in the final average. One scan, one global
    // partial aggregate.
    Q("ml_log_loss_brier",
      (s, d) => {
        val scored = events(s, d).select(
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
          scoreK.as("k"))
        scored.select(col("y"), col("k"),
          ((col("k") - col("y") * 1000L) * (col("k") - col("y") * 1000L)).as("d2"),
          (col("k").cast("double") / 1000.0).as("p"))
          .agg(count(lit(1)).as("n"),
            expr("CAST(sum(d2) DIV count(1) AS BIGINT)").as("brier_micro"),
            round(-avg(col("y") * log(col("p"))
              + (lit(1L) - col("y")) * log(lit(1.0) - col("p"))), 6).as("log_loss"))
      },
      Some(sql(s"""WITH scored AS (SELECT
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                       $scoreKSql AS k
                     FROM events),
                   rows_ AS (SELECT y, k,
                       (k - 1000 * y) * (k - 1000 * y) AS d2,
                       CAST(k AS DOUBLE) / 1000.0 AS p
                     FROM scored)
                   SELECT count(*) AS n,
                     CAST(sum(d2) // count(*) AS BIGINT) AS brier_micro,
                     round(-avg(y * ln(p) + (1 - y) * ln(1 - p)), 6) AS log_loss
                   FROM rows_"""))),

    // WELCH'S T-TEST (unequal variances) between purchase and click
    // event values: per-group exact integer (n, Σv, Σv²), then the
    // t statistic and Welch–Satterthwaite degrees of freedom as the
    // shared IEEE scalar formula. The reference's closest surface is
    // mllib/stat's streaming significance testing.
    Q("ml_welch_t",
      (s, d) => {
        val g = events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
            sum(col("v").cast("decimal(38,0)") * col("v")).as("qv"))
          .select(col("event_type"), col("n").cast("double").as("n"),
            col("sv").cast("double").as("s"), col("qv").cast("double").as("q"))
        val w = g.agg(
          max(when(col("event_type") === "purchase", col("n"))).as("n1"),
          max(when(col("event_type") === "purchase", col("s"))).as("s1"),
          max(when(col("event_type") === "purchase", col("q"))).as("q1"),
          max(when(col("event_type") === "click", col("n"))).as("n2"),
          max(when(col("event_type") === "click", col("s"))).as("s2"),
          max(when(col("event_type") === "click", col("q"))).as("q2"))
        w.select(
          col("n1").cast("long").as("n_purchase"), col("n2").cast("long").as("n_click"),
          ((col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1) / col("n1"))
            .as("se1sq"),
          ((col("q2") - col("s2") * col("s2") / col("n2")) / (col("n2") - 1) / col("n2"))
            .as("se2sq"),
          (col("s1") / col("n1") - col("s2") / col("n2")).as("dmean"))
          .select(col("n_purchase"), col("n_click"),
            round(col("dmean") / 100.0, 4).as("mean_diff_d"),
            round(col("dmean") / sqrt(col("se1sq") + col("se2sq")), 6).as("t_stat"),
            round((col("se1sq") + col("se2sq")) * (col("se1sq") + col("se2sq")) /
              (col("se1sq") * col("se1sq") / (col("n_purchase").cast("double") - 1) +
               col("se2sq") * col("se2sq") / (col("n_click").cast("double") - 1)), 2)
              .as("welch_df"))
      },
      Some(sql("""WITH g AS (SELECT event_type, count(*) AS n,
                       sum(CAST(round(value * 100) AS BIGINT)) AS sv,
                       sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS qv
                     FROM events WHERE event_type IN ('purchase', 'click')
                     GROUP BY event_type),
                   w AS (SELECT
                       max(CASE WHEN event_type = 'purchase' THEN CAST(n AS DOUBLE) END) AS n1,
                       max(CASE WHEN event_type = 'purchase' THEN CAST(sv AS DOUBLE) END) AS s1,
                       max(CASE WHEN event_type = 'purchase' THEN CAST(qv AS DOUBLE) END) AS q1,
                       max(CASE WHEN event_type = 'click' THEN CAST(n AS DOUBLE) END) AS n2,
                       max(CASE WHEN event_type = 'click' THEN CAST(sv AS DOUBLE) END) AS s2,
                       max(CASE WHEN event_type = 'click' THEN CAST(qv AS DOUBLE) END) AS q2
                     FROM g),
                   se AS (SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_click,
                       (q1 - s1 * s1 / n1) / (n1 - 1) / n1 AS se1sq,
                       (q2 - s2 * s2 / n2) / (n2 - 1) / n2 AS se2sq,
                       s1 / n1 - s2 / n2 AS dmean
                     FROM w)
                   SELECT n_purchase, n_click,
                     round(dmean / 100.0, 4) AS mean_diff_d,
                     round(dmean / sqrt(se1sq + se2sq), 6) AS t_stat,
                     round((se1sq + se2sq) * (se1sq + se2sq) /
                       (se1sq * se1sq / (CAST(n_purchase AS DOUBLE) - 1) +
                        se2sq * se2sq / (CAST(n_click AS DOUBLE) - 1)), 2) AS welch_df
                   FROM se"""))),

    // COHEN'S KAPPA: chance-corrected agreement between the true class
    // and a deterministic noisy rater (hash-agree 80%, else the next
    // class cyclically). po/pe come from exact contingency counts; the
    // single division is the final projection. The multiclass-agreement
    // dial next to ml_prf_metrics' per-class F1.
    Q("ml_cohen_kappa",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val nextType = types.zipWithIndex.map { case (t, i) =>
          (t, types((i + 1) % types.size))
        }.foldLeft(lit(null).cast("string")) { case (acc, (t, nt)) =>
          when(col("event_type") === t, nt).otherwise(acc)
        }
        val rated = events(s, d).select(col("event_type").as("a"),
          when(Portable.stableHash64(col("event_id")) % 5 < 4, col("event_type"))
            .otherwise(nextType).as("b"))
        val counts = rated.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
        counts.agg(
          sum(col("c")).as("n"),
          sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("agree"))
          .crossJoin(broadcast(
            counts.groupBy(col("a")).agg(sum(col("c")).as("ra"))
              .join(counts.groupBy(col("b")).agg(sum(col("c")).as("cb")),
                col("a") === col("b"))
              .agg(sum(col("ra").cast("decimal(38,0)") * col("cb")).as("pe_num"))))
          .select(col("n").cast("long").as("n"),
            col("agree").cast("long").as("agree"),
            round((col("agree").cast("double") / col("n").cast("double") -
              col("pe_num").cast("double") / (col("n").cast("double") * col("n").cast("double"))) /
              (lit(1.0) -
                col("pe_num").cast("double") / (col("n").cast("double") * col("n").cast("double"))), 6)
              .as("kappa"))
      },
      Some(sql(s"""WITH rated AS (SELECT event_type AS a,
                       CASE WHEN ${Portable.stableHash64Sql("event_id")} % 5 < 4 THEN event_type
                            ELSE CASE event_type
                                   WHEN 'click' THEN 'error' WHEN 'error' THEN 'purchase'
                                   WHEN 'purchase' THEN 'signup' WHEN 'signup' THEN 'view'
                                   WHEN 'view' THEN 'click' END
                       END AS b
                     FROM events),
                   counts AS (SELECT a, b, count(*) AS c FROM rated GROUP BY a, b),
                   tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                       CAST(sum(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS agree
                     FROM counts),
                   pe AS (SELECT sum(ra * cb) AS pe_num
                          FROM (SELECT a, sum(c) AS ra FROM counts GROUP BY a) x
                          JOIN (SELECT b, sum(c) AS cb FROM counts GROUP BY b) y
                            ON x.a = y.b)
                   SELECT n, agree,
                     round((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) -
                       CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
                       (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
                       AS kappa
                   FROM tot, pe"""))),

    // SIMPLIFIED SILHOUETTE (centroid-based, the linear-time variant of
    // mllib's ClusteringEvaluator): a(x) = dist to own label centroid,
    // b(x) = min dist to the other 9 — centroids are exact integer-DIV
    // micro vectors from one partial agg, distances exact integer sums
    // of squares via a broadcast join on the dimension index, sqrt only
    // in the final per-point projection. The misassignment count uses
    // the exact b²<a² integer compare, immune to float drift.
    Q("ml_silhouette",
      (s, d) => {
        val pts = graft.Engine.table(s, d, "embeddings")
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")).as(Seq("pos", "e")))
          .select(col("vec_id"), col("label"), col("pos"),
            round(col("e").cast("double") * 1e6).cast("long").as("xm"))
        val cent = pts.groupBy(col("label").as("clabel"), col("pos"))
          .agg(expr("CAST(sum(xm) DIV count(1) AS BIGINT)").as("c"))
        val d2 = pts.join(broadcast(cent), Seq("pos"))
          .groupBy(col("vec_id"), col("label"), col("clabel"))
          .agg(sum((col("xm") - col("c")) * (col("xm") - col("c"))).as("d2"))
        val per = d2.groupBy(col("vec_id"), col("label"))
          .agg(max(when(col("clabel") === col("label"), col("d2"))).as("a2"),
            min(when(col("clabel") =!= col("label"), col("d2"))).as("b2"))
        per
          .select(col("label"), col("a2"), col("b2"),
            ((sqrt(col("b2").cast("double")) - sqrt(col("a2").cast("double"))) /
              greatest(sqrt(col("a2").cast("double")), sqrt(col("b2").cast("double"))))
              .as("sil"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("sil")), 6).as("mean_silhouette"),
            sum(when(col("b2") < col("a2"), 1L).otherwise(0L)).as("n_misassigned"))
          .orderBy(col("label"))
      },
      Some(sql("""WITH pts AS (SELECT vec_id, label, CAST(i.range AS INT) - 1 AS pos,
                       CAST(round(CAST(embedding[CAST(i.range AS INT)] AS DOUBLE) * 1e6) AS BIGINT) AS xm
                     FROM embeddings, range(1, 65) i),
                   cent AS (SELECT label AS clabel, pos,
                       CAST(sum(xm) // count(*) AS BIGINT) AS c
                     FROM pts GROUP BY 1, 2),
                   d2 AS (SELECT vec_id, label, clabel,
                       CAST(sum((xm - c) * (xm - c)) AS BIGINT) AS d2
                     FROM pts JOIN cent USING (pos) GROUP BY 1, 2, 3),
                   per AS (SELECT vec_id, label,
                       max(CASE WHEN clabel = label THEN d2 END) AS a2,
                       min(CASE WHEN clabel <> label THEN d2 END) AS b2
                     FROM d2 GROUP BY 1, 2)
                   SELECT label, count(*) AS n,
                     round(avg((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE))) /
                       greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE)))), 6)
                       AS mean_silhouette,
                     CAST(sum(CASE WHEN b2 < a2 THEN 1 ELSE 0 END) AS BIGINT) AS n_misassigned
                   FROM per GROUP BY label ORDER BY label"""))),

    // ISOTONIC REGRESSION on calibration bins (mllib regression/
    // IsotonicRegression — pool-adjacent-violators), restated via the
    // minimax characterization fitted_j = max_{i≤j} min_{k≥j} avg(y
    // over bins i..k): the (i,j,k) enumeration is bounded by the FIXED
    // bin count (10³ rows from one broadcastable bin table), so the
    // sequential PAV sweep becomes three declarative joins. Range
    // averages come from exact integer prefix sums; the final fitted
    // values are monotone by construction (pinned as data).
    Q("ml_isotonic_bins",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val bins = events(s, d).select(
          (scoreK / lit(100L)).cast("long").as("bin"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("w"), sum(col("y")).as("sy"))
          .withColumn("cw", sum(col("w")).over(Window.orderBy(col("bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cy", sum(col("sy")).over(Window.orderBy(col("bin"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val b = bins.select(col("bin"), col("w"), col("sy"), col("cw"), col("cy"))
        // A(i,k) = (cy_k − cy_{i-1}) / (cw_k − cw_{i-1}) over the 55
        // ordered ranges — bounded by the bin-count constant, never by
        // the corpus
        val ranges = b.as("i").crossJoin(b.as("k"))
          .filter(col("i.bin") <= col("k.bin"))
          .select(col("i.bin").as("i"), col("k.bin").as("k"),
            ((col("k.cy") - col("i.cy") + col("i.sy")).cast("double") /
              (col("k.cw") - col("i.cw") + col("i.w")).cast("double")).as("a"))
        val innerMin = ranges.as("r").join(b.select(col("bin").as("j")),
            col("r.i") <= col("j") && col("r.k") >= col("j"))
          .groupBy(col("j"), col("r.i"))
          .agg(min(col("a")).as("mn"))
        val fitted = innerMin.groupBy(col("j"))
          .agg(max(col("mn")).as("fit"))
        b.select(col("bin"), col("w"),
          expr("CAST(sy * 1000000 DIV w AS BIGINT)").as("raw_micro"))
          .join(fitted, col("bin") === col("j"))
          .select(col("bin"), col("w"), col("raw_micro"), round(col("fit"), 6).as("fitted"))
          .orderBy(col("bin"))
      },
      Some(sql(s"""WITH pts AS (SELECT $scoreKSql // 100 AS bin,
                       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
                     FROM events),
                   bins AS (SELECT bin, count(*) AS w, CAST(sum(y) AS BIGINT) AS sy
                            FROM pts GROUP BY bin),
                   cum AS (SELECT bin, w, sy,
                       CAST(sum(w) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
                       CAST(sum(sy) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cy
                     FROM bins),
                   ranges AS (SELECT i.bin AS i, k.bin AS k,
                       CAST(k.cy - i.cy + i.sy AS DOUBLE) / CAST(k.cw - i.cw + i.w AS DOUBLE) AS a
                     FROM cum i, cum k WHERE i.bin <= k.bin),
                   innermin AS (SELECT j.bin AS j, r.i, min(r.a) AS mn
                     FROM ranges r JOIN cum j ON r.i <= j.bin AND r.k >= j.bin
                     GROUP BY 1, 2),
                   fitted AS (SELECT j, max(mn) AS fit FROM innermin GROUP BY j)
                   SELECT bin, w, sy * 1000000 // w AS raw_micro,
                     round(fit, 6) AS fitted
                   FROM cum JOIN fitted ON bin = j
                   ORDER BY bin"""))),

    // K-FOLD CROSS-VALIDATION of the OLS slope (mllib CrossValidator
    // shape, closed form): per-fold exact sufficient statistics from
    // ONE scan; each fold's TRAIN stats are total − fold (the
    // leave-fold-out subtraction — no per-fold re-scan), the fit and
    // the held-out MSE are the shared IEEE formula over those exact
    // integers. The k=5 fold assignment is the portable hash.
    Q("ml_kfold_ols",
      (s, d) => {
        val rows = table(s, d, "lineitem")
          .select(col("l_quantity").cast("long").as("x"),
            round(col("l_extendedprice") * 100).cast("long").as("y"),
            (Portable.stableHash64(concat_ws("|",
              col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))) % 5L).as("fold"))
        val perFold = rows.groupBy(col("fold")).agg(
          count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).cast("decimal(38,0)").as("sx"),
          sum(col("y")).cast("decimal(38,0)").as("sy"),
          sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"),
          sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
        val tot = perFold.agg(sum(col("n")).as("tn"), sum(col("sx")).as("tsx"),
          sum(col("sy")).as("tsy"), sum(col("sxy")).as("tsxy"),
          sum(col("sxx")).as("tsxx"))
        perFold.crossJoin(broadcast(tot))
          .select(col("fold"), col("n").cast("long").as("n_test"),
            (col("tn") - col("n")).cast("double").as("n_tr"),
            (col("tsx") - col("sx")).cast("double").as("sx_tr"),
            (col("tsy") - col("sy")).cast("double").as("sy_tr"),
            (col("tsxy") - col("sxy")).cast("double").as("sxy_tr"),
            (col("tsxx") - col("sxx")).cast("double").as("sxx_tr"),
            col("n").cast("double").as("nd"), col("sx").cast("double").as("sxd"),
            col("sy").cast("double").as("syd"), col("sxy").cast("double").as("sxyd"),
            col("sxx").cast("double").as("sxxd"), col("syy").cast("double").as("syyd"))
          .withColumn("b", (col("n_tr") * col("sxy_tr") - col("sx_tr") * col("sy_tr")) /
            (col("n_tr") * col("sxx_tr") - col("sx_tr") * col("sx_tr")))
          .withColumn("a", (col("sy_tr") - col("b") * col("sx_tr")) / col("n_tr"))
          .select(col("fold"), col("n_test"),
            round(col("b"), 6).as("slope"),
            round(col("a"), 4).as("intercept_c"),
            round((col("syyd") - col("a") * col("syd") * 2 - col("b") * col("sxyd") * 2
              + col("nd") * col("a") * col("a")
              + col("a") * col("b") * col("sxd") * 2
              + col("b") * col("b") * col("sxxd")) / col("nd"), 2).as("test_mse"))
          .orderBy(col("fold"))
      },
      Some(sql(s"""WITH rows_ AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
                       ${Portable.stableHash64Sql(
                         "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR)")} % 5 AS fold
                     FROM lineitem),
                   pf AS (SELECT fold, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                       sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
                     FROM rows_ GROUP BY fold),
                   tot AS (SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sy) AS tsy,
                       sum(sxy) AS tsxy, sum(sxx) AS tsxx FROM pf),
                   dd AS (SELECT fold, CAST(n AS BIGINT) AS n_test,
                       CAST(tn - n AS DOUBLE) AS n_tr, CAST(tsx - sx AS DOUBLE) AS sx_tr,
                       CAST(tsy - sy AS DOUBLE) AS sy_tr, CAST(tsxy - sxy AS DOUBLE) AS sxy_tr,
                       CAST(tsxx - sxx AS DOUBLE) AS sxx_tr,
                       CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                       CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
                       CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
                     FROM pf, tot),
                   fit AS (SELECT *,
                       (n_tr * sxy_tr - sx_tr * sy_tr) / (n_tr * sxx_tr - sx_tr * sx_tr) AS b
                     FROM dd),
                   fit2 AS (SELECT *, (sy_tr - b * sx_tr) / n_tr AS a FROM fit)
                   SELECT fold, n_test, round(b, 6) AS slope,
                     round(a, 4) AS intercept_c,
                     round((syyd - a * syd * 2 - b * sxyd * 2
                       + nd * a * a + a * b * sxd * 2 + b * b * sxxd) / nd, 2) AS test_mse
                   FROM fit2 ORDER BY fold"""))),

    // BENFORD'S-LAW FIRST-DIGIT AUDIT: the fraud/data-quality screen —
    // observed first-significant-digit counts of order totals (taken
    // EXACTLY from the cents integer's decimal string, no log10 float)
    // against the Benford expectation p_d = ln(1+1/d)/ln(10), with the
    // per-digit chi-square contribution. One scan, a 9-row aggregate.
    Q("ml_benford_digits",
      (s, d) => {
        val digits = table(s, d, "orders")
          .select(substring(round(col("o_totalprice") * 100).cast("long")
            .cast("string"), 1, 1).cast("int").as("digit"))
          .filter(col("digit") >= 1)
        val n = digits.agg(count(lit(1)).as("n"))
        digits.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
          .crossJoin(broadcast(n))
          .withColumn("p", log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
            / log(lit(10.0)))
          .select(col("digit"), col("n_obs"),
            round(col("p") * col("n").cast("double"), 2).as("exp_n"),
            round((col("n_obs").cast("double") - col("p") * col("n").cast("double"))
              * (col("n_obs").cast("double") - col("p") * col("n").cast("double"))
              / (col("p") * col("n").cast("double")), 4).as("chi2_term"))
          .orderBy(col("digit"))
      },
      Some(sql("""WITH digits AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100)
                         AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
                     FROM orders),
                   d2 AS (SELECT digit FROM digits WHERE digit >= 1),
                   n AS (SELECT count(*) AS n FROM d2)
                   SELECT digit, count(*) AS n_obs,
                     round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)
                       * CAST(n AS DOUBLE), 2) AS exp_n,
                     round((CAST(count(*) AS DOUBLE) - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * CAST(n AS DOUBLE))
                       * (CAST(count(*) AS DOUBLE) - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * CAST(n AS DOUBLE))
                       / (ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0) * CAST(n AS DOUBLE)), 4) AS chi2_term
                   FROM d2, n GROUP BY digit, n ORDER BY digit"""))),

    // THEIL–SEN ROBUST SLOPE: the median of pairwise slopes over a
    // deterministic 100-point sample (hash-top selection), with each
    // slope an EXACT floor-1e6-scaled integer ((yj−yi)·1e6 DIV (xj−xi))
    // so the median is an exact element selection — the
    // outlier-resistant alternative to agg_corr_covar's OLS slope.
    // Pair volume is bounded by the FIXED sample size (C(100,2)), never
    // by the corpus; the sample selection is one TopK.
    Q("ml_theilsen_slope",
      (s, d) => {
        val pts = table(s, d, "lineitem")
          .select(col("l_quantity").cast("long").as("x"),
            round(col("l_extendedprice") * 100).cast("long").as("y"),
            Portable.stableHash64(concat_ws("|",
              col("l_orderkey"), col("l_linenumber"), col("l_suppkey"))).as("h"))
          .orderBy(col("h")).limit(100)
        val slopes = pts.as("a").join(pts.as("b"),
            col("a.h") < col("b.h") && col("a.x") =!= col("b.x"))
          .select(expr("((b.y - a.y) * 1000000) DIV (b.x - a.x)").as("slope_micro"))
        slopes.agg(count(lit(1)).as("n_pairs"),
          expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY slope_micro) AS BIGINT)")
            .as("theilsen_slope_micro"))
      },
      Some(sql(s"""WITH pts AS (SELECT CAST(l_quantity AS BIGINT) AS x,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
                       ${Portable.stableHash64Sql(
                         "CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR) || '|' || CAST(l_suppkey AS VARCHAR)")} AS h
                     FROM lineitem ORDER BY h LIMIT 100),
                   slopes AS (SELECT ((b.y - a.y) * 1000000) // (b.x - a.x) AS slope_micro
                     FROM pts a JOIN pts b ON a.h < b.h AND a.x <> b.x)
                   SELECT count(*) AS n_pairs,
                     CAST(quantile_disc(slope_micro, 0.5) AS BIGINT) AS theilsen_slope_micro
                   FROM slopes"""))),

    // WALD–WOLFOWITZ RUNS TEST for serial randomness: per event type,
    // the daily series is dichotomized around its exact median (ties
    // dropped, the standard convention), runs are counted with one
    // partitioned lag window, and the normal-approximation z comes
    // from exact (n1, n2, R) integers via the shared IEEE formula —
    // the trend/clustering diagnostic next to win_autocorr.
    Q("ml_runs_test",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val daily = events(s, d)
          .groupBy(col("event_type"),
            floor(unix_micros(col("ts")) / 86400000000.0).cast("long").as("day"))
          .agg(sum(round(col("value") * 100).cast("long")).as("v"))
        val med = daily.groupBy(col("event_type").as("et"))
          .agg(expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT)")
            .as("med"))
        val signs = daily.join(broadcast(med), col("event_type") === col("et"))
          .filter(col("v") =!= col("med"))
          .select(col("event_type"), col("day"), (col("v") > col("med")).as("up"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        signs
          .withColumn("chg", when(lag(col("up"), 1).over(w).isNull
            || col("up") =!= lag(col("up"), 1).over(w), 1L).otherwise(0L))
          .groupBy(col("event_type"))
          .agg(sum(col("chg")).as("runs"),
            sum(when(col("up"), 1L).otherwise(0L)).as("n1"),
            sum(when(!col("up"), 1L).otherwise(0L)).as("n2"))
          .select(col("event_type"), col("runs"), col("n1"), col("n2"),
            round((col("runs").cast("double") -
              (col("n1").cast("double") * col("n2").cast("double") * 2.0 /
                (col("n1") + col("n2")).cast("double") + 1.0)) /
              sqrt(col("n1").cast("double") * col("n2").cast("double") * 2.0 *
                (col("n1").cast("double") * col("n2").cast("double") * 2.0 -
                  col("n1").cast("double") - col("n2").cast("double")) /
                ((col("n1") + col("n2")).cast("double") *
                  (col("n1") + col("n2")).cast("double") *
                  ((col("n1") + col("n2")).cast("double") - 1.0))), 4).as("z"))
          .orderBy(col("event_type"))
      },
      Some(sql("""WITH daily AS (SELECT event_type,
                       CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
                     FROM events GROUP BY 1, 2),
                   med AS (SELECT event_type AS et, quantile_disc(v, 0.5) AS med
                           FROM daily GROUP BY 1),
                   signs AS (SELECT event_type, day, v > med AS up
                     FROM daily JOIN med ON event_type = et
                     WHERE v <> med),
                   chg AS (SELECT event_type, up,
                       CASE WHEN lag(up) OVER (PARTITION BY event_type ORDER BY day) IS NULL
                              OR up <> lag(up) OVER (PARTITION BY event_type ORDER BY day)
                            THEN 1 ELSE 0 END AS chg
                     FROM signs),
                   agg AS (SELECT event_type, CAST(sum(chg) AS BIGINT) AS runs,
                       CAST(sum(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                       CAST(sum(CASE WHEN NOT up THEN 1 ELSE 0 END) AS BIGINT) AS n2
                     FROM chg GROUP BY event_type)
                   SELECT event_type, runs, n1, n2,
                     round((CAST(runs AS DOUBLE) -
                       (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * 2.0 /
                         CAST(n1 + n2 AS DOUBLE) + 1.0)) /
                       sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * 2.0 *
                         (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * 2.0 -
                           CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)) /
                         (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE) *
                           (CAST(n1 + n2 AS DOUBLE) - 1.0))), 4) AS z
                   FROM agg ORDER BY event_type""")))
  )
}
