package graft.queries

import graft.Engine.{events, table}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Registry.sql

/** MLlib parity, wave 6 (round 10) — classical INFERENTIAL STATISTICS
  * the reference exposes through mllib/stat (Statistics.chiSqTest,
  * colStats, corr — mllib/src/main/scala/org/apache/spark/mllib/stat/
  * Statistics.scala): one-way ANOVA, a multiplier-bootstrap confidence
  * interval, the full corr/covar family, Tukey/winsorized/trimmed and
  * MAD robust estimators, and difference-in-differences — each restated
  * as ONE partial-aggregate scan producing exact integer sufficient
  * statistics, with the final scalar formula evaluated identically in
  * both engines.
  *
  * Exactness contract: measures are quantized to integer cents, all
  * sums/sums-of-squares are exact integers (DECIMAL(38,0) in Spark,
  * HUGEINT in DuckDB — no double accumulation-order drift can exist),
  * and only the FINAL k-row / 1-row scalar arithmetic converts to
  * double, where both engines evaluate the same IEEE expression tree on
  * identical inputs.
  *
  * Scale posture: every query is one scan + one partial agg on a
  * low-cardinality key (event_type / replicate id) — map-side combine
  * does all the work, the exchange carries k rows per partition.
  */
object Ml6Queries {

  /** Bootstrap replicate count: one md5 per row yields 32 hex digits;
    * replicate r's multiplier weight is digit r mod 3 — the hash is
    * computed ONCE per row, before the replicate explode. */
  private val Reps = 30

  /** Exact integer floor-quotient of two non-negative exact integer
    * decimals: a/b would round at result scale, so subtract the exact
    * remainder first — the division is then exact at any scale.
    * DuckDB twin: a // b (HUGEINT floor division). */
  private def divExact(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("decimal(38,0)")

  val all: Seq[Q] = Seq(

    // ONE-WAY ANOVA across event_type on value (cents): between/within
    // sums of squares and the F statistic from per-group exact integer
    // (n, S, Q=Σv²) triples. S_g² needs int128 (S_g² ≈ 1e20 at sf0.1
    // overflows BIGINT) — DECIMAL(38,0)/HUGEINT carries it exactly.
    Q("ml_anova_f",
      (s, d) => {
        val g = events(s, d)
          .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("decimal(38,0)").as("n_g"),
            sum(col("v")).cast("decimal(38,0)").as("s_g"),
            sum(col("v").cast("decimal(38,0)") * col("v")).as("q_g"))
        g.agg(
          count(lit(1)).as("k"),
          sum(col("n_g")).as("n"),
          sum(divExact(col("s_g") * col("s_g"), col("n_g"))).as("t"),
          sum(col("s_g")).as("s"),
          sum(col("q_g")).as("q"))
          .select(col("k"), col("n").cast("long").as("n"),
            (col("t") - divExact(col("s") * col("s"), col("n"))).cast("double").as("ssb"),
            (col("q") - col("t")).cast("double").as("ssw"),
            col("k").cast("double").as("kd"))
          .select(col("k"), col("n"),
            round(col("ssb") / 1e4, 2).as("ssb_d2"),
            round(col("ssw") / 1e4, 2).as("ssw_d2"),
            round((col("ssb") / (col("kd") - 1)) /
              (col("ssw") / (col("n").cast("double") - col("kd"))), 6).as("f_stat"))
      },
      Some(sql("""WITH g AS (SELECT event_type, count(*) AS n_g,
                       sum(CAST(round(value * 100) AS BIGINT)) AS s_g,
                       sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS q_g
                     FROM events GROUP BY event_type),
                   tot AS (SELECT count(*) AS k, sum(n_g) AS n,
                       sum((s_g * s_g) // n_g) AS t, sum(s_g) AS s, sum(q_g) AS q
                     FROM g),
                   f AS (SELECT k, CAST(n AS BIGINT) AS n,
                       CAST(t - (s * s) // n AS DOUBLE) AS ssb,
                       CAST(q - t AS DOUBLE) AS ssw,
                       CAST(k AS DOUBLE) AS kd
                     FROM tot)
                   SELECT k, n, round(ssb / 1e4, 2) AS ssb_d2, round(ssw / 1e4, 2) AS ssw_d2,
                     round((ssb / (kd - 1)) / (ssw / (CAST(n AS DOUBLE) - kd)), 6) AS f_stat
                   FROM f"""))),

    // MULTIPLIER-BOOTSTRAP CI of the mean event value: md5(event_id) is
    // hashed ONCE per row; replicate r reweights the row by hex digit r
    // mod 3 ∈ {0,1,2}. Each replicate's weighted mean comes from exact
    // integer (Σw·v, Σw) pairs; the CI is percentile_disc over the 30
    // replicate means — an exact element selection, no interpolation.
    Q("ml_bootstrap_ci",
      (s, d) => {
        val hashed = events(s, d)
          .select(round(col("value") * 100).cast("long").as("v"),
            md5(concat(col("event_id").cast("string"), lit("|bs"))).as("hx"))
        val reps = hashed
          .select(col("v"), explode(sequence(lit(0), lit(Reps - 1))).as("r"),
            col("hx"))
          .select(col("r"), col("v"),
            (conv(substring(col("hx"), col("r") + 1, lit(1)), 16, 10).cast("long") % 3).as("w"))
          .groupBy(col("r"))
          .agg((sum(col("w") * col("v")).cast("double") /
            sum(col("w")).cast("double")).as("rep_mean"))
        reps.agg(
          count(lit(1)).as("n_reps"),
          round(avg(col("rep_mean")), 6).as("boot_mean_c"),
          round(expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY rep_mean)"), 6).as("ci_lo_c"),
          round(expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY rep_mean)"), 6).as("ci_hi_c"))
      },
      Some(sql(s"""WITH hashed AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                       md5(CAST(event_id AS VARCHAR) || '|bs') AS hx
                     FROM events),
                   reps AS (SELECT r, v,
                       CAST(concat('0x', substr(hx, CAST(r + 1 AS BIGINT), 1)) AS BIGINT) % 3 AS w
                     FROM hashed, (SELECT unnest(range(0, $Reps)) AS r)),
                   rm AS (SELECT r, CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS rep_mean
                          FROM reps GROUP BY r)
                   SELECT count(*) AS n_reps,
                     round(avg(rep_mean), 6) AS boot_mean_c,
                     round(quantile_disc(rep_mean, 0.05), 6) AS ci_lo_c,
                     round(quantile_disc(rep_mean, 0.95), 6) AS ci_hi_c
                   FROM rm"""))),

    // CORR / COVAR family on lineitem (quantity vs extendedprice cents)
    // from one exact-integer sufficient-statistics scan: n, Σx, Σy,
    // Σxy, Σx², Σy² (Σy² ≈ 6e19 at sf0.1 — int128 again), then
    // Pearson r, covar_pop/samp, and the OLS slope dy/dx as the same
    // IEEE scalar formula in both engines.
    Q("agg_corr_covar",
      (s, d) => {
        val li = table(s, d, "lineitem")
          .select(col("l_quantity").cast("long").as("x"),
            round(col("l_extendedprice") * 100).cast("long").as("y"))
        li.agg(
          count(lit(1)).as("n"),
          sum(col("x")).cast("decimal(38,0)").as("sx"),
          sum(col("y")).cast("decimal(38,0)").as("sy"),
          sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"),
          sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"),
          sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
          .select(col("n"),
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"), col("sy").cast("double").as("syd"),
            col("sxy").cast("double").as("sxyd"),
            col("sxx").cast("double").as("sxxd"), col("syy").cast("double").as("syyd"))
          .select(col("n"),
            round((col("sxyd") - col("sxd") * col("syd") / col("nd")) / col("nd"), 6)
              .as("covar_pop"),
            round((col("sxyd") - col("sxd") * col("syd") / col("nd")) / (col("nd") - 1), 6)
              .as("covar_samp"),
            round((col("sxyd") - col("sxd") * col("syd") / col("nd")) /
              sqrt((col("sxxd") - col("sxd") * col("sxd") / col("nd")) *
                (col("syyd") - col("syd") * col("syd") / col("nd"))), 6).as("pearson_r"),
            round((col("sxyd") - col("sxd") * col("syd") / col("nd")) /
              (col("sxxd") - col("sxd") * col("sxd") / col("nd")), 6).as("ols_slope"))
      },
      Some(sql("""WITH s AS (SELECT count(*) AS n,
                       sum(CAST(l_quantity AS BIGINT)) AS sx,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
                       sum(CAST(l_quantity AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
                       sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
                       sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
                     FROM lineitem),
                   d AS (SELECT n, CAST(n AS DOUBLE) AS nd,
                       CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                       CAST(sxy AS DOUBLE) AS sxyd,
                       CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
                     FROM s)
                   SELECT n,
                     round((sxyd - sxd * syd / nd) / nd, 6) AS covar_pop,
                     round((sxyd - sxd * syd / nd) / (nd - 1), 6) AS covar_samp,
                     round((sxyd - sxd * syd / nd) /
                       sqrt((sxxd - sxd * sxd / nd) * (syyd - syd * syd / nd)), 6) AS pearson_r,
                     round((sxyd - sxd * syd / nd) /
                       (sxxd - sxd * sxd / nd), 6) AS ols_slope
                   FROM d"""))),

    // ROBUST ESTIMATORS (Tukey fences, winsorized and trimmed means):
    // the heavy-tail-safe summary every metrics pipeline publishes next
    // to the raw mean. Boundaries are exact percentile_disc elements
    // (broadcast 1-row model), the fence arithmetic is exact integers
    // ((3·IQR) DIV 2 — no float at the decision boundary), and the
    // clipped/trimmed means divide exact integer sums.
    Q("agg_robust_stats",
      (s, d) => {
        val cents = table(s, d, "orders")
          .select(round(col("o_totalprice") * 100).cast("long").as("v"))
        // percentile_disc returns DOUBLE; the selected elements are exact
        // cents integers, so the long cast is lossless
        val bounds = cents.agg(
          expr("CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS BIGINT)").as("q1"),
          expr("CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS BIGINT)").as("q3"),
          expr("CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY v) AS BIGINT)").as("p5"),
          expr("CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY v) AS BIGINT)").as("p95"))
        cents.crossJoin(broadcast(bounds))
          .withColumn("lo", col("q1") - expr("(3 * (q3 - q1)) DIV 2"))
          .withColumn("hi", col("q3") + expr("(3 * (q3 - q1)) DIV 2"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("v") < col("lo") || col("v") > col("hi"), 1L).otherwise(0L))
              .as("tukey_outliers"),
            round(sum(greatest(col("p5"), least(col("p95"), col("v")))).cast("double")
              / count(lit(1)).cast("double"), 4).as("winsorized_mean_c"),
            round(sum(when(col("v").between(col("p5"), col("p95")), col("v"))).cast("double")
              / sum(when(col("v").between(col("p5"), col("p95")), 1L).otherwise(0L))
                .cast("double"), 4).as("trimmed_mean_c"),
            round(sum(col("v")).cast("double") / count(lit(1)).cast("double"), 4)
              .as("raw_mean_c"))
      },
      Some(sql("""WITH cents AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
                     FROM orders),
                   bounds AS (SELECT quantile_disc(v, 0.25) AS q1, quantile_disc(v, 0.75) AS q3,
                       quantile_disc(v, 0.05) AS p5, quantile_disc(v, 0.95) AS p95
                     FROM cents),
                   f AS (SELECT v, q1, q3, p5, p95,
                       q1 - (3 * (q3 - q1)) // 2 AS lo,
                       q3 + (3 * (q3 - q1)) // 2 AS hi
                     FROM cents, bounds)
                   SELECT count(*) AS n,
                     CAST(sum(CASE WHEN v < lo OR v > hi THEN 1 ELSE 0 END) AS BIGINT)
                       AS tukey_outliers,
                     round(CAST(sum(greatest(p5, least(p95, v))) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 4) AS winsorized_mean_c,
                     round(CAST(sum(CASE WHEN v BETWEEN p5 AND p95 THEN v END) AS DOUBLE)
                       / CAST(sum(CASE WHEN v BETWEEN p5 AND p95 THEN 1 ELSE 0 END) AS DOUBLE), 4)
                       AS trimmed_mean_c,
                     round(CAST(sum(v) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS raw_mean_c
                   FROM f"""))),

    // DIFFERENCE-IN-DIFFERENCES (the A/B-over-time causal estimator):
    // hash-assigned treatment group × pre/post periods split at the
    // exact median day; the 2×2 cell means come from exact integer
    // (Σv, n) pairs and the DiD estimate is the shared IEEE scalar
    // formula. One scan, a 4-row aggregate.
    Q("ml_diff_in_diff",
      (s, d) => {
        val ev = events(s, d).select(
          round(col("value") * 100).cast("long").as("v"),
          floor(unix_micros(col("ts")) / 86400000000.0).cast("long").as("day"),
          (graft.functions.Portable.stableHash64(col("user_id")) % 2 === 0).as("treated"))
        val cut = ev.agg(expr(
          "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY day) AS BIGINT)").as("cut"))
        val cells = ev.crossJoin(broadcast(cut))
          .withColumn("post", col("day") >= col("cut"))
          .groupBy(col("treated"), col("post"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        cells.agg(
          max(when(col("treated") && col("post"), col("s").cast("double") / col("n"))).as("tp"),
          max(when(col("treated") && !col("post"), col("s").cast("double") / col("n"))).as("tr"),
          max(when(!col("treated") && col("post"), col("s").cast("double") / col("n"))).as("cp"),
          max(when(!col("treated") && !col("post"), col("s").cast("double") / col("n"))).as("cr"))
          .select(round(col("tp"), 4).as("treat_post"), round(col("tr"), 4).as("treat_pre"),
            round(col("cp"), 4).as("ctrl_post"), round(col("cr"), 4).as("ctrl_pre"),
            round((col("tp") - col("tr")) - (col("cp") - col("cr")), 4).as("did_c"))
      },
      Some(sql(s"""WITH ev AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                       CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day,
                       ${graft.functions.Portable.stableHash64Sql("user_id")} % 2 = 0 AS treated
                     FROM events),
                   cut AS (SELECT quantile_disc(day, 0.5) AS cut FROM ev),
                   cells AS (SELECT treated, day >= cut AS post,
                       count(*) AS n, CAST(sum(v) AS BIGINT) AS s
                     FROM ev, cut GROUP BY 1, 2),
                   m AS (SELECT
                       max(CASE WHEN treated AND post THEN CAST(s AS DOUBLE) / n END) AS tp,
                       max(CASE WHEN treated AND NOT post THEN CAST(s AS DOUBLE) / n END) AS tr,
                       max(CASE WHEN NOT treated AND post THEN CAST(s AS DOUBLE) / n END) AS cp,
                       max(CASE WHEN NOT treated AND NOT post THEN CAST(s AS DOUBLE) / n END) AS cr
                     FROM cells)
                   SELECT round(tp, 4) AS treat_post, round(tr, 4) AS treat_pre,
                     round(cp, 4) AS ctrl_post, round(cr, 4) AS ctrl_pre,
                     round((tp - tr) - (cp - cr), 4) AS did_c
                   FROM m"""))),

    // MEDIAN ABSOLUTE DEVIATION + robust z outliers: MAD = median of
    // |v − median|, the robust-scale companion of agg_robust_stats'
    // fences. The 3σ-equivalent cut |v−med| > 3·1.4826·MAD is an exact
    // integer cross-multiplication (10000·dev > 44478·MAD) — no float
    // at the decision boundary. Two broadcast one-row models, one scan
    // each.
    Q("agg_mad",
      (s, d) => {
        val cents = table(s, d, "orders")
          .select(round(col("o_totalprice") * 100).cast("long").as("v"))
        val med = cents.agg(expr(
          "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT)").as("med"))
        val dev = cents.crossJoin(broadcast(med))
          .select(col("v"), col("med"), abs(col("v") - col("med")).as("dev"))
        val mad = dev.agg(expr(
          "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev) AS BIGINT)").as("mad"))
        dev.crossJoin(broadcast(mad))
          .agg(count(lit(1)).as("n"),
            max(col("med")).as("median_c"), max(col("mad")).as("mad_c"),
            sum(when(col("dev") * 10000L > col("mad") * 44478L, 1L).otherwise(0L))
              .as("robust_outliers"))
      },
      Some(sql("""WITH cents AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
                     FROM orders),
                   med AS (SELECT quantile_disc(v, 0.5) AS med FROM cents),
                   dev AS (SELECT v, med, abs(v - med) AS dev FROM cents, med),
                   mad AS (SELECT quantile_disc(dev, 0.5) AS mad FROM dev)
                   SELECT count(*) AS n,
                     CAST(max(med) AS BIGINT) AS median_c,
                     CAST(max(mad) AS BIGINT) AS mad_c,
                     CAST(sum(CASE WHEN dev * 10000 > mad * 44478 THEN 1 ELSE 0 END) AS BIGINT)
                       AS robust_outliers
                   FROM dev, mad""")))
  )
}
