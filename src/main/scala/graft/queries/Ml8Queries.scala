package graft.queries

import graft.Engine.table
import Registry.sql

/** MLlib/stat parity, wave 8 (round 11) — the nonparametric rank-based
  * test family (Mann-Whitney U, Kruskal-Wallis H, Spearman's rho) plus
  * two experiment-analysis staples (CUPED variance reduction, McNemar's
  * paired test). Closest reference surfaces: mllib/stat's hypothesis
  * testing (ChiSqTest.scala) and the streaming significance tests.
  *
  * The scale story is the DISTRIBUTED AVERAGE-RANK pattern shared by the
  * three rank tests: ranks are never computed with a global row_number
  * (a single-partition window dies at 100 TB). Instead
  *   1. group by the DISTINCT VALUE (cents-quantized, so the distinct
  *      count is bounded by the VALUE DOMAIN, not the corpus),
  *   2. roll distinct values into ~48 coarse buckets (domain/1024) and
  *      take a cumulative sum over the BUCKET TOTALS — the only
  *      unpartitioned window in the plan runs over a constant-bounded
  *      input,
  *   3. add a bucket-partitioned cumulative within each bucket:
  *      rows-before k(v) = bucket_offset + within-bucket prefix.
  * The tie-averaged rank of value v is then k(v) + (c(v)+1)/2, kept
  * exact as the INTEGER 2·rank = 2k+c+1; every sufficient statistic is
  * an exact integer (decimal(38,0) against 100 TB overflow) and IEEE
  * arithmetic appears only in the final projected statistic.
  */
object Ml8Queries {

  val all: Seq[Q] = Seq(

    // MANN-WHITNEY U (purchase vs click event values): 2·R1 and the
    // tie-cube sum are exact integers from the rank pipeline; U, the
    // normal approximation z (tie-corrected variance), and the common-
    // language effect size U/(n1·n2) are the final IEEE projection.
    Q("ml_mann_whitney",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_mw")
        s.sql(sql("""
          WITH vals AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type
                        FROM graft_ev_mw WHERE event_type IN ('purchase', 'click')
                          AND value IS NOT NULL),
               cnts AS (SELECT v, count(*) AS c,
                          count(*) FILTER (WHERE event_type = 'purchase') AS c1
                        FROM vals GROUP BY v),
               btot AS (SELECT v DIV 1024 AS b, sum(c) AS tot FROM cnts GROUP BY v DIV 1024),
               boff AS (SELECT b, COALESCE(SUM(tot) OVER (ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
                        FROM btot),
               ranked AS (SELECT c.v, c.c, c.c1,
                            o.off + COALESCE(SUM(c.c) OVER (PARTITION BY c.v DIV 1024
                              ORDER BY c.v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
                          FROM cnts c JOIN boff o ON c.v DIV 1024 = o.b),
               st AS (SELECT sum(c1) AS n1, sum(c) - sum(c1) AS n2, sum(c) AS n,
                        sum(CAST(c1 AS DECIMAL(38,0)) * (2 * k + c + 1)) AS r1x2,
                        sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS tie3
                      FROM ranked)
          SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                 CAST(r1x2 - n1 * (CAST(n1 AS DECIMAL(38,0)) + 1) AS BIGINT) AS u1_x2,
                 CAST(tie3 AS BIGINT) AS tie_cubes,
                 round(((CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2.0
                        - CAST(n1 AS DOUBLE) * n2 / 2.0)
                   / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                       * ((n + 1) - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))), 6) AS z,
                 round((CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2.0
                   / (CAST(n1 AS DOUBLE) * n2), 6) AS effect_cl
          FROM st"""))
      },
      Some(sql("""
        WITH vals AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type
                      FROM events WHERE event_type IN ('purchase', 'click')
                        AND value IS NOT NULL),
             cnts AS (SELECT v, count(*) AS c,
                        count(*) FILTER (WHERE event_type = 'purchase') AS c1
                      FROM vals GROUP BY v),
             ranked AS (SELECT v, c, c1,
                          COALESCE(SUM(c) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
                        FROM cnts),
             st AS (SELECT sum(c1) AS n1, sum(c) - sum(c1) AS n2, sum(c) AS n,
                      sum(CAST(c1 AS HUGEINT) * (2 * k + c + 1)) AS r1x2,
                      sum(CAST(c AS HUGEINT) * c * c - c) AS tie3
                    FROM ranked)
        SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
               CAST(r1x2 - n1 * (CAST(n1 AS HUGEINT) + 1) AS BIGINT) AS u1_x2,
               CAST(tie3 AS BIGINT) AS tie_cubes,
               round(((CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2.0
                      - CAST(n1 AS DOUBLE) * n2 / 2.0)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12.0
                     * ((n + 1) - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))), 6) AS z,
               round((CAST(r1x2 AS DOUBLE) - CAST(n1 AS DOUBLE) * (n1 + 1)) / 2.0
                 / (CAST(n1 AS DOUBLE) * n2), 6) AS effect_cl
        FROM st"""))),

    // KRUSKAL-WALLIS H across all five event types: per-group rank sums
    // from the same pipeline (per-(v,group) counts join the per-v rank
    // table), H with and without the tie correction 1 − Σ(c³−c)/(N³−N).
    Q("ml_kruskal_wallis",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_kw")
        s.sql(sql("""
          WITH vals AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type
                        FROM graft_ev_kw WHERE value IS NOT NULL),
               cnt_v AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
               cnt_vg AS (SELECT v, event_type, count(*) AS cg FROM vals GROUP BY v, event_type),
               btot AS (SELECT v DIV 1024 AS b, sum(c) AS tot FROM cnt_v GROUP BY v DIV 1024),
               boff AS (SELECT b, COALESCE(SUM(tot) OVER (ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
                        FROM btot),
               ranked AS (SELECT c.v, c.c,
                            o.off + COALESCE(SUM(c.c) OVER (PARTITION BY c.v DIV 1024
                              ORDER BY c.v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
                          FROM cnt_v c JOIN boff o ON c.v DIV 1024 = o.b),
               rg AS (SELECT g.event_type, sum(g.cg) AS ng,
                        sum(CAST(g.cg AS DECIMAL(38,0)) * (2 * r.k + r.c + 1)) AS rgx2
                      FROM cnt_vg g JOIN ranked r ON g.v = r.v
                      GROUP BY g.event_type),
               tot AS (SELECT sum(ng) AS n,
                         sum(CAST(rgx2 AS DOUBLE) * rgx2 / 4.0 / ng) AS sum_r2_over_n
                       FROM rg),
               ties AS (SELECT sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS tie3 FROM ranked)
          SELECT CAST(t.n AS BIGINT) AS n,
                 CAST(ti.tie3 AS BIGINT) AS tie_cubes,
                 round(12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1)) * t.sum_r2_over_n
                   - 3.0 * (t.n + 1), 6) AS h_raw,
                 round((12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1)) * t.sum_r2_over_n
                   - 3.0 * (t.n + 1))
                   / (1.0 - CAST(ti.tie3 AS DOUBLE)
                       / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n)), 6) AS h_corrected
          FROM tot t CROSS JOIN ties ti"""))
      },
      Some(sql("""
        WITH vals AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type
                      FROM events WHERE value IS NOT NULL),
             cnt_v AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
             cnt_vg AS (SELECT v, event_type, count(*) AS cg FROM vals GROUP BY v, event_type),
             ranked AS (SELECT v, c,
                          COALESCE(SUM(c) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
                        FROM cnt_v),
             rg AS (SELECT g.event_type, sum(g.cg) AS ng,
                      sum(CAST(g.cg AS HUGEINT) * (2 * r.k + r.c + 1)) AS rgx2
                    FROM cnt_vg g JOIN ranked r ON g.v = r.v
                    GROUP BY g.event_type),
             tot AS (SELECT sum(ng) AS n,
                       sum(CAST(rgx2 AS DOUBLE) * rgx2 / 4.0 / ng) AS sum_r2_over_n
                     FROM rg),
             ties AS (SELECT sum(CAST(c AS HUGEINT) * c * c - c) AS tie3 FROM ranked)
        SELECT CAST(t.n AS BIGINT) AS n,
               CAST(ti.tie3 AS BIGINT) AS tie_cubes,
               round(12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1)) * t.sum_r2_over_n
                 - 3.0 * (t.n + 1), 6) AS h_raw,
               round((12.0 / (CAST(t.n AS DOUBLE) * (t.n + 1)) * t.sum_r2_over_n
                 - 3.0 * (t.n + 1))
                 / (1.0 - CAST(ti.tie3 AS DOUBLE)
                     / (CAST(t.n AS DOUBLE) * t.n * t.n - t.n)), 6) AS h_corrected
        FROM tot t CROSS JOIN ties ti"""))),

    // SPEARMAN'S RHO between event value (cents) and the props.k payload
    // field: tie-averaged ranks for BOTH axes come from domain-bounded
    // distinct-value tables (cents ≤ value domain, k ∈ 0..99) that
    // BROADCAST-join back to the events — the corpus-sized side never
    // shuffles. Pearson on 2·rank integers (the factor cancels).
    Q("ml_spearman",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_sp")
        s.sql(sql("""
          WITH rows_ AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                           CAST(get_json_object(props, '$.k') AS BIGINT) AS kk
                         FROM graft_ev_sp
                         WHERE value IS NOT NULL
                           AND get_json_object(props, '$.k') IS NOT NULL),
               xc AS (SELECT v, count(*) AS c FROM rows_ GROUP BY v),
               xbt AS (SELECT v DIV 1024 AS b, sum(c) AS tot FROM xc GROUP BY v DIV 1024),
               xbo AS (SELECT b, COALESCE(SUM(tot) OVER (ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
                       FROM xbt),
               xr AS (SELECT c.v, 2 * (o.off + COALESCE(SUM(c.c) OVER (PARTITION BY c.v DIV 1024
                          ORDER BY c.v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                          + c.c + 1 AS rx2
                      FROM xc c JOIN xbo o ON c.v DIV 1024 = o.b),
               yc AS (SELECT kk, count(*) AS c FROM rows_ GROUP BY kk),
               yr AS (SELECT kk, 2 * COALESCE(SUM(c) OVER (ORDER BY kk
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS ry2
                      FROM yc),
               j AS (SELECT /*+ BROADCAST(xr, yr) */ xr.rx2, yr.ry2
                     FROM rows_ e JOIN xr ON e.v = xr.v JOIN yr ON e.kk = yr.kk),
               st AS (SELECT count(*) AS n,
                        sum(CAST(rx2 AS DECIMAL(38,0))) AS sx,
                        sum(CAST(ry2 AS DECIMAL(38,0))) AS sy,
                        sum(CAST(rx2 AS DECIMAL(38,0)) * rx2) AS sxx,
                        sum(CAST(ry2 AS DECIMAL(38,0)) * ry2) AS syy,
                        sum(CAST(rx2 AS DECIMAL(38,0)) * ry2) AS sxy
                      FROM j)
          SELECT CAST(n AS BIGINT) AS n,
                 round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS rho
          FROM st"""))
      },
      Some(sql("""
        WITH rows_ AS (SELECT CAST(round(value * 100) AS BIGINT) AS v,
                         CAST(json_extract_string(props, '$.k') AS BIGINT) AS kk
                       FROM events
                       WHERE value IS NOT NULL
                         AND json_extract_string(props, '$.k') IS NOT NULL),
             xc AS (SELECT v, count(*) AS c FROM rows_ GROUP BY v),
             xr AS (SELECT v, 2 * COALESCE(SUM(c) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS rx2
                    FROM xc),
             yc AS (SELECT kk, count(*) AS c FROM rows_ GROUP BY kk),
             yr AS (SELECT kk, 2 * COALESCE(SUM(c) OVER (ORDER BY kk
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS ry2
                    FROM yc),
             j AS (SELECT xr.rx2, yr.ry2
                   FROM rows_ e JOIN xr ON e.v = xr.v JOIN yr ON e.kk = yr.kk),
             st AS (SELECT count(*) AS n,
                      sum(CAST(rx2 AS HUGEINT)) AS sx,
                      sum(CAST(ry2 AS HUGEINT)) AS sy,
                      sum(CAST(rx2 AS HUGEINT) * rx2) AS sxx,
                      sum(CAST(ry2 AS HUGEINT) * ry2) AS syy,
                      sum(CAST(rx2 AS HUGEINT) * ry2) AS sxy
                    FROM j)
        SELECT CAST(n AS BIGINT) AS n,
               round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS rho
        FROM st"""))),

    // CUPED variance reduction (the standard A/B pre-period adjustment):
    // per-user pre/post cent sums, variant by user parity, pooled
    // θ = cov(x,y)/var(x) from exact sufficient statistics. Adjusted
    // lift = raw lift − θ·(pre-period imbalance); the variance-reduction
    // ratio is ρ²(x,y). Everything reduces in one pass over per-user
    // aggregates — no window, no driver loop.
    Q("ml_cuped",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_cu")
        s.sql(sql("""
          WITH per_user AS (SELECT user_id, user_id % 2 AS variant,
                   sum(CASE WHEN ts < timestamp'2024-01-16 00:00:00'
                            THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
                   sum(CASE WHEN ts >= timestamp'2024-01-16 00:00:00'
                            THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
                 FROM graft_ev_cu GROUP BY user_id),
               st AS (SELECT count(*) AS n,
                        sum(CAST(x AS DECIMAL(38,0))) AS sx, sum(CAST(y AS DECIMAL(38,0))) AS sy,
                        sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
                        sum(CAST(y AS DECIMAL(38,0)) * y) AS syy,
                        sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
                        count(*) FILTER (WHERE variant = 1) AS n1,
                        sum(CAST(x AS DECIMAL(38,0))) FILTER (WHERE variant = 1) AS sx1,
                        sum(CAST(y AS DECIMAL(38,0))) FILTER (WHERE variant = 1) AS sy1
                      FROM per_user),
               f AS (SELECT CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
                       CAST(sy AS DOUBLE) AS sy, CAST(sxx AS DOUBLE) AS sxx,
                       CAST(syy AS DOUBLE) AS syy, CAST(sxy AS DOUBLE) AS sxy,
                       CAST(n1 AS DOUBLE) AS n1, CAST(sx1 AS DOUBLE) AS sx1,
                       CAST(sy1 AS DOUBLE) AS sy1,
                       CAST(n - n1 AS DOUBLE) AS n0, CAST(sx - sx1 AS DOUBLE) AS sx0,
                       CAST(sy - sy1 AS DOUBLE) AS sy0
                     FROM st)
          SELECT CAST(n AS BIGINT) AS n_users,
                 round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
                 round((sy1 / n1 - sy0 / n0) / 100.0, 4) AS lift_raw_d,
                 round((sy1 / n1 - sy0 / n0
                   - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                     * (sx1 / n1 - sx0 / n0)) / 100.0, 4) AS lift_adj_d,
                 round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                   / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS var_reduction
          FROM f"""))
      },
      Some(sql("""
        WITH per_user AS (SELECT user_id, user_id % 2 AS variant,
                 sum(CASE WHEN ts < timestamp'2024-01-16 00:00:00'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
                 sum(CASE WHEN ts >= timestamp'2024-01-16 00:00:00'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
               FROM events GROUP BY user_id),
             st AS (SELECT count(*) AS n,
                      sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
                      sum(CAST(x AS HUGEINT) * x) AS sxx,
                      sum(CAST(y AS HUGEINT) * y) AS syy,
                      sum(CAST(x AS HUGEINT) * y) AS sxy,
                      count(*) FILTER (WHERE variant = 1) AS n1,
                      sum(CAST(x AS HUGEINT)) FILTER (WHERE variant = 1) AS sx1,
                      sum(CAST(y AS HUGEINT)) FILTER (WHERE variant = 1) AS sy1
                    FROM per_user),
             f AS (SELECT CAST(n AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS sx,
                     CAST(sy AS DOUBLE) AS sy, CAST(sxx AS DOUBLE) AS sxx,
                     CAST(syy AS DOUBLE) AS syy, CAST(sxy AS DOUBLE) AS sxy,
                     CAST(n1 AS DOUBLE) AS n1, CAST(sx1 AS DOUBLE) AS sx1,
                     CAST(sy1 AS DOUBLE) AS sy1,
                     CAST(n - n1 AS DOUBLE) AS n0, CAST(sx - sx1 AS DOUBLE) AS sx0,
                     CAST(sy - sy1 AS DOUBLE) AS sy0
                   FROM st)
        SELECT CAST(n AS BIGINT) AS n_users,
               round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS theta,
               round((sy1 / n1 - sy0 / n0) / 100.0, 4) AS lift_raw_d,
               round((sy1 / n1 - sy0 / n0
                 - (n * sxy - sx * sy) / (n * sxx - sx * sx)
                   * (sx1 / n1 - sx0 / n0)) / 100.0, 4) AS lift_adj_d,
               round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS var_reduction
        FROM f"""))),

    // McNEMAR'S PAIRED TEST: two deterministic classifiers on the same
    // rows (A: high-value rule, B: even-key rule) against the
    // purchase/other truth; only the DISCORDANT cells b (A right, B
    // wrong) and c (A wrong, B right) matter. Continuity-corrected
    // (|b−c|−1)²/(b+c) — exact integer cells, one division at the end.
    Q("ml_mcnemar",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_mc")
        s.sql(sql("""
          WITH scored AS (SELECT
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS truth,
                   CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS pred_a,
                   CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS pred_b
                 FROM graft_ev_mc),
               cells AS (SELECT
                   count(*) FILTER (WHERE pred_a = truth AND pred_b <> truth) AS b,
                   count(*) FILTER (WHERE pred_a <> truth AND pred_b = truth) AS c
                 FROM scored)
          SELECT CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c,
                 round((abs(CAST(b AS DOUBLE) - c) - 1.0)
                     * (abs(CAST(b AS DOUBLE) - c) - 1.0)
                   / (CAST(b AS DOUBLE) + c), 6) AS chi2_cc
          FROM cells"""))
      },
      Some(sql("""
        WITH scored AS (SELECT
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS truth,
                 CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS pred_a,
                 CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS pred_b
               FROM events),
             cells AS (SELECT
                 count(*) FILTER (WHERE pred_a = truth AND pred_b <> truth) AS b,
                 count(*) FILTER (WHERE pred_a <> truth AND pred_b = truth) AS c
               FROM scored)
        SELECT CAST(b AS BIGINT) AS b, CAST(c AS BIGINT) AS c,
               round((abs(CAST(b AS DOUBLE) - c) - 1.0)
                   * (abs(CAST(b AS DOUBLE) - c) - 1.0)
                 / (CAST(b AS DOUBLE) + c), 6) AS chi2_cc
        FROM cells"""))),

    // ONE GRADIENT-BOOSTING ROUND (squared loss): base prediction is the
    // integer global mean, residuals are exact dollars, and each
    // candidate stump split on x = custkey%25 is scored by the variance-
    // reduction surrogate Σl²/nl + Σr²/nr from per-threshold integer
    // sufficient statistics (the reference's GradientBoostedTrees shape,
    // one round, fully declarative). Leaf values are integer DIV means;
    // post-split SSE comes from the algebraic identity Σ(r−γ)² =
    // Σr² − 2γΣr + nγ² — no second data pass. The best-split window
    // runs over the 4-row threshold table (bounded by the candidate
    // list constant, never the corpus).
    Q("ml_gbt_step",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_gbt")
        s.sql(sql("""
          WITH rows_ AS (SELECT o_custkey % 25 AS x,
                   CAST(round(o_totalprice) AS BIGINT) AS y
                 FROM graft_o_gbt),
               base AS (SELECT sum(CAST(y AS DECIMAL(38,0))) AS sy, count(*) AS n FROM rows_),
               mu AS (SELECT CAST(sy DIV n AS BIGINT) AS mu0 FROM base),
               resid AS (SELECT x, y - mu0 AS r FROM rows_ CROSS JOIN mu),
               cand AS (SELECT x, r, t
                        FROM resid LATERAL VIEW explode(array(4, 9, 14, 19)) tt AS t),
               agg AS (SELECT t,
                   count(*) FILTER (WHERE x <= t) AS nl,
                   count(*) FILTER (WHERE x > t) AS nr,
                   sum(CAST(r AS DECIMAL(38,0))) FILTER (WHERE x <= t) AS sl,
                   sum(CAST(r AS DECIMAL(38,0))) FILTER (WHERE x > t) AS sr,
                   sum(CAST(r AS DECIMAL(38,0)) * r) AS qq
                 FROM cand GROUP BY t),
               scored AS (SELECT t, nl, nr,
                   CAST(sl DIV nl AS BIGINT) AS gamma_l,
                   CAST(sr DIV nr AS BIGINT) AS gamma_r,
                   CAST(qq AS DOUBLE) AS sse_before,
                   round(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl
                       + CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / nr, 4) AS score
                 FROM agg),
               post AS (SELECT s.*,
                   CAST(a.qq
                     - 2 * CAST(s.gamma_l AS DECIMAL(38,0)) * a.sl
                     - 2 * CAST(s.gamma_r AS DECIMAL(38,0)) * a.sr
                     + CAST(s.gamma_l AS DECIMAL(38,0)) * s.gamma_l * a.nl
                     + CAST(s.gamma_r AS DECIMAL(38,0)) * s.gamma_r * a.nr
                     AS DOUBLE) AS sse_after
                 FROM scored s JOIN agg a ON s.t = a.t)
          SELECT t, CAST(nl AS BIGINT) AS nl, CAST(nr AS BIGINT) AS nr,
                 gamma_l, gamma_r, score,
                 round(sse_before / 1e6, 4) AS sse_before_m,
                 round(sse_after / 1e6, 4) AS sse_after_m,
                 score = max(score) OVER () AS best
          FROM post"""))
      },
      Some(sql("""
        WITH rows_ AS (SELECT o_custkey % 25 AS x,
                 CAST(round(o_totalprice) AS BIGINT) AS y
               FROM orders),
             base AS (SELECT sum(CAST(y AS HUGEINT)) AS sy, count(*) AS n FROM rows_),
             mu AS (SELECT CAST(sy // n AS BIGINT) AS mu0 FROM base),
             resid AS (SELECT x, y - mu0 AS r FROM rows_ CROSS JOIN mu),
             cand AS (SELECT x, r, unnest([4, 9, 14, 19]) AS t FROM resid),
             agg AS (SELECT t,
                 count(*) FILTER (WHERE x <= t) AS nl,
                 count(*) FILTER (WHERE x > t) AS nr,
                 sum(CAST(r AS HUGEINT)) FILTER (WHERE x <= t) AS sl,
                 sum(CAST(r AS HUGEINT)) FILTER (WHERE x > t) AS sr,
                 sum(CAST(r AS HUGEINT) * r) AS qq
               FROM cand GROUP BY t),
             scored AS (SELECT t, nl, nr,
                 CAST(sl // nl AS BIGINT) AS gamma_l,
                 CAST(sr // nr AS BIGINT) AS gamma_r,
                 CAST(qq AS DOUBLE) AS sse_before,
                 round(CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl
                     + CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) / nr, 4) AS score
               FROM agg),
             post AS (SELECT s.*,
                 CAST(a.qq
                   - 2 * CAST(s.gamma_l AS HUGEINT) * a.sl
                   - 2 * CAST(s.gamma_r AS HUGEINT) * a.sr
                   + CAST(s.gamma_l AS HUGEINT) * s.gamma_l * a.nl
                   + CAST(s.gamma_r AS HUGEINT) * s.gamma_r * a.nr
                   AS DOUBLE) AS sse_after
               FROM scored s JOIN agg a ON s.t = a.t)
        SELECT t, CAST(nl AS BIGINT) AS nl, CAST(nr AS BIGINT) AS nr,
               gamma_l, gamma_r, score,
               round(sse_before / 1e6, 4) AS sse_before_m,
               round(sse_after / 1e6, 4) AS sse_after_m,
               score = max(score) OVER () AS best
        FROM post"""))),

    // FISHER'S EXACT TEST on a 2×2 from a FIXED 200-event sample (the
    // small-sample regime the test exists for; chi2/McNemar cover the
    // large-n cells). Everything transcendental is evaluated in a FIXED
    // LEFT-TO-RIGHT FOLD so both engines produce bit-identical doubles:
    // ln-factorials 0..n as a prefix-fold array (the i=0 CASE guards
    // Spark's DESCENDING sequence(1,0), which would fold ln(0) = -Inf
    // into 0!), the hypergeometric tail Σ_{k≥a} pmf(k) as a second fold
    // over the feasible k range. SQL comments must never appear inside
    // these strings — Registry.sql collapses newlines, so a `--` would
    // swallow the rest of the query. The only aggregation over data
    // rows is exact integer cell counts.
    Q("ml_fisher_exact",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_fx")
        s.sql(sql("""
          WITH s AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                            CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS x
                     FROM graft_ev_fx WHERE event_id <= 200),
               cells AS (SELECT
                   count(*) FILTER (WHERE y = 1 AND x = 1) AS a,
                   count(*) FILTER (WHERE y = 1 AND x = 0) AS b,
                   count(*) FILTER (WHERE y = 0 AND x = 1) AS c,
                   count(*) FILTER (WHERE y = 0 AND x = 0) AS dd
                 FROM s),
               m AS (SELECT CAST(a AS INT) AS a, CAST(b AS INT) AS b,
                       CAST(c AS INT) AS c, CAST(dd AS INT) AS dd,
                       CAST(a + b AS INT) AS r1, CAST(c + dd AS INT) AS r2,
                       CAST(a + c AS INT) AS c1, CAST(a + b + c + dd AS INT) AS n
                     FROM cells),
               lf AS (SELECT *, transform(sequence(0, n),
                        i -> CASE WHEN i = 0 THEN CAST(0.0 AS DOUBLE)
                                  ELSE aggregate(sequence(1, i), CAST(0.0 AS DOUBLE),
                                         (acc, x) -> acc + ln(x)) END) AS f
                      FROM m),
               p AS (SELECT *, aggregate(
                       filter(sequence(greatest(0, c1 - r2), least(r1, c1)), k -> k >= a),
                       CAST(0.0 AS DOUBLE),
                       (acc, k) -> acc + exp(
                         element_at(f, r1 + 1) - element_at(f, CAST(k AS INT) + 1)
                           - element_at(f, r1 - CAST(k AS INT) + 1)
                         + element_at(f, r2 + 1) - element_at(f, c1 - CAST(k AS INT) + 1)
                           - element_at(f, r2 - c1 + CAST(k AS INT) + 1)
                         - (element_at(f, n + 1) - element_at(f, c1 + 1)
                            - element_at(f, n - c1 + 1)))) AS ptail
                     FROM lf)
          SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
                 CAST(c AS BIGINT) AS c, CAST(dd AS BIGINT) AS d,
                 round(ptail, 6) AS p_one_sided,
                 round(CAST(a AS DOUBLE) * dd / (CAST(b AS DOUBLE) * c), 6) AS odds_ratio
          FROM p"""))
      },
      Some(sql("""
        WITH s AS (SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                          CASE WHEN value >= 100.0 THEN 1 ELSE 0 END AS x
                   FROM events WHERE event_id <= 200),
             cells AS (SELECT
                 count(*) FILTER (WHERE y = 1 AND x = 1) AS a,
                 count(*) FILTER (WHERE y = 1 AND x = 0) AS b,
                 count(*) FILTER (WHERE y = 0 AND x = 1) AS c,
                 count(*) FILTER (WHERE y = 0 AND x = 0) AS dd
               FROM s),
             m AS (SELECT CAST(a AS INT) AS a, CAST(b AS INT) AS b,
                     CAST(c AS INT) AS c, CAST(dd AS INT) AS dd,
                     CAST(a + b AS INT) AS r1, CAST(c + dd AS INT) AS r2,
                     CAST(a + c AS INT) AS c1, CAST(a + b + c + dd AS INT) AS n
                   FROM cells),
             lf AS (SELECT *, list_transform(range(0, n + 1),
                      i -> COALESCE(list_sum(list_transform(range(1, i + 1),
                             x -> ln(x))), 0.0)) AS f
                    FROM m),
             p AS (SELECT *, list_sum(list_transform(
                     list_filter(range(greatest(0, c1 - r2), least(r1, c1) + 1),
                       k -> k >= a),
                     k -> exp(
                       f[r1 + 1] - f[CAST(k AS INT) + 1] - f[r1 - CAST(k AS INT) + 1]
                       + f[r2 + 1] - f[c1 - CAST(k AS INT) + 1]
                         - f[r2 - c1 + CAST(k AS INT) + 1]
                       - (f[n + 1] - f[c1 + 1] - f[n - c1 + 1])))) AS ptail
                   FROM lf)
        SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
               CAST(c AS BIGINT) AS c, CAST(dd AS BIGINT) AS d,
               round(ptail, 6) AS p_one_sided,
               round(CAST(a AS DOUBLE) * dd / (CAST(b AS DOUBLE) * c), 6) AS odds_ratio
        FROM p"""))),

    // DUNN'S POST-HOC TEST — the pairwise follow-up to Kruskal-Wallis:
    // for every pair of event types, z = (R̄_i − R̄_j) / √(S²(1/nᵢ+1/nⱼ))
    // with the tie-corrected S² = N(N+1)/12 − Σ(c³−c)/(12(N−1)). Rank
    // sums come from the SAME two-level bucket-offset pipeline as
    // ml_kruskal_wallis (2·ranksum exact in decimal); the 10 group
    // pairs are a self-join of the 5-row per-group aggregate.
    Q("ml_dunn_posthoc",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_dn")
        s.sql(sql("""
          WITH vals AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type
                        FROM graft_ev_dn WHERE value IS NOT NULL),
               cnt_v AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
               cnt_vg AS (SELECT v, event_type, count(*) AS cg FROM vals GROUP BY v, event_type),
               btot AS (SELECT v DIV 1024 AS b, sum(c) AS tot FROM cnt_v GROUP BY v DIV 1024),
               boff AS (SELECT b, COALESCE(SUM(tot) OVER (ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
                        FROM btot),
               ranked AS (SELECT c.v, c.c,
                            o.off + COALESCE(SUM(c.c) OVER (PARTITION BY c.v DIV 1024
                              ORDER BY c.v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
                          FROM cnt_v c JOIN boff o ON c.v DIV 1024 = o.b),
               rg AS (SELECT g.event_type, sum(g.cg) AS ng,
                        sum(CAST(g.cg AS DECIMAL(38,0)) * (2 * r.k + r.c + 1)) AS rgx2
                      FROM cnt_vg g JOIN ranked r ON g.v = r.v
                      GROUP BY g.event_type),
               st AS (SELECT sum(ng) AS n,
                        (SELECT sum(CAST(c AS DECIMAL(38,0)) * c * c - c) FROM ranked) AS tie3
                      FROM rg),
               s2 AS (SELECT CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 12.0
                        - CAST(tie3 AS DOUBLE) / (12.0 * (CAST(n AS DOUBLE) - 1)) AS v
                      FROM st)
          SELECT a.event_type AS g1, b.event_type AS g2,
                 CAST(a.ng AS BIGINT) AS n1, CAST(b.ng AS BIGINT) AS n2,
                 round((CAST(a.rgx2 AS DOUBLE) / (2.0 * a.ng)
                        - CAST(b.rgx2 AS DOUBLE) / (2.0 * b.ng))
                   / sqrt(s2.v * (1.0 / a.ng + 1.0 / b.ng)), 6) AS z
          FROM rg a JOIN rg b ON a.event_type < b.event_type CROSS JOIN s2"""))
      },
      Some(sql("""
        WITH vals AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type
                      FROM events WHERE value IS NOT NULL),
             cnt_v AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
             cnt_vg AS (SELECT v, event_type, count(*) AS cg FROM vals GROUP BY v, event_type),
             ranked AS (SELECT v, c,
                          COALESCE(SUM(c) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
                        FROM cnt_v),
             rg AS (SELECT g.event_type, sum(g.cg) AS ng,
                      sum(CAST(g.cg AS HUGEINT) * (2 * r.k + r.c + 1)) AS rgx2
                    FROM cnt_vg g JOIN ranked r ON g.v = r.v
                    GROUP BY g.event_type),
             st AS (SELECT sum(ng) AS n,
                      (SELECT sum(CAST(c AS HUGEINT) * c * c - c) FROM ranked) AS tie3
                    FROM rg),
             s2 AS (SELECT CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 12.0
                      - CAST(tie3 AS DOUBLE) / (12.0 * (CAST(n AS DOUBLE) - 1)) AS v
                    FROM st)
        SELECT a.event_type AS g1, b.event_type AS g2,
               CAST(a.ng AS BIGINT) AS n1, CAST(b.ng AS BIGINT) AS n2,
               round((CAST(a.rgx2 AS DOUBLE) / (2.0 * a.ng)
                      - CAST(b.rgx2 AS DOUBLE) / (2.0 * b.ng))
                 / sqrt(s2.v * (1.0 / a.ng + 1.0 / b.ng)), 6) AS z
        FROM rg a JOIN rg b ON a.event_type < b.event_type CROSS JOIN s2"""))),

    // SPLIT CONFORMAL PREDICTION (Vovk; the distribution-free interval
    // the modern ML-ops stack ships): model = per-event-type mean cents
    // (train split, integer DIV), nonconformity = |y − ŷ| on the
    // CALIBRATION split, interval half-width q = the 0.9 percentile_disc
    // of calibration residuals (exact set element, 1-row broadcast), and
    // the guaranteed-coverage check on the TEST split — the empirical
    // coverage must be reported next to the nominal 90%. Splits by
    // event_id residue; every statistic is an exact integer until the
    // final coverage ratio.
    Q("ml_conformal_interval",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_cp")
        s.sql(sql("""
          WITH rows_ AS (SELECT event_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS y,
                   event_id % 3 AS split
                 FROM graft_ev_cp),
               model AS (SELECT event_type,
                   CAST(sum(CAST(y AS DECIMAL(38,0))) DIV count(*) AS BIGINT) AS yhat
                 FROM rows_ WHERE split = 0 GROUP BY event_type),
               calib AS (SELECT abs(r.y - m.yhat) AS resid
                         FROM rows_ r JOIN model m ON r.event_type = m.event_type
                         WHERE r.split = 1),
               q AS (SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY resid) AS qhat
                     FROM calib),
               test AS (SELECT r.y, m.yhat
                        FROM rows_ r JOIN model m ON r.event_type = m.event_type
                        WHERE r.split = 2)
          SELECT CAST(q.qhat AS BIGINT) AS qhat_cents,
                 count(*) AS n_test,
                 count(*) FILTER (WHERE abs(t.y - t.yhat) <= q.qhat) AS n_covered,
                 round(CAST(count(*) FILTER (WHERE abs(t.y - t.yhat) <= q.qhat)
                   AS DOUBLE) / count(*), 6) AS coverage
          FROM test t CROSS JOIN q GROUP BY q.qhat"""))
      },
      Some(sql("""
        WITH rows_ AS (SELECT event_id, event_type,
                 CAST(round(value * 100) AS BIGINT) AS y,
                 event_id % 3 AS split
               FROM events),
             model AS (SELECT event_type,
                 CAST(sum(CAST(y AS HUGEINT)) // count(*) AS BIGINT) AS yhat
               FROM rows_ WHERE split = 0 GROUP BY event_type),
             calib AS (SELECT abs(r.y - m.yhat) AS resid
                       FROM rows_ r JOIN model m ON r.event_type = m.event_type
                       WHERE r.split = 1),
             q AS (SELECT quantile_disc(resid, 0.9) AS qhat FROM calib),
             test AS (SELECT r.y, m.yhat
                      FROM rows_ r JOIN model m ON r.event_type = m.event_type
                      WHERE r.split = 2)
        SELECT CAST(q.qhat AS BIGINT) AS qhat_cents,
               count(*) AS n_test,
               count(*) FILTER (WHERE abs(t.y - t.yhat) <= q.qhat) AS n_covered,
               round(CAST(count(*) FILTER (WHERE abs(t.y - t.yhat) <= q.qhat)
                 AS DOUBLE) / count(*), 6) AS coverage
        FROM test t CROSS JOIN q GROUP BY q.qhat"""))),

    // POWER ANALYSIS for a two-proportion test — the planning tool run
    // BEFORE ml_ab_ztest: from the observed baseline purchase rate,
    // the per-arm sample size to detect a 10% relative lift at
    // α=0.05 (two-sided, z=1.959964) and power 80% (z=0.841621):
    // n = (z_α·√(2·p̄·(1−p̄)) + z_β·√(p₁q₁+p₂q₂))² / (p₂−p₁)².
    // Inputs are exact integer counts; the closed form is one identical
    // IEEE evaluation on both engines (constants are shared literals).
    Q("ml_power_analysis",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_pw")
        s.sql(sql("""
          WITH base AS (SELECT count(*) AS n,
                   count(*) FILTER (WHERE event_type = 'purchase') AS k
                 FROM graft_ev_pw),
               p AS (SELECT CAST(k AS DOUBLE) / n AS p1,
                       CAST(k AS DOUBLE) / n * 1.1 AS p2,
                       CAST(n AS BIGINT) AS n_obs, CAST(k AS BIGINT) AS k_obs
                     FROM base),
               f AS (SELECT n_obs, k_obs, p1, p2, (p1 + p2) / 2.0 AS pbar FROM p)
          SELECT n_obs, k_obs, round(p1, 6) AS p1, round(p2, 6) AS p2,
                 CAST(ceil(
                   pow(1.959964 * sqrt(2.0 * pbar * (1.0 - pbar))
                     + 0.841621 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2)
                   / pow(p2 - p1, 2)) AS BIGINT) AS n_per_arm
          FROM f"""))
      },
      Some(sql("""
        WITH base AS (SELECT count(*) AS n,
                 count(*) FILTER (WHERE event_type = 'purchase') AS k
               FROM events),
             p AS (SELECT CAST(k AS DOUBLE) / n AS p1,
                     CAST(k AS DOUBLE) / n * 1.1 AS p2,
                     CAST(n AS BIGINT) AS n_obs, CAST(k AS BIGINT) AS k_obs
                   FROM base),
             f AS (SELECT n_obs, k_obs, p1, p2, (p1 + p2) / 2.0 AS pbar FROM p)
        SELECT n_obs, k_obs, round(p1, 6) AS p1, round(p2, 6) AS p2,
               CAST(ceil(
                 pow(1.959964 * sqrt(2.0 * pbar * (1.0 - pbar))
                   + 0.841621 * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2)
                 / pow(p2 - p1, 2)) AS BIGINT) AS n_per_arm
        FROM f"""))),

    // BENJAMINI-HOCHBERG FDR over the 10 Dunn pairwise z-values — the
    // multiple-comparison correction the post-hoc battery requires.
    // Two-sided p from |z| via the Abramowitz-Stegun 7.1.26 polynomial
    // Φ approximation spelled as ONE shared arithmetic formula (both
    // engines evaluate identical IEEE doubles, so parity is exact even
    // though the approximation itself is 1.5e-7); BH ranks the 10 pair
    // p-values (a window over the pair-count-bounded set) and rejects
    // every pair at or below the largest rank with p ≤ rank·α/m, α=0.05.
    Q("ml_bh_fdr",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_bh")
        s.sql(sql(s"""
          WITH vals AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type
                        FROM graft_ev_bh WHERE value IS NOT NULL),
               cnt_v AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
               cnt_vg AS (SELECT v, event_type, count(*) AS cg FROM vals GROUP BY v, event_type),
               ranked AS (SELECT v, c,
                            COALESCE(SUM(c) OVER (ORDER BY v
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
                          FROM cnt_v),
               rg AS (SELECT g.event_type, sum(g.cg) AS ng,
                        sum(CAST(g.cg AS DECIMAL(38,0)) * (2 * r.k + r.c + 1)) AS rgx2
                      FROM cnt_vg g JOIN ranked r ON g.v = r.v
                      GROUP BY g.event_type),
               st AS (SELECT sum(ng) AS n,
                        (SELECT sum(CAST(c AS DECIMAL(38,0)) * c * c - c) FROM ranked) AS tie3
                      FROM rg),
               s2 AS (SELECT CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 12.0
                        - CAST(tie3 AS DOUBLE) / (12.0 * (CAST(n AS DOUBLE) - 1)) AS v
                      FROM st),
               zs AS (SELECT a.event_type AS g1, b.event_type AS g2,
                        abs((CAST(a.rgx2 AS DOUBLE) / (2.0 * a.ng)
                             - CAST(b.rgx2 AS DOUBLE) / (2.0 * b.ng))
                          / sqrt(s2.v * (1.0 / a.ng + 1.0 / b.ng))) AS az
                      FROM rg a JOIN rg b ON a.event_type < b.event_type CROSS JOIN s2),
               ps AS (SELECT g1, g2, az,
                        2.0 * (exp(-az * az / 2.0) * 0.3989422804014327
                               * (0.319381530 * (1.0 / (1.0 + 0.2316419 * az))
                                - 0.356563782 * pow(1.0 / (1.0 + 0.2316419 * az), 2)
                                + 1.781477937 * pow(1.0 / (1.0 + 0.2316419 * az), 3)
                                - 1.821255978 * pow(1.0 / (1.0 + 0.2316419 * az), 4)
                                + 1.330274429 * pow(1.0 / (1.0 + 0.2316419 * az), 5)))
                          AS p
                      FROM zs),
               rk AS (SELECT g1, g2, az, p,
                        row_number() OVER (ORDER BY p, g1, g2) AS r,
                        count(*) OVER () AS m
                      FROM ps),
               thr AS (SELECT COALESCE(max(r), 0) AS kmax FROM rk
                       WHERE p <= r * 0.05 / m)
          SELECT g1, g2, round(az, 6) AS abs_z, round(p, 6) AS p_two_sided,
                 CAST(r AS BIGINT) AS rank, (r <= thr.kmax) AS bh_reject
          FROM rk CROSS JOIN thr"""))
      },
      Some(sql("""
        WITH vals AS (SELECT CAST(round(value * 100) AS BIGINT) AS v, event_type
                      FROM events WHERE value IS NOT NULL),
             cnt_v AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
             cnt_vg AS (SELECT v, event_type, count(*) AS cg FROM vals GROUP BY v, event_type),
             ranked AS (SELECT v, c,
                          COALESCE(SUM(c) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
                        FROM cnt_v),
             rg AS (SELECT g.event_type, sum(g.cg) AS ng,
                      sum(CAST(g.cg AS HUGEINT) * (2 * r.k + r.c + 1)) AS rgx2
                    FROM cnt_vg g JOIN ranked r ON g.v = r.v
                    GROUP BY g.event_type),
             st AS (SELECT sum(ng) AS n,
                      (SELECT sum(CAST(c AS HUGEINT) * c * c - c) FROM ranked) AS tie3
                    FROM rg),
             s2 AS (SELECT CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 12.0
                      - CAST(tie3 AS DOUBLE) / (12.0 * (CAST(n AS DOUBLE) - 1)) AS v
                    FROM st),
             zs AS (SELECT a.event_type AS g1, b.event_type AS g2,
                      abs((CAST(a.rgx2 AS DOUBLE) / (2.0 * a.ng)
                           - CAST(b.rgx2 AS DOUBLE) / (2.0 * b.ng))
                        / sqrt(s2.v * (1.0 / a.ng + 1.0 / b.ng))) AS az
                    FROM rg a JOIN rg b ON a.event_type < b.event_type CROSS JOIN s2),
             ps AS (SELECT g1, g2, az,
                      2.0 * (exp(-az * az / 2.0) * 0.3989422804014327
                             * (0.319381530 * (1.0 / (1.0 + 0.2316419 * az))
                              - 0.356563782 * pow(1.0 / (1.0 + 0.2316419 * az), 2)
                              + 1.781477937 * pow(1.0 / (1.0 + 0.2316419 * az), 3)
                              - 1.821255978 * pow(1.0 / (1.0 + 0.2316419 * az), 4)
                              + 1.330274429 * pow(1.0 / (1.0 + 0.2316419 * az), 5)))
                        AS p
                    FROM zs),
             rk AS (SELECT g1, g2, az, p,
                      row_number() OVER (ORDER BY p, g1, g2) AS r,
                      count(*) OVER () AS m
                    FROM ps),
             thr AS (SELECT COALESCE(max(r), 0) AS kmax FROM rk
                     WHERE p <= r * 0.05 / m)
        SELECT g1, g2, round(az, 6) AS abs_z, round(p, 6) AS p_two_sided,
               CAST(r AS BIGINT) AS rank, (r <= thr.kmax) AS bh_reject
        FROM rk CROSS JOIN thr"""))),

    // VARIANCE INFLATION FACTORS for the 3-feature customer design
    // (frequency, monetary cents, recency days) — the multicollinearity
    // diagnostic run before any regression. Pairwise Pearson r from one
    // pass of exact integer sufficient statistics, then the CLOSED-FORM
    // 3×3 correlation-matrix inverse diagonal:
    //   det = 1 + 2·r12·r13·r23 − r12² − r13² − r23²,
    //   VIF₁ = (1 − r23²)/det (and cyclically). Identical IEEE
    // evaluation on both engines; 6-digit projection at the end.
    Q("ml_vif",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_vif")
        s.sql(sql("""
          WITH per_cust AS (SELECT o_custkey,
                   count(*) AS x1,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x2,
                   datediff(date'2000-01-01', max(o_orderdate)) AS x3
                 FROM graft_o_vif GROUP BY o_custkey),
               st AS (SELECT count(*) AS n,
                   sum(CAST(x1 AS DECIMAL(38,0))) AS s1, sum(CAST(x2 AS DECIMAL(38,0))) AS s2,
                   sum(CAST(x3 AS DECIMAL(38,0))) AS s3,
                   sum(CAST(x1 AS DECIMAL(38,0)) * x1) AS s11,
                   sum(CAST(x2 AS DECIMAL(38,0)) * x2) AS s22,
                   sum(CAST(x3 AS DECIMAL(38,0)) * x3) AS s33,
                   sum(CAST(x1 AS DECIMAL(38,0)) * x2) AS s12,
                   sum(CAST(x1 AS DECIMAL(38,0)) * x3) AS s13,
                   sum(CAST(x2 AS DECIMAL(38,0)) * x3) AS s23
                 FROM per_cust),
               r AS (SELECT CAST(n AS BIGINT) AS n_cust,
                   (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)
                     / sqrt((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
                          * (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)) AS r12,
                   (CAST(n AS DOUBLE) * s13 - CAST(s1 AS DOUBLE) * s3)
                     / sqrt((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
                          * (CAST(n AS DOUBLE) * s33 - CAST(s3 AS DOUBLE) * s3)) AS r13,
                   (CAST(n AS DOUBLE) * s23 - CAST(s2 AS DOUBLE) * s3)
                     / sqrt((CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)
                          * (CAST(n AS DOUBLE) * s33 - CAST(s3 AS DOUBLE) * s3)) AS r23
                 FROM st),
               dt AS (SELECT *, 1.0 + 2.0 * r12 * r13 * r23
                        - r12 * r12 - r13 * r13 - r23 * r23 AS det FROM r)
          SELECT n_cust, round(r12, 6) AS r12, round(r13, 6) AS r13,
                 round(r23, 6) AS r23,
                 round((1.0 - r23 * r23) / det, 6) AS vif_freq,
                 round((1.0 - r13 * r13) / det, 6) AS vif_monetary,
                 round((1.0 - r12 * r12) / det, 6) AS vif_recency
          FROM dt"""))
      },
      Some(sql("""
        WITH per_cust AS (SELECT o_custkey,
                 count(*) AS x1,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS x2,
                 datediff('day', max(o_orderdate), date'2000-01-01') AS x3
               FROM orders GROUP BY o_custkey),
             st AS (SELECT count(*) AS n,
                 sum(CAST(x1 AS HUGEINT)) AS s1, sum(CAST(x2 AS HUGEINT)) AS s2,
                 sum(CAST(x3 AS HUGEINT)) AS s3,
                 sum(CAST(x1 AS HUGEINT) * x1) AS s11,
                 sum(CAST(x2 AS HUGEINT) * x2) AS s22,
                 sum(CAST(x3 AS HUGEINT) * x3) AS s33,
                 sum(CAST(x1 AS HUGEINT) * x2) AS s12,
                 sum(CAST(x1 AS HUGEINT) * x3) AS s13,
                 sum(CAST(x2 AS HUGEINT) * x3) AS s23
               FROM per_cust),
             r AS (SELECT CAST(n AS BIGINT) AS n_cust,
                 (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)
                   / sqrt((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
                        * (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)) AS r12,
                 (CAST(n AS DOUBLE) * s13 - CAST(s1 AS DOUBLE) * s3)
                   / sqrt((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
                        * (CAST(n AS DOUBLE) * s33 - CAST(s3 AS DOUBLE) * s3)) AS r13,
                 (CAST(n AS DOUBLE) * s23 - CAST(s2 AS DOUBLE) * s3)
                   / sqrt((CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2)
                        * (CAST(n AS DOUBLE) * s33 - CAST(s3 AS DOUBLE) * s3)) AS r23
               FROM st),
             dt AS (SELECT *, 1.0 + 2.0 * r12 * r13 * r23
                      - r12 * r12 - r13 * r13 - r23 * r23 AS det FROM r)
        SELECT n_cust, round(r12, 6) AS r12, round(r13, 6) AS r13,
               round(r23, 6) AS r23,
               round((1.0 - r23 * r23) / det, 6) AS vif_freq,
               round((1.0 - r13 * r13) / det, 6) AS vif_monetary,
               round((1.0 - r12 * r12) / det, 6) AS vif_recency
        FROM dt"""))),

    // CRAMÉR'S V — the normalized effect size that turns a chi-square
    // contingency into a [0,1] association strength (ml_chi2_cells pins
    // the raw cells; this pins the summary statistic analysts quote).
    // Table: event_type × value tercile (integer thresholds 5000/20000
    // cents). χ² from exact observed counts and rational expected values
    // via the cross-product spelling n·Σ(o²/(rᵢ·cⱼ)) − n, so there is no
    // per-cell float expected-count subtraction to drift.
    Q("ml_cramers_v",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_cv")
        s.sql(sql("""
          WITH b AS (SELECT event_type,
                   CASE WHEN round(value * 100) < 5000 THEN 'lo'
                        WHEN round(value * 100) < 20000 THEN 'mid'
                        ELSE 'hi' END AS tercile
                 FROM graft_ev_cv),
               cells AS (SELECT event_type, tercile, count(*) AS o
                         FROM b GROUP BY event_type, tercile),
               rows_ AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY event_type),
               cols AS (SELECT tercile, sum(o) AS c FROM cells GROUP BY tercile),
               n AS (SELECT sum(o) AS n FROM cells),
               agg AS (SELECT
                   sum(CAST(cl.o AS DOUBLE) * cl.o
                       / (CAST(r.r AS DOUBLE) * c.c)) AS srate,
                   count(DISTINCT cl.event_type) AS nr,
                   count(DISTINCT cl.tercile) AS nc
                 FROM cells cl
                 JOIN rows_ r ON cl.event_type = r.event_type
                 JOIN cols c ON cl.tercile = c.tercile),
               chi AS (SELECT n.n, agg.srate * CAST(n.n AS DOUBLE)
                         - CAST(n.n AS DOUBLE) AS chi2, agg.nr, agg.nc
                       FROM agg CROSS JOIN n)
          SELECT CAST(n AS BIGINT) AS n, round(chi2, 6) AS chi2,
                 CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
                 round(sqrt(chi2 / (CAST(n AS DOUBLE)
                   * (least(nr, nc) - 1))), 6) AS cramers_v
          FROM chi"""))
      },
      Some(sql("""
        WITH b AS (SELECT event_type,
                 CASE WHEN round(value * 100) < 5000 THEN 'lo'
                      WHEN round(value * 100) < 20000 THEN 'mid'
                      ELSE 'hi' END AS tercile
               FROM events),
             cells AS (SELECT event_type, tercile, count(*) AS o
                       FROM b GROUP BY event_type, tercile),
             rows_ AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY event_type),
             cols AS (SELECT tercile, sum(o) AS c FROM cells GROUP BY tercile),
             n AS (SELECT sum(o) AS n FROM cells),
             agg AS (SELECT
                 sum(CAST(cl.o AS DOUBLE) * cl.o
                     / (CAST(r.r AS DOUBLE) * c.c)) AS srate,
                 count(DISTINCT cl.event_type) AS nr,
                 count(DISTINCT cl.tercile) AS nc
               FROM cells cl
               JOIN rows_ r ON cl.event_type = r.event_type
               JOIN cols c ON cl.tercile = c.tercile),
             chi AS (SELECT n.n, agg.srate * CAST(n.n AS DOUBLE)
                       - CAST(n.n AS DOUBLE) AS chi2, agg.nr, agg.nc
                     FROM agg CROSS JOIN n)
        SELECT CAST(n AS BIGINT) AS n, round(chi2, 6) AS chi2,
               CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
               round(sqrt(chi2 / (CAST(n AS DOUBLE)
                 * (least(nr, nc) - 1))), 6) AS cramers_v
        FROM chi"""))),

    // WILCOXON SIGNED-RANK — the PAIRED member of the nonparametric
    // family (Mann-Whitney covers independent samples): per-user
    // pre/post cent sums (the CUPED split), zero differences dropped,
    // |d| tie-averaged ranks from the SAME bucket-offset pipeline
    // (|d| domain is bounded by the cents range, buckets by domain/4096),
    // 2·W⁺ exact in decimal, and the tie-corrected normal z
    //   z = (W⁺ − n(n+1)/4) / √(n(n+1)(2n+1)/24 − Σ(c³−c)/48).
    Q("ml_wilcoxon_signed",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_wx")
        s.sql(sql("""
          WITH per_user AS (SELECT user_id,
                   sum(CASE WHEN ts < timestamp'2024-01-16 00:00:00'
                            THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS pre,
                   sum(CASE WHEN ts >= timestamp'2024-01-16 00:00:00'
                            THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS post
                 FROM graft_ev_wx WHERE value IS NOT NULL GROUP BY user_id),
               diffs AS (SELECT post - pre AS dd, abs(post - pre) AS ad
                         FROM per_user WHERE post <> pre),
               cnts AS (SELECT ad, count(*) AS c,
                          count(*) FILTER (WHERE dd > 0) AS cpos
                        FROM diffs GROUP BY ad),
               btot AS (SELECT ad DIV 4096 AS b, sum(c) AS tot FROM cnts GROUP BY ad DIV 4096),
               boff AS (SELECT b, COALESCE(SUM(tot) OVER (ORDER BY b
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
                        FROM btot),
               ranked AS (SELECT c.ad, c.c, c.cpos,
                            o.off + COALESCE(SUM(c.c) OVER (PARTITION BY c.ad DIV 4096
                              ORDER BY c.ad ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
                          FROM cnts c JOIN boff o ON c.ad DIV 4096 = o.b),
               st AS (SELECT sum(c) AS n,
                        sum(CAST(cpos AS DECIMAL(38,0)) * (2 * k + c + 1)) AS wposx2,
                        sum(CAST(c AS DECIMAL(38,0)) * c * c - c) AS tie3
                      FROM ranked)
          SELECT CAST(n AS BIGINT) AS n_pairs,
                 CAST(wposx2 AS BIGINT) AS wpos_x2,
                 CAST(tie3 AS BIGINT) AS tie_cubes,
                 round((CAST(wposx2 AS DOUBLE) / 2.0
                        - CAST(n AS DOUBLE) * (n + 1) / 4.0)
                   / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2.0 * n + 1) / 24.0
                        - CAST(tie3 AS DOUBLE) / 48.0), 6) AS z
          FROM st"""))
      },
      Some(sql("""
        WITH per_user AS (SELECT user_id,
                 sum(CASE WHEN ts < timestamp'2024-01-16 00:00:00'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS pre,
                 sum(CASE WHEN ts >= timestamp'2024-01-16 00:00:00'
                          THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS post
               FROM events WHERE value IS NOT NULL GROUP BY user_id),
             diffs AS (SELECT post - pre AS dd, abs(post - pre) AS ad
                       FROM per_user WHERE post <> pre),
             cnts AS (SELECT ad, count(*) AS c,
                        count(*) FILTER (WHERE dd > 0) AS cpos
                      FROM diffs GROUP BY ad),
             ranked AS (SELECT ad, c, cpos,
                          COALESCE(SUM(c) OVER (ORDER BY ad
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS k
                        FROM cnts),
             st AS (SELECT sum(c) AS n,
                      sum(CAST(cpos AS HUGEINT) * (2 * k + c + 1)) AS wposx2,
                      sum(CAST(c AS HUGEINT) * c * c - c) AS tie3
                    FROM ranked)
        SELECT CAST(n AS BIGINT) AS n_pairs,
               CAST(wposx2 AS BIGINT) AS wpos_x2,
               CAST(tie3 AS BIGINT) AS tie_cubes,
               round((CAST(wposx2 AS DOUBLE) / 2.0
                      - CAST(n AS DOUBLE) * (n + 1) / 4.0)
                 / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2.0 * n + 1) / 24.0
                      - CAST(tie3 AS DOUBLE) / 48.0), 6) AS z
        FROM st"""))),

    // TOST EQUIVALENCE (two one-sided tests) — the "no-harm" A/B check:
    // instead of asking whether the variants DIFFER, ask whether the
    // per-user mean-spend difference is provably INSIDE ±δ (δ = 500
    // cents). From the same per-variant exact sufficient statistics as
    // ml_welch_t: t_lower = (diff+δ)/se, t_upper = (δ−diff)/se;
    // equivalent at 5% iff BOTH exceed z=1.644854. One identical IEEE
    // evaluation on both engines.
    Q("ml_tost_equivalence",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_ts")
        s.sql(sql("""
          WITH per_user AS (SELECT user_id, user_id % 2 AS variant,
                   sum(CAST(round(value * 100) AS BIGINT)) AS y
                 FROM graft_ev_ts GROUP BY user_id),
               g AS (SELECT variant, count(*) AS n,
                       sum(CAST(y AS DECIMAL(38,0))) AS s,
                       sum(CAST(y AS DECIMAL(38,0)) * y) AS q
                     FROM per_user GROUP BY variant),
               w AS (SELECT
                   max(CASE WHEN variant = 1 THEN CAST(n AS DOUBLE) END) AS n1,
                   max(CASE WHEN variant = 1 THEN CAST(s AS DOUBLE) END) AS s1,
                   max(CASE WHEN variant = 1 THEN CAST(q AS DOUBLE) END) AS q1,
                   max(CASE WHEN variant = 0 THEN CAST(n AS DOUBLE) END) AS n0,
                   max(CASE WHEN variant = 0 THEN CAST(s AS DOUBLE) END) AS s0,
                   max(CASE WHEN variant = 0 THEN CAST(q AS DOUBLE) END) AS q0
                 FROM g),
               f AS (SELECT CAST(n1 AS BIGINT) AS n_treat, CAST(n0 AS BIGINT) AS n_ctrl,
                   s1 / n1 - s0 / n0 AS diff,
                   sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                      + (q0 - s0 * s0 / n0) / (n0 - 1) / n0) AS se
                 FROM w)
          SELECT n_treat, n_ctrl, round(diff / 100.0, 4) AS diff_d,
                 round((diff + 500.0) / se, 6) AS t_lower,
                 round((500.0 - diff) / se, 6) AS t_upper,
                 ((diff + 500.0) / se > 1.644854
                   AND (500.0 - diff) / se > 1.644854) AS equivalent
          FROM f"""))
      },
      Some(sql("""
        WITH per_user AS (SELECT user_id, user_id % 2 AS variant,
                 sum(CAST(round(value * 100) AS BIGINT)) AS y
               FROM events GROUP BY user_id),
             g AS (SELECT variant, count(*) AS n,
                     sum(CAST(y AS HUGEINT)) AS s,
                     sum(CAST(y AS HUGEINT) * y) AS q
                   FROM per_user GROUP BY variant),
             w AS (SELECT
                 max(CASE WHEN variant = 1 THEN CAST(n AS DOUBLE) END) AS n1,
                 max(CASE WHEN variant = 1 THEN CAST(s AS DOUBLE) END) AS s1,
                 max(CASE WHEN variant = 1 THEN CAST(q AS DOUBLE) END) AS q1,
                 max(CASE WHEN variant = 0 THEN CAST(n AS DOUBLE) END) AS n0,
                 max(CASE WHEN variant = 0 THEN CAST(s AS DOUBLE) END) AS s0,
                 max(CASE WHEN variant = 0 THEN CAST(q AS DOUBLE) END) AS q0
               FROM g),
             f AS (SELECT CAST(n1 AS BIGINT) AS n_treat, CAST(n0 AS BIGINT) AS n_ctrl,
                 s1 / n1 - s0 / n0 AS diff,
                 sqrt((q1 - s1 * s1 / n1) / (n1 - 1) / n1
                    + (q0 - s0 * s0 / n0) / (n0 - 1) / n0) AS se
               FROM w)
        SELECT n_treat, n_ctrl, round(diff / 100.0, 4) AS diff_d,
               round((diff + 500.0) / se, 6) AS t_lower,
               round((500.0 - diff) / se, 6) AS t_upper,
               ((diff + 500.0) / se > 1.644854
                 AND (500.0 - diff) / se > 1.644854) AS equivalent
        FROM f"""))),

    // MATTHEWS CORRELATION COEFFICIENT — the class-imbalance-robust
    // binary metric ml_prf_metrics lacks: exact integer confusion cells
    // (truth = purchase, prediction = high-value rule), one projection
    // MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)); the
    // products run in DOUBLE so the √ argument never overflows BIGINT.
    Q("ml_mcc",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_mcc")
        s.sql(sql("""
          WITH cells AS (SELECT
                   count(*) FILTER (WHERE event_type = 'purchase' AND value >= 100.0) AS tp,
                   count(*) FILTER (WHERE event_type <> 'purchase' AND value < 100.0) AS tn,
                   count(*) FILTER (WHERE event_type <> 'purchase' AND value >= 100.0) AS fp,
                   count(*) FILTER (WHERE event_type = 'purchase' AND value < 100.0) AS fn
                 FROM graft_ev_mcc)
          SELECT CAST(tp AS BIGINT) AS tp, CAST(tn AS BIGINT) AS tn,
                 CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
                 round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                   / sqrt((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)
                        * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn)), 6) AS mcc
          FROM cells"""))
      },
      Some(sql("""
        WITH cells AS (SELECT
                 count(*) FILTER (WHERE event_type = 'purchase' AND value >= 100.0) AS tp,
                 count(*) FILTER (WHERE event_type <> 'purchase' AND value < 100.0) AS tn,
                 count(*) FILTER (WHERE event_type <> 'purchase' AND value >= 100.0) AS fp,
                 count(*) FILTER (WHERE event_type = 'purchase' AND value < 100.0) AS fn
               FROM events)
        SELECT CAST(tp AS BIGINT) AS tp, CAST(tn AS BIGINT) AS tn,
               CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
               round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
                 / sqrt((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)
                      * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn)), 6) AS mcc
        FROM cells"""))),

    // COHEN'S D — the standardized mean-difference effect size that
    // turns ml_welch_t's "significant?" into "how big?": pooled-SD d
    // with Hedges' small-sample correction g = d·(1 − 3/(4(n1+n2)−9)),
    // from the same exact per-group sufficient statistics.
    Q("ml_cohens_d",
      (s, d) => {
        table(s, d, "events").createOrReplaceTempView("graft_ev_cd")
        s.sql(sql("""
          WITH g AS (SELECT event_type, count(*) AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) AS s,
                   sum(CAST(round(value * 100) AS DECIMAL(38,0))
                       * CAST(round(value * 100) AS BIGINT)) AS q
                 FROM graft_ev_cd WHERE event_type IN ('purchase', 'click')
                 GROUP BY event_type),
               w AS (SELECT
                   max(CASE WHEN event_type = 'purchase' THEN CAST(n AS DOUBLE) END) AS n1,
                   max(CASE WHEN event_type = 'purchase' THEN CAST(s AS DOUBLE) END) AS s1,
                   max(CASE WHEN event_type = 'purchase' THEN CAST(q AS DOUBLE) END) AS q1,
                   max(CASE WHEN event_type = 'click' THEN CAST(n AS DOUBLE) END) AS n2,
                   max(CASE WHEN event_type = 'click' THEN CAST(s AS DOUBLE) END) AS s2,
                   max(CASE WHEN event_type = 'click' THEN CAST(q AS DOUBLE) END) AS q2
                 FROM g),
               f AS (SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_click,
                   (s1 / n1 - s2 / n2)
                     / sqrt(((q1 - s1 * s1 / n1) + (q2 - s2 * s2 / n2))
                            / (n1 + n2 - 2)) AS d,
                   n1 + n2 AS nt
                 FROM w)
          SELECT n_purchase, n_click, round(d, 6) AS cohens_d,
                 round(d * (1.0 - 3.0 / (4.0 * nt - 9.0)), 6) AS hedges_g
          FROM f"""))
      },
      Some(sql("""
        WITH g AS (SELECT event_type, count(*) AS n,
                 sum(CAST(round(value * 100) AS BIGINT)) AS s,
                 sum(CAST(round(value * 100) AS HUGEINT)
                     * CAST(round(value * 100) AS BIGINT)) AS q
               FROM events WHERE event_type IN ('purchase', 'click')
               GROUP BY event_type),
             w AS (SELECT
                 max(CASE WHEN event_type = 'purchase' THEN CAST(n AS DOUBLE) END) AS n1,
                 max(CASE WHEN event_type = 'purchase' THEN CAST(s AS DOUBLE) END) AS s1,
                 max(CASE WHEN event_type = 'purchase' THEN CAST(q AS DOUBLE) END) AS q1,
                 max(CASE WHEN event_type = 'click' THEN CAST(n AS DOUBLE) END) AS n2,
                 max(CASE WHEN event_type = 'click' THEN CAST(s AS DOUBLE) END) AS s2,
                 max(CASE WHEN event_type = 'click' THEN CAST(q AS DOUBLE) END) AS q2
               FROM g),
             f AS (SELECT CAST(n1 AS BIGINT) AS n_purchase, CAST(n2 AS BIGINT) AS n_click,
                 (s1 / n1 - s2 / n2)
                   / sqrt(((q1 - s1 * s1 / n1) + (q2 - s2 * s2 / n2))
                          / (n1 + n2 - 2)) AS d,
                 n1 + n2 AS nt
               FROM w)
        SELECT n_purchase, n_click, round(d, 6) AS cohens_d,
               round(d * (1.0 - 3.0 / (4.0 * nt - 9.0)), 6) AS hedges_g
        FROM f""")))
  )
}
