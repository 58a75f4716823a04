package graft.queries

import graft.Engine.table
import Registry.sql

/** Round-11 warehouse wave 2 — three classic customer-analytics /
  * compliance operations on top of the r10 ops layer (SCD2, CDC,
  * survivorship, checksums):
  *
  * - RFM segmentation: recency/frequency/monetary quintiles. The
  *   quintile boundaries are ONE 1-row percentile_disc aggregate that
  *   broadcasts back onto the per-customer metrics — never a global
  *   ntile window. percentile_disc picks actual set elements, so the
  *   boundary comparisons are exact integer compares on both engines.
  *   Scale note: exact percentile_disc buffers the per-customer metric
  *   vector on the final reducer; past ~10⁸ customers the drop-in swap
  *   is approx_percentile (GK sketch, mergeable partials — the
  *   agg_percentile_approx row pins its rank-error contract), which
  *   changes only which element is picked near quintile boundaries.
  * - ABC (Pareto) analysis: customers by cumulative revenue share. The
  *   global cumulative uses the same two-level pattern as the rank
  *   tests: revenue-bucket totals (bounded count) take the only
  *   unpartitioned cumulative; per-customer prefixes are bucket-
  *   partitioned. Class boundaries compare exact integer cross products
  *   (cum·100 vs total·80), so no IEEE rounding can flip a row.
  * - GDPR erasure audit: the right-to-be-forgotten pass — broadcast
  *   anti-join erasure of a deletion list plus a one-row audit of what
  *   was dropped and the surviving checksum, the shape a 100 TB
  *   compliance job must have (erasure list broadcasts, facts stream).
  */
object Pipeline8Queries {

  val all: Seq[Q] = Seq(

    Q("pipe_rfm_segments",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o18_rfm")
        s.sql(sql("""
          WITH per_cust AS (SELECT o_custkey,
                   datediff(date'2000-01-01', max(o_orderdate)) AS rec_days,
                   count(*) AS freq,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS mon
                 FROM graft_o18_rfm GROUP BY o_custkey),
               qs AS (SELECT
                   percentile_disc(0.2) WITHIN GROUP (ORDER BY rec_days) AS r20,
                   percentile_disc(0.4) WITHIN GROUP (ORDER BY rec_days) AS r40,
                   percentile_disc(0.6) WITHIN GROUP (ORDER BY rec_days) AS r60,
                   percentile_disc(0.8) WITHIN GROUP (ORDER BY rec_days) AS r80,
                   percentile_disc(0.2) WITHIN GROUP (ORDER BY freq) AS f20,
                   percentile_disc(0.4) WITHIN GROUP (ORDER BY freq) AS f40,
                   percentile_disc(0.6) WITHIN GROUP (ORDER BY freq) AS f60,
                   percentile_disc(0.8) WITHIN GROUP (ORDER BY freq) AS f80,
                   percentile_disc(0.2) WITHIN GROUP (ORDER BY mon) AS m20,
                   percentile_disc(0.4) WITHIN GROUP (ORDER BY mon) AS m40,
                   percentile_disc(0.6) WITHIN GROUP (ORDER BY mon) AS m60,
                   percentile_disc(0.8) WITHIN GROUP (ORDER BY mon) AS m80
                 FROM per_cust),
               scored AS (SELECT
                   6 - (1 + CASE WHEN rec_days > r20 THEN 1 ELSE 0 END
                          + CASE WHEN rec_days > r40 THEN 1 ELSE 0 END
                          + CASE WHEN rec_days > r60 THEN 1 ELSE 0 END
                          + CASE WHEN rec_days > r80 THEN 1 ELSE 0 END) AS r_score,
                   1 + CASE WHEN freq > f20 THEN 1 ELSE 0 END
                     + CASE WHEN freq > f40 THEN 1 ELSE 0 END
                     + CASE WHEN freq > f60 THEN 1 ELSE 0 END
                     + CASE WHEN freq > f80 THEN 1 ELSE 0 END AS f_score,
                   1 + CASE WHEN mon > m20 THEN 1 ELSE 0 END
                     + CASE WHEN mon > m40 THEN 1 ELSE 0 END
                     + CASE WHEN mon > m60 THEN 1 ELSE 0 END
                     + CASE WHEN mon > m80 THEN 1 ELSE 0 END AS m_score,
                   mon
                 FROM per_cust CROSS JOIN qs)
          SELECT concat('R', r_score, 'F', f_score, 'M', m_score) AS segment,
                 count(*) AS n_customers,
                 CAST(sum(mon) AS BIGINT) AS cents
          FROM scored GROUP BY r_score, f_score, m_score"""))
      },
      Some(sql("""
        WITH per_cust AS (SELECT o_custkey,
                 datediff('day', max(o_orderdate), date'2000-01-01') AS rec_days,
                 count(*) AS freq,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS mon
               FROM orders GROUP BY o_custkey),
             qs AS (SELECT
                 quantile_disc(rec_days, 0.2) AS r20, quantile_disc(rec_days, 0.4) AS r40,
                 quantile_disc(rec_days, 0.6) AS r60, quantile_disc(rec_days, 0.8) AS r80,
                 quantile_disc(freq, 0.2) AS f20, quantile_disc(freq, 0.4) AS f40,
                 quantile_disc(freq, 0.6) AS f60, quantile_disc(freq, 0.8) AS f80,
                 quantile_disc(mon, 0.2) AS m20, quantile_disc(mon, 0.4) AS m40,
                 quantile_disc(mon, 0.6) AS m60, quantile_disc(mon, 0.8) AS m80
               FROM per_cust),
             scored AS (SELECT
                 6 - (1 + CASE WHEN rec_days > r20 THEN 1 ELSE 0 END
                        + CASE WHEN rec_days > r40 THEN 1 ELSE 0 END
                        + CASE WHEN rec_days > r60 THEN 1 ELSE 0 END
                        + CASE WHEN rec_days > r80 THEN 1 ELSE 0 END) AS r_score,
                 1 + CASE WHEN freq > f20 THEN 1 ELSE 0 END
                   + CASE WHEN freq > f40 THEN 1 ELSE 0 END
                   + CASE WHEN freq > f60 THEN 1 ELSE 0 END
                   + CASE WHEN freq > f80 THEN 1 ELSE 0 END AS f_score,
                 1 + CASE WHEN mon > m20 THEN 1 ELSE 0 END
                   + CASE WHEN mon > m40 THEN 1 ELSE 0 END
                   + CASE WHEN mon > m60 THEN 1 ELSE 0 END
                   + CASE WHEN mon > m80 THEN 1 ELSE 0 END AS m_score,
                 mon
               FROM per_cust CROSS JOIN qs)
        SELECT concat('R', r_score, 'F', f_score, 'M', m_score) AS segment,
               count(*) AS n_customers,
               CAST(sum(mon) AS BIGINT) AS cents
        FROM scored GROUP BY r_score, f_score, m_score"""))),

    Q("pipe_abc_analysis",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o18_abc")
        s.sql(sql("""
          WITH rev AS (SELECT o_custkey,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS r
                 FROM graft_o18_abc GROUP BY o_custkey),
               b AS (SELECT o_custkey, r, r DIV 1048576 AS bk FROM rev),
               btot AS (SELECT bk, sum(r) AS tot FROM b GROUP BY bk),
               boff AS (SELECT bk, COALESCE(SUM(tot) OVER (ORDER BY bk DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
                        FROM btot),
               cum AS (SELECT b.o_custkey, b.r,
                   o.off + SUM(b.r) OVER (PARTITION BY b.bk
                     ORDER BY b.r DESC, b.o_custkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
                 FROM b JOIN boff o ON b.bk = o.bk),
               tot AS (SELECT sum(r) AS t FROM rev),
               classed AS (SELECT o_custkey, r,
                   CASE WHEN c * 100 <= t * 80 THEN 'A'
                        WHEN c * 100 <= t * 95 THEN 'B'
                        ELSE 'C' END AS abc
                 FROM cum CROSS JOIN tot)
          SELECT abc, count(*) AS n_customers, CAST(sum(r) AS BIGINT) AS cents
          FROM classed GROUP BY abc"""))
      },
      Some(sql("""
        WITH rev AS (SELECT o_custkey,
                 sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS r
               FROM orders GROUP BY o_custkey),
             cum AS (SELECT o_custkey, r,
                 SUM(r) OVER (ORDER BY r DESC, o_custkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
               FROM rev),
             tot AS (SELECT sum(r) AS t FROM rev),
             classed AS (SELECT o_custkey, r,
                 CASE WHEN c * 100 <= t * 80 THEN 'A'
                      WHEN c * 100 <= t * 95 THEN 'B'
                      ELSE 'C' END AS abc
               FROM cum CROSS JOIN tot)
        SELECT abc, count(*) AS n_customers, CAST(sum(r) AS BIGINT) AS cents
        FROM classed GROUP BY abc"""))),

    Q("pipe_gdpr_erasure",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o18_gdpr")
        table(s, d, "customer").createOrReplaceTempView("graft_c18_gdpr")
        s.sql(sql("""
          WITH erase AS (SELECT c_custkey FROM graft_c18_gdpr WHERE c_custkey % 97 = 0),
               survivors AS (SELECT o.* FROM graft_o18_gdpr o
                             LEFT ANTI JOIN erase e ON o.o_custkey = e.c_custkey),
               erased AS (SELECT o.* FROM graft_o18_gdpr o
                          LEFT SEMI JOIN erase e ON o.o_custkey = e.c_custkey)
          SELECT (SELECT count(*) FROM erase) AS n_erase_requests,
                 (SELECT count(*) FROM erased) AS n_erased_orders,
                 (SELECT count(*) FROM survivors) AS n_surviving_orders,
                 (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  FROM survivors) AS surviving_cents"""))
      },
      Some(sql("""
        WITH erase AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
             survivors AS (SELECT o.* FROM orders o
                           ANTI JOIN erase e ON o.o_custkey = e.c_custkey),
             erased AS (SELECT o.* FROM orders o
                        SEMI JOIN erase e ON o.o_custkey = e.c_custkey)
        SELECT (SELECT count(*) FROM erase) AS n_erase_requests,
               (SELECT count(*) FROM erased) AS n_erased_orders,
               (SELECT count(*) FROM survivors) AS n_surviving_orders,
               (SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                FROM survivors) AS surviving_cents""")))
  )
}
