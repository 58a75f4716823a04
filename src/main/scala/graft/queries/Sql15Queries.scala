package graft.queries

import graft.Engine.table
import Registry.sql

/** Round-11 SQL wave 15 — golden shared-scan correlation + window frame
  * DEFAULTS (the two families the r10 verdict ranked highest-value among
  * the reference's uncrossed golden tests):
  *
  * - correlationoptimizer1-15 (reference sql/hive/src/test/resources/
  *   golden/correlationoptimizer*): one fact table feeding MULTIPLE
  *   aggregation branches that re-join on the group key — the 100 TB
  *   idiom behind every multi-metric report. sql_shared_scan pins the
  *   identical-branch case (ReusedExchange); sql_correlated_agg_join
  *   pins the DIFFERENT-aggregates case, whose scale contract is that
  *   the branch join rides the aggregations' hash partitioning and adds
  *   NO third exchange (PlanSpec).
  *
  * - windowing.q frame defaults (golden windowing_windowspec /
  *   windowing_expressions): with an ORDER BY the implicit frame is
  *   RANGE UNBOUNDED PRECEDING..CURRENT ROW — peers INCLUDED — so
  *   last_value under the default frame returns the last PEER, not the
  *   current row; with no ORDER BY the frame is the whole partition.
  */
object Sql15Queries {

  val all: Seq[Q] = Seq(

    // Correlation-optimizer shape with DIFFERENT aggregates per branch:
    // order counts and order value (exact cents) both grouped by
    // customer, re-joined on the key, reduced to one summary row.
    // sum_avg pins that BOTH branches carried per-key values (a branch
    // mixup changes it); total_orders pins the join's key coverage.
    Q("sql_correlated_agg_join",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o15c")
        s.sql(sql("""
          WITH cnts AS (SELECT o_custkey, count(*) AS n
                        FROM graft_o15c GROUP BY o_custkey),
               sums AS (SELECT o_custkey,
                          sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
                        FROM graft_o15c GROUP BY o_custkey)
          SELECT count(*) AS n_keys,
                 CAST(sum(c.n) AS BIGINT) AS total_orders,
                 CAST(sum(s.cents DIV c.n) AS BIGINT) AS sum_avg_cents
          FROM cnts c JOIN sums s ON c.o_custkey = s.o_custkey"""))
      },
      Some(sql("""
        WITH cnts AS MATERIALIZED (SELECT o_custkey, count(*) AS n
                                   FROM orders GROUP BY o_custkey),
             sums AS MATERIALIZED (SELECT o_custkey,
                                     sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
                                   FROM orders GROUP BY o_custkey)
        SELECT count(*) AS n_keys,
               CAST(sum(c.n) AS BIGINT) AS total_orders,
               CAST(sum(s.cents // c.n) AS BIGINT) AS sum_avg_cents
        FROM cnts c JOIN sums s ON c.o_custkey = s.o_custkey"""))),

    // Window frame DEFAULTS on a tie-heavy order key (o_orderdate
    // repeats within a status): def_cnt must equal the explicit RANGE
    // spelling (peers included — on ties it differs from ROWS), the
    // running max under the default frame must cover the current row's
    // FULL peer group (a ROWS-default engine would cut mid-group; max,
    // unlike last_value, is tie-permutation deterministic), and the
    // ORDER-BY-free window must span the whole partition.
    Q("sql_window_default_frame",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o15w")
        s.sql(sql("""
          SELECT o_orderkey, o_orderstatus,
                 CAST(count(*) OVER (PARTITION BY o_orderstatus
                        ORDER BY o_orderdate) AS BIGINT) AS def_cnt,
                 CAST(count(*) OVER (PARTITION BY o_orderstatus
                        ORDER BY o_orderdate
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS range_cnt,
                 CAST(max(o_orderkey) OVER (PARTITION BY o_orderstatus
                        ORDER BY o_orderdate) AS BIGINT) AS run_max_key,
                 CAST(count(*) OVER (PARTITION BY o_orderstatus)
                   AS BIGINT) AS part_cnt
          FROM graft_o15w WHERE o_orderkey <= 400"""))
      },
      Some(sql("""
        SELECT o_orderkey, o_orderstatus,
               CAST(count(*) OVER (PARTITION BY o_orderstatus
                      ORDER BY o_orderdate) AS BIGINT) AS def_cnt,
               CAST(count(*) OVER (PARTITION BY o_orderstatus
                      ORDER BY o_orderdate
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS range_cnt,
               CAST(max(o_orderkey) OVER (PARTITION BY o_orderstatus
                      ORDER BY o_orderdate) AS BIGINT) AS run_max_key,
               CAST(count(*) OVER (PARTITION BY o_orderstatus)
                 AS BIGINT) AS part_cnt
        FROM orders WHERE o_orderkey <= 400""")))
  )
}
