package graft.queries

import graft.Engine.table
import Registry.sql

/** Round-11 SQL wave 17 — the modern-SQL surfaces Spark 4 added that the
  * registry had not yet crossed:
  *
  * - WITH RECURSIVE (Spark 4's UnionLoop fixpoint execution): a bounded
  *   series generator joined against a real table, and an ancestor-chain
  *   walk over an implicit binary-tree hierarchy. The 100 TB contract of
  *   recursive CTEs is the per-iteration plan: each step is a normal
  *   distributed join/filter over the previous frontier — the fixpoint
  *   loop lives in the driver, the data never does.
  * - GROUP BY ALL: resolution sugar that must bind every non-aggregate
  *   output column.
  * - LATERAL correlated subquery in FROM: per-row top-k dependent join —
  *   the SQL spelling of win_top_per_group; Spark must decorrelate it
  *   (DomainJoin rewrite) instead of looping.
  */
object Sql17Queries {

  val all: Seq[Q] = Seq(

    // Recursive series generator: 500 fixpoint iterations (driver-side
    // loop over a 1-row frontier), then a real aggregation join — pins
    // both the UnionLoop termination and that the recursion result is a
    // first-class relation.
    Q("sql_recursive_series",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o17_rs")
        s.sql(sql("""
          WITH RECURSIVE seq(n) MAX RECURSION LEVEL 600 AS (
            SELECT 1
            UNION ALL
            SELECT n + 1 FROM seq WHERE n < 500)
          SELECT count(*) AS n_rows,
                 CAST(sum(q.n) AS BIGINT) AS series_sum,
                 CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS matched_cents
          FROM seq q JOIN graft_o17_rs o ON q.n = o.o_orderkey"""))
      },
      Some(sql("""
        WITH RECURSIVE seq(n) AS (
          SELECT 1
          UNION ALL
          SELECT n + 1 FROM seq WHERE n < 500)
        SELECT count(*) AS n_rows,
               CAST(sum(q.n) AS BIGINT) AS series_sum,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS matched_cents
        FROM seq q JOIN orders o ON q.n = o.o_orderkey"""))),

    // Recursive hierarchy walk: nation keys form an implicit binary tree
    // (parent = key DIV 2); every nation walks its ancestor chain to the
    // root, accumulating depth and path sum — the org-chart/BOM idiom.
    Q("sql_recursive_ancestors",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_n17_ra")
        s.sql(sql("""
          WITH RECURSIVE walk(start_key, cur, depth, path_sum) AS (
            SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
                   0, CAST(n_nationkey AS BIGINT)
            FROM graft_n17_ra
            UNION ALL
            SELECT start_key, cur DIV 2, depth + 1, path_sum + cur DIV 2
            FROM walk WHERE cur > 0)
          SELECT start_key,
                 CAST(max(depth) AS BIGINT) AS depth_to_root,
                 CAST(max(path_sum) AS BIGINT) AS path_sum
          FROM walk GROUP BY start_key"""))
      },
      Some(sql("""
        WITH RECURSIVE walk(start_key, cur, depth, path_sum) AS (
          SELECT CAST(n_nationkey AS BIGINT), CAST(n_nationkey AS BIGINT),
                 0, CAST(n_nationkey AS BIGINT)
          FROM nation
          UNION ALL
          SELECT start_key, cur // 2, depth + 1, path_sum + cur // 2
          FROM walk WHERE cur > 0)
        SELECT start_key,
               CAST(max(depth) AS BIGINT) AS depth_to_root,
               CAST(max(path_sum) AS BIGINT) AS path_sum
        FROM walk GROUP BY start_key"""))),

    // GROUP BY ALL: every non-aggregate select item becomes a group key.
    Q("sql_group_by_all",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o17_ga")
        s.sql(sql("""
          SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          FROM graft_o17_ga GROUP BY ALL"""))
      },
      Some(sql("""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY ALL"""))),

    // LATERAL correlated subquery: top-2 orders per customer, fully
    // deterministic (price DESC, key tiebreak). Spark decorrelates the
    // LIMIT-per-group into a ranked join rather than re-executing the
    // inner query per outer row.
    Q("sql_lateral_join",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o17_lj")
        table(s, d, "customer").createOrReplaceTempView("graft_c17_lj")
        s.sql(sql("""
          SELECT c.c_custkey, t.o_orderkey,
                 CAST(round(t.o_totalprice * 100) AS BIGINT) AS cents
          FROM graft_c17_lj c,
               LATERAL (SELECT o_orderkey, o_totalprice
                        FROM graft_o17_lj o
                        WHERE o.o_custkey = c.c_custkey
                        ORDER BY o_totalprice DESC, o_orderkey
                        LIMIT 2) t
          WHERE c.c_custkey <= 100"""))
      },
      Some(sql("""
        SELECT c.c_custkey, t.o_orderkey,
               CAST(round(t.o_totalprice * 100) AS BIGINT) AS cents
        FROM customer c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 2) t
        WHERE c.c_custkey <= 100""")))
  )
}
