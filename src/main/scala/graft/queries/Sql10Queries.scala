package graft.queries

import graft.Engine.table
import Registry.sql

/** Golden-corpus semantics, wave 11 — optimizer-contract families from
  * the reference's golden corpus (sql/hive/compatibility/.../
  * HiveCompatibilitySuite.scala:246 whiteList; plus the subquery suites
  * under sql/core/src/test/):
  *
  * - the COUNT bug (subquery_in/subquery_exists suites; Kim 1982's
  *   classic decorrelation hazard): a correlated scalar `count(*)`
  *   subquery must return 0 — not NULL — for outer rows with no match.
  *   Naive decorrelation to a left-outer aggregate join yields NULL for
  *   the unmatched side; the planner must patch it with a coalesce over
  *   the join (Spark: the `cnt` handling in RewriteCorrelatedScalarSubquery).
  *   Pinned as a histogram over order counts so a NULL-vs-0 divergence
  *   changes the grouped result.
  *
  * - shared-scan correlation (golden correlationoptimizer1..15; the
  *   reference's Hive-era CorrelationOptimizer merged multiple
  *   aggregations over one table into one scan): the modern Spark
  *   spelling is exchange reuse — a CTE aggregated once and joined to
  *   itself must plan ONE aggregate subtree and a ReusedExchange for the
  *   second branch, not two scans of the fact table. At 100 TB the
  *   difference is reading the corpus once vs twice; PlanSpec asserts
  *   the ReusedExchange.
  *
  * - outer-join elimination (golden ppd_outer_join1..5 +
  *   louter_join_ppd): a WHERE predicate on the null-producing side that
  *   rejects NULL converts LEFT JOIN → INNER (EliminateOuterJoin), after
  *   which the predicate pushes below the join into the scan. The plan
  *   contract (inner join + PushedFilters on the orders scan) is the
  *   100 TB posture: an un-eliminated outer join can't push the filter
  *   and drags the full right side through the shuffle.
  *
  * - limit pushdown through UNION ALL (golden limit_pushdown.q): a
  *   LIMIT above a union plans a LocalLimit INSIDE each branch, so no
  *   branch materializes more than n rows before the global take. The
  *   observable is the exact row count; the plan shape is PlanSpec's.
  *
  * - ON-clause vs WHERE-clause outer-join filters (golden
  *   join_filters.q): the same predicate means different things on the
  *   two sides of the join boundary — pre-join right-side filter vs
  *   post-join row filter; both cardinalities pinned in one result.
  *
  * - listagg (Spark 4.0's ANSI ordered-set aggregate): string
  *   concatenation with an explicit WITHIN GROUP order — the
  *   deterministic spelling of Hive's collect_list+concat_ws golden
  *   idiom. DuckDB twin: string_agg(x, sep ORDER BY x).
  */
object Sql10Queries {

  val all: Seq[Q] = Seq(

    // The COUNT bug: customers with zero orders must land in the cnt=0
    // bucket (present in the histogram), not a NULL bucket. The
    // decorrelated plan is a left-outer aggregate join with the count
    // coalesced — never a per-row re-scan of orders.
    Q("sql_count_bug",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_c10")
        table(s, d, "orders").createOrReplaceTempView("graft_o10")
        s.sql("""SELECT cnt, count(*) AS n_cust
                 FROM (SELECT c_custkey,
                         (SELECT count(*) FROM graft_o10 o
                          WHERE o.o_custkey = c.c_custkey) AS cnt
                       FROM graft_c10 c)
                 GROUP BY cnt ORDER BY cnt""")
      },
      Some(sql("""SELECT cnt, count(*) AS n_cust
                  FROM (SELECT c_custkey,
                          (SELECT count(*) FROM orders o
                           WHERE o.o_custkey = c.c_custkey) AS cnt
                        FROM customer c)
                  GROUP BY cnt ORDER BY cnt"""))),

    // Shared-scan correlation: ONE aggregation CTE joined to itself on
    // the group key. Both branches are byte-identical subplans, so the
    // second must plan as ReusedExchange (asserted in PlanSpec) — the
    // fact table is scanned and aggregated ONCE. sum(n*n) over the
    // matched pairs pins that both branches carry the same counts.
    Q("sql_shared_scan",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o10s")
        s.sql("""WITH agg AS (SELECT o_custkey, count(*) AS n
                              FROM graft_o10s GROUP BY o_custkey)
                 SELECT count(*) AS n_keys,
                        CAST(sum(x.n * y.n) AS BIGINT) AS sum_nn
                 FROM agg x JOIN agg y ON x.o_custkey = y.o_custkey""")
      },
      Some(sql("""WITH agg AS MATERIALIZED
                    (SELECT o_custkey, count(*) AS n
                     FROM orders GROUP BY o_custkey)
                  SELECT count(*) AS n_keys,
                         CAST(sum(x.n * y.n) AS BIGINT) AS sum_nn
                  FROM agg x JOIN agg y ON x.o_custkey = y.o_custkey"""))),

    // Outer-join elimination: the WHERE o_orderstatus = 'F' predicate on
    // the null-producing side rejects NULL, so the LEFT JOIN must
    // degrade to INNER and the status filter must reach the orders
    // parquet scan (PlanSpec asserts both). A second, genuinely outer
    // branch (filter IS NULL on the right side) pins that elimination
    // does NOT fire when the predicate accepts NULL.
    Q("sql_outer_join_elim",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_c10p")
        table(s, d, "orders").createOrReplaceTempView("graft_o10p")
        s.sql("""SELECT 'eliminated' AS branch, count(*) AS n
                 FROM graft_c10p c LEFT JOIN graft_o10p o
                   ON o.o_custkey = c.c_custkey
                 WHERE o.o_orderstatus = 'F'
                 UNION ALL
                 SELECT 'kept_outer' AS branch, count(*) AS n
                 FROM graft_c10p c LEFT JOIN graft_o10p o
                   ON o.o_custkey = c.c_custkey
                 WHERE o.o_orderkey IS NULL""")
      },
      Some(sql("""SELECT 'eliminated' AS branch, count(*) AS n
                  FROM customer c LEFT JOIN orders o
                    ON o.o_custkey = c.c_custkey
                  WHERE o.o_orderstatus = 'F'
                  UNION ALL
                  SELECT 'kept_outer' AS branch, count(*) AS n
                  FROM customer c LEFT JOIN orders o
                    ON o.o_custkey = c.c_custkey
                  WHERE o.o_orderkey IS NULL"""))),

    // Limit pushdown through UNION ALL: the observable contract is the
    // exact global count (500 — both branches together far exceed it);
    // WHICH 500 rows is left to the engine, so only the count is
    // exposed. PlanSpec asserts a LocalLimit inside each union branch.
    Q("sql_limit_union",
      (s, d) => {
        table(s, d, "lineitem").createOrReplaceTempView("graft_li10")
        table(s, d, "orders").createOrReplaceTempView("graft_o10l")
        s.sql("""SELECT count(*) AS n FROM (
                   SELECT l_orderkey AS k FROM graft_li10
                   UNION ALL
                   SELECT o_orderkey AS k FROM graft_o10l
                   LIMIT 500)""")
      },
      Some(sql("""SELECT count(*) AS n FROM (
                    SELECT l_orderkey AS k FROM lineitem
                    UNION ALL
                    SELECT o_orderkey AS k FROM orders
                    LIMIT 500)"""))),

    // ON-clause vs WHERE-clause predicates on an outer join (golden
    // join_filters.q family): the SAME predicate placed in the ON
    // clause filters the RIGHT side BEFORE the join (every customer
    // row survives, unmatched ones null-extended), while in WHERE it
    // filters AFTER (unmatched rows die — the join collapses to
    // inner). The two branches must disagree on n_rows and agree on
    // n_matched — the asymmetry IS the semantic.
    Q("sql_outer_on_vs_where",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_c10w")
        table(s, d, "orders").createOrReplaceTempView("graft_o10w")
        s.sql("""SELECT 'on_clause' AS variant, count(*) AS n_rows,
                   count(o_orderkey) AS n_matched
                 FROM graft_c10w c LEFT JOIN graft_o10w o
                   ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                 UNION ALL
                 SELECT 'where_clause' AS variant, count(*) AS n_rows,
                   count(o_orderkey) AS n_matched
                 FROM graft_c10w c LEFT JOIN graft_o10w o
                   ON o.o_custkey = c.c_custkey
                 WHERE o.o_orderstatus = 'F'""")
      },
      Some(sql("""SELECT 'on_clause' AS variant, count(*) AS n_rows,
                    count(o_orderkey) AS n_matched
                  FROM customer c LEFT JOIN orders o
                    ON o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                  UNION ALL
                  SELECT 'where_clause' AS variant, count(*) AS n_rows,
                    count(o_orderkey) AS n_matched
                  FROM customer c LEFT JOIN orders o
                    ON o.o_custkey = c.c_custkey
                  WHERE o.o_orderstatus = 'F'"""))),

    // listagg WITHIN GROUP (ORDER BY ...): deterministic ordered string
    // aggregation per group — the ANSI spelling of the reference's
    // collect_list golden idiom, with the order made explicit so the
    // result hashes identically on any partitioning. Small group count
    // (region ⋈ nation: 5 × ≤25) keeps the strings bounded.
    Q("sql_listagg",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_n10")
        table(s, d, "region").createOrReplaceTempView("graft_r10")
        s.sql("""SELECT r.r_name,
                   listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                     AS nations
                 FROM graft_r10 r JOIN graft_n10 n
                   ON n.n_regionkey = r.r_regionkey
                 GROUP BY r.r_name ORDER BY r.r_name""")
      },
      Some(sql("""SELECT r.r_name,
                    string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations
                  FROM region r JOIN nation n
                    ON n.n_regionkey = r.r_regionkey
                  GROUP BY r.r_name ORDER BY r.r_name""")))
  )
}
