package graft.queries

import graft.Engine.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Registry.sql

/** Reference-era SQL dialect surface, wave 2 — the HiveQL constructs the
  * Spark 1.3 fork parsed (reference sql/hive/.../HiveQl.scala): LATERAL
  * VIEW [OUTER] explode (Generate), SELECT TRANSFORM … USING
  * (ScriptTransformation — the operator behind Hive streaming scripts),
  * DISTRIBUTE BY / SORT BY / CLUSTER BY (repartition + per-partition
  * sort), TABLESAMPLE, and join strategy hints.
  *
  * Scale posture: LATERAL VIEW explode is a per-row generator inside the
  * scan stage (no shuffle); TRANSFORM streams rows through the child
  * process per partition (one pipe per task — the RDD.pipe shape);
  * DISTRIBUTE BY is one hash exchange + local sort (the write-side layout
  * primitive for sorted-run files); TABLESAMPLE pushes the Bernoulli
  * sample into the scan.
  */
object Sql2Queries {

  val all: Seq[Q] = Seq(

    // LATERAL VIEW explode (HiveQl generator syntax → Generate operator):
    // part names flattened to words, counted per brand. The OUTER variant
    // is proven by keeping rows whose filtered token list is empty.
    Q("sql_lateral_view",
      (s, d) => {
        table(s, d, "part").createOrReplaceTempView("graft_part_lv")
        s.sql(sql("""SELECT p_brand, w AS word, count(*) AS n
                     FROM graft_part_lv
                     LATERAL VIEW explode(split(p_name, ' ')) t AS w
                     WHERE w <> '' GROUP BY p_brand, w"""))
      },
      Some(sql("""SELECT p_brand, w AS word, CAST(count(*) AS BIGINT) AS n
                  FROM (SELECT p_brand, unnest(string_split(p_name, ' ')) AS w
                        FROM part)
                  WHERE w <> '' GROUP BY p_brand, w"""))),

    // LATERAL VIEW OUTER: generators yielding zero rows keep the parent
    // row with a NULL generator column (HiveQl.scala's `outer` flag —
    // Generate(outer=true)). Tokens longer than 8 chars are rare enough
    // that some suppliers produce an empty array.
    Q("sql_lateral_view_outer",
      (s, d) => {
        table(s, d, "supplier").createOrReplaceTempView("graft_supp_lv")
        s.sql(sql("""SELECT s_suppkey, w AS long_word
                     FROM graft_supp_lv
                     LATERAL VIEW OUTER explode(
                       filter(split(s_name, ' '), x -> length(x) > 8)) t AS w"""))
      },
      Some(sql("""SELECT s_suppkey, w AS long_word FROM (
                    SELECT s_suppkey,
                      list_filter(string_split(s_name, ' '), x -> length(x) > 8) AS ws
                    FROM supplier) LEFT JOIN LATERAL (SELECT unnest(ws) AS w) ON TRUE"""))),

    // SELECT TRANSFORM … USING 'cat' (ScriptTransformation, reference
    // sql/hive/.../ScriptTransformation.scala): rows stream tab-delimited
    // through an external process, one pipe per partition task — identity
    // script so both engines can compute the exact result. Output columns
    // come back as strings and are re-cast, proving the full serde
    // round-trip rather than a no-op.
    Q("sql_transform",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_nat_tr")
        s.sql(sql("""SELECT CAST(k AS BIGINT) AS n_nationkey, name AS n_name
                     FROM (SELECT TRANSFORM(n_nationkey, n_name) USING 'cat'
                             AS (k STRING, name STRING)
                           FROM graft_nat_tr)"""))
      },
      Some(sql("""SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
                  FROM nation"""))),

    // DISTRIBUTE BY + SORT BY (HiveQl's repartition/sort-within-partitions
    // clauses): the write-side layout primitive — one hash exchange on the
    // key, then a per-partition sort, never a global sort. Content is
    // partition-layout-invariant, so the oracle is the plain projection;
    // the physical shape (hash exchange + local sort, no global sort) is
    // asserted in PlanSpec.
    Q("sql_distribute_by",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_ord_db")
        s.sql(sql("""SELECT o_orderkey, o_custkey, o_totalprice
                     FROM graft_ord_db WHERE o_totalprice > 100000.0
                     DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderkey"""))
      },
      Some(sql("""SELECT o_orderkey, o_custkey, o_totalprice
                  FROM orders WHERE o_totalprice > 100000.0"""))),

    // CLUSTER BY = DISTRIBUTE BY + SORT BY on the same keys.
    Q("sql_cluster_by",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_cust_cb")
        s.sql(sql("""SELECT c_custkey, c_nationkey FROM graft_cust_cb
                     CLUSTER BY c_nationkey"""))
      },
      Some(sql("SELECT c_custkey, c_nationkey FROM customer"))),

    // TABLESAMPLE (30 PERCENT) REPEATABLE(42): Bernoulli sample pushed
    // into the scan (SampleExec over the relation). The drawn subset is
    // engine-specific, so the ORACLED contract is the pair of invariants
    // that characterize a correct seeded sample: REPEATABLE determinism
    // (two draws with the same seed are identical — EXCEPT empty both
    // ways) and the size landing inside loose Chernoff bounds for p=0.3.
    Q("sql_tablesample",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_ord_ts")
        s.sql(sql("""WITH s1 AS (SELECT o_orderkey
                       FROM graft_ord_ts TABLESAMPLE (30 PERCENT) REPEATABLE (42)),
                     s2 AS (SELECT o_orderkey
                       FROM graft_ord_ts TABLESAMPLE (30 PERCENT) REPEATABLE (42)),
                     tot AS (SELECT count(*) AS n FROM graft_ord_ts)
                     SELECT
                       (SELECT count(*) FROM (SELECT * FROM s1 EXCEPT SELECT * FROM s2))
                         + (SELECT count(*) FROM (SELECT * FROM s2 EXCEPT SELECT * FROM s1))
                         AS n_seed_diff,
                       (SELECT count(*) FROM s1) BETWEEN
                         CAST(0.10 * (SELECT n FROM tot) AS BIGINT) AND
                         CAST(0.50 * (SELECT n FROM tot) AS BIGINT) AS size_in_bounds"""))
      },
      Some(sql("SELECT CAST(0 AS BIGINT) AS n_seed_diff, TRUE AS size_in_bounds"))),

    // Join strategy hints (SELECT /*+ BROADCAST(n) */ …): the SQL-level
    // switch for the reference's BroadcastHashJoin vs ShuffledHashJoin
    // planner choice. Result is hint-invariant; PlanSpec asserts the
    // hinted plan actually broadcasts.
    Q("sql_join_hint",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_cust_jh")
        table(s, d, "nation").createOrReplaceTempView("graft_nat_jh")
        s.sql(sql("""SELECT /*+ BROADCAST(graft_nat_jh) */
                       n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
                     FROM graft_cust_jh JOIN graft_nat_jh ON c_nationkey = n_nationkey
                     GROUP BY n_name"""))
      },
      Some(sql("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust,
                    round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS total_bal
                  FROM customer JOIN nation ON c_nationkey = n_nationkey
                  GROUP BY n_name""")))
  )
}
