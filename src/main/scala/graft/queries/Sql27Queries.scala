package graft.queries

import graft.Engine.table
import Registry.{dropManaged, sql}

/** Round-13 golden wave 12 — the predicate-pushdown grid and catalog
  * tail (reference HiveCompatibilitySuite.scala:246 whiteList; query
  * sources under ql/src/test/queries/clientpositive/):
  *
  *   - `lateral_view_ppd` / `push_or` / `ppd_random` (+ the ppd_*
  *     singles): parent-column predicates push below a LATERAL VIEW
  *     generator into the scan; OR-of-key predicates push; a
  *     NONDETERMINISTIC predicate (rand) must NOT push — evaluating it
  *     at the scan would re-draw per pushed row and change results.
  *     Plan side PlanSpec-fenced; this row pins the answers (the rand
  *     predicate is `rand(seed) < p_size + 2`, always true since
  *     p_size ≥ 1, so the result is deterministic while the plan still
  *     must keep it above the scan; the bound is data-dependent because
  *     Spark 4 constant-folds statically-decidable rand comparisons).
  *   - `default_partition_name` / `dynamic_partition_skip_default`:
  *     NULL dynamic-partition values land in the
  *     `__HIVE_DEFAULT_PARTITION__` directory and read back as NULL
  *     (prunable with IS NULL / IS NOT NULL).
  *   - `join_array` / `decimal_join` / `nullgroup4_multi_distinct`:
  *     ARRAY columns through FULL OUTER joins, decimal-arithmetic join
  *     keys (HIVE-5292), multi-DISTINCT aggregates over empty input.
  *   - `show_functions` / `show_tblproperties` /
  *     `desc_non_existent_tbl`: catalog introspection — SHOW FUNCTIONS
  *     LIKE, DESCRIBE FUNCTION, SHOW TBLPROPERTIES, and the error class
  *     for a missing table.
  */
object Sql27Queries {

  val all: Seq[Q] = Seq(

    // ── ppd grid: pushdown through generators, OR, and the rand fence ─
    Q("sql_ppd_grid",
      (s, d) => {
        table(s, d, "supplier").createOrReplaceTempView("graft_ppd_s")
        table(s, d, "part").createOrReplaceTempView("graft_ppd_p")
        s.sql(sql("""
          SELECT 'lv_ppd' AS tag, count(*) AS n
          FROM (SELECT s_suppkey, w FROM graft_ppd_s
                LATERAL VIEW explode(split(s_name, ' ')) t AS w
                WHERE s_suppkey <= 50 AND w <> '')
          UNION ALL
          SELECT 'push_or', count(*)
          FROM graft_ppd_p
          WHERE p_size = 5 OR p_size = 10
          UNION ALL
          SELECT 'rand_true', count(*)
          FROM graft_ppd_p
          WHERE rand(7) < CAST(p_size AS DOUBLE) + 2.0 AND p_size > 10"""))
      },
      Some(sql("""
        SELECT 'lv_ppd' AS tag, count(*) AS n
        FROM (SELECT s_suppkey, unnest(string_split(s_name, ' ')) AS w
              FROM supplier WHERE s_suppkey <= 50)
        WHERE w <> ''
        UNION ALL
        SELECT 'push_or', count(*) FROM part WHERE p_size = 5 OR p_size = 10
        UNION ALL
        SELECT 'rand_true', count(*) FROM part WHERE p_size > 10"""))),

    // ── NULL dynamic partitions → __HIVE_DEFAULT_PARTITION__ ──────────
    Q("sql_null_partition_default",
      (s, d) => {
        dropManaged(s, "graft_npd")
        table(s, d, "customer").createOrReplaceTempView("graft_npd_src")
        s.sql(sql("""CREATE TABLE graft_npd (k BIGINT)
                     USING parquet PARTITIONED BY (seg STRING)"""))
        // every 7th key writes a NULL partition value
        s.sql(sql("""INSERT OVERWRITE TABLE graft_npd PARTITION (seg)
                     SELECT c_custkey,
                            CASE WHEN c_custkey % 7 = 0 THEN NULL
                                 ELSE c_mktsegment END
                     FROM graft_npd_src"""))
        val sq = s; import sq.implicits._
        val parts = s.sql("SHOW PARTITIONS graft_npd").as[String].collect()
        val hasDefault =
          parts.exists(_.contains("__HIVE_DEFAULT_PARTITION__"))
        val nullRows = s.sql(
          "SELECT count(*) FROM graft_npd WHERE seg IS NULL")
          .collect()(0).getLong(0)
        val notNull = s.sql(
          "SELECT count(*) FROM graft_npd WHERE seg IS NOT NULL")
          .collect()(0).getLong(0)
        Seq(("partitions", parts.length.toLong),
          ("has_default_dir", if (hasDefault) 1L else 0L),
          ("null_rows", nullRows), ("not_null_rows", notNull))
          .toDF("metric", "value")
      },
      Some(sql("""
        SELECT 'partitions' AS metric,
               (SELECT count(DISTINCT CASE WHEN c_custkey % 7 = 0 THEN 'null'
                                           ELSE c_mktsegment END)
                FROM customer) AS value
        UNION ALL SELECT 'has_default_dir', 1
        UNION ALL SELECT 'null_rows',
          (SELECT count(*) FROM customer WHERE c_custkey % 7 = 0)
        UNION ALL SELECT 'not_null_rows',
          (SELECT count(*) FROM customer WHERE c_custkey % 7 <> 0)"""))),

    // ── join_array / decimal_join / nullgroup4_multi_distinct ─────────
    // Three one-file stragglers in one grid: an ARRAY column rides a
    // FULL OUTER join (NULL-extended to a NULL list, never an empty
    // one); a join keyed on DECIMAL ARITHMETIC (a.k = b.k + 10,
    // HIVE-5292's class — precision-promoted equality; both sides
    // pre-DISTINCTed to the bounded size domain — the raw self-join is
    // a quadratic many-to-many on a 50-value key, the jn_nullsafe
    // scale-killer class); and multiple
    // count(DISTINCT) over EMPTY input (global agg yields the one
    // all-zeros row).
    Q("jn_misc_grid",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_jm_c")
        table(s, d, "supplier").createOrReplaceTempView("graft_jm_s")
        table(s, d, "part").createOrReplaceTempView("graft_jm_p")
        table(s, d, "orders").createOrReplaceTempView("graft_jm_o")
        s.sql(sql("""
          SELECT 'array_fo' AS tag, count(*) AS n,
                 CAST(sum(CASE WHEN blist IS NULL THEN -1
                               ELSE size(blist) END) AS BIGINT) AS chk
          FROM (SELECT c_custkey AS a FROM graft_jm_c WHERE c_custkey <= 15) x
          FULL OUTER JOIN
               (SELECT s_suppkey AS a, split(s_name, ' ') AS blist
                FROM graft_jm_s WHERE s_suppkey BETWEEN 10 AND 25) y
          ON x.a = y.a
          UNION ALL
          SELECT 'decimal_arith_key', count(*),
                 CAST(sum(CAST(ka AS BIGINT)) AS BIGINT)
          FROM (SELECT DISTINCT CAST(p_size AS DECIMAL(6,2)) AS ka
                FROM graft_jm_p) a
          JOIN (SELECT DISTINCT CAST(p_size AS DECIMAL(6,2)) AS kb
                FROM graft_jm_p) b
          ON a.ka = b.kb + 10
          UNION ALL
          SELECT 'multi_distinct_empty', count(*),
                 CAST(sum(c1 * 100 + c2 * 10 + c3) AS BIGINT)
          FROM (SELECT count(1) AS c1, count(DISTINCT o_orderstatus) AS c2,
                       count(DISTINCT substr(o_orderpriority, 1, 1)) AS c3
                FROM graft_jm_o WHERE o_orderkey = -1)"""))
      },
      Some(sql("""
        SELECT 'array_fo' AS tag, count(*) AS n,
               CAST(sum(CASE WHEN blist IS NULL THEN -1
                             ELSE len(blist) END) AS BIGINT) AS chk
        FROM (SELECT c_custkey AS a FROM customer WHERE c_custkey <= 15) x
        FULL OUTER JOIN
             (SELECT s_suppkey AS a, string_split(s_name, ' ') AS blist
              FROM supplier WHERE s_suppkey BETWEEN 10 AND 25) y
        ON x.a = y.a
        UNION ALL
        SELECT 'decimal_arith_key', count(*),
               CAST(sum(CAST(ka AS BIGINT)) AS BIGINT)
        FROM (SELECT DISTINCT CAST(p_size AS DECIMAL(6,2)) AS ka FROM part) a
        JOIN (SELECT DISTINCT CAST(p_size AS DECIMAL(6,2)) AS kb FROM part) b
        ON a.ka = b.kb + 10
        UNION ALL
        SELECT 'multi_distinct_empty', count(*),
               CAST(sum(c1 * 100 + c2 * 10 + c3) AS BIGINT)
        FROM (SELECT count(1) AS c1, count(DISTINCT o_orderstatus) AS c2,
                     count(DISTINCT substr(o_orderpriority, 1, 1)) AS c3
              FROM orders WHERE o_orderkey = -1)"""))),

    // ── catalog introspection tail ────────────────────────────────────
    Q("sql_show_catalog_grid",
      (s, d) => {
        dropManaged(s, "graft_stp")
        s.sql(sql("""CREATE TABLE graft_stp (k BIGINT) USING parquet
                     TBLPROPERTIES ('tier' = 'gold', 'team' = 'graft')"""))
        val sq = s; import sq.implicits._
        val fnXpath = s.sql("SHOW FUNCTIONS LIKE 'xpath*'").count()
        val descAbs = s.sql("DESCRIBE FUNCTION abs")
          .as[String].collect().mkString(" ")
        val props = s.sql("SHOW TBLPROPERTIES graft_stp")
          .as[(String, String)].collect().toMap
        val missingErr =
          try { s.sql("DESCRIBE TABLE graft_no_such_table").collect(); "none" }
          catch { case e: org.apache.spark.sql.AnalysisException =>
            e.getCondition }
        Seq(("xpath_fn_count", fnXpath.toString),
          ("desc_abs_names_abs", descAbs.contains("abs").toString),
          ("tier_prop", props.getOrElse("tier", "")),
          ("team_prop", props.getOrElse("team", "")),
          ("missing_table_error", missingErr))
          .toDF("metric", "value")
      },
      // Spark 4 ships exactly 9 xpath_* functions (xpath + 8 typed).
      Some(sql("""
        SELECT 'xpath_fn_count' AS metric, '9' AS value
        UNION ALL SELECT 'desc_abs_names_abs', 'true'
        UNION ALL SELECT 'tier_prop', 'gold'
        UNION ALL SELECT 'team_prop', 'graft'
        UNION ALL SELECT 'missing_table_error', 'TABLE_OR_VIEW_NOT_FOUND'""")))
  )
}
