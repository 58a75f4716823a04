package graft.queries

import graft.Engine.table
import Registry.sql

/** Round-11 SQL wave 17 — deep recursion. sql_recursive_cte (series) and
  * sql_recursive_transitive (graph closure) pin the WITH RECURSIVE
  * surface inside Spark's DEFAULT 100-level budget; this wave pins the
  * governed path past it: a 500-step fixpoint under an explicit
  * `MAX RECURSION LEVEL` clause (Spark's per-CTE override of
  * spark.sql.cteRecursionLevelLimit — without it the same query fails
  * with RECURSION_LEVEL_LIMIT_EXCEEDED, which is the 100 TB safety
  * contract: unbounded recursion must be an explicit opt-in, not a
  * default). DuckDB needs no clause (its recursion is row-bounded), so
  * the oracle spells the plain form.
  */
object Sql17Queries {

  val all: Seq[Q] = Seq(

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
        FROM seq q JOIN orders o ON q.n = o.o_orderkey""")))
  )
}
