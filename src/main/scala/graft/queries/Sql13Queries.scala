package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.sql

/** Round-10 SQL wave 13 — golden families still uncrossed: NULL group
  * keys (golden nullgroup*, 76 files), nested-union flattening (golden
  * union_remove_*, the 1.3 CombineUnions rewrite — Optimizer.scala:48),
  * and the timestamp cast grid (golden timestamp_* family,
  * sql/catalyst/.../expressions/Cast.scala:28's second-precision
  * timestamp↔numeric contract).
  */
object Sql13Queries {

  val all: Seq[Q] = Seq(

    // NULL GROUP KEYS (golden nullgroup family): a NULL grouping key
    // forms its OWN group (unlike joins, where NULL matches nothing),
    // and the count family splits exactly there — count(*) counts the
    // group's rows, count(col) skips NULLs of the counted column,
    // count(DISTINCT col) likewise. The key NULLs every 7th customer,
    // the counted column NULLs every 3rd order.
    Q("sql_group_null_keys",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_ord_ng")
        s.sql(sql("""
          SELECT CASE WHEN o_custkey % 7 = 0 THEN CAST(NULL AS BIGINT)
                      ELSE o_custkey % 5 END AS grp,
                 count(*) AS n_rows,
                 count(CASE WHEN o_orderkey % 3 = 0 THEN CAST(NULL AS BIGINT)
                            ELSE o_orderkey END) AS n_nonnull,
                 count(DISTINCT CASE WHEN o_orderkey % 3 = 0 THEN CAST(NULL AS BIGINT)
                                     ELSE o_orderkey % 11 END) AS n_dist
          FROM graft_ord_ng
          GROUP BY 1 ORDER BY grp NULLS FIRST"""))
      },
      Some(sql("""SELECT CASE WHEN o_custkey % 7 = 0 THEN CAST(NULL AS BIGINT)
                         ELSE o_custkey % 5 END AS grp,
                    count(*) AS n_rows,
                    count(CASE WHEN o_orderkey % 3 = 0 THEN CAST(NULL AS BIGINT)
                               ELSE o_orderkey END) AS n_nonnull,
                    count(DISTINCT CASE WHEN o_orderkey % 3 = 0 THEN CAST(NULL AS BIGINT)
                                        ELSE o_orderkey % 11 END) AS n_dist
                  FROM orders
                  GROUP BY 1 ORDER BY grp NULLS FIRST"""))),

    // NESTED-UNION FLATTENING (golden union_remove / 1.3 CombineUnions):
    // a left-deep ((A ∪ B) ∪ C) ∪ D of four branch-tagged scans must
    // optimize to ONE n-ary Union feeding one aggregate — PlanSpec
    // asserts a single Union node; the result pins per-branch counts.
    Q("sql_union_flatten",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_nat_uf")
        s.sql(sql("""
          SELECT branch, count(*) AS n FROM (
            ((SELECT 'a' AS branch, n_nationkey FROM graft_nat_uf WHERE n_regionkey = 0
              UNION ALL
              SELECT 'b' AS branch, n_nationkey FROM graft_nat_uf WHERE n_regionkey = 1)
             UNION ALL
             SELECT 'c' AS branch, n_nationkey FROM graft_nat_uf WHERE n_regionkey = 2)
            UNION ALL
            SELECT 'd' AS branch, n_nationkey FROM graft_nat_uf WHERE n_regionkey > 2
          ) GROUP BY branch ORDER BY branch"""))
      },
      Some(sql("""SELECT branch, count(*) AS n FROM (
                    SELECT 'a' AS branch, n_nationkey FROM nation WHERE n_regionkey = 0
                    UNION ALL
                    SELECT 'b' AS branch, n_nationkey FROM nation WHERE n_regionkey = 1
                    UNION ALL
                    SELECT 'c' AS branch, n_nationkey FROM nation WHERE n_regionkey = 2
                    UNION ALL
                    SELECT 'd' AS branch, n_nationkey FROM nation WHERE n_regionkey > 2
                  ) GROUP BY branch ORDER BY branch"""))),

    // TIMESTAMP CAST GRID (golden timestamp_1..3 / Cast.scala): the
    // numeric faces of a timestamp — BIGINT cast truncates to SECONDS
    // (floor), DOUBLE cast keeps the fraction, INT→TIMESTAMP reads
    // seconds, string parse keeps microseconds, DATE→TIMESTAMP is
    // midnight — each rendered as exact epoch integers.
    Q("sql_timestamp_casts",
      (s, d) => {
        graft.Engine.events(s, d).createOrReplaceTempView("graft_ev_tc")
        s.sql(sql("""
          SELECT CAST(min(ts) AS BIGINT) AS ts_secs,
                 CAST(floor(CAST(min(ts) AS DOUBLE) * 1000000) AS BIGINT) AS ts_us_via_dbl,
                 unix_micros(CAST(1700000000 AS TIMESTAMP)) AS int_to_ts_us,
                 unix_micros(CAST('2024-03-01 12:34:56.123456' AS TIMESTAMP)) AS str_to_ts_us,
                 unix_micros(CAST(DATE '2024-03-01' AS TIMESTAMP)) AS date_to_ts_us
          FROM graft_ev_tc"""))
      },
      Some(sql("""SELECT CAST(epoch_us(min(ts)) // 1000000 AS BIGINT) AS ts_secs,
                    CAST(floor((epoch_us(min(ts)) / 1000000.0) * 1000000) AS BIGINT) AS ts_us_via_dbl,
                    epoch_us(to_timestamp(1700000000)) AS int_to_ts_us,
                    epoch_us(TIMESTAMP '2024-03-01 12:34:56.123456') AS str_to_ts_us,
                    epoch_us(CAST(DATE '2024-03-01' AS TIMESTAMP)) AS date_to_ts_us
                  FROM events""")))
  )
}
