package graft.queries

import graft.Engine.table
import org.apache.spark.sql.SparkSession
import Registry.{dropManaged, sql}

/** Round-13 golden wave 3 — the null-group, date-function, insert-
  * overwrite-partition, misc-scalar-UDF, and join-filter-propagation
  * families:
  *
  *   - `nullgroup`/`nullgroup2`/`nullgroup3`/`nullgroup4` (~70 golden
  *     files): aggregation over EMPTY and ALL-NULL inputs — global aggs
  *     over an empty relation return exactly one row (count 0, sum/min
  *     NULL), GROUPED aggs over it return zero rows, an all-NULL key
  *     forms exactly one group, and count(*) vs count(col) vs
  *     count(DISTINCT col) diverge on NULLs.
  *   - `date_udf`/`date_1`/`date_comparison` residue (65 files): the
  *     DATE twin of the ts_* grid — field extraction, month arithmetic
  *     with end-of-month CLAMPING (Jan 31 + 1 month = Feb 29), last_day,
  *     ISO week at year boundaries.
  *   - `insert2_overwrite_partitions` (16 files): INSERT OVERWRITE of
  *     ONE partition replaces exactly that partition and leaves the
  *     others untouched.
  *   - `udf_pmod`/`udf_find_in_set`/`udf_to_float`/`udf_to_double`
  *     (~80 files): scalar grids with cross-engine spellings pinned in
  *     the oracle (pmod = ((a%b)+b)%b, find_in_set = list_position over
  *     string_split, greatest/least skip NULLs on BOTH engines).
  *   - `ppd_join_filter` (16 files): a filter on ONE join side must
  *     propagate through the equi-join to the OTHER side's scan
  *     (constraint inference → PushedFilters on both scans;
  *     PlanSpec-fenced).
  */
object Sql21Queries {

  /** The nullgroup probe body — scalar subqueries over an EMPTY slice
    * (`1 = 0`) and an all-NULL-key slice, identical text both engines. */
  private def ngBody(cust: String): String = s"""
    WITH e AS (SELECT c_custkey AS k, c_acctbal AS v FROM $cust WHERE 1 = 0),
         ng AS (SELECT CAST(NULL AS BIGINT) AS k, c_acctbal AS v
                FROM $cust WHERE c_custkey <= 100)
    SELECT
      (SELECT count(*) FROM e) AS empty_count,
      (SELECT sum(v) FROM e) AS empty_sum,
      (SELECT min(v) FROM e) AS empty_min,
      (SELECT count(*) FROM (SELECT k FROM e GROUP BY k) t) AS empty_groups,
      (SELECT count(*) FROM (SELECT k FROM ng GROUP BY k) t) AS nullkey_groups,
      (SELECT count(*) FROM ng) AS nullkey_rows,
      (SELECT count(k) FROM ng) AS count_k,
      (SELECT count(DISTINCT k) FROM ng) AS count_distinct_k"""

  private val dateGrid = Seq(
    "2024-01-31", "2024-02-29", "2023-02-28", "2021-01-01",
    "2020-12-31", "1969-07-20")
  private def sparkDates = dateGrid.map(s => s"('$s')").mkString(", ")
  private def duckDates = s"(VALUES ${dateGrid.map(s => s"('$s')").mkString(", ")})"

  val all: Seq[Q] = Seq(

    // nullgroup grid: one row of scalar probes over an empty relation
    // and an all-NULL-key slice — identical text on both engines.
    Q("agg_nullgroup_grid",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_ng_c")
        s.sql(sql(ngBody("graft_ng_c")))
      },
      Some(sql(ngBody("customer")))),

    // DATE field/arithmetic grid (the ts_fields twin on DATE literals,
    // including the leap-day clamp and ISO-week year-boundary rows).
    Q("date_fields_grid",
      (s, _) => s.sql(sql(s"""
        SELECT s, year(dt) AS y, quarter(dt) AS q, month(dt) AS mo,
               day(dt) AS dd, dayofweek(dt) AS dw, weekofyear(dt) AS wy,
               dayofyear(dt) AS dy,
               CAST(add_months(dt, 1) AS STRING) AS plus_month,
               CAST(last_day(dt) AS STRING) AS month_end,
               datediff(DATE '2025-01-01', dt) AS days_to
        FROM (SELECT s, CAST(s AS DATE) AS dt FROM VALUES $sparkDates v(s))""")),
      Some(sql(s"""
        SELECT s, CAST(year(dt) AS INT) AS y, CAST(quarter(dt) AS INT) AS q,
               CAST(month(dt) AS INT) AS mo, CAST(day(dt) AS INT) AS dd,
               CAST(dayofweek(dt) + 1 AS INT) AS dw,
               CAST(weekofyear(dt) AS INT) AS wy,
               CAST(dayofyear(dt) AS INT) AS dy,
               CAST(CAST(dt + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS plus_month,
               CAST(last_day(dt) AS VARCHAR) AS month_end,
               CAST(datediff('day', dt, DATE '2025-01-01') AS INT) AS days_to
        FROM (SELECT s, CAST(s AS DATE) AS dt FROM $duckDates v(s))"""))),

    // INSERT OVERWRITE PARTITION: only the named partition is replaced.
    Q("sql_insert_overwrite_partition",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_iop_src")
        dropManaged(s, "graft_iop")
        s.sql("CREATE TABLE graft_iop (k BIGINT) USING parquet PARTITIONED BY (st STRING)")
        Seq("F", "O").foreach { st =>
          s.sql(sql(s"""INSERT INTO graft_iop PARTITION (st='$st')
                        SELECT o_orderkey FROM graft_iop_src
                        WHERE o_orderstatus = '$st'"""))
        }
        // overwrite ONLY st='O' with its keys-below-100 subset
        s.sql(sql("""INSERT OVERWRITE TABLE graft_iop PARTITION (st='O')
                     SELECT o_orderkey FROM graft_iop_src
                     WHERE o_orderstatus = 'O' AND o_orderkey < 100"""))
        s.sql(sql("""SELECT st, count(*) AS n, CAST(sum(k) AS BIGINT) AS ksum
                     FROM graft_iop GROUP BY st"""))
      },
      Some(sql("""
        SELECT 'F' AS st, count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS ksum
        FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT 'O', count(*), CAST(sum(o_orderkey) AS BIGINT)
        FROM orders WHERE o_orderstatus = 'O' AND o_orderkey < 100"""))),

    // Misc scalar grid: pmod (sign-correct modulo), find_in_set,
    // to-float/double casts, greatest/least NULL-skipping.
    Q("expr_misc_udfs",
      (s, _) => s.sql(sql("""
        SELECT pmod(-7, 3) AS pm_neg, pmod(7, 3) AS pm_pos,
               find_in_set('b', 'a,b,c') AS fis_hit,
               find_in_set('x', 'a,b,c') AS fis_miss,
               CAST('3.5' AS FLOAT) AS f, CAST('2.25' AS DOUBLE) AS dbl,
               greatest(1, CAST(NULL AS INT), 3) AS gr,
               least(CAST(NULL AS INT), 2) AS le""")),
      Some(sql("""
        SELECT CAST(((-7 % 3) + 3) % 3 AS INT) AS pm_neg,
               CAST(((7 % 3) + 3) % 3 AS INT) AS pm_pos,
               CAST(coalesce(list_position(string_split('a,b,c', ','), 'b'), 0)
                    AS INT) AS fis_hit,
               CAST(coalesce(list_position(string_split('a,b,c', ','), 'x'), 0)
                    AS INT) AS fis_miss,
               CAST('3.5' AS FLOAT) AS f, CAST('2.25' AS DOUBLE) AS dbl,
               greatest(1, CAST(NULL AS INT), 3) AS gr,
               least(CAST(NULL AS INT), 2) AS le"""))),

    // ppd_join_filter: the c-side key filter must reach the ORDERS scan
    // too (constraint inference through the equi-join; PlanSpec pins
    // LessThan(o_custkey) in the orders scan's PushedFilters).
    Q("sql_ppd_join_filter",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_pjf_o")
        table(s, d, "customer").createOrReplaceTempView("graft_pjf_c")
        s.sql(sql("""
          SELECT c.c_mktsegment AS seg, count(*) AS n
          FROM graft_pjf_o o JOIN graft_pjf_c c ON o.o_custkey = c.c_custkey
          WHERE c.c_custkey < 100
          GROUP BY c.c_mktsegment"""))
      },
      Some(sql("""
        SELECT c.c_mktsegment AS seg, count(*) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE c.c_custkey < 100
        GROUP BY c.c_mktsegment"""))),

    // groupby_position golden family (14 files): GROUP BY / ORDER BY by
    // ordinal, including the REORDERED `GROUP BY 2, 1` and a
    // count(DISTINCT substr(...)) aggregate — ordinals must bind to the
    // SELECT list positions, not the scan order.
    Q("sql_groupby_ordinal",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_gbo_c")
        s.sql(sql("""
          SELECT c_mktsegment AS seg, c_nationkey % 5 AS ng,
                 count(DISTINCT substr(c_name, -2)) AS n_suffixes, count(*) AS n
          FROM graft_gbo_c WHERE c_custkey < 500
          GROUP BY 2, 1 ORDER BY 1, 2"""))
      },
      Some(sql("""
        SELECT c_mktsegment AS seg, c_nationkey % 5 AS ng,
               count(DISTINCT substr(c_name, -2)) AS n_suffixes, count(*) AS n
        FROM customer WHERE c_custkey < 500
        GROUP BY 2, 1 ORDER BY 1, 2"""))),

    // view golden family (24 files): layered views — a view over a join,
    // a second view over the first with an aggregation, and a third with
    // ORDER BY + LIMIT baked into the definition (the top-k must be
    // evaluated INSIDE the view).
    Q("sql_view_layers",
      (s, d) => {
        Seq("graft_vl3", "graft_vl2", "graft_vl1").foreach { v =>
          s.sql(s"DROP VIEW IF EXISTS $v")
        }
        s.sql(sql(s"""CREATE VIEW graft_vl1 AS
                      SELECT o.o_custkey AS k, c.c_mktsegment AS seg,
                             o.o_totalprice AS price
                      FROM parquet.`$d/orders.parquet` o
                      JOIN parquet.`$d/customer.parquet` c
                        ON o.o_custkey = c.c_custkey"""))
        s.sql(sql("""CREATE VIEW graft_vl2 AS
                     SELECT seg, count(*) AS n,
                            CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
                              AS cents
                     FROM graft_vl1 GROUP BY seg"""))
        s.sql(sql("""CREATE VIEW graft_vl3 AS
                     SELECT seg, n, cents FROM graft_vl2
                     ORDER BY cents DESC, seg LIMIT 3"""))
        s.sql("SELECT seg, n, cents FROM graft_vl3")
      },
      Some(sql("""
        WITH vl1 AS (SELECT o.o_custkey AS k, c.c_mktsegment AS seg,
                            o.o_totalprice AS price
                     FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
             vl2 AS (SELECT seg, count(*) AS n,
                            CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
                              AS cents
                     FROM vl1 GROUP BY seg)
        SELECT seg, n, cents FROM vl2 ORDER BY cents DESC, seg LIMIT 3""")))
  )
}
