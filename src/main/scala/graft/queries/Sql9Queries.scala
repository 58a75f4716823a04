package graft.queries

import graft.Engine.table
import Registry.sql

/** Golden-corpus semantics, wave 10 — the date-arithmetic and semi-join
  * rewrite families from the reference's golden corpus
  * (sql/hive/compatibility/.../HiveCompatibilitySuite.scala:246 whiteList;
  * query sources under sql/hive/src/test/resources/ql/src/test/queries/
  * clientpositive/):
  *
  * - date_comparison.q + date_1.q..date_4.q: DATE literals, the full
  *   comparison operator grid on equal and differing dates, the valid-cast
  *   square (string→date, date→string, date→timestamp, timestamp→date —
  *   a midday timestamp TRUNCATES to its date), and date functions
  *   (date±days, add_months with end-of-month CLAMP, last_day, datediff).
  *   The reference era could only reach these via Cast+DateUtils; Spark 4
  *   has the whole surface natively, and every function here is a codegen
  *   scan-stage expression — date arithmetic at 100 TB stays inside
  *   whole-stage codegen with filters still pushed to parquet.
  *
  * - date_join1.q: a DATE column as an equi-join key; duplicate dates on
  *   both sides must multiply (the golden file's "2 rows with date
  *   2000-11-28 → 4 join rows" point), pinned here by joining two
  *   differently-filtered derivations of orders on o_orderdate and
  *   aggregating the matched cardinality per year.
  *
  * - semijoin.q: the EXISTS / IN / NOT EXISTS → LeftSemi/LeftAnti rewrite
  *   family (the golden file's LEFT SEMI JOIN spellings predate Spark's
  *   subquery decorrelation; modern SQL reaches the same plans through
  *   predicate subqueries). Four variants in one result: plain EXISTS,
  *   IN, EXISTS with an extra NON-equi conjunct (the golden `b.value <
  *   "val_10"` shape — the extra predicate must stay inside the semi-join
  *   condition, not become a post-filter), and NOT EXISTS. PlanSpec
  *   asserts the join types (LeftSemi ×3, LeftAnti) — at 100 TB a semi
  *   join that degrades to inner-join + distinct re-shuffles the fact
  *   table; the rewrite IS the scale contract.
  */
object Sql9Queries {

  val all: Seq[Q] = Seq(

    // date_comparison.q + date_1.q "valid casts" / literal-comparison
    // rows, as one boolean truth table (booleans cast to INT so both
    // engines hash identically). Pure literal plan — LocalRelation,
    // zero scans.
    Q("sql_date_compare",
      (s, d) => s.sql("""SELECT
          CAST(DATE '2011-05-06' >  DATE '2011-05-06' AS INT) AS gt_same,
          CAST(DATE '2011-05-06' <  DATE '2011-05-06' AS INT) AS lt_same,
          CAST(DATE '2011-05-06' =  DATE '2011-05-06' AS INT) AS eq_same,
          CAST(DATE '2011-05-06' <> DATE '2011-05-06' AS INT) AS ne_same,
          CAST(DATE '2011-05-06' >= DATE '2011-05-06' AS INT) AS ge_same,
          CAST(DATE '2011-05-06' <= DATE '2011-05-06' AS INT) AS le_same,
          CAST(DATE '2011-05-05' >  DATE '2011-05-06' AS INT) AS gt_diff,
          CAST(DATE '2011-05-05' <  DATE '2011-05-06' AS INT) AS lt_diff,
          CAST(DATE '2011-05-05' =  DATE '2011-05-06' AS INT) AS eq_diff,
          CAST(DATE '2011-05-05' <> DATE '2011-05-06' AS INT) AS ne_diff,
          CAST(CAST('2011-01-01' AS DATE) = DATE '2011-01-01' AS INT) AS cast_eq,
          CAST(CAST(CAST('2011-01-01 12:13:14' AS TIMESTAMP) AS DATE)
               = DATE '2011-01-01' AS INT) AS ts_trunc_eq,
          CAST(CAST(DATE '2011-01-01' AS STRING) = '2011-01-01' AS INT) AS str_eq,
          CAST(CAST(DATE '2001-01-31' AS TIMESTAMP) AS STRING) AS ts_render,
          CAST(CAST('2011-13-40' AS DATE) IS NULL AS INT) AS bad_date_null"""),
      Some(sql("""SELECT
          CAST(DATE '2011-05-06' >  DATE '2011-05-06' AS INT) AS gt_same,
          CAST(DATE '2011-05-06' <  DATE '2011-05-06' AS INT) AS lt_same,
          CAST(DATE '2011-05-06' =  DATE '2011-05-06' AS INT) AS eq_same,
          CAST(DATE '2011-05-06' <> DATE '2011-05-06' AS INT) AS ne_same,
          CAST(DATE '2011-05-06' >= DATE '2011-05-06' AS INT) AS ge_same,
          CAST(DATE '2011-05-06' <= DATE '2011-05-06' AS INT) AS le_same,
          CAST(DATE '2011-05-05' >  DATE '2011-05-06' AS INT) AS gt_diff,
          CAST(DATE '2011-05-05' <  DATE '2011-05-06' AS INT) AS lt_diff,
          CAST(DATE '2011-05-05' =  DATE '2011-05-06' AS INT) AS eq_diff,
          CAST(DATE '2011-05-05' <> DATE '2011-05-06' AS INT) AS ne_diff,
          CAST(CAST('2011-01-01' AS DATE) = DATE '2011-01-01' AS INT) AS cast_eq,
          CAST(CAST(CAST('2011-01-01 12:13:14' AS TIMESTAMP) AS DATE)
               = DATE '2011-01-01' AS INT) AS ts_trunc_eq,
          CAST(CAST(DATE '2011-01-01' AS VARCHAR) = '2011-01-01' AS INT) AS str_eq,
          CAST(CAST(DATE '2001-01-31' AS TIMESTAMP) AS VARCHAR) AS ts_render,
          CAST(TRY_CAST('2011-13-40' AS DATE) IS NULL AS INT) AS bad_date_null"""))),

    // date_1..date_4 function surface over a real DATE column, grouped so
    // the oracle pins per-year values: date+days, add_months (with its
    // end-of-month clamp exercised by real month-end order dates),
    // last_day, datediff against a fixed anchor. Dates render identically
    // ('yyyy-MM-dd') in both engines, so min/max dates travel as strings.
    Q("sql_date_arith",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_ord9")
        s.sql("""SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                   count(*) AS n,
                   CAST(sum(datediff(DATE '1999-01-01', o_orderdate)) AS BIGINT) AS sum_dd,
                   CAST(min(date_add(o_orderdate, 90)) AS STRING) AS min_plus90,
                   CAST(max(add_months(o_orderdate, 3)) AS STRING) AS max_plus3m,
                   CAST(max(last_day(o_orderdate)) AS STRING) AS max_eom
                 FROM graft_ord9 GROUP BY 1""")
      },
      // the oracle casts o_orderdate (TIMESTAMP in DuckDB's parquet
      // read) to DATE explicitly; Spark's date functions do the same
      // truncation implicitly
      Some(sql("""SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS y,
                    count(*) AS n,
                    CAST(sum(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')) AS BIGINT) AS sum_dd,
                    CAST(min(CAST(o_orderdate AS DATE) + 90) AS VARCHAR) AS min_plus90,
                    CAST(max(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)) AS VARCHAR) AS max_plus3m,
                    CAST(max(last_day(CAST(o_orderdate AS DATE))) AS VARCHAR) AS max_eom
                  FROM orders GROUP BY 1"""))),

    // date_join1.q: DATE as an equi-join key, duplicate dates multiplying
    // on both sides; the per-year matched cardinality + key checksum pin
    // the quadratic-per-date semantics without depending on row order.
    Q("sql_date_join",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_ord9j")
        s.sql("""SELECT CAST(year(t1.o_orderdate) AS BIGINT) AS y,
                   count(*) AS n,
                   CAST(sum(t1.o_orderkey + t2.o_orderkey) AS BIGINT) AS key_sum
                 FROM (SELECT o_orderkey, o_orderdate FROM graft_ord9j
                       WHERE o_orderpriority = '1-URGENT') t1
                 JOIN (SELECT o_orderkey, o_orderdate FROM graft_ord9j
                       WHERE o_orderstatus = 'F') t2
                   ON t1.o_orderdate = t2.o_orderdate
                 GROUP BY 1""")
      },
      Some(sql("""SELECT CAST(year(t1.o_orderdate) AS BIGINT) AS y,
                    count(*) AS n,
                    CAST(sum(t1.o_orderkey + t2.o_orderkey) AS BIGINT) AS key_sum
                  FROM (SELECT o_orderkey, o_orderdate FROM orders
                        WHERE o_orderpriority = '1-URGENT') t1
                  JOIN (SELECT o_orderkey, o_orderdate FROM orders
                        WHERE o_orderstatus = 'F') t2
                    ON t1.o_orderdate = t2.o_orderdate
                  GROUP BY 1"""))),

    // semijoin.q: the four predicate-subquery spellings and their planned
    // join types (PlanSpec: LeftSemi for exists/in/exists_extra, LeftAnti
    // for not_exists). Each variant is a global aggregate, so the result
    // shape is stable (4 rows) at every SF; sum(c_custkey) checksums the
    // surviving set. The exists_extra variant carries a non-equi conjunct
    // referencing BOTH sides — it must ride inside the semi-join
    // condition, not filter a materialized inner join.
    Q("sql_semijoin",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_cust9")
        table(s, d, "orders").createOrReplaceTempView("graft_ord9s")
        s.sql("""SELECT 'exists' AS variant, count(*) AS n,
                   CAST(sum(c_custkey) AS BIGINT) AS key_sum
                 FROM graft_cust9 c
                 WHERE EXISTS (SELECT 1 FROM graft_ord9s o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_orderpriority = '1-URGENT')
                 UNION ALL
                 SELECT 'in', count(*), CAST(sum(c_custkey) AS BIGINT)
                 FROM graft_cust9 c
                 WHERE c.c_custkey IN (SELECT o_custkey FROM graft_ord9s
                                       WHERE o_totalprice > 150000)
                 UNION ALL
                 SELECT 'exists_extra', count(*), CAST(sum(c_custkey) AS BIGINT)
                 FROM graft_cust9 c
                 WHERE EXISTS (SELECT 1 FROM graft_ord9s o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_totalprice > c.c_acctbal * 10)
                 UNION ALL
                 SELECT 'not_exists', count(*), CAST(sum(c_custkey) AS BIGINT)
                 FROM graft_cust9 c
                 WHERE NOT EXISTS (SELECT 1 FROM graft_ord9s o
                                   WHERE o.o_custkey = c.c_custkey)""")
      },
      Some(sql("""SELECT 'exists' AS variant, count(*) AS n,
                    CAST(sum(c_custkey) AS BIGINT) AS key_sum
                  FROM customer c
                  WHERE EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c.c_custkey
                                  AND o.o_orderpriority = '1-URGENT')
                  UNION ALL
                  SELECT 'in', count(*), CAST(sum(c_custkey) AS BIGINT)
                  FROM customer c
                  WHERE c.c_custkey IN (SELECT o_custkey FROM orders
                                        WHERE o_totalprice > 150000)
                  UNION ALL
                  SELECT 'exists_extra', count(*), CAST(sum(c_custkey) AS BIGINT)
                  FROM customer c
                  WHERE EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c.c_custkey
                                  AND o.o_totalprice > c.c_acctbal * 10)
                  UNION ALL
                  SELECT 'not_exists', count(*), CAST(sum(c_custkey) AS BIGINT)
                  FROM customer c
                  WHERE NOT EXISTS (SELECT 1 FROM orders o
                                    WHERE o.o_custkey = c.c_custkey)""")))
  )
}
