package graft.queries

import graft.Engine.table
import Registry.sql

/** Golden-corpus semantics, wave 5 — the HiveQL/ANSI corners migrating
  * users actually trip on, from the reference's 7,448-file golden corpus
  * (sql/hive/compatibility/.../HiveCompatibilitySuite.scala:246
  * whiteList):
  *
  * - ppd_outer_join* family: predicate PLACEMENT on outer joins. A
  *   filter in ON on the null-supplemented side restricts the MATCH but
  *   keeps unmatched rows; the same filter in WHERE rejects the
  *   null-padded rows and silently degrades the join to inner. A WHERE
  *   filter on the preserved side is pushable and keeps the join outer.
  *   One query declares all the variants side by side so the engine's
  *   pushdown rules are pinned against the ANSI answer.
  *
  * - union* family: multi-branch UNION type coercion — INT, BIGINT,
  *   DECIMAL and DOUBLE branches must widen to one common type with
  *   values preserved (HiveTypeCoercion.WidenTypes in the reference,
  *   catalyst/analysis/HiveTypeCoercion.scala).
  *
  * - semijoin/not_in family: NOT IN versus NOT EXISTS under NULLs.
  *   `x NOT IN (set containing NULL)` is three-valued logic — never
  *   TRUE, so zero rows — while NOT EXISTS is a plain anti-join; the
  *   most-reported SQL migration bug in existence.
  *
  * - DecimalPrecision parity (catalyst/analysis/HiveTypeCoercion
  *   .scala:318, types/Decimal.scala): sum/avg precision widening,
  *   (values chosen non-zero: Spark renders a zero DECIMAL(38,10) as
  *   "0E-10" — Java BigDecimal scientific notation — where DuckDB
  *   prints plain digits, so zero would be a rendering mismatch),
  *   explicit DECIMAL(38,x) casts, and overflow-to-NULL via try_cast
  *   (ANSI off) — testdata is doubles, so the decimals are produced by
  *   explicit casts and every output is rendered as STRING so both
  *   engines compare the exact fixed-point digits, not float hashes.
  */
object Sql5Queries {

  val all: Seq[Q] = Seq(

    // Outer-join predicate pushdown: the same extra predicate moved
    // between ON and WHERE across left/right/full variants. matched
    // counts the non-null join-side rows, so every variant pins BOTH
    // cardinality and null-padding behavior.
    Q("sql_ppd_outer_join",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_c5")
        table(s, d, "orders").createOrReplaceTempView("graft_o5")
        s.sql(sql("""
          SELECT 'on_null_side' AS variant, count(*) AS n, count(o.o_orderkey) AS matched
          FROM graft_c5 c LEFT JOIN graft_o5 o
            ON c.c_custkey = o.o_custkey AND o.o_totalprice > 200000
          UNION ALL
          SELECT 'where_null_side', count(*), count(o.o_orderkey)
          FROM graft_c5 c LEFT JOIN graft_o5 o ON c.c_custkey = o.o_custkey
          WHERE o.o_totalprice > 200000
          UNION ALL
          SELECT 'where_preserved_side', count(*), count(o.o_orderkey)
          FROM graft_c5 c LEFT JOIN graft_o5 o ON c.c_custkey = o.o_custkey
          WHERE c.c_acctbal > 5000
          UNION ALL
          SELECT 'right_on_null_side', count(*), count(c.c_custkey)
          FROM graft_c5 c RIGHT JOIN graft_o5 o
            ON c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
          UNION ALL
          SELECT 'full_on_both', count(*), count(o.o_orderkey)
          FROM graft_c5 c FULL JOIN graft_o5 o
            ON c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
              AND o.o_totalprice > 200000
          UNION ALL
          SELECT 'full_where_one_side', count(*), count(o.o_orderkey)
          FROM graft_c5 c FULL JOIN graft_o5 o ON c.c_custkey = o.o_custkey
          WHERE o.o_totalprice > 200000"""))
      },
      Some(sql("""
        SELECT 'on_null_side' AS variant, count(*) AS n, count(o.o_orderkey) AS matched
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_totalprice > 200000
        UNION ALL
        SELECT 'where_null_side', count(*), count(o.o_orderkey)
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE o.o_totalprice > 200000
        UNION ALL
        SELECT 'where_preserved_side', count(*), count(o.o_orderkey)
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE c.c_acctbal > 5000
        UNION ALL
        SELECT 'right_on_null_side', count(*), count(c.c_custkey)
        FROM customer c RIGHT JOIN orders o
          ON c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
        UNION ALL
        SELECT 'full_on_both', count(*), count(o.o_orderkey)
        FROM customer c FULL JOIN orders o
          ON c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
            AND o.o_totalprice > 200000
        UNION ALL
        SELECT 'full_where_one_side', count(*), count(o.o_orderkey)
        FROM customer c FULL JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE o.o_totalprice > 200000"""))),

    // Multi-branch UNION coercion: INT, BIGINT, DECIMAL(10,2) and DOUBLE
    // branches widen to DOUBLE; an untyped-NULL branch joins the ladder
    // without pinning its own type. Values come from aggregates so the
    // row set is deterministic.
    Q("sql_union_coerce",
      (s, d) => {
        table(s, d, "lineitem").createOrReplaceTempView("graft_li5")
        s.sql(sql("""
          SELECT 'int' AS src, min(l_linenumber) AS v FROM graft_li5
          UNION ALL
          SELECT 'bigint', max(l_orderkey) FROM graft_li5
          UNION ALL
          SELECT 'decimal', CAST(max(l_quantity) AS DECIMAL(10,2)) FROM graft_li5
          UNION ALL
          SELECT 'double', round(avg(l_discount), 6) FROM graft_li5
          UNION ALL
          SELECT 'null_branch', NULL"""))
      },
      Some(sql("""
        SELECT 'int' AS src, CAST(min(l_linenumber) AS DOUBLE) AS v FROM lineitem
        UNION ALL
        SELECT 'bigint', CAST(max(l_orderkey) AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'decimal', CAST(CAST(max(l_quantity) AS DECIMAL(10,2)) AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'double', round(avg(l_discount), 6) FROM lineitem
        UNION ALL
        SELECT 'null_branch', NULL"""))),

    // NOT IN vs NOT EXISTS under NULLs: injecting one NULL into the
    // subquery flips NOT IN to the empty set (three-valued logic) while
    // NOT EXISTS / the null-free NOT IN agree on the true anti-join
    // count; IN is unaffected by the extra NULL.
    Q("sql_not_in_nulls",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_c5n")
        table(s, d, "orders").createOrReplaceTempView("graft_o5n")
        s.sql(sql("""
          SELECT 'not_in_with_null' AS variant, count(*) AS n FROM graft_c5n
          WHERE c_custkey NOT IN
            (SELECT o_custkey FROM graft_o5n UNION ALL SELECT CAST(NULL AS BIGINT))
          UNION ALL
          SELECT 'not_in_clean', count(*) FROM graft_c5n
          WHERE c_custkey NOT IN
            (SELECT o_custkey FROM graft_o5n WHERE o_custkey IS NOT NULL)
          UNION ALL
          SELECT 'not_exists', count(*) FROM graft_c5n c
          WHERE NOT EXISTS
            (SELECT 1 FROM graft_o5n o WHERE o.o_custkey = c.c_custkey)
          UNION ALL
          SELECT 'in_with_null', count(*) FROM graft_c5n
          WHERE c_custkey IN
            (SELECT o_custkey FROM graft_o5n UNION ALL SELECT CAST(NULL AS BIGINT))"""))
      },
      Some(sql("""
        SELECT 'not_in_with_null' AS variant, count(*) AS n FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders UNION ALL SELECT CAST(NULL AS BIGINT))
        UNION ALL
        SELECT 'not_in_clean', count(*) FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
        UNION ALL
        SELECT 'not_exists', count(*) FROM customer c
        WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        UNION ALL
        SELECT 'in_with_null', count(*) FROM customer
        WHERE c_custkey IN
          (SELECT o_custkey FROM orders UNION ALL SELECT CAST(NULL AS BIGINT))"""))),

    // Recursive CTE (Spark 4.0's WITH RECURSIVE, the reference era had
    // none): an anchor + recursive step generates the 0..9 bucket
    // series, which then LEFT JOINs the orders fact — recursion drives
    // the row set, data drives the counts. Cast to BIGINT both sides so
    // the coercion of the recursive column is pinned too.
    Q("sql_recursive_cte",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o5r")
        s.sql(sql("""
          WITH RECURSIVE seq(n) AS (
            SELECT 0
            UNION ALL
            SELECT n + 1 FROM seq WHERE n < 9
          )
          SELECT CAST(s.n AS BIGINT) AS n, count(o.o_orderkey) AS n_orders
          FROM seq s LEFT JOIN graft_o5r o ON o.o_orderkey % 10 = s.n
          GROUP BY s.n"""))
      },
      Some(sql("""
        WITH RECURSIVE seq(n) AS (
          SELECT 0
          UNION ALL
          SELECT n + 1 FROM seq WHERE n < 9
        )
        SELECT CAST(s.n AS BIGINT) AS n, count(o.o_orderkey) AS n_orders
        FROM seq s LEFT JOIN orders o ON o.o_orderkey % 10 = s.n
        GROUP BY s.n"""))),

    // Correlated LATERAL subquery (standard-SQL lateral join): per
    // customer, the single highest-value order — the decorrelation path
    // (DomainJoin rewrite) that replaced LATERAL VIEW for relational
    // subqueries. Tie-broken on o_orderkey so top-1 is deterministic.
    Q("sql_lateral_join",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_c5l")
        table(s, d, "orders").createOrReplaceTempView("graft_o5l")
        s.sql(sql("""
          SELECT c.c_custkey, t.o_orderkey AS top_order, t.o_totalprice AS top_price
          FROM graft_c5l c JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM graft_o5l o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
          ) t"""))
      },
      Some(sql("""
        SELECT c.c_custkey, t.o_orderkey AS top_order, t.o_totalprice AS top_price
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1
        ) t ON true"""))),

    // SQL UNPIVOT (wide metrics → long rows) over an aggregated base;
    // the DuckDB oracle states the same reshape as a UNION ALL so the
    // row set, not the syntax, is what's pinned.
    Q("sql_unpivot",
      (s, d) => {
        table(s, d, "lineitem").createOrReplaceTempView("graft_li5u")
        s.sql(sql("""
          SELECT flag, metric, val FROM (
            SELECT l_returnflag AS flag,
              CAST(sum(l_quantity) AS DOUBLE) AS qty,
              CAST(sum(l_extendedprice) AS DOUBLE) AS price
            FROM graft_li5u GROUP BY l_returnflag
          ) UNPIVOT (val FOR metric IN (qty, price))"""))
      },
      Some(sql("""
        WITH base AS (
          SELECT l_returnflag AS flag,
            CAST(sum(l_quantity) AS DOUBLE) AS qty,
            CAST(sum(l_extendedprice) AS DOUBLE) AS price
          FROM lineitem GROUP BY l_returnflag)
        SELECT flag, 'qty' AS metric, qty AS val FROM base
        UNION ALL
        SELECT flag, 'price', price FROM base"""))),

    // GROUP BY ALL: every non-aggregate select item becomes a grouping
    // key — both engines support the clause, so the oracle uses it too.
    Q("sql_group_by_all",
      (s, d) => {
        table(s, d, "lineitem").createOrReplaceTempView("graft_li5g")
        s.sql(sql("""
          SELECT l_returnflag, l_linestatus, count(*) AS n,
            round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty
          FROM graft_li5g GROUP BY ALL"""))
      },
      Some(sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
          round(CAST(sum(l_quantity) AS DOUBLE), 2) AS sum_qty
        FROM lineitem GROUP BY ALL"""))),

    // DecimalPrecision parity: widening sum/avg over DECIMAL(12,2),
    // a fixed-point product, an explicit DECIMAL(38,10) widening cast,
    // and overflow-to-NULL via try_cast (Spark ANSI off == DuckDB
    // TRY_CAST). Every value is CAST to an explicit DECIMAL type and
    // rendered as STRING so the comparison is on exact digits.
    Q("expr_decimal",
      (s, d) => {
        table(s, d, "lineitem").createOrReplaceTempView("graft_li5d")
        s.sql(sql("""
          SELECT 'sum_dec' AS tag,
            CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS STRING) AS val
          FROM graft_li5d
          UNION ALL
          SELECT 'avg_dec',
            CAST(CAST(avg(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS STRING)
          FROM graft_li5d
          UNION ALL
          SELECT 'mul_dec',
            CAST(CAST(max(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(38,6)) AS STRING)
          FROM graft_li5d
          UNION ALL
          SELECT 'widen_38_10',
            CAST(CAST(max(CAST(l_tax AS DECIMAL(6,4))) AS DECIMAL(38,10)) AS STRING)
          FROM graft_li5d
          UNION ALL
          SELECT 'overflow_null',
            CAST(try_cast('99999999999999999999' AS DECIMAL(10,2)) AS STRING)"""))
      },
      Some(sql("""
        SELECT 'sum_dec' AS tag,
          CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS val
        FROM lineitem
        UNION ALL
        SELECT 'avg_dec',
          CAST(CAST(avg(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,6)) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'mul_dec',
          CAST(CAST(max(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(6,4))) AS DECIMAL(38,6)) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'widen_38_10',
          CAST(CAST(max(CAST(l_tax AS DECIMAL(6,4))) AS DECIMAL(38,10)) AS VARCHAR)
        FROM lineitem
        UNION ALL
        SELECT 'overflow_null',
          CAST(TRY_CAST('99999999999999999999' AS DECIMAL(10,2)) AS VARCHAR)""")))
  )
}
