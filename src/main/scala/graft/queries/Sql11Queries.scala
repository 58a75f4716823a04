package graft.queries

import graft.Engine.table
import Registry.sql

/** Golden-corpus semantics, wave 12 — defining aggregate/expression
  * contracts from the reference's golden corpus plus the modern
  * bitmap-distinct surface:
  *
  * - empty-input aggregation (golden `groupby_neg_float`, `having2`,
  *   the classic SQL contract): a GLOBAL aggregate over zero rows
  *   returns exactly ONE row (count = 0, sum/max = NULL), while a
  *   GROUPED aggregate over zero rows returns ZERO rows. The reference
  *   pins this split in Aggregate's empty-partition handling
  *   (sql/core/.../Aggregate.scala:126 — the groupingExpressions.isEmpty
  *   branch emitting EmptyGeneratedRow); engines that get one side
  *   wrong corrupt every downstream COALESCE.
  *
  * - bitmap-based distinct counting (Spark 3.5's bitmap_* family):
  *   count(DISTINCT key) restated as a two-level MERGEABLE aggregate —
  *   per (group, bucket) bitmaps OR-merged then popcounted. At 100 TB
  *   this is the scalable spelling of exact distinct: bitmap partials
  *   combine map-side and never carry raw keys through the shuffle,
  *   unlike the Expand-based DISTINCT rewrite whose per-group key sets
  *   grow with the corpus. Oracled against plain count(DISTINCT).
  *
  * - URL component extraction (Hive golden `udf_parse_url`; the
  *   reference routes it through HiveGenericUdf — Spark 4 has native
  *   ParseUrl): HOST / PATH / PROTOCOL / QUERY and a single query
  *   parameter, over URLs built deterministically from `documents`
  *   columns. The oracle rebuilds the components from the same columns
  *   directly, so the crossing proves parse_url actually inverts the
  *   construction — the first operation every web-corpus curation
  *   pipeline runs.
  */
object Sql11Queries {

  val all: Seq[Q] = Seq(

    // Empty-input aggregation: one row for the global aggregate (count 0,
    // NULL sum/max), zero rows for the grouped aggregate (pinned via an
    // outer count). Both branches share the same impossible predicate.
    Q("sql_empty_agg",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o11e")
        s.sql(sql("""
          SELECT 'global' AS tag, count(*) AS n,
                 round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS sum_price,
                 CAST(max(o_totalprice) AS DOUBLE) AS max_price
          FROM graft_o11e WHERE o_orderkey < 0
          UNION ALL
          SELECT 'grouped_rowcount', count(*), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
          FROM (SELECT o_custkey FROM graft_o11e
                WHERE o_orderkey < 0 GROUP BY o_custkey)"""))
      },
      Some(sql("""
        SELECT 'global' AS tag, count(*) AS n,
               round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS sum_price,
               CAST(max(o_totalprice) AS DOUBLE) AS max_price
        FROM orders WHERE o_orderkey < 0
        UNION ALL
        SELECT 'grouped_rowcount', count(*), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM (SELECT o_custkey FROM orders
              WHERE o_orderkey < 0 GROUP BY o_custkey)"""))),

    // Bitmap distinct: per-status distinct customers via
    // bucket-partitioned bitmaps. Inner aggregate keys on
    // (status, bitmap bucket) — bounded 4KB bitmap state per bucket,
    // partial-merged map-side; outer aggregate sums the popcounts.
    // The oracle is the semantic contract: plain count(DISTINCT).
    Q("sql_bitmap_distinct",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o11b")
        s.sql(sql("""
          SELECT o_orderstatus, CAST(sum(cnt) AS BIGINT) AS n_distinct
          FROM (SELECT o_orderstatus, bitmap_bucket_number(o_custkey) AS bkt,
                  bitmap_count(bitmap_construct_agg(bitmap_bit_position(o_custkey))) AS cnt
                FROM graft_o11b GROUP BY o_orderstatus, bitmap_bucket_number(o_custkey))
          GROUP BY o_orderstatus"""))
      },
      Some(sql("""
        SELECT o_orderstatus, CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
        FROM orders GROUP BY o_orderstatus"""))),

    // Multi-VALUE-column UNPIVOT (Spark 3.4): two measure columns per
    // metric group collapse together — (qty_o, price_o) and
    // (qty_f, price_f) each become one (metric, q, p) row. The oracle
    // is the UNION ALL expansion the clause abbreviates.
    Q("sql_unpivot_multi",
      (s, d) => {
        table(s, d, "lineitem").createOrReplaceTempView("graft_li11m")
        s.sql(sql("""
          SELECT flag, metric, q, p FROM (
            SELECT l_returnflag AS flag,
              CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS DOUBLE) AS qty_o,
              CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END) AS DOUBLE) AS price_o,
              CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS DOUBLE) AS qty_f,
              CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END) AS DOUBLE) AS price_f
            FROM graft_li11m GROUP BY l_returnflag
          ) UNPIVOT INCLUDE NULLS
            ((q, p) FOR metric IN ((qty_o, price_o) AS open_st,
                                   (qty_f, price_f) AS filled_st))"""))
      },
      Some(sql("""
        WITH base AS (
          SELECT l_returnflag AS flag,
            CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS DOUBLE) AS qty_o,
            CAST(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END) AS DOUBLE) AS price_o,
            CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS DOUBLE) AS qty_f,
            CAST(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END) AS DOUBLE) AS price_f
          FROM lineitem GROUP BY l_returnflag)
        SELECT flag, 'open_st' AS metric, qty_o AS q, price_o AS p FROM base
        UNION ALL
        SELECT flag, 'filled_st', qty_f, price_f FROM base"""))),

    // Multi-AGGREGATE PIVOT: two aggregates per pivot value produce the
    // suffixed column grid (urgent_n/urgent_total/high_n/high_total);
    // the oracle restates it as FILTER-based conditional aggregation
    // with the same aliases.
    Q("sql_pivot_multi_agg",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o11pm")
        s.sql(sql("""
          SELECT * FROM (
            SELECT o_orderstatus, o_orderpriority, o_totalprice
            FROM graft_o11pm)
          PIVOT (count(*) AS n, round(sum(o_totalprice), 4) AS total
                 FOR o_orderpriority IN ('1-URGENT' AS urgent, '2-HIGH' AS high))"""))
      },
      Some(sql("""
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent_n,
               round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4)
                 AS urgent_total,
               count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high_n,
               round(sum(o_totalprice) FILTER (WHERE o_orderpriority = '2-HIGH'), 4)
                 AS high_total
        FROM orders GROUP BY o_orderstatus"""))),

    // Scalar subquery in HAVING (golden having subqueries): groups kept
    // only when their aggregate beats a GLOBAL aggregate computed by an
    // uncorrelated scalar subquery — the subquery must evaluate once
    // and broadcast into the having filter, never per group.
    Q("sql_subquery_having",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o11h")
        s.sql(sql("""
          SELECT o_custkey, count(*) AS n,
                 round(sum(o_totalprice), 4) AS total
          FROM graft_o11h
          GROUP BY o_custkey
          HAVING sum(o_totalprice) >
            (SELECT 3 * avg(o_totalprice) FROM graft_o11h)"""))
      },
      Some(sql("""
        SELECT o_custkey, count(*) AS n,
               round(sum(o_totalprice), 4) AS total
        FROM orders
        GROUP BY o_custkey
        HAVING sum(o_totalprice) > (SELECT 3 * avg(o_totalprice) FROM orders)"""))),

    // nth_value / first_value / last_value over a full frame (golden
    // windowing_navfn): the three navigation functions with an explicit
    // UNBOUNDED frame (last_value over the default frame is the classic
    // running-value trap — the full frame pins the intended semantics),
    // ordered by a unique key for determinism.
    Q("win_nth_value",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o11v")
        s.sql(sql("""
          SELECT o_orderkey, o_orderstatus,
                 round(first_value(o_totalprice) OVER w, 4) AS first_price,
                 round(last_value(o_totalprice) OVER w, 4) AS last_price,
                 round(nth_value(o_totalprice, 3) OVER w, 4) AS third_price
          FROM graft_o11v WHERE o_orderkey <= 300
          WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))
      },
      Some(sql("""
        SELECT o_orderkey, o_orderstatus,
               round(first_value(o_totalprice) OVER w, 4) AS first_price,
               round(last_value(o_totalprice) OVER w, 4) AS last_price,
               round(nth_value(o_totalprice, 3) OVER w, 4) AS third_price
        FROM orders WHERE o_orderkey <= 300
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""))),

    // ROWS vs RANGE with duplicate order keys (golden windowing_rows/
    // windowing_range): RANGE frames include ALL peers of the current
    // key, ROWS frames cut mid-peer-group. Counting (value-free) frames
    // keep the pin deterministic under tie permutation: each peer group
    // of size k yields the row-count multiset {base+1..base+k} in ANY
    // order, while the range count is base+k for every peer.
    Q("sql_rows_vs_range_ties",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o11r")
        s.sql(sql("""
          SELECT o_orderstatus, o_orderdate,
                 CAST(count(*) OVER (PARTITION BY o_orderstatus
                      ORDER BY o_orderdate
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS rows_cnt,
                 CAST(count(*) OVER (PARTITION BY o_orderstatus
                      ORDER BY o_orderdate
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS range_cnt
          FROM graft_o11r WHERE o_orderkey <= 500"""))
      },
      Some(sql("""
        SELECT o_orderstatus, o_orderdate,
               CAST(count(*) OVER (PARTITION BY o_orderstatus
                    ORDER BY o_orderdate
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS rows_cnt,
               CAST(count(*) OVER (PARTITION BY o_orderstatus
                    ORDER BY o_orderdate
                    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS range_cnt
        FROM orders WHERE o_orderkey <= 500"""))),

    // NATURAL JOIN + JOIN USING (golden join_nulls/natural family):
    // NATURAL resolves the shared column set implicitly, USING
    // coalesces the key into ONE output column — both pinned via the
    // same aggregate so a resolution difference changes the result.
    Q("sql_natural_join",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_n11n")
        table(s, d, "region")
          .withColumnRenamed("r_regionkey", "n_regionkey")
          .createOrReplaceTempView("graft_r11n")
        s.sql(sql("""
          SELECT 'natural' AS variant, n_regionkey, count(*) AS n
          FROM (SELECT * FROM graft_n11n NATURAL JOIN graft_r11n)
          GROUP BY n_regionkey
          UNION ALL
          SELECT 'using', n_regionkey, count(*)
          FROM (SELECT n_regionkey FROM graft_n11n JOIN graft_r11n USING (n_regionkey))
          GROUP BY n_regionkey"""))
      },
      Some(sql("""
        WITH r2 AS (SELECT r_regionkey AS n_regionkey, r_name FROM region)
        SELECT 'natural' AS variant, n_regionkey, count(*) AS n
        FROM (SELECT * FROM nation NATURAL JOIN r2)
        GROUP BY n_regionkey
        UNION ALL
        SELECT 'using', n_regionkey, count(*)
        FROM (SELECT n_regionkey FROM nation JOIN r2 USING (n_regionkey))
        GROUP BY n_regionkey"""))),

    // LIMIT ... OFFSET (Spark 3.4's OFFSET surface; DuckDB native):
    // a deterministic page — unique-key ORDER BY, rows 21-30.
    Q("sql_offset",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o11o")
        s.sql(sql("""
          SELECT o_orderkey, round(o_totalprice, 4) AS price
          FROM graft_o11o ORDER BY o_orderkey LIMIT 10 OFFSET 20"""))
      },
      Some(sql("""
        SELECT o_orderkey, round(o_totalprice, 4) AS price
        FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 20"""))),

    // Table-valued function as a relation: range() standalone (strided
    // arithmetic sum) and joined to a real table on its generated id —
    // the generator participates in join planning like any relation.
    Q("sql_tvf_range",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_n11t")
        s.sql(sql("""
          SELECT 'strided_sum' AS tag, CAST(sum(id) AS BIGINT) AS v,
                 count(*) AS n
          FROM range(0, 100000, 7)
          UNION ALL
          SELECT 'joined_to_dim', CAST(sum(id * n_regionkey) AS BIGINT), count(*)
          FROM range(0, 25) r JOIN graft_n11t ON r.id = n_nationkey"""))
      },
      Some(sql("""
        SELECT 'strided_sum' AS tag, CAST(sum(range) AS BIGINT) AS v,
               count(*) AS n
        FROM range(0, 100000, 7)
        UNION ALL
        SELECT 'joined_to_dim', CAST(sum(range * n_regionkey) AS BIGINT), count(*)
        FROM range(0, 25) r JOIN nation ON r.range = n_nationkey"""))),

    // Scalar bitwise family (golden udf_bitwise_and/or/xor/not + shift
    // golden rows): &, |, ^(xor), ~, shifts, and popcount over BIGINT
    // keys. Spark spells shifts shiftleft/shiftright, DuckDB << / >> —
    // same two's-complement semantics pinned value-for-value.
    Q("expr_bitwise_scalar",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o11w")
        s.sql(sql("""
          SELECT o_orderkey AS k,
                 o_orderkey & 255 AS b_and, o_orderkey | 16 AS b_or,
                 o_orderkey ^ 85 AS b_xor, ~o_orderkey AS b_not,
                 shiftleft(o_orderkey, 3) AS b_shl,
                 shiftright(o_orderkey, 2) AS b_shr,
                 CAST(bit_count(o_orderkey) AS INT) AS b_pop
          FROM graft_o11w WHERE o_orderkey <= 64"""))
      },
      Some(sql("""
        SELECT o_orderkey AS k,
               o_orderkey & 255 AS b_and, o_orderkey | 16 AS b_or,
               xor(o_orderkey, 85) AS b_xor, ~o_orderkey AS b_not,
               o_orderkey << 3 AS b_shl, o_orderkey >> 2 AS b_shr,
               CAST(bit_count(o_orderkey) AS INT) AS b_pop
        FROM orders WHERE o_orderkey <= 64"""))),

    // CTE shadowing (golden cte_2/with semantics): a WITH name that
    // collides with an existing relation must win INSIDE the WITH scope
    // while the relation stays reachable outside it — both resolutions
    // pinned in one output.
    Q("sql_cte_shadow",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_c11s")
        s.sql(sql("""
          SELECT 'shadowed' AS scope, count(*) AS n, max(x) AS mx
          FROM (WITH graft_c11s AS (SELECT 1 AS x) SELECT x FROM graft_c11s)
          UNION ALL
          SELECT 'unshadowed', count(*), CAST(NULL AS INT)
          FROM graft_c11s"""))
      },
      Some(sql("""
        SELECT 'shadowed' AS scope, count(*) AS n, max(x) AS mx
        FROM (WITH customer AS (SELECT 1 AS x) SELECT x FROM customer)
        UNION ALL
        SELECT 'unshadowed', count(*), CAST(NULL AS INT)
        FROM customer"""))),

    // parse_url component extraction over deterministically built URLs;
    // the oracle reconstructs each component from the source columns, so
    // agreement proves parse_url inverts the construction exactly.
    Q("expr_url_funcs",
      (s, d) => {
        table(s, d, "documents").createOrReplaceTempView("graft_d11u")
        s.sql(sql("""
          SELECT doc_id,
                 parse_url(url, 'PROTOCOL') AS proto,
                 parse_url(url, 'HOST') AS host,
                 parse_url(url, 'PATH') AS path,
                 parse_url(url, 'QUERY') AS query,
                 parse_url(url, 'QUERY', 'lang') AS lang_param
          FROM (SELECT doc_id,
                  concat('https://', source, '.example.com/docs/', doc_id,
                         '?lang=', lang, '&n=', n_chars) AS url
                FROM graft_d11u)"""))
      },
      Some(sql("""
        SELECT doc_id, 'https' AS proto,
               source || '.example.com' AS host,
               '/docs/' || doc_id AS path,
               'lang=' || lang || '&n=' || n_chars AS query,
               lang AS lang_param
        FROM documents"""))),

    // Lateral column aliases (Spark 3.4+): a SELECT-list alias is
    // referenceable by LATER items in the same list, including chained
    // alias-of-alias — the spreadsheet-style derivation every analyst
    // writes first. DuckDB supports the identical surface, so the
    // oracle is the same query text.
    Q("sql_lateral_alias",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_lca")
        s.sql(sql("""
          SELECT o_orderkey,
                 round(o_totalprice * 0.1, 4) AS tax,
                 round(tax * 2, 4) AS tax2,
                 round(tax + tax2, 4) AS tax3
          FROM graft_o_lca WHERE o_orderkey <= 200"""))
      },
      Some(sql("""
        SELECT o_orderkey,
               round(o_totalprice * 0.1, 4) AS tax,
               round(tax * 2, 4) AS tax2,
               round(tax + tax2, 4) AS tax3
        FROM orders WHERE o_orderkey <= 200"""))),

    // SELECT * EXCEPT (Spark 4 star-modifier): project everything but
    // the named columns — DuckDB spells the same modifier EXCLUDE.
    Q("sql_star_except",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_sx")
        s.sql(sql("""SELECT * EXCEPT (o_totalprice, o_orderdate)
                     FROM graft_o_sx WHERE o_orderkey <= 100"""))
      },
      Some(sql("""SELECT * EXCLUDE (o_totalprice, o_orderdate)
                  FROM orders WHERE o_orderkey <= 100"""))),

    // SQL session variables (Spark 4 DECLARE VARIABLE / SET VAR): a
    // scalar-subquery-assigned variable referenced from a later query —
    // the parameterize-without-string-splicing surface. The threshold is
    // max/2 (exact double arithmetic), so the boundary count is
    // bit-deterministic in both engines.
    Q("sql_session_variable",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_o_var")
        s.sql("DECLARE OR REPLACE VARIABLE graft_thr DOUBLE DEFAULT 0.0")
        s.sql(sql("""SET VAR graft_thr =
                     (SELECT max(o_totalprice) / 2 FROM graft_o_var)"""))
        s.sql(sql("""SELECT count(*) AS n_above, round(graft_thr, 4) AS thr
                     FROM graft_o_var WHERE o_totalprice > graft_thr"""))
      },
      Some(sql("""SELECT count(*) AS n_above,
                    round((SELECT max(o_totalprice) / 2 FROM orders), 4) AS thr
                  FROM orders
                  WHERE o_totalprice > (SELECT max(o_totalprice) / 2 FROM orders)"""))),

    // SQL TABLE FUNCTION (CREATE FUNCTION … RETURNS TABLE … RETURN
    // SELECT): a declarative UDTF defined entirely in SQL, invoked both
    // standalone and LATERALLY per outer row — the reusable-subquery
    // surface that replaces the Hive UDTF bridge for SQL-expressible
    // generators. The oracle restates the body inline.
    Q("sql_table_function",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_nat_tf")
        s.sql(sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_region_nations(r INT)
                     RETURNS TABLE (n_nationkey BIGINT, n_name STRING)
                     RETURN SELECT n_nationkey, n_name
                            FROM graft_nat_tf WHERE n_regionkey = r"""))
        s.sql(sql("""SELECT 'standalone' AS mode, n_nationkey, n_name
                     FROM graft_region_nations(2)
                     UNION ALL
                     SELECT 'lateral', t.n_nationkey, t.n_name
                     FROM (SELECT DISTINCT n_regionkey FROM graft_nat_tf
                           WHERE n_regionkey < 2) r,
                          LATERAL graft_region_nations(r.n_regionkey) t"""))
      },
      Some(sql("""SELECT 'standalone' AS mode,
                    CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
                  FROM nation WHERE n_regionkey = 2
                  UNION ALL
                  SELECT 'lateral', CAST(n_nationkey AS BIGINT), n_name
                  FROM nation WHERE n_regionkey < 2"""))),

    // ANSI-MODE DIALECT PROBE: the engine pins ANSI OFF for the
    // reference's 1.3 null-not-error semantics (Engine.scala); this row
    // makes that contract EXECUTABLE — the same four expressions run
    // under both modes and the outcome grid (null vs raised) travels as
    // data. Each ANSI-on probe runs a tiny collect at declaration —
    // the error-contract documented-exception class. The mode is
    // restored in a finally so a failure cannot leak ANSI-on into the
    // session.
    Q("sql_ansi_mode_probe",
      (s, _) => {
        val sq = s; import sq.implicits._
        val exprs = Seq(
          ("div_zero", "1 / 0"),
          ("bad_cast", "CAST('abc' AS INT)"),
          ("arr_oob", "array(1, 2)[5]"),
          ("int_overflow", "CAST(2147483647 AS INT) + CAST(1 AS INT)"))
        def outcome(e: String): String =
          scala.util.Try(s.sql(s"SELECT $e").collect()(0)) match {
            case scala.util.Success(r) => if (r.isNullAt(0)) "null" else "value"
            case scala.util.Failure(_) => "raised"
          }
        val prev = s.conf.get("spark.sql.ansi.enabled")
        val rows = try {
          s.conf.set("spark.sql.ansi.enabled", "false")
          val off = exprs.map { case (n, e) => n -> outcome(e) }.toMap
          s.conf.set("spark.sql.ansi.enabled", "true")
          val on = exprs.map { case (n, e) => n -> outcome(e) }.toMap
          exprs.map { case (n, _) => (n, off(n), on(n)) }
        } finally s.conf.set("spark.sql.ansi.enabled", prev)
        rows.toDF("probe", "ansi_off", "ansi_on")
      },
      Some(sql("""SELECT probe, ansi_off, ansi_on FROM (VALUES
                    ('div_zero',     'null',  'raised'),
                    ('bad_cast',     'null',  'raised'),
                    ('arr_oob',      'null',  'raised'),
                    ('int_overflow', 'value', 'raised')
                  ) AS t(probe, ansi_off, ansi_on)"""))),

    // SET-OPERATION PRECEDENCE: INTERSECT binds tighter than
    // UNION/EXCEPT, so a UNION b INTERSECT c ≡ a UNION (b ∩ c) — the
    // dialect rule that silently reshapes un-parenthesized set chains.
    // Both the bare chain and the explicit grouping run; they must be
    // identical, and DIFFERENT from the left-to-right reading.
    Q("sql_setop_precedence",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_nat_sp")
        s.sql(sql("""
          SELECT 'bare' AS variant, n_nationkey
          FROM (SELECT n_nationkey FROM graft_nat_sp WHERE n_regionkey = 0
                UNION
                SELECT n_nationkey FROM graft_nat_sp WHERE n_nationkey < 12
                INTERSECT
                SELECT n_nationkey FROM graft_nat_sp WHERE n_nationkey >= 6)
          UNION ALL
          SELECT 'grouped', n_nationkey
          FROM (SELECT n_nationkey FROM graft_nat_sp WHERE n_regionkey = 0
                UNION
                (SELECT n_nationkey FROM graft_nat_sp WHERE n_nationkey < 12
                 INTERSECT
                 SELECT n_nationkey FROM graft_nat_sp WHERE n_nationkey >= 6))"""))
      },
      Some(sql("""SELECT v AS variant, CAST(n_nationkey AS BIGINT) AS n_nationkey
                  FROM (VALUES ('bare'), ('grouped')) AS t(v),
                    (SELECT n_nationkey FROM nation WHERE n_regionkey = 0
                     UNION
                     SELECT n_nationkey FROM nation
                     WHERE n_nationkey < 12 AND n_nationkey >= 6) u""")))
  )
}
