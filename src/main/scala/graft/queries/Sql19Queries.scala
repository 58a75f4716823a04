package graft.queries

import graft.Engine.table
import org.apache.spark.sql.SparkSession
import Registry.{dropManaged, sql}

/** Round-13 golden wave — the `semijoin` family (50 golden files,
  * reference ql/src/test/queries/clientpositive/semijoin.q +
  * leftsemijoin*.q: LEFT SEMI mixed with outer joins, duplicate-key
  * build sides, build-side predicates, expression keys, empty builds,
  * chained semi), the `timestamp_1`/`timestamp_2` grid (118 golden
  * files: cast-to-numeric/string across fractional precisions at µs
  * resolution — the reference stores INT96 nanos, this engine and the
  * oracle both truncate to µs, which the grid pins explicitly), and the
  * `multi_insert_lateral_view` crossing (29 files: one scan fanned into
  * multiple INSERT branches each with its own LATERAL VIEW / GROUP BY /
  * WHERE).
  *
  * Engine-syntax note: Spark spells semi/anti joins `LEFT SEMI JOIN` /
  * `LEFT ANTI JOIN`; DuckDB spells them `SEMI JOIN` / `ANTI JOIN`. The
  * oracle is the same body with only that token rewritten, so the two
  * engines run textually-identical logic.
  *
  * Scale posture: every semi/anti here is a key-equi join (shuffle-hash
  * or broadcast on the FK-derived key) — semi joins are the CHEAP side
  * of the join family at 100 TB (build side deduplicates into an
  * existence set; output never exceeds the probe side). The timestamp
  * rows are constant-size literal grids plus one scan-level aggregate.
  */
object Sql19Queries {

  /** The semijoin fixture, verbatim from the golden family's shape:
    * t1 = small keyed slice, t2 = t1 with doubled keys (overlap on even
    * keys), t3 = t1 ∪all t2 (DUPLICATE keys — the build-side-dups case),
    * t4 = empty. */
  private def withT(body: String, cust: String): String = sql(s"""
    WITH t1 AS (SELECT CAST(c_custkey AS INT) AS key, c_mktsegment AS value
                FROM $cust WHERE c_custkey <= 200),
         t2 AS (SELECT CAST(2 * key AS INT) AS key, value FROM t1),
         t3 AS (SELECT * FROM t1 UNION ALL SELECT * FROM t2),
         t4 AS (SELECT key, value FROM t1 WHERE 1 = 0)
    $body""")

  private def sj(name: String, body: String): Q =
    Q(name,
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_sj_c")
        s.sql(withT(body, "graft_sj_c"))
      },
      Some(withT(body, "customer")
        .replace("LEFT SEMI JOIN", "SEMI JOIN")
        .replace("LEFT ANTI JOIN", "ANTI JOIN")))

  /** The timestamp literal grid: second-aligned, one fractional digit,
    * sub-ms, explicit-trailing-zero, 9-digit (nanos — BOTH engines
    * truncate to µs), and a pre-epoch half-second (negative epoch —
    * cast-to-integral must FLOOR, not truncate toward zero). */
  private val tsGrid = Seq(
    "2011-01-01 01:01:01", "2011-01-01 01:01:01.1",
    "2011-01-01 01:01:01.0001", "2011-01-01 01:01:01.000100000",
    "2011-01-01 01:01:01.001000011", "1969-12-31 23:59:59.5")
  private def sparkVals = tsGrid.map(s => s"('$s')").mkString(", ")
  private def duckVals = s"(VALUES ${tsGrid.map(s => s"('$s')").mkString(", ")})"

  val all: Seq[Q] = Seq(

    // ---- semijoin family ------------------------------------------------

    // Row-level: semi preserves LEFT multiplicity (t3's duplicate keys
    // each survive) while never widening rows with build columns.
    sj("sj_dup_preserve", """
      SELECT key, value FROM t3 a LEFT SEMI JOIN t1 b ON a.key = b.key"""),

    // Duplicate keys on the BUILD side must not multiply the probe:
    // n == n_keys == |t1| even though t3 holds each even key twice.
    sj("sj_build_dups_no_multiply", """
      SELECT count(*) AS n, count(DISTINCT a.key) AS n_keys
      FROM t1 a LEFT SEMI JOIN t3 b ON a.key = b.key"""),

    // Build-side predicate inside the ON clause: existence is tested
    // against the FILTERED build set.
    sj("sj_build_pred", """
      SELECT key, value FROM t1 a
      LEFT SEMI JOIN t2 b ON a.key = b.key AND b.value < 'C'"""),

    // Expression join key (a.key = 2*b.key): survivors are the keys
    // divisible by 4 (t2 keys are 2k, so 2·(2k) = 4k).
    sj("sj_expr_key", """
      SELECT key, value FROM t1 a LEFT SEMI JOIN t2 b ON a.key = 2 * b.key"""),

    // Empty build relation → empty semi result (and the dual: anti
    // against an empty build keeps EVERYTHING).
    sj("sj_empty_build", """
      SELECT (SELECT count(*) FROM t1 a LEFT SEMI JOIN t4 b ON a.key = b.key)
               AS n_semi,
             (SELECT count(*) FROM t1 a LEFT ANTI JOIN t4 b ON a.key = b.key)
               AS n_anti"""),

    // LEFT OUTER then SEMI on the outer's nullable column: rows where b
    // was null-extended can never pass the semi (NULL key matches
    // nothing under `=`).
    sj("sj_outer_then_semi", """
      SELECT a.key % 10 AS kg, count(*) AS n
      FROM t3 a LEFT JOIN t1 b ON a.key = b.key
      LEFT SEMI JOIN t2 c ON b.key = c.key
      GROUP BY a.key % 10"""),

    // SEMI then FULL OUTER: the semi filters t3 FIRST, then the full
    // join null-extends both ways against t1.
    sj("sj_semi_then_full", """
      SELECT count(*) AS n, count(c.key) AS matched
      FROM t3 a LEFT SEMI JOIN t2 b ON a.key = b.key
      FULL JOIN t1 c ON a.key = c.key"""),

    // Chained double semi: both existence tests must hold.
    sj("sj_chain2", """
      SELECT a.key % 10 AS kg, count(*) AS n
      FROM t3 a LEFT SEMI JOIN t1 b ON a.key = b.key
      LEFT SEMI JOIN t2 c ON a.key = c.key
      GROUP BY a.key % 10"""),

    // Composite condition (key AND value): existence needs BOTH to
    // match in one build row.
    sj("sj_composite", """
      SELECT count(*) AS n
      FROM t3 a LEFT SEMI JOIN t1 b ON a.key = b.key AND a.value = b.value"""),

    // Semi/anti partition the left relation exactly: |semi| + |anti|
    // must equal |t3| on the SAME inputs.
    sj("sj_anti_partitions", """
      SELECT (SELECT count(*) FROM t3 a LEFT SEMI JOIN t1 b ON a.key = b.key)
               AS n_semi,
             (SELECT count(*) FROM t3 a LEFT ANTI JOIN t1 b ON a.key = b.key)
               AS n_anti,
             (SELECT count(*) FROM t3) AS n_total"""),

    // ---- timestamp_1 / timestamp_2 grid ---------------------------------

    // Cast grid across fractional precisions: epoch-seconds (FLOORED —
    // the pre-epoch row is the trap), fractional double, canonical
    // string rendering (trailing zeros trimmed, identical on both
    // engines), string roundtrip, and date truncation.
    Q("ts_cast_grid",
      (s, _) => s.sql(sql(s"""
        SELECT s,
               CAST(CAST(s AS TIMESTAMP) AS BIGINT) AS secs,
               CAST(CAST(s AS TIMESTAMP) AS DOUBLE) AS dbl,
               CAST(CAST(s AS TIMESTAMP) AS STRING) AS str,
               CAST(CAST(CAST(s AS TIMESTAMP) AS STRING) AS TIMESTAMP)
                 = CAST(s AS TIMESTAMP) AS roundtrip,
               CAST(CAST(s AS TIMESTAMP) AS DATE) AS d
        FROM VALUES $sparkVals v(s)""")),
      Some(sql(s"""
        SELECT s,
               CAST(floor(epoch(CAST(s AS TIMESTAMP))) AS BIGINT) AS secs,
               epoch(CAST(s AS TIMESTAMP)) AS dbl,
               CAST(CAST(s AS TIMESTAMP) AS VARCHAR) AS str,
               CAST(CAST(CAST(s AS TIMESTAMP) AS VARCHAR) AS TIMESTAMP)
                 = CAST(s AS TIMESTAMP) AS roundtrip,
               CAST(CAST(s AS TIMESTAMP) AS DATE) AS d
        FROM $duckVals v(s)"""))),

    // Comparison grid (timestamp_comparison golden): every ordered pair
    // of the literal grid — sub-µs differences must order correctly and
    // the ns-digit literals must compare EQUAL to their µs truncations.
    Q("ts_compare_grid",
      (s, _) => s.sql(sql(s"""
        WITH g AS (SELECT s, CAST(s AS TIMESTAMP) AS t FROM VALUES $sparkVals v(s))
        SELECT a.s AS s1, b.s AS s2, a.t < b.t AS lt, a.t = b.t AS eq,
               a.t >= b.t AS ge
        FROM g a CROSS JOIN g b""")),
      Some(sql(s"""
        WITH g AS (SELECT s, CAST(s AS TIMESTAMP) AS t FROM $duckVals v(s))
        SELECT a.s AS s1, b.s AS s2, a.t < b.t AS lt, a.t = b.t AS eq,
               a.t >= b.t AS ge
        FROM g a CROSS JOIN g b"""))),

    // Interval arithmetic + day difference over a real scan (timestamp_2
    // arithmetic rows), re-aggregated per status: +1 day, −90 minutes,
    // month truncation, and whole-day difference to a fixed date.
    Q("ts_arith_grid",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_ts_o")
        s.sql(sql("""
          SELECT o_orderstatus,
                 CAST(min(o_orderdate + INTERVAL 1 DAY) AS STRING) AS min_plus_day,
                 CAST(max(o_orderdate - INTERVAL 90 MINUTE) AS STRING) AS max_minus_90m,
                 CAST(CAST(min(date_trunc('month', o_orderdate)) AS DATE) AS STRING) AS min_month,
                 CAST(max(datediff(DATE '1998-12-01', CAST(o_orderdate AS DATE))) AS INT) AS max_days_to
          FROM graft_ts_o GROUP BY o_orderstatus"""))
      },
      Some(sql("""
        SELECT o_orderstatus,
               CAST(min(o_orderdate + INTERVAL 1 DAY) AS VARCHAR) AS min_plus_day,
               CAST(max(o_orderdate - INTERVAL 90 MINUTE) AS VARCHAR) AS max_minus_90m,
               CAST(CAST(min(date_trunc('month', o_orderdate)) AS DATE) AS VARCHAR) AS min_month,
               CAST(max(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01')) AS INT) AS max_days_to
        FROM orders GROUP BY o_orderstatus"""))),

    // Field extraction (timestamp_udf golden): the full field set on the
    // literal grid. Engine deltas pinned in the oracle: DuckDB's
    // dayofweek is 0=Sunday vs Spark's 1=Sunday (+1), and DuckDB types
    // fields BIGINT vs Spark INT (explicit casts).
    Q("ts_fields",
      (s, _) => s.sql(sql(s"""
        SELECT s, year(t) AS y, quarter(t) AS q, month(t) AS mo, day(t) AS d,
               hour(t) AS h, minute(t) AS mi, second(t) AS sec,
               dayofweek(t) AS dw, weekofyear(t) AS wy, dayofyear(t) AS dy
        FROM (SELECT s, CAST(s AS TIMESTAMP) AS t FROM VALUES $sparkVals v(s))""")),
      Some(sql(s"""
        SELECT s, CAST(year(t) AS INT) AS y, CAST(quarter(t) AS INT) AS q,
               CAST(month(t) AS INT) AS mo, CAST(day(t) AS INT) AS d,
               CAST(hour(t) AS INT) AS h, CAST(minute(t) AS INT) AS mi,
               CAST(second(t) AS INT) AS sec,
               CAST(dayofweek(t) + 1 AS INT) AS dw,
               CAST(weekofyear(t) AS INT) AS wy,
               CAST(dayofyear(t) AS INT) AS dy
        FROM (SELECT s, CAST(s AS TIMESTAMP) AS t FROM $duckVals v(s))"""))),

    // ---- multi_insert_lateral_view crossing ------------------------------

    // One scan, three INSERT branches: LV+GROUP BY, plain LV fan-out,
    // and a WHERE+GROUP BY branch with no LV — the golden family's three
    // plan shapes in one statement. Catalog read-back as a tagged union.
    Q("sql_multi_insert_lv",
      (s, d) => {
        table(s, d, "customer")
          .selectExpr("c_custkey AS key", "c_mktsegment AS value")
          .where("c_custkey <= 100")
          .createOrReplaceTempView("graft_milv_src")
        Seq("graft_milv1", "graft_milv2", "graft_milv3").foreach(dropManaged(s, _))
        s.sql("CREATE TABLE graft_milv1 (key BIGINT, v BIGINT) USING parquet")
        s.sql("CREATE TABLE graft_milv2 (key BIGINT, v BIGINT) USING parquet")
        s.sql("CREATE TABLE graft_milv3 (key BIGINT, v BIGINT) USING parquet")
        s.sql(sql("""
          FROM graft_milv_src
          INSERT OVERWRITE TABLE graft_milv1
            SELECT key, CAST(sum(C) AS BIGINT)
            LATERAL VIEW explode(array(key + 1, key + 2)) A AS C GROUP BY key
          INSERT OVERWRITE TABLE graft_milv2
            SELECT key, C LATERAL VIEW explode(array(key + 3, key + 4)) A AS C
          INSERT OVERWRITE TABLE graft_milv3
            SELECT key, count(value) WHERE key > 50 GROUP BY key"""))
        s.sql(sql("""
          SELECT 'lv_gby' AS tag, key, v FROM graft_milv1
          UNION ALL SELECT 'lv' AS tag, key, v FROM graft_milv2
          UNION ALL SELECT 'gby' AS tag, key, v FROM graft_milv3"""))
      },
      Some(sql("""
        WITH src AS (SELECT c_custkey AS key, c_mktsegment AS value
                     FROM customer WHERE c_custkey <= 100)
        SELECT 'lv_gby' AS tag, key, CAST(sum(c) AS BIGINT) AS v
        FROM (SELECT key, unnest([key + 1, key + 2]) AS c FROM src) GROUP BY key
        UNION ALL
        SELECT 'lv' AS tag, key, unnest([key + 3, key + 4]) AS v FROM src
        UNION ALL
        SELECT 'gby' AS tag, key, count(value) AS v FROM src
        WHERE key > 50 GROUP BY key""")))
  )
}
