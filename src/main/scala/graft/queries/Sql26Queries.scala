package graft.queries

import graft.Engine.table
import Registry.{dropManaged, sql}

/** Round-13 golden wave 11 — the last untouched scalar families
  * (reference HiveCompatibilitySuite.scala:246 whiteList):
  *
  *   - `udf_java_method` + `udf_reflect2` (~10 golden files): Hive's
  *     reflection UDFs. Spark ships the same surface natively
  *     (`java_method` / `reflect` → CallMethodViaReflection), restricted
  *     to static methods of whitelisted-classpath classes.
  *   - `udf_acos`/`udf_asin`/`udf_atan`/`udf_degrees` (~16): the inverse
  *     trig grid (forward trig + radians long crossed in Geo/Expr rows).
  *   - `mapreduce1..8` (mapreduce1.q): Hive's MAP ... USING / REDUCE ...
  *     USING keyword spellings of ScriptTransformation, composed with
  *     FROM-first INSERT and DISTRIBUTE BY/SORT BY, string outputs
  *     implicitly cast on insert into a typed table.
  */
object Sql26Queries {

  val all: Seq[Q] = Seq(

    // ── udf_java_method / udf_reflect2: reflection scalar calls ───────
    // DuckDB has no reflection; the oracle pins the exact values the
    // JDK methods must return (deterministic pure-static calls).
    Q("expr_reflect",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_rfl_n")
        s.sql(sql("""
          SELECT n_nationkey AS k,
                 java_method('java.lang.Integer', 'toHexString', n_nationkey) AS hex,
                 reflect('java.lang.Math', 'abs', n_nationkey - 20) AS abs20,
                 java_method('java.lang.String', 'valueOf', n_nationkey % 2 = 0) AS even_str
          FROM graft_rfl_n WHERE n_nationkey < 4"""))
      },
      Some(sql("""
        SELECT n_nationkey AS k,
               format('{:x}', n_nationkey) AS hex,
               CAST(abs(n_nationkey - 20) AS VARCHAR) AS abs20,
               CAST(n_nationkey % 2 = 0 AS VARCHAR) AS even_str
        FROM nation WHERE n_nationkey < 4"""))),

    // ── inverse trig grid ─────────────────────────────────────────────
    // floor(1e6·x + 0.5) fixed-point carried as BIGINT — half-up, NOT
    // bare floor: inverse-trig/log are transcendentals, where the JVM's
    // and DuckDB's libm may differ by an ULP, and bare floor's
    // knife-edge sits AT integers (OracleLint knife-edge class; e.g.
    // log2(4.0) via ln(x)/ln(2) can read 1.9999999999999998).
    Q("expr_inverse_trig",
      (s, d) => {
        table(s, d, "region").createOrReplaceTempView("graft_trig_r")
        s.sql(sql("""
          SELECT r_regionkey AS k,
                 CAST(floor(1e6 * acos(r_regionkey / 10.0) + 0.5) AS BIGINT) AS acos_v,
                 CAST(floor(1e6 * asin(r_regionkey / 10.0) + 0.5) AS BIGINT) AS asin_v,
                 CAST(floor(1e6 * atan(r_regionkey / 10.0) + 0.5) AS BIGINT) AS atan_v,
                 CAST(floor(1e6 * atan2(CAST(r_regionkey AS DOUBLE), 3.0) + 0.5) AS BIGINT) AS atan2_v,
                 CAST(floor(1e6 * degrees(atan(r_regionkey / 10.0)) + 0.5) AS BIGINT) AS deg_v
          FROM graft_trig_r"""))
      },
      Some(sql("""
        SELECT r_regionkey AS k,
               CAST(floor(1e6 * acos(r_regionkey / 10.0) + 0.5) AS BIGINT) AS acos_v,
               CAST(floor(1e6 * asin(r_regionkey / 10.0) + 0.5) AS BIGINT) AS asin_v,
               CAST(floor(1e6 * atan(r_regionkey / 10.0) + 0.5) AS BIGINT) AS atan_v,
               CAST(floor(1e6 * atan2(CAST(r_regionkey AS DOUBLE), 3.0) + 0.5) AS BIGINT) AS atan2_v,
               CAST(floor(1e6 * degrees(atan(r_regionkey / 10.0)) + 0.5) AS BIGINT) AS deg_v
        FROM region"""))),

    // ── udf_log/udf_log2/udf_nvl: the last whiteList scalar tail ──────
    // log(base, x) and log2 close the log family (ln/log10 long
    // crossed); nvl/nvl2 are the Hive null-default spellings on top of
    // the already-crossed coalesce/ifnull grid.
    Q("expr_log_nvl_grid",
      (s, d) => {
        table(s, d, "region").createOrReplaceTempView("graft_ln_r")
        s.sql(sql("""
          SELECT r_regionkey AS k,
                 CAST(floor(1e6 * log(3.0, r_regionkey + 2.0) + 0.5) AS BIGINT) AS logb_v,
                 CAST(floor(1e6 * log2(r_regionkey + 2.0) + 0.5) AS BIGINT) AS log2_v,
                 nvl(nullif(r_regionkey, 2), -1) AS nvl_v,
                 nvl2(nullif(r_regionkey, 2), 'present', 'was_null') AS nvl2_v
          FROM graft_ln_r"""))
      },
      Some(sql("""
        SELECT r_regionkey AS k,
               CAST(floor(1e6 * log(r_regionkey + 2.0) / log(3.0) + 0.5) AS BIGINT) AS logb_v,
               CAST(floor(1e6 * log2(r_regionkey + 2.0) + 0.5) AS BIGINT) AS log2_v,
               coalesce(nullif(r_regionkey, 2), -1) AS nvl_v,
               CASE WHEN nullif(r_regionkey, 2) IS NOT NULL
                    THEN 'present' ELSE 'was_null' END AS nvl2_v
        FROM region"""))),

    // ── mapreduce1: MAP/REDUCE keyword ScriptTransformation ───────────
    // The Hive-dialect spellings of SELECT TRANSFORM (mapreduce1.q's
    // FROM-first INSERT + MAP ... USING 'cat' + DISTRIBUTE BY/SORT BY;
    // a REDUCE leg besides). The MAP clause declares TYPED output
    // columns (the script emits strings; ScriptTransformation casts to
    // the declared types — Spark's ANSI store-assignment would reject
    // Hive's untyped-string implicit insert cast), so the round-trip
    // proves the serde + cast chain, not just the pipe.
    Q("sql_map_reduce_syntax",
      (s, d) => {
        table(s, d, "nation").createOrReplaceTempView("graft_mr_src")
        dropManaged(s, "graft_mr")
        s.sql(sql("""CREATE TABLE graft_mr
                     (tkey BIGINT, ten BIGINT, one BIGINT, tvalue STRING)
                     USING parquet"""))
        s.sql(sql("""
          FROM graft_mr_src
          INSERT OVERWRITE TABLE graft_mr
          MAP n_nationkey, CAST(n_nationkey / 10 AS INT),
              CAST(n_nationkey % 10 AS INT), n_name
          USING 'cat' AS (tkey BIGINT, ten BIGINT, one BIGINT, tvalue STRING)
          DISTRIBUTE BY tvalue, tkey
          SORT BY ten, one"""))
        s.sql(sql("""
          SELECT 'map_insert' AS tag, count(*) AS n,
                 CAST(sum(tkey * 131 + ten * 17 + one) AS BIGINT) AS chk
          FROM graft_mr
          UNION ALL
          SELECT 'reduce', count(*), CAST(sum(CAST(k AS BIGINT)) AS BIGINT)
          FROM (REDUCE n_nationkey, n_name USING 'cat' AS (k STRING, v STRING)
                FROM graft_mr_src)"""))
      },
      Some(sql("""
        SELECT 'map_insert' AS tag, count(*) AS n,
               CAST(sum(n_nationkey * 131
                        + CAST(floor(n_nationkey / 10.0) AS BIGINT) * 17
                        + n_nationkey % 10) AS BIGINT) AS chk
        FROM nation
        UNION ALL
        SELECT 'reduce', count(*), CAST(sum(n_nationkey) AS BIGINT)
        FROM nation""")))
  )
}
