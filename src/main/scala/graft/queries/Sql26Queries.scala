package graft.queries

import graft.Engine.table
import Registry.sql

/** Round-13 golden wave 11 — the last untouched scalar families
  * (reference HiveCompatibilitySuite.scala:246 whiteList):
  *
  *   - `udf_java_method` + `udf_reflect2` (~10 golden files): Hive's
  *     reflection UDFs. Spark ships the same surface natively
  *     (`java_method` / `reflect` → CallMethodViaReflection), restricted
  *     to static methods of whitelisted-classpath classes.
  *   - `udf_acos`/`udf_asin`/`udf_atan`/`udf_degrees` (~16): the inverse
  *     trig grid (forward trig + radians long crossed in Geo/Expr rows).
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
    // floor(1e6·x) fixed-point carried as BIGINT — both engines evaluate
    // the same IEEE chain (the Flesch/readability convention).
    Q("expr_inverse_trig",
      (s, d) => {
        table(s, d, "region").createOrReplaceTempView("graft_trig_r")
        s.sql(sql("""
          SELECT r_regionkey AS k,
                 CAST(floor(1e6 * acos(r_regionkey / 10.0)) AS BIGINT) AS acos_v,
                 CAST(floor(1e6 * asin(r_regionkey / 10.0)) AS BIGINT) AS asin_v,
                 CAST(floor(1e6 * atan(r_regionkey / 10.0)) AS BIGINT) AS atan_v,
                 CAST(floor(1e6 * atan2(CAST(r_regionkey AS DOUBLE), 3.0)) AS BIGINT) AS atan2_v,
                 CAST(floor(1e6 * degrees(atan(r_regionkey / 10.0))) AS BIGINT) AS deg_v
          FROM graft_trig_r"""))
      },
      Some(sql("""
        SELECT r_regionkey AS k,
               CAST(floor(1e6 * acos(r_regionkey / 10.0)) AS BIGINT) AS acos_v,
               CAST(floor(1e6 * asin(r_regionkey / 10.0)) AS BIGINT) AS asin_v,
               CAST(floor(1e6 * atan(r_regionkey / 10.0)) AS BIGINT) AS atan_v,
               CAST(floor(1e6 * atan2(CAST(r_regionkey AS DOUBLE), 3.0)) AS BIGINT) AS atan2_v,
               CAST(floor(1e6 * degrees(atan(r_regionkey / 10.0))) AS BIGINT) AS deg_v
        FROM region""")))
  )
}
