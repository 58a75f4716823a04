package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.{dropManaged, sql}

/** Round-13 golden wave 9 — remaining mid-tail families (reference
  * HiveCompatibilitySuite.scala:246 whiteList; golden files under
  * sql/hive/src/test/resources/golden/):
  *
  *   - `union_remove_1..25` (~150 files in aggregate): Hive's
  *     UnionRemove optimization writes union branches straight into the
  *     target without a union MR stage. Spark-first analog: INSERT of a
  *     UNION ALL of aggregating branches plans the branches as
  *     independent stages under ONE write job — no exchange above the
  *     Union (PlanSpec-fenced on the SELECT).
  *   - `show_create_table_alter`/`show_create_table_*` (~30): SHOW
  *     CREATE TABLE round-trip — the emitted DDL recreates an
  *     equivalent table.
  *   - `set_variable_sub` (11): Hive var substitution; the Spark-4
  *     surface is SQL session variables (DECLARE VARIABLE / SET VAR /
  *     references in queries).
  *   - `database_location` + `database_properties` (23): CREATE DATABASE
  *     with custom LOCATION and DBPROPERTIES, read back via DESCRIBE
  *     DATABASE EXTENDED.
  */
object Sql24Queries {

  val all: Seq[Q] = Seq(

    // ── union_remove class: INSERT of a UNION ALL of agg branches ─────
    Q("sql_union_insert_parallel",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_uip_src")
        dropManaged(s, "graft_uip")
        s.sql("CREATE TABLE graft_uip (tag STRING, k STRING, n BIGINT) USING parquet")
        s.sql(sql("""
          INSERT OVERWRITE TABLE graft_uip
          SELECT 'status' AS tag, o_orderstatus AS k, count(*) AS n
          FROM graft_uip_src GROUP BY o_orderstatus
          UNION ALL
          SELECT 'prio', o_orderpriority, count(*)
          FROM graft_uip_src GROUP BY o_orderpriority"""))
        s.sql("SELECT tag, k, n FROM graft_uip")
      },
      Some(sql("""
        SELECT 'status' AS tag, o_orderstatus AS k, count(*) AS n
        FROM orders GROUP BY o_orderstatus
        UNION ALL
        SELECT 'prio', o_orderpriority, count(*)
        FROM orders GROUP BY o_orderpriority"""))),

    // ── show_create_table: the emitted DDL recreates the table ────────
    // The DDL text itself is layout/version-dependent, so the row pins
    // the ROUND-TRIP: run SHOW CREATE TABLE, re-execute it under a new
    // name, and compare the clone's schema + partitioning census.
    Q("sql_show_create_roundtrip",
      (s, d) => {
        dropManaged(s, "graft_sct"); dropManaged(s, "graft_sct2")
        s.sql(sql("""CREATE TABLE graft_sct
                     (k BIGINT, name STRING, bal DOUBLE) USING parquet
                     PARTITIONED BY (st STRING)"""))
        val ddl = s.sql("SHOW CREATE TABLE graft_sct")
          .collect()(0).getString(0)
        s.sql(ddl.replace("graft_sct", "graft_sct2"))
        s.sql("INSERT INTO graft_sct2 PARTITION (st='A') VALUES (1, 'x', 2.5)")
        val sq = s; import sq.implicits._
        val cols = s.sql("SHOW COLUMNS IN graft_sct2").as[String].collect().toSeq
        val parts = s.sql("SHOW PARTITIONS graft_sct2").count()
        val rows = s.table("graft_sct2").count()
        Seq(("cols", cols.sorted.mkString("|")),
          ("parts", parts.toString), ("rows", rows.toString))
          .toDF("metric", "value")
      },
      Some(sql("""
        SELECT 'cols' AS metric, 'bal|k|name|st' AS value
        UNION ALL SELECT 'parts', '1' UNION ALL SELECT 'rows', '1'"""))),

    // ── set_variable_sub → Spark-4 SQL session variables ──────────────
    Q("sql_session_variables",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_sv_c")
        s.sql("DECLARE OR REPLACE VARIABLE graft_cutoff BIGINT DEFAULT 0")
        s.sql("SET VAR graft_cutoff = 100")
        s.sql("DECLARE OR REPLACE VARIABLE graft_seg STRING DEFAULT 'BUILDING'")
        s.sql(sql("""
          SELECT count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS ksum,
                 graft_cutoff AS cutoff_used
          FROM graft_sv_c
          WHERE c_custkey <= graft_cutoff AND c_mktsegment = graft_seg"""))
      },
      Some(sql("""
        SELECT count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS ksum,
               CAST(100 AS BIGINT) AS cutoff_used
        FROM customer
        WHERE c_custkey <= 100 AND c_mktsegment = 'BUILDING'"""))),

    // ── database LOCATION + DBPROPERTIES ──────────────────────────────
    Q("sql_db_location_props",
      (s, d) => {
        s.sql("DROP DATABASE IF EXISTS graft_dbp CASCADE")
        val loc = "/tmp/graft_dbp_loc"
        // the location can survive from a previous JVM whose in-memory
        // metastore is gone (the dropManaged rationale, db-shaped):
        // CREATE TABLE refuses to reuse it, so clear it first
        Registry.rmTree(new java.io.File(loc))
        s.sql(sql(s"""CREATE DATABASE graft_dbp LOCATION '$loc'
                      WITH DBPROPERTIES ('team' = 'graft', 'tier' = 'gold')"""))
        s.sql("CREATE TABLE graft_dbp.t1 (k BIGINT) USING parquet")
        s.sql("INSERT INTO graft_dbp.t1 VALUES (7), (11)")
        val sq = s; import sq.implicits._
        val info = s.sql("DESCRIBE DATABASE EXTENDED graft_dbp")
          .as[(String, String)].collect().toMap
        val locOk = info.get("Location").exists(_.contains("graft_dbp_loc"))
        val props = info.getOrElse("Properties", "")
        val ksum = s.table("graft_dbp.t1")
          .agg(expr("CAST(sum(k) AS BIGINT)")).collect()(0).getLong(0)
        Seq(("loc_ok", locOk.toString),
          ("has_team", props.contains("team").toString),
          ("has_tier", props.contains("tier").toString),
          ("ksum", ksum.toString))
          .toDF("metric", "value")
      },
      Some(sql("""
        SELECT 'loc_ok' AS metric, 'true' AS value
        UNION ALL SELECT 'has_team', 'true'
        UNION ALL SELECT 'has_tier', 'true'
        UNION ALL SELECT 'ksum', '18'""")))
  )
}
