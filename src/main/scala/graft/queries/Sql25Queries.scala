package graft.queries

import graft.Engine.table
import org.apache.spark.sql.functions._
import Registry.{dropManaged, rmTree, sql}

/** Round-13 golden wave 10 — remaining mid-tail families (reference
  * HiveCompatibilitySuite.scala:246 whiteList; query sources under
  * sql/hive/src/test/resources/ql/src/test/queries/clientpositive/):
  *
  *   - `reduce_deduplicate_extended` (36 golden files,
  *     reduce_deduplicate_extended.q): Hive's RS-deduplication — a
  *     reduce-sink followed by a compatible reduce-sink collapses into
  *     one shuffle. The Spark-first analog is EnsureRequirements reusing
  *     a child's hashpartitioning: DISTRIBUTE BY k followed by GROUP BY
  *     k plans ONE exchange total (PlanSpec-fenced); the grid also pins
  *     the semantics of gby→order, nested gby, and DISTINCT-after-gby.
  *   - `correlationoptimizer14` (26 files, correlationoptimizer14.q):
  *     subqueries that DISTRIBUTE BY the join key feed a join on that
  *     key — the join (and the agg above it) must reuse both
  *     repartitions instead of re-shuffling.
  *   - `nullgroup3` (22 files, nullgroup3.q): aggregates over partitioned
  *     tables where some partitions hold zero rows — counts skip empty
  *     partitions, a partition-pruned scan of ONLY empty partitions
  *     yields the global-agg-over-empty-input row (count 0 / sum NULL),
  *     and a grouped agg over empty input yields zero rows.
  *   - `insert1` (22 files, insert1.q / HIVE-3465/3676): INSERT
  *     INTO/OVERWRITE across databases with db-qualified and
  *     case-insensitive target names.
  *   - `alter5` (22 files, alter5.q / HIVE-2117): ADD PARTITION with an
  *     explicit LOCATION — inserts land under the custom directory and
  *     reads resolve through it.
  */
object Sql25Queries {

  val all: Seq[Q] = Seq(

    // ── reduce_deduplicate_extended: the RS-dedup semantic grid ───────
    // Plan side (one exchange for DISTRIBUTE BY k → GROUP BY k) is
    // fenced in PlanSpec; this row pins the ANSWERS of the four shapes.
    Q("sql_rs_dedup_chain",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_rd_c")
        s.sql(sql("""
          SELECT 'dist_gby' AS tag, count(*) AS n,
                 CAST(sum(k * 131 + sk) AS BIGINT) AS chk
          FROM (SELECT c_nationkey AS k, CAST(sum(c_custkey) AS BIGINT) AS sk
                FROM (SELECT c_custkey, c_nationkey FROM graft_rd_c
                      DISTRIBUTE BY c_nationkey
                      SORT BY c_nationkey, c_custkey)
                GROUP BY c_nationkey)
          UNION ALL
          SELECT 'gby_order_first', count(*),
                 CAST(sum(k * 131 + sk) AS BIGINT)
          FROM (SELECT c_nationkey AS k, CAST(sum(c_custkey) AS BIGINT) AS sk
                FROM graft_rd_c GROUP BY c_nationkey
                ORDER BY sk DESC, k LIMIT 1)
          UNION ALL
          SELECT 'nested_gby', count(*), CAST(sum(k) AS BIGINT)
          FROM (SELECT k FROM (SELECT c_nationkey AS k, c_mktsegment AS v
                               FROM graft_rd_c GROUP BY 1, 2)
                GROUP BY k)
          UNION ALL
          SELECT 'distinct_after_gby', count(*),
                 CAST(sum(k * 131 + c) AS BIGINT)
          FROM (SELECT k, count(DISTINCT v) AS c
                FROM (SELECT c_nationkey AS k, c_mktsegment AS v
                      FROM graft_rd_c GROUP BY 1, 2)
                GROUP BY k)"""))
      },
      // DISTRIBUTE BY / SORT BY are layout directives, not semantics —
      // the DuckDB twin drops them (identity on the row multiset).
      Some(sql("""
        SELECT 'dist_gby' AS tag, count(*) AS n,
               CAST(sum(k * 131 + sk) AS BIGINT) AS chk
        FROM (SELECT c_nationkey AS k, CAST(sum(c_custkey) AS BIGINT) AS sk
              FROM customer GROUP BY c_nationkey)
        UNION ALL
        SELECT 'gby_order_first', count(*), CAST(sum(k * 131 + sk) AS BIGINT)
        FROM (SELECT c_nationkey AS k, CAST(sum(c_custkey) AS BIGINT) AS sk
              FROM customer GROUP BY c_nationkey
              ORDER BY sk DESC, k LIMIT 1)
        UNION ALL
        SELECT 'nested_gby', count(*), CAST(sum(k) AS BIGINT)
        FROM (SELECT k FROM (SELECT c_nationkey AS k, c_mktsegment AS v
                             FROM customer GROUP BY 1, 2) GROUP BY k)
        UNION ALL
        SELECT 'distinct_after_gby', count(*),
               CAST(sum(k * 131 + c) AS BIGINT)
        FROM (SELECT k, count(DISTINCT v) AS c
              FROM (SELECT c_nationkey AS k, c_mktsegment AS v
                    FROM customer GROUP BY 1, 2) GROUP BY k)"""))),

    // ── correlationoptimizer14: join rides both DISTRIBUTE BYs ────────
    // Two subqueries each DISTRIBUTE BY the join key, then joined on it:
    // the join must reuse BOTH repartitions (2 exchanges total, both the
    // DISTRIBUTE BYs' — PlanSpec-fenced). The census collapses the join
    // to bounded groups.
    Q("sql_rs_dedup_join",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_rdj_c")
        table(s, d, "nation").createOrReplaceTempView("graft_rdj_n")
        s.sql(sql("""
          SELECT xx.k AS k, count(*) AS n,
                 CAST(sum(xx.ck) AS BIGINT) AS cksum
          FROM (SELECT c_nationkey AS k, c_custkey AS ck FROM graft_rdj_c
                DISTRIBUTE BY k) xx
          JOIN (SELECT n_nationkey AS k, n_name FROM graft_rdj_n
                DISTRIBUTE BY k) yy
          ON xx.k = yy.k
          GROUP BY xx.k"""))
      },
      Some(sql("""
        SELECT c_nationkey AS k, count(*) AS n,
               CAST(sum(c_custkey) AS BIGINT) AS cksum
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY c_nationkey"""))),

    // ── nullgroup3: aggregates over empty partitions ──────────────────
    Q("sql_empty_partition_agg",
      (s, d) => {
        dropManaged(s, "graft_np")
        s.sql(sql("""CREATE TABLE graft_np (k BIGINT, v STRING)
                     USING parquet PARTITIONED BY (ds STRING)"""))
        table(s, d, "nation").createOrReplaceTempView("graft_np_src")
        s.sql(sql("""INSERT INTO graft_np PARTITION (ds='full')
                     SELECT n_nationkey, n_name FROM graft_np_src"""))
        s.sql("ALTER TABLE graft_np ADD PARTITION (ds='empty')")
        val sq = s; import sq.implicits._
        val parts = s.sql("SHOW PARTITIONS graft_np").count()
        val total = s.table("graft_np").count()
        // global agg over the empty partition: one row, count 0, sum NULL
        val eRow = s.sql(sql("""SELECT count(*) AS c, sum(k) AS sk
                                FROM graft_np WHERE ds = 'empty'""")).collect()(0)
        // grouped agg over empty input: zero rows
        val eGrouped = s.sql(sql("""SELECT v, count(*) FROM graft_np
                                    WHERE ds = 'empty' GROUP BY v""")).count()
        Seq(("partitions", parts), ("total_rows", total),
          ("empty_count", eRow.getLong(0)),
          ("empty_sum_is_null", if (eRow.isNullAt(1)) 1L else 0L),
          ("empty_grouped_rows", eGrouped))
          .toDF("metric", "value")
      },
      Some(sql("""
        SELECT 'partitions' AS metric, CAST(2 AS BIGINT) AS value
        UNION ALL SELECT 'total_rows', (SELECT count(*) FROM nation)
        UNION ALL SELECT 'empty_count', 0
        UNION ALL SELECT 'empty_sum_is_null', 1
        UNION ALL SELECT 'empty_grouped_rows', 0"""))),

    // ── insert1: INSERT INTO/OVERWRITE across databases ───────────────
    Q("sql_cross_db_insert",
      (s, d) => {
        s.sql("DROP DATABASE IF EXISTS graft_ins1 CASCADE")
        s.sql("DROP DATABASE IF EXISTS graft_ins2 CASCADE")
        // the db warehouse dirs can survive from a previous JVM whose
        // metastore is gone (the dropManaged rationale, db-shaped) —
        // CREATE TABLE then refuses the stale managed location
        rmTree(new java.io.File("/tmp/graft_warehouse/graft_ins1.db"))
        rmTree(new java.io.File("/tmp/graft_warehouse/graft_ins2.db"))
        s.sql("CREATE DATABASE graft_ins1")
        s.sql("CREATE DATABASE graft_ins2")
        s.sql("CREATE TABLE graft_ins1.result (col1 STRING) USING parquet")
        s.sql("CREATE TABLE graft_ins2.result (col1 STRING) USING parquet")
        // db-qualified + case-insensitive identifiers (HIVE-3465 class)
        s.sql("INSERT OVERWRITE TABLE graft_ins1.result VALUES ('db1_insert1')")
        s.sql("INSERT INTO TABLE graft_INS1.RESULT VALUES ('db1_insert2')")
        s.sql("INSERT OVERWRITE TABLE graft_ins2.result VALUES ('db2_insert1')")
        s.sql("INSERT INTO TABLE graft_ins2.result VALUES ('db2_insert2')")
        // overwrite semantics: re-overwrite db2 and confirm the append
        // survives only in db1
        s.sql("INSERT OVERWRITE TABLE graft_ins2.result VALUES ('db2_final')")
        s.sql(sql("""
          SELECT 'db1' AS db, col1 FROM graft_ins1.result
          UNION ALL
          SELECT 'db2', col1 FROM graft_ins2.result"""))
      },
      Some(sql("""
        SELECT 'db1' AS db, 'db1_insert1' AS col1
        UNION ALL SELECT 'db1', 'db1_insert2'
        UNION ALL SELECT 'db2', 'db2_final'"""))),

    // ── alter5: ADD PARTITION with explicit LOCATION ──────────────────
    Q("sql_partition_custom_location",
      (s, d) => {
        dropManaged(s, "graft_a5")
        val loc = "/tmp/graft_a5_parta"
        rmTree(new java.io.File(loc))
        s.sql(sql("""CREATE TABLE graft_a5 (col1 BIGINT)
                     USING parquet PARTITIONED BY (dt STRING)"""))
        s.sql(s"ALTER TABLE graft_a5 ADD PARTITION (dt='a') LOCATION '$loc'")
        table(s, d, "region").createOrReplaceTempView("graft_a5_src")
        s.sql(sql("""INSERT OVERWRITE TABLE graft_a5 PARTITION (dt='a')
                     SELECT r_regionkey FROM graft_a5_src"""))
        val sq = s; import sq.implicits._
        val rows = s.sql("SELECT count(*) FROM graft_a5 WHERE dt='a'")
          .collect()(0).getLong(0)
        val ksum = s.sql(sql("""SELECT CAST(sum(col1) AS BIGINT)
                                FROM graft_a5""")).collect()(0).getLong(0)
        // the data files must live under the CUSTOM directory
        val files = Option(new java.io.File(loc).listFiles())
          .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
        val descLoc = s.sql("DESCRIBE EXTENDED graft_a5 PARTITION (dt='a')")
          .collect().exists(r => r.getString(0) == "Location" &&
            r.getString(1).contains("graft_a5_parta"))
        Seq(("rows", rows), ("ksum", ksum),
          ("files_in_custom_loc", if (files > 0) 1L else 0L),
          ("desc_shows_custom_loc", if (descLoc) 1L else 0L))
          .toDF("metric", "value")
      },
      Some(sql("""
        SELECT 'rows' AS metric, (SELECT count(*) FROM region) AS value
        UNION ALL SELECT 'ksum',
          (SELECT CAST(sum(r_regionkey) AS BIGINT) FROM region)
        UNION ALL SELECT 'files_in_custom_loc', 1
        UNION ALL SELECT 'desc_shows_custom_loc', 1""")))
  )
}
