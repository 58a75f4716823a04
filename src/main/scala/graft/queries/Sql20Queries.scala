package graft.queries

import graft.Engine.table
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import Registry.{dropManaged, sql}

/** Round-13 golden wave 2 — the remaining large uncrossed families:
  *
  *   - `smb_mapjoin_*` / `auto_sortmerge_join_*` (~400 golden files
  *     combined): joins on co-bucketed, co-sorted tables must read the
  *     bucket layout as the join partitioning — ZERO shuffle under the
  *     join for inner/outer/multi-way shapes, and a join-key aggregation
  *     directly on the join output adds NO further exchange. At 100 TB
  *     this is THE warehouse join idiom: both fact tables pre-bucketed
  *     by the FK, every daily join map-side.
  *   - `correlationoptimizer1` (68 files): Hive's correlation optimizer
  *     merged the join shuffle with the following aggregation's shuffle;
  *     Spark expresses the same contract as output-partitioning reuse —
  *     the agg keyed on the join key reuses the join's partitioning
  *     (PlanSpec pins the exact exchange count).
  *   - `multiMapJoin1/2` (67 files): a CHAIN of broadcast joins must
  *     stay in one map stage — no shuffle between consecutive joins.
  *   - `database_drop` (49 files): CREATE DATABASE → objects → DROP
  *     DATABASE CASCADE lifecycle.
  *   - `alter2`-adjacent `rename_column`/schema-evolution slice: ALTER
  *     TABLE ADD COLUMNS, old rows reading NULL for the new column.
  *   - `stats0` / `annotate_stats_part` (61 files): ANALYZE TABLE ...
  *     FOR COLUMNS must land EXACT min/max/null-count in the catalog
  *     (the oracle recomputes them from the raw data — the catalog is
  *     hash-compared against DuckDB).
  *   - `union31` (26 files): UNION ALL branches feeding a join + group
  *     by.
  */
object Sql20Queries {

  /** Stage the co-bucketed co-sorted pair (+ a second customer
    * projection for the 3-way row) once per fixture fingerprint per JVM.
    * Catalog tables can't use the rename-based Staging protocol, so the
    * guard is an in-process fingerprint check — each JVM stages at most
    * once per testdata generation. */
  @volatile private var smbStaged: String = ""
  private def smbTables(s: SparkSession, d: String): Unit = this.synchronized {
    val fp = d + "|" + graft.Staging.fingerprint(s"$d/orders.parquet") +
      "|" + graft.Staging.fingerprint(s"$d/customer.parquet")
    val have = Seq("graft_smb_o", "graft_smb_c", "graft_smb_c2")
      .forall(s.catalog.tableExists)
    if (smbStaged != fp || !have) {
      Seq("graft_smb_o", "graft_smb_c", "graft_smb_c2").foreach(dropManaged(s, _))
      table(s, d, "orders")
        .repartition(8, col("o_custkey"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("graft_smb_o")
      table(s, d, "customer")
        .repartition(8, col("c_custkey"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("graft_smb_c")
      table(s, d, "customer")
        .select(col("c_custkey").as("k2"), col("c_nationkey"))
        .repartition(8, col("k2"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "k2").sortBy("k2").saveAsTable("graft_smb_c2")
      smbStaged = fp
    }
  }

  private def smb(name: String, sparkBody: String, oracleBody: String): Q =
    Q(name,
      (s, d) => { smbTables(s, d); s.sql(sql(sparkBody)) },
      Some(sql(oracleBody)))

  val all: Seq[Q] = Seq(

    // FULL OUTER on the bucket key: the join itself runs on the bucket
    // layout (zero shuffle — PlanSpec pins exactly ONE exchange in the
    // whole plan, the mod-10 re-aggregation); customers with no orders
    // surface as the NULL kg group.
    smb("smb_outer_grid", """
      SELECT o_custkey % 10 AS kg, count(*) AS n, count(c_custkey) AS matched
      FROM graft_smb_o o FULL JOIN graft_smb_c c ON o.o_custkey = c.c_custkey
      GROUP BY o_custkey % 10""", """
      SELECT o_custkey % 10 AS kg, count(*) AS n, count(c_custkey) AS matched
      FROM orders o FULL JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY o_custkey % 10"""),

    // Three co-bucketed tables joined on the shared bucket key: one SMJ
    // chain, zero shuffles under it (the smb_mapjoin_14/17 multi-table
    // shape).
    smb("smb_three_way", """
      SELECT c.c_mktsegment AS seg, count(*) AS n,
             CAST(sum(c2.c_nationkey) AS BIGINT) AS nat_sum
      FROM graft_smb_o o
      JOIN graft_smb_c c ON o.o_custkey = c.c_custkey
      JOIN graft_smb_c2 c2 ON o.o_custkey = c2.k2
      GROUP BY c.c_mktsegment""", """
      SELECT c.c_mktsegment AS seg, count(*) AS n,
             CAST(sum(c2.c_nationkey) AS BIGINT) AS nat_sum
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN (SELECT c_custkey AS k2, c_nationkey FROM customer) c2
        ON o.o_custkey = c2.k2
      GROUP BY c.c_mktsegment"""),

    // Join on the bucket key, then GROUP BY that same key: the
    // aggregation reuses the join's (bucket-derived) partitioning — the
    // auto_sortmerge_join_9 / correlationoptimizer-on-bucketed shape.
    // PlanSpec pins EXACTLY ONE exchange (the outer mod-10 rollup); the
    // join + per-key agg run with zero.
    smb("smb_join_then_gby", """
      SELECT k % 10 AS kg, count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_orders
      FROM (SELECT o.o_custkey AS k, count(*) AS n
            FROM graft_smb_o o JOIN graft_smb_c c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey) t
      GROUP BY k % 10""", """
      SELECT k % 10 AS kg, count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_orders
      FROM (SELECT o.o_custkey AS k, count(*) AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey) t
      GROUP BY k % 10"""),

    // correlationoptimizer1 on UNBUCKETED inputs: the MERGE hint forces
    // the shuffled join, and the per-key aggregation directly above it
    // must add NO exchange — PlanSpec pins exactly 3 exchanges (two join
    // sides + the final mod-10 rollup). DuckDB reads the hint as a plain
    // comment, so the oracle text is identical.
    Q("sql_join_agg_adjacent",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_jaa_o")
        table(s, d, "customer").createOrReplaceTempView("graft_jaa_c")
        s.sql(sql("""
          SELECT k % 10 AS kg, count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_orders
          FROM (SELECT /*+ MERGE(c) */ o.o_custkey AS k, count(*) AS n
                FROM graft_jaa_o o JOIN graft_jaa_c c ON o.o_custkey = c.c_custkey
                GROUP BY o.o_custkey) t
          GROUP BY k % 10"""))
      },
      Some(sql("""
        SELECT k % 10 AS kg, count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_orders
        FROM (SELECT /*+ MERGE(c) */ o.o_custkey AS k, count(*) AS n
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY o.o_custkey) t
        GROUP BY k % 10"""))),

    // multiMapJoin: lineitem through a CHAIN of three broadcast dims
    // (supplier → nation → region) — consecutive broadcast joins must
    // stay in one map stage with no shuffle between them (PlanSpec: 3
    // BroadcastHashJoin, zero sort-merge/shuffled-hash, ≤2 exchanges —
    // both belonging to the final aggregation).
    Q("join_broadcast_chain",
      (s, d) => {
        table(s, d, "lineitem").createOrReplaceTempView("graft_mbc_l")
        table(s, d, "supplier").createOrReplaceTempView("graft_mbc_s")
        table(s, d, "nation").createOrReplaceTempView("graft_mbc_n")
        table(s, d, "region").createOrReplaceTempView("graft_mbc_r")
        s.sql(sql("""
          SELECT /*+ BROADCAST(s), BROADCAST(n), BROADCAST(r) */
                 r.r_name, count(*) AS n,
                 CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM graft_mbc_l l
          JOIN graft_mbc_s s ON l.l_suppkey = s.s_suppkey
          JOIN graft_mbc_n n ON s.s_nationkey = n.n_nationkey
          JOIN graft_mbc_r r ON n.n_regionkey = r.r_regionkey
          GROUP BY r.r_name"""))
      },
      Some(sql("""
        SELECT r.r_name, count(*) AS n,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name"""))),

    // database_drop lifecycle: CREATE DATABASE, fill it with a table +
    // a view over that table, probe all objects EAGERLY (the documented
    // DDL-lifecycle exception class — lazy probes would observe the
    // post-drop world), DROP ... CASCADE, probe the catalog again.
    Q("sql_database_cascade",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_dbc_src")
        s.sql("DROP DATABASE IF EXISTS graft_db13 CASCADE")
        Registry.rmTree(new java.io.File("/tmp/graft_warehouse/graft_db13.db"))
        s.sql("CREATE DATABASE graft_db13")
        s.sql(sql("""CREATE TABLE graft_db13.t1 USING parquet AS
                     SELECT c_custkey, c_mktsegment FROM graft_dbc_src
                     WHERE c_custkey <= 100"""))
        s.sql(sql("""CREATE VIEW graft_db13.v1 AS
                     SELECT c_mktsegment, count(*) AS n
                     FROM graft_db13.t1 GROUP BY c_mktsegment"""))
        val nObjects = s.sql("SHOW TABLES IN graft_db13")
          .filter("isTemporary = false").count()
        val v1Groups = s.table("graft_db13.v1").count()
        val t1Rows = s.table("graft_db13.t1").count()
        s.sql("DROP DATABASE graft_db13 CASCADE")
        val dropped = if (!s.catalog.databaseExists("graft_db13")) 1L else 0L
        val sq = s; import sq.implicits._
        Seq(("n_objects", nObjects), ("v1_groups", v1Groups),
          ("t1_rows", t1Rows), ("dropped", dropped)).toDF("metric", "value")
      },
      Some(sql("""
        SELECT 'n_objects' AS metric, CAST(2 AS BIGINT) AS value
        UNION ALL SELECT 'v1_groups',
          (SELECT count(DISTINCT c_mktsegment) FROM customer WHERE c_custkey <= 100)
        UNION ALL SELECT 't1_rows',
          (SELECT count(*) FROM customer WHERE c_custkey <= 100)
        UNION ALL SELECT 'dropped', CAST(1 AS BIGINT)"""))),

    // Schema evolution: ADD COLUMNS on a parquet table — rows written
    // BEFORE the alter read NULL for the new column; rows written after
    // carry values. (rename_column's v1-parquet-legal slice.)
    Q("sql_alter_add_columns",
      (s, d) => {
        table(s, d, "customer").createOrReplaceTempView("graft_addcol_src")
        dropManaged(s, "graft_addcol")
        s.sql(sql("""CREATE TABLE graft_addcol USING parquet AS
                     SELECT c_custkey AS k, c_mktsegment AS seg
                     FROM graft_addcol_src WHERE c_custkey <= 50"""))
        s.sql("ALTER TABLE graft_addcol ADD COLUMNS (bonus BIGINT)")
        s.sql(sql("""INSERT INTO graft_addcol
                     SELECT c_custkey, c_mktsegment, c_custkey * 10
                     FROM graft_addcol_src
                     WHERE c_custkey > 50 AND c_custkey <= 80"""))
        s.sql(sql("""
          SELECT CASE WHEN bonus IS NULL THEN 'pre_alter' ELSE 'post_alter' END
                   AS phase,
                 count(*) AS n, CAST(sum(coalesce(bonus, 0)) AS BIGINT) AS bonus_sum
          FROM graft_addcol GROUP BY 1"""))
      },
      Some(sql("""
        SELECT 'pre_alter' AS phase, count(*) AS n, CAST(0 AS BIGINT) AS bonus_sum
        FROM customer WHERE c_custkey <= 50
        UNION ALL
        SELECT 'post_alter', count(*),
               CAST(sum(c_custkey * 10) AS BIGINT)
        FROM customer WHERE c_custkey > 50 AND c_custkey <= 80"""))),

    // stats0 / annotate_stats: ANALYZE ... FOR COLUMNS must land EXACT
    // min / max / null-count in the catalog — the DESCRIBE EXTENDED
    // read-back is hash-compared against DuckDB recomputing the same
    // statistics from the raw data. (distinct_count is an HLL estimate
    // and deliberately excluded.)
    Q("sql_analyze_column_stats",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_stats_src")
        dropManaged(s, "graft_stats13")
        s.sql(sql("""CREATE TABLE graft_stats13 USING parquet AS
                     SELECT o_orderkey,
                            CASE WHEN o_orderkey % 7 = 0 THEN NULL
                                 ELSE o_custkey END AS ck
                     FROM graft_stats_src"""))
        s.sql("ANALYZE TABLE graft_stats13 COMPUTE STATISTICS FOR COLUMNS o_orderkey, ck")
        val rows = Seq("o_orderkey", "ck").flatMap { c =>
          s.sql(s"DESCRIBE EXTENDED graft_stats13 $c").collect()
            .filter(r => Set("min", "max", "num_nulls")(r.getString(0)))
            .map(r => (c, r.getString(0), r.getString(1)))
        }
        val sq = s; import sq.implicits._
        rows.toDF("col", "stat", "value")
      },
      Some(sql("""
        SELECT 'o_orderkey' AS col, 'min' AS stat,
               CAST(min(o_orderkey) AS VARCHAR) AS value FROM orders
        UNION ALL SELECT 'o_orderkey', 'max', CAST(max(o_orderkey) AS VARCHAR)
        FROM orders
        UNION ALL SELECT 'o_orderkey', 'num_nulls',
          CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS VARCHAR) FROM orders
        UNION ALL SELECT 'ck', 'min',
          CAST(min(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END)
               AS VARCHAR) FROM orders
        UNION ALL SELECT 'ck', 'max',
          CAST(max(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END)
               AS VARCHAR) FROM orders
        UNION ALL SELECT 'ck', 'num_nulls',
          CAST(count(*) FILTER (WHERE o_orderkey % 7 = 0) AS VARCHAR)
        FROM orders"""))),

    // union31: UNION ALL branches feeding a join + GROUP BY — branch
    // tags must survive through the join and the aggregation.
    Q("sql_union_join_gby",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_ujg_o")
        table(s, d, "customer").createOrReplaceTempView("graft_ujg_c")
        s.sql(sql("""
          SELECT side, c.c_mktsegment AS seg, count(*) AS n
          FROM (SELECT 'f' AS side, o_custkey FROM graft_ujg_o
                WHERE o_orderstatus = 'F'
                UNION ALL
                SELECT 'o' AS side, o_custkey FROM graft_ujg_o
                WHERE o_orderstatus = 'O') u
          JOIN graft_ujg_c c ON u.o_custkey = c.c_custkey
          GROUP BY side, c.c_mktsegment"""))
      },
      Some(sql("""
        SELECT side, c.c_mktsegment AS seg, count(*) AS n
        FROM (SELECT 'f' AS side, o_custkey FROM orders WHERE o_orderstatus = 'F'
              UNION ALL
              SELECT 'o' AS side, o_custkey FROM orders WHERE o_orderstatus = 'O') u
        JOIN customer c ON u.o_custkey = c.c_custkey
        GROUP BY side, c.c_mktsegment"""))),

    // alter3 / alter_rename_partition (60 golden files) +
    // drop_partitions (26): the partition lifecycle — load three status
    // partitions, RENAME one (data must follow the new spec), DROP one
    // (its rows must vanish), probing EAGERLY after each step (the
    // documented DDL-lifecycle exception class).
    Q("sql_partition_lifecycle",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_plc_src")
        dropManaged(s, "graft_plc")
        s.sql("CREATE TABLE graft_plc (k BIGINT) USING parquet PARTITIONED BY (st STRING)")
        Seq("F", "O", "P").foreach { st =>
          s.sql(sql(s"""INSERT INTO graft_plc PARTITION (st='$st')
                        SELECT o_orderkey FROM graft_plc_src
                        WHERE o_orderstatus = '$st'"""))
        }
        s.sql("ALTER TABLE graft_plc PARTITION (st='F') RENAME TO PARTITION (st='FIN')")
        val renamedParts = s.sql("SHOW PARTITIONS graft_plc").count()
        val finRows = s.table("graft_plc").filter(col("st") === "FIN").count()
        s.sql("ALTER TABLE graft_plc DROP PARTITION (st='P')")
        val afterDropParts = s.sql("SHOW PARTITIONS graft_plc").count()
        val afterDropRows = s.table("graft_plc").count()
        val sq = s; import sq.implicits._
        Seq(("after_rename_parts", renamedParts), ("fin_rows", finRows),
          ("after_drop_parts", afterDropParts), ("after_drop_rows", afterDropRows))
          .toDF("metric", "value")
      },
      Some(sql("""
        SELECT 'after_rename_parts' AS metric, CAST(3 AS BIGINT) AS value
        UNION ALL SELECT 'fin_rows',
          (SELECT count(*) FROM orders WHERE o_orderstatus = 'F')
        UNION ALL SELECT 'after_drop_parts', CAST(2 AS BIGINT)
        UNION ALL SELECT 'after_drop_rows',
          (SELECT count(*) FROM orders WHERE o_orderstatus IN ('F', 'O'))"""))),

    // create_like_view (28 golden files): CREATE TABLE LIKE a VIEW —
    // the clone takes the view's RESOLVED schema but none of its rows;
    // an insert then fills it independently of the view's definition.
    Q("sql_create_like_view",
      (s, d) => {
        dropManaged(s, "graft_clv_t")
        s.sql("DROP VIEW IF EXISTS graft_clv_v")
        // a PERSISTENT view may not reference a temp view — define it
        // over the parquet path directly
        s.sql(sql(s"""CREATE VIEW graft_clv_v AS
                      SELECT o_orderkey AS k, o_totalprice AS p
                      FROM parquet.`$d/orders.parquet`
                      WHERE o_orderkey % 2 = 0"""))
        s.sql("CREATE TABLE graft_clv_t LIKE graft_clv_v USING parquet")
        val emptyN = s.table("graft_clv_t").count()
        val sig = s.table("graft_clv_t").schema.simpleString
        s.sql(sql("""INSERT INTO graft_clv_t
                     SELECT * FROM graft_clv_v WHERE k <= 100"""))
        val filledN = s.table("graft_clv_t").count()
        val sq = s; import sq.implicits._
        Seq(("empty_clone", emptyN, sig), ("after_insert", filledN, sig))
          .toDF("phase", "n", "schema_sig")
      },
      Some(sql("""
        SELECT 'empty_clone' AS phase, CAST(0 AS BIGINT) AS n,
               'struct<k:bigint,p:double>' AS schema_sig
        UNION ALL
        SELECT 'after_insert',
          (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0 AND o_orderkey <= 100),
          'struct<k:bigint,p:double>'"""))),

    // correlationoptimizer6 (59 golden files): two IDENTICAL aggregation
    // branches self-joined on the group key — the second branch must
    // REUSE the first's shuffle (ReusedExchange, PlanSpec-pinned), not
    // recompute it; at 100 TB this halves the scan+shuffle cost of every
    // self-comparison query.
    Q("sql_selfjoin_exchange_reuse",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_sxr_o")
        s.sql(sql("""
          SELECT a.k % 10 AS kg, count(*) AS n
          FROM (SELECT o_custkey AS k, count(*) AS c FROM graft_sxr_o
                GROUP BY o_custkey) a
          JOIN (SELECT o_custkey AS k, count(*) AS c FROM graft_sxr_o
                GROUP BY o_custkey) b
            ON a.k = b.k AND a.c = b.c
          GROUP BY a.k % 10"""))
      },
      Some(sql("""
        SELECT a.k % 10 AS kg, count(*) AS n
        FROM (SELECT o_custkey AS k, count(*) AS c FROM orders
              GROUP BY o_custkey) a
        JOIN (SELECT o_custkey AS k, count(*) AS c FROM orders
              GROUP BY o_custkey) b
          ON a.k = b.k AND a.c = b.c
        GROUP BY a.k % 10"""))),

    // correlationoptimizer2/3 class (~100 golden files): a whole PIPELINE
    // sharing one key — join on custkey, aggregate by custkey, join BACK
    // to the same dimension on custkey, final rollup. The plan contract
    // (PlanSpec): EXACTLY 4 exchanges — 3 scan-side + the rollup — i.e.
    // the join → agg → join chain itself adds NONE, every stage riding
    // the shared custkey partitioning. (Exchange REUSE between the two
    // customer scans is unavailable by design: column pruning gives them
    // different ReadSchemas — the count pin is the honest contract.)
    Q("sql_shared_key_pipeline",
      (s, d) => {
        table(s, d, "orders").createOrReplaceTempView("graft_skp_o")
        table(s, d, "customer").createOrReplaceTempView("graft_skp_c")
        s.sql(sql("""
          WITH per_key AS (
            SELECT /*+ MERGE(c) */ o.o_custkey AS k, count(*) AS n
            FROM graft_skp_o o JOIN graft_skp_c c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey)
          SELECT /*+ MERGE(c2) */ c2.c_mktsegment AS seg,
                 count(*) AS n_cust, CAST(sum(p.n) AS BIGINT) AS n_orders
          FROM per_key p JOIN graft_skp_c c2 ON p.k = c2.c_custkey
          GROUP BY c2.c_mktsegment"""))
      },
      Some(sql("""
        WITH per_key AS (
          SELECT o.o_custkey AS k, count(*) AS n
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY o.o_custkey)
        SELECT c2.c_mktsegment AS seg,
               count(*) AS n_cust, CAST(sum(p.n) AS BIGINT) AS n_orders
        FROM per_key p JOIN customer c2 ON p.k = c2.c_custkey
        GROUP BY c2.c_mktsegment"""))),

    // join_reorder 1-4 golden families (~40 files): Hive reordered
    // multi-way joins by STREAMTABLE hints and size; the Spark-native
    // restatement is COST-BASED join reorder — with table + column
    // stats ANALYZEd, `spark.sql.cbo.joinReorder` rewrites the
    // syntactically fact-first join (orders ⋈ customer) ⋈ nation into
    // dims-first (customer ⋈ nation) ⋈ orders. PlanSpec pins the leaf
    // order flip; the answer is order-independent and oracled. At
    // 100 TB this is the optimizer feature that keeps a mis-written
    // 5-way join from shuffling the fact table twice.
    Q("sql_cbo_join_reorder",
      (s, d) => {
        cboTables(s, d)
        val savedCbo = s.conf.getOption("spark.sql.cbo.enabled")
        val savedRe = s.conf.getOption("spark.sql.cbo.joinReorder.enabled")
        try {
          s.conf.set("spark.sql.cbo.enabled", "true")
          s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
          // eager: the plan must be optimized (and executed) UNDER the
          // CBO confs, not at the caller's later materialization time
          val sq = s; import sq.implicits._
          s.sql(sql("""
            SELECT n.n_name, count(*) AS cnt
            FROM graft_cbo_o o
            JOIN graft_cbo_c c ON o.o_custkey = c.c_custkey
            JOIN graft_cbo_n n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name""")).collect().toSeq
            .map(r => (r.getString(0), r.getLong(1))).toDF("n_name", "cnt")
        } finally {
          savedCbo.fold(s.conf.unset("spark.sql.cbo.enabled"))(
            s.conf.set("spark.sql.cbo.enabled", _))
          savedRe.fold(s.conf.unset("spark.sql.cbo.joinReorder.enabled"))(
            s.conf.set("spark.sql.cbo.joinReorder.enabled", _))
        }
      },
      Some(sql("""
        SELECT n.n_name, count(*) AS cnt
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name""")))
  )

  /** Stage + ANALYZE the three CBO tables once per fixture fingerprint
    * per JVM (stats live in the catalog; same guard as [[smbTables]]). */
  @volatile private var cboStaged: String = ""
  private[graft] def cboTables(s: SparkSession, d: String): Unit = this.synchronized {
    val fp = d + "|" + graft.Staging.fingerprint(s"$d/orders.parquet")
    val names = Map("graft_cbo_o" -> "orders", "graft_cbo_c" -> "customer",
      "graft_cbo_n" -> "nation")
    if (cboStaged != fp || !names.keys.forall(s.catalog.tableExists)) {
      names.foreach { case (t, src) =>
        dropManaged(s, t)
        table(s, d, src).write.saveAsTable(t)
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
        s.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
      cboStaged = fp
    }
  }
}
