package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine façade: session configuration + catalog over the testdata layout.
  *
  * Matches the reference's query-visible semantics (Spark 1.3 fork — see
  * /root/reference/sql/catalyst/src/main/scala/org/apache/spark/sql/catalyst/expressions/Cast.scala:28
  * null-on-bad-cast, arithmetic.scala:179 Divide null-on-zero) by pinning
  * ANSI mode off; everything else rides modern Catalyst/Tungsten/AQE.
  *
  * Scale posture: all configuration here is cluster-safe — AQE handles
  * skew/coalescing at 1000-executor scale; nothing assumes local mode.
  */
object Engine {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Runtime confs every query needs regardless of who built the session.
    * Runs ONCE per session (guarded by a session-local conf flag):
    * re-registering the native functions on every table() call produced
    * "replaced a previously registered function" WARN spam and redundant
    * session mutation on hot paths. */
  def configure(spark: SparkSession): SparkSession = {
    if (!spark.conf.getOption("spark.graft.configured").contains("true")) {
      val c = spark.conf
      c.set("spark.sql.ansi.enabled", "false") // 1.3 semantics: null, not error
      c.set("spark.sql.session.timeZone", "UTC")
      c.set("spark.sql.adaptive.enabled", "true")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // mismatched bucket counts (8 vs 4) still join shuffle-free by
      // reading the finer side's buckets coalesced — the repeated
      // fact-fact join posture when tables were bucketed independently
      c.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
      // r21 (r20 verdict #2): preserve cached-plan OUTPUT PARTITIONING.
      // The text_tf/text_df posting caches are stored hash-partitioned
      // on token (the Lucene posting-list layout) so the per-trial
      // tf⋈df scoring join can ride the stored layout with zero
      // exchanges. Spark 4 defaults this to true, which lets AQE
      // re-plan the cache build; the cached plan's partitioning is then
      // unknown at planning time and EnsureRequirements re-shuffles
      // EVERY cached side on EVERY use (measured: 2 extra exchanges per
      // text_tfidf trial, plans/r21/text_tfidf_*). Cluster-safe: this
      // only restores the pre-3.5 guarantee that a cache keeps its
      // build partitioning; index builds run once per session and don't
      // need AQE's post-shuffle coalescing.
      c.set("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      // nanos timestamps in events.parquet: read as LONG then convert
      // explicitly where needed (legacy flag keeps the scan vectorized).
      c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata timestamps are naive micros (no isAdjustedToUTC flag);
      // read them as session-zone instants (TIMESTAMP, matching the
      // DuckDB oracle's rendering under the UTC session zone) rather
      // than TIMESTAMP_NTZ, which watermarks and unix_micros reject.
      c.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      graft.plans.Hamming64.register(spark)
      graft.plans.CosineSim.register(spark)
      graft.plans.TopKAgg.register(spark)
      graft.plans.MinHash16.register(spark)
      graft.plans.IntL2.register(spark)
      graft.plans.Overlap64.register(spark)
      graft.plans.GraftRules.install(spark)
      c.set("spark.graft.configured", "true")
    }
    spark
  }

  /** Hive-metastore confs shared by every session builder: a real
    * HiveExternalCatalog (HiveTableScan / InsertIntoHiveTable parity)
    * backed by an in-memory Derby metastore — unique per JVM, so
    * concurrent JVMs (sbt test + Verify) never contend on a metastore
    * lock, and the catalog state is rebuilt by each query (which are all
    * repetition-safe by construction). */
  def withHive(b: SparkSession.Builder): SparkSession.Builder = b
    .config("javax.jdo.option.ConnectionURL",
      s"jdbc:derby:memory:graftms${java.lang.ProcessHandle.current().pid()};create=true")
    .enableHiveSupport()

  /** Standalone session for mains/tests. local[*] here; on a cluster the
    * same builder settings apply unchanged. */
  def session(appName: String = "graft", master: Option[String] = None): SparkSession = {
    val b = SparkSession.builder().appName(appName)
    master.foreach(b.master)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val spark = withHive(b
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the eager census attributes ~1500 job groups (726 rows × 2
      // passes) through the status store; the default retention (1000
      // jobs) can evict early groups mid-census and misread an eager row
      // as lazy (r16 ADVICE) — retention must exceed the census volume
      .config("spark.ui.retainedJobs", "20000")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    configure(spark)
  }

  /** Read one testdata table. Plain parquet scan — Catalyst pushes filters
    * and prunes columns into it; at 100 TB this is a partitioned columnar
    * scan with row-group pruning, no code change needed.
    *
    * The schema is inferred ONCE per path and then passed explicitly:
    * schema inference fires a footer-read job per `spark.read.parquet`
    * call, so without the cache every query DECLARATION launched a job
    * (Verify declares 185 of them). With it, declaring a query builds a
    * pure lazy plan — SkewGuardSpec asserts zero jobs at declaration. */
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    val path = s"$dir/$name.parquet"
    val sch = schemaCache.getOrElseUpdate(path, spark.read.parquet(path).schema)
    spark.read.schema(sch).parquet(path)
  }

  /** events with `ts` restored to a proper µs TimestampType column.
    * The raw file stores timestamp[ns]; nanosAsLong gives LONG nanos which
    * we floor-divide to µs — identical to what DuckDB reports. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral `div`, NOT `/`: double division loses µs precision on
        // ~1e18 nanosecond values (53-bit mantissa).
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
