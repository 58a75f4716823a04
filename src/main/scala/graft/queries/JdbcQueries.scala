package graft.queries

import graft.Engine.table
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY §2.1 — JDBC source + sink (reference jdbc/JDBCRDD.scala:98
  * schema probe, :244 compileFilter predicate pushdown;
  * jdbc/JDBCRelation.scala:125 column-range partitioned reads; sinks at
  * DataFrame.scala:1260 createJDBCTable / :1288 insertIntoJDBC), proven
  * against EMBEDDED Derby — the same in-process-database pattern the
  * reference's JDBCSuite uses with H2 (no external server needed).
  *
  * Scale posture: the partitioned read issues `numPartitions` range
  * predicates on the partition column so every executor pulls its own
  * stripe in parallel — the reference's JDBCRelation.columnPartition
  * shape. Filters are pushed into the remote WHERE clause (asserted in
  * PlanSpec via the scan's PushedFilters), so the database — not Spark —
  * prunes rows.
  */
object JdbcQueries {

  private val Url = "jdbc:derby:/tmp/graft_derby/gdb;create=true"

  private def props: java.util.Properties = {
    // keep derby.log out of the repo working dir (dir must pre-exist or
    // Derby falls back with a FileNotFoundException on the log stream)
    new java.io.File("/tmp/graft_derby").mkdirs()
    System.setProperty("derby.stream.error.file", "/tmp/graft_derby/derby.log")
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  /** Write suppliers once per (session, sfDir); reruns overwrite. */
  private def stage(s: org.apache.spark.sql.SparkSession, d: String): Unit =
    table(s, d, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      .write.mode(SaveMode.Overwrite).jdbc(Url, "GRAFT_SUPPLIER", props)

  val all: Seq[Q] = Seq(

    // Sink + partitioned source round-trip: df.write.jdbc → 4-way
    // range-partitioned read on s_suppkey → aggregate equals the original.
    Q("src_jdbc_roundtrip",
      (s, d) => {
        stage(s, d)
        s.read.jdbc(Url, "GRAFT_SUPPLIER",
            columnName = "s_suppkey", lowerBound = 0L, upperBound = 100000L,
            numPartitions = 4, connectionProperties = props)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("s_acctbal")), 4).as("bal"))
      },
      Some(sql("""SELECT s_nationkey, count(*) AS n,
                   round(sum(s_acctbal), 4) AS bal
                  FROM supplier GROUP BY s_nationkey"""))),

    // Predicate-pushdown read (JDBCRDD.compileFilter analog): the filter
    // travels to Derby in the WHERE clause; PlanSpec asserts PushedFilters
    // on the JDBC scan.
    Q("src_jdbc_read",
      (s, d) => {
        stage(s, d)
        s.read.jdbc(Url, "GRAFT_SUPPLIER", props)
          .filter(col("s_acctbal") > 1000.0 && col("s_nationkey") < 13)
          .select(col("s_suppkey"), col("s_nationkey"),
            round(col("s_acctbal"), 4).as("bal"))
      },
      Some(sql("""SELECT s_suppkey, s_nationkey, round(s_acctbal, 4) AS bal
                  FROM supplier
                  WHERE s_acctbal > 1000.0 AND s_nationkey < 13"""))),

    // AGGREGATE pushdown through the JDBC V2 catalog: the whole
    // GROUP BY + COUNT/SUM evaluates inside Derby — Spark receives one
    // pre-aggregated row per group (PlanSpec asserts PushedAggregates +
    // PushedGroupByExpressions on the scan). The modern deepening of
    // JDBCRDD.compileFilter's WHERE pushdown: at scale the database
    // ships group summaries, not rows.
    Q("src_jdbc_agg_pushdown",
      (s, d) => {
        stage(s, d)
        s.conf.set("spark.sql.catalog.graftjdbc",
          "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
        s.conf.set("spark.sql.catalog.graftjdbc.url", Url)
        s.conf.set("spark.sql.catalog.graftjdbc.driver",
          "org.apache.derby.jdbc.EmbeddedDriver")
        s.conf.set("spark.sql.catalog.graftjdbc.pushDownAggregate", "true")
        s.table("graftjdbc.GRAFT_SUPPLIER")
          .groupBy(col("S_NATIONKEY").as("s_nationkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("S_ACCTBAL")), 4).as("bal"))
      },
      Some(sql("""SELECT s_nationkey, count(*) AS n,
                   round(sum(s_acctbal), 4) AS bal
                  FROM supplier GROUP BY s_nationkey"""))),

    // NOTE: TopN/limit pushdown (pushDownLimit) was probed and is NOT
    // declarable against Derby: the scan advertises `PushedTopN: ORDER
    // BY [s_suppkey] LIMIT 5` and Spark plans no fallback limit, yet
    // the database returns the FULL table — the Derby dialect compiles
    // a LIMIT clause Derby ignores (Derby wants FETCH FIRST). Aggregate
    // pushdown (above) works and is verified; limit pushdown would
    // silently return wrong row counts, so it stays undeclared.
  )
}
