package graft.queries

import graft.Engine.table
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import Registry.sql

/** SURVEY §2.1 — sources and sinks: JSON (write + schema-inferred read,
  * JSONRelation/JsonRDD analog), CSV (text-format round-trip), raw text
  * (textFile/saveAsTextFile analog), and partitioned parquet with
  * directory partition discovery + pruning (ParquetRelation2/newParquet
  * analog). Each query round-trips through a real on-disk sink and is
  * oracle-checked against the original table, so writer AND reader paths
  * are both verified. JDBC (§2.1 JDBCRelation) is omitted: no database is
  * reachable in this environment; `spark.read/write.jdbc` is the
  * documented built-in mapping.
  *
  * Scale posture: writers shuffle-free (write from the scan's own
  * partitioning); the partitioned-parquet read proves partition pruning
  * (only the o_orderstatus=F directory is listed), which at 100 TB is the
  * difference between scanning one partition and the whole lake.
  */
object SourceQueries {

  private def tmp(d: String, name: String) =
    s"/tmp/graft_io/${d.replaceAll("[^a-zA-Z0-9]", "_")}/$name"

  val all: Seq[Q] = Seq(

    // JSON round-trip with inferred schema (JsonRDD.inferSchema analog).
    Q("src_json_roundtrip",
      (s, d) => {
        val path = tmp(d, "orders_json")
        table(s, d, "orders").filter(col("o_totalprice") > 200000.0)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
          .write.mode(SaveMode.Overwrite).json(path)
        s.read.json(path) // schema inferred by sampling
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("total"))
      },
      Some(sql("""SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 4) AS total
                  FROM orders WHERE o_totalprice > 200000.0 GROUP BY o_orderstatus"""))),

    // CSV round-trip with header + explicit schema on read.
    Q("src_csv_roundtrip",
      (s, d) => {
        val path = tmp(d, "nation_csv")
        table(s, d, "nation").write.mode(SaveMode.Overwrite)
          .option("header", "true").csv(path)
        s.read.option("header", "true")
          .schema("n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING")
          .csv(path)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      },
      Some(sql("SELECT n_nationkey, n_name, n_regionkey FROM nation"))),

    // Raw text sink + source (textFile/saveAsTextFile analog).
    Q("src_text_roundtrip",
      (s, d) => {
        val path = tmp(d, "docs_text")
        table(s, d, "documents").select(concat_ws("\t", col("doc_id"), col("text")))
          .write.mode(SaveMode.Overwrite).text(path)
        s.read.text(path)
          .select(split(col("value"), "\t").getItem(0).cast("long").as("doc_id"),
            length(split(col("value"), "\t").getItem(1)).cast("long").as("n_chars_rt"))
      },
      Some(sql("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_rt FROM documents"))),

    // Partitioned parquet write → partition discovery → PRUNED read: the
    // filter on the partition column must prune directories, not rows.
    Q("src_parquet_partitioned",
      (s, d) => {
        val path = tmp(d, "orders_part")
        table(s, d, "orders")
          .write.mode(SaveMode.Overwrite).partitionBy("o_orderstatus").parquet(path)
        s.read.parquet(path)
          .filter(col("o_orderstatus") === "F") // partition pruning
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 4).as("avg_price"))
      },
      Some(sql("""SELECT o_orderpriority, count(*) AS n,
                   round(avg(o_totalprice), 4) AS avg_price
                  FROM orders WHERE o_orderstatus = 'F' GROUP BY o_orderpriority"""))),

    // Parquet schema-merging read (mergeSchema, newParquet.scala:175):
    // two writes with different column subsets, one merged scan.
    Q("src_parquet_merge_schema",
      (s, d) => {
        val base = tmp(d, "merge_schema")
        val r = table(s, d, "region")
        r.select(col("r_regionkey")).write.mode(SaveMode.Overwrite).parquet(s"$base/p=1")
        r.select(col("r_regionkey"), col("r_name")).write.mode(SaveMode.Overwrite).parquet(s"$base/p=2")
        s.read.option("mergeSchema", "true").parquet(base)
          .groupBy(col("p"))
          .agg(count(lit(1)).as("n"), count(col("r_name")).as("n_named"))
      },
      Some(sql("""SELECT 1 AS p, count(*) AS n, 0 AS n_named FROM region
                  UNION ALL
                  SELECT 2 AS p, count(*) AS n, count(r_name) AS n_named FROM region""")))
  )
}
