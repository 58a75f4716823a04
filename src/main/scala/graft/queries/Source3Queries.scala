package graft.queries

import org.apache.spark.sql.functions._
import Registry.sql

/** Round-11 source wave 3 — the `_metadata` hidden file-source column
  * (Spark 3.2+): per-row provenance (file name, per-file row index)
  * surfaced without any extra I/O, the lineage/debugging surface a data
  * platform exposes to trace a bad row back to its input file. The pin:
  * row counts per file and the row-index range [0, n−1] must agree with
  * the table itself (the fixture is a single parquet file, so the file
  * grouping collapses to one row — on a sharded lake the same query
  * audits every shard).
  */
object Source3Queries {

  val all: Seq[Q] = Seq(

    Q("src_parquet_metadata",
      (s, d) => s.read.parquet(s"$d/events.parquet")
        .select(col("_metadata.file_name").as("file_name"),
          col("_metadata.row_index").as("ri"))
        .groupBy(col("file_name"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("ri")).as("min_row_index"),
          max(col("ri")).as("max_row_index")),
      Some(sql("""SELECT 'events.parquet' AS file_name,
                    count(*) AS n_rows,
                    CAST(0 AS BIGINT) AS min_row_index,
                    CAST(count(*) - 1 AS BIGINT) AS max_row_index
                  FROM events""")))
  )
}
