package graft.queries

import graft.Engine.table
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
        .agg(count(lit(1)).as("n"), min(col("ri")).as("mn"), max(col("ri")).as("mx"))
        // Collapse the per-file audit to LAYOUT-INDEPENDENT invariants
        // (r11 advice: the old oracle hardcoded a single-file layout):
        // every file's row_index runs 0..n_f−1, so min(mn)=0 and
        // Σ(mx+1)=Σn=count(*) hold for ANY sharding of the fixture.
        .agg(sum(col("n")).cast("long").as("n_rows"),
          min(col("mn")).cast("long").as("min_row_index"),
          sum(col("mx") + 1).cast("long").as("rowcount_via_index")),
      Some(sql("""SELECT count(*) AS n_rows,
                    CAST(0 AS BIGINT) AS min_row_index,
                    count(*) AS rowcount_via_index
                  FROM events"""))),

    // Z-ORDER layout key (the Delta/Iceberg OPTIMIZE ZORDER curve): two
    // 16-bit dimensions (custkey, days-since-epoch) bit-interleaved into
    // one exact BIGINT — rows close in Z are close in BOTH dimensions,
    // so range-partitioning the write by z gives min/max file pruning on
    // either column. The 16-step interleave is unrolled from ONE Scala
    // loop into both engines' spellings (no UDF, pure bit algebra inside
    // the scan); the first 20 rows of the curve pin the interleave.
    Q("src_zorder_interleave",
      (s, d) => {
        val z = (0 until 16).map(i =>
          s"(shiftleft(shiftright(ck, $i) & 1, ${2 * i + 1}) + " +
            s"shiftleft(shiftright(dk, $i) & 1, ${2 * i}))").mkString(" + ")
        table(s, d, "orders")
          .select(col("o_orderkey"),
            (col("o_custkey") % 65536).cast("long").as("ck"),
            (datediff(col("o_orderdate"), lit("1992-01-01").cast("date")) % 65536)
              .cast("long").as("dk"))
          .withColumn("z", expr(z).cast("long"))
          .orderBy(col("z"), col("o_orderkey"))
          .limit(20)
      },
      Some {
        val z = (0 until 16).map(i =>
          s"((((ck >> $i) & 1) << ${2 * i + 1}) + (((dk >> $i) & 1) << ${2 * i}))")
          .mkString(" + ")
        sql(s"""SELECT o_orderkey, ck, dk, CAST($z AS BIGINT) AS z
                FROM (SELECT o_orderkey,
                        CAST(o_custkey % 65536 AS BIGINT) AS ck,
                        CAST(datediff('day', date'1992-01-01', o_orderdate) % 65536
                          AS BIGINT) AS dk
                      FROM orders)
                ORDER BY z, o_orderkey LIMIT 20""")
      })
  )
}
