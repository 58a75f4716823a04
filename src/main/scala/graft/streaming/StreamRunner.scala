package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.LongType

/** SURVEY §2.9 — Structured Streaming harness. The reference's DStream
  * model (processing-time micro-batches, DStream.scala:68-74) is restated
  * on event time: file-source `readStream` over the events parquet,
  * watermarked event-time windows, memory sink for verification.
  *
  * Scale posture: the same code runs against a Kafka source + file sink
  * on a cluster (swap format strings); state is bounded by the watermark.
  */
object StreamRunner {

  /** Streaming Dataset over `$dir/events.parquet` (file source), with the
    * same nanos→micros ts normalization as Engine.events. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    graft.Engine.configure(spark)
    val path = s"$dir/events.parquet"
    // The file source wants a directory: stage a symlink dir when the
    // testdata table is a single parquet file.
    val streamDir =
      if (new java.io.File(path).isDirectory) path
      else {
        val d = java.nio.file.Paths.get(
          s"/tmp/graft_stream/${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
        java.nio.file.Files.createDirectories(d)
        val link = d.resolve("events.parquet")
        if (!java.nio.file.Files.exists(link))
          java.nio.file.Files.createSymbolicLink(link, java.nio.file.Paths.get(path))
        d.toString
      }
    val schema = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(schema).parquet(streamDir)
    if (schema("ts").dataType == LongType)
      // integral `div`: double division loses µs precision on ns longs
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Run a streaming plan to completion (AvailableNow) into a memory sink
    * and return the sink as a DataFrame. */
  def runToTable(spark: SparkSession, df: DataFrame, name: String,
                 outputMode: String = "complete"): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"/tmp/graft_ckpt/$name-${System.nanoTime()}")
      .start()
    q.awaitTermination(300000)
    spark.table(name)
  }
}
