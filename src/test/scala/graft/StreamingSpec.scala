package graft

import graft.streaming.StreamRunner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream unification check (the §2.9 contract): the REAL
  * Structured Streaming pipeline over the events file source produces
  * exactly the batch result of the same plan. */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("streaming tumbling-window counts equal the batch computation") {
    val streamed = StreamRunner.runToTable(
      spark,
      StreamRunner.eventsStream(spark, TestSpark.Sf)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n")),
      "spec_tumbling")
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(_.toString).toSet

    val batch = Engine.events(spark, TestSpark.Sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(_.toString).toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("file source replays as a multi-batch sequence (maxFilesPerTrigger)") {
    import org.apache.spark.sql.streaming.Trigger
    val q = StreamRunner.eventsStream(spark, TestSpark.Sf)
      .groupBy(col("event_type")).count()
      .writeStream.format("memory").queryName("spec_batches").outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"/tmp/graft_ckpt/spec-batches-${System.nanoTime()}")
      .start()
    assert(q.awaitTermination(300000))
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= StreamRunner.Batches,
      s"expected >= ${StreamRunner.Batches} data batches, saw $dataBatches")
  }

  test("rate source drives a non-file streaming input end-to-end") {
    // the non-file input path (reference external/ receivers analog):
    // the generator source feeds a windowless aggregate into a memory
    // sink; liveness + monotonic totals are the contract (values are
    // wall-clock dependent, so no oracle)
    val q = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").option("numPartitions", "2")
      .load()
      .groupBy((col("value") % 10).as("m")).count()
      .writeStream.format("memory").queryName("spec_rate").outputMode("complete")
      .option("checkpointLocation", s"/tmp/graft_ckpt/spec-rate-${System.nanoTime()}")
      .start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      var n = 0L
      while (n == 0L && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("spec_rate").count()
      }
      assert(n > 0, "rate source produced no aggregated rows within 60s")
    } finally q.stop()
  }

  test("streaming per-key totals equal batch groupBy") {
    val streamed = StreamRunner.runToTable(
      spark,
      StreamRunner.eventsStream(spark, TestSpark.Sf)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n")),
      "spec_totals")
      .collect().map(_.toString).toSet
    val batch = Engine.events(spark, TestSpark.Sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(_.toString).toSet
    assert(streamed === batch)
  }
}
