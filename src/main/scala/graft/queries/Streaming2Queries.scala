package graft.queries

import graft.streaming.StreamRunner
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import Registry.sql

/** Round-11 streaming wave 2 — the State Data Source (Spark 4's
  * `format("statestore")` reader): after a streaming aggregation runs to
  * completion, its CHECKPOINTED STATE is read back as a plain batch
  * DataFrame — the operational surface for state inspection, debugging
  * and repair a production streaming deployment needs. The state rows
  * (key = group key, value = aggregation buffer) must equal the batch
  * aggregation of the same input — pinning that (a) the checkpoint holds
  * exactly the final state and (b) the reader decodes the buffer
  * faithfully. Buffer columns are positional (`value.*` order follows
  * the agg declaration), renamed via toDF.
  */
object Streaming2Queries {

  val all: Seq[Q] = Seq(

    Q("stream_state_source",
      (s, d) => {
        val name = s"statesrc2_${math.abs(d.hashCode)}"
        // Deterministic per-query checkpoint path, PRE-CLEANED on every
        // invocation: the statestore reader is lazy, so the checkpoint
        // cannot be deleted inside the query fn — a nanotime-suffixed dir
        // would accumulate one copy per run forever (r11 advice).
        val ckpt = s"/tmp/graft_ckpt/$name"
        Registry.rmTree(new java.io.File(ckpt))
        val agg = StreamRunner.eventsStream(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .start()
        if (!q.awaitTermination(300000)) {
          q.stop()
          throw new IllegalStateException(s"streaming query '$name' did not finish")
        }
        s.read.format("statestore").load(ckpt)
          .select(col("key.*"), col("value.*"))
          .toDF("user_id", "n_events", "cents")
      },
      Some(sql("""SELECT user_id, count(*) AS n_events,
                    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
                  FROM events GROUP BY user_id"""))),

    // State CHANGE FEED: the per-batch changelog of the same aggregation
    // (readChangeFeed from batch 0). Replaying the log — keeping each
    // key's LAST change — must reconstruct the final state exactly, the
    // contract an incremental downstream consumer (CDC to a serving
    // store) depends on. The last-change pick is a groupBy max(batch_id)
    // + self-join on (key, batch), not a global window.
    Q("stream_state_change_feed",
      (s, d) => {
        val name = s"statecf2_${math.abs(d.hashCode)}"
        // Deterministic pre-cleaned checkpoint — see stream_state_source.
        val ckpt = s"/tmp/graft_ckpt/$name"
        Registry.rmTree(new java.io.File(ckpt))
        val agg = StreamRunner.eventsStream(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"))
        val q = agg.writeStream.format("memory").queryName(name)
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .start()
        if (!q.awaitTermination(300000)) {
          q.stop()
          throw new IllegalStateException(s"streaming query '$name' did not finish")
        }
        val feed = s.read.format("statestore")
          .option("readChangeFeed", "true")
          .option("changeStartBatchId", "0")
          .load(ckpt)
          .select(col("batch_id"), col("change_type"),
            col("key.user_id").as("user_id"), col("value.*"))
          .toDF("batch_id", "change_type", "user_id", "n_events")
        val last = feed.groupBy(col("user_id")).agg(max(col("batch_id")).as("batch_id"))
        feed.join(last, Seq("user_id", "batch_id"))
          .filter(col("change_type") === "update")
          .select(col("user_id"), col("n_events"))
      },
      Some(sql("""SELECT user_id, count(*) AS n_events
                  FROM events GROUP BY user_id""")))
  )
}
