package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-bucket guard for LSH/blocking self-joins.
  *
  * An LSH self-join on (band, sig) is quadratic INSIDE each bucket: one
  * degenerate signature (boilerplate or near-empty docs that all minhash
  * identically) produces an O(n²) bucket that AQE's skew-join splitting
  * can mitigate but not bound — splitting a 10M-row bucket still emits
  * 50T pairs. The standard production fix (used by every large-scale
  * minhash dedup pipeline) is to drop buckets above a size threshold:
  * a bucket that big is a degenerate signature, not a real near-dup
  * cluster, and its pairs are noise.
  *
  * Shape: the per-key counts are aggregated (one partial-agg pass over
  * the already-cached signature table), the over-threshold keys — a
  * tiny set by construction — are broadcast, and the input is pruned
  * with a broadcast anti-join. No extra shuffle of the data itself, and
  * — deliberately — NO driver-side action: the guard is a pure plan
  * transformation, so declaring a guarded query launches zero jobs
  * (asserted by SkewGuardSpec's listener test). The previous design
  * counted the hot keys eagerly to decide whether to join at all, which
  * cost one extra job per declaration just to log.
  */
object SkewGuard {

  /** Buckets above this are degenerate-signature noise. Testdata buckets
    * are ≤ corpus size (500–60k), so the guard is inert at test SF and
    * binding only at the 100 TB scale it exists for. */
  val DefaultMaxBucket = 100000L

  /** Remove rows belonging to join-key buckets with more than `maxBucket`
    * rows. Identity on data whose buckets are all under the threshold
    * (the anti-join's build side is empty). Lazy: builds the plan only. */
  def dropHotBuckets(df: DataFrame, keys: Seq[String],
      maxBucket: Long = DefaultMaxBucket): DataFrame = {
    val hot = df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bucket_n"))
      .filter(col("__bucket_n") > maxBucket)
      .select(keys.map(col): _*)
    df.join(broadcast(hot), keys, "left_anti")
  }
}
