package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Keyed persist with swap semantics: re-registering a key unpersists the
  * previous DataFrame first, so repeated query invocations (Verify runs
  * every query in one session; Bench re-runs trials) hold at most ONE
  * cached copy per signature table instead of leaking a new one per call.
  *
  * Re-registering an EQUIVALENT plan (sameResult — same sfDir, same
  * conf-derived literals) returns the already-persisted DataFrame
  * instead of swapping: without this, every Bench trial unpersisted and
  * recomputed the signature tables (18M md5 gram hashes at sf0.1),
  * silently defeating the bench's documented warm-up trial — the same
  * dedup-by-equivalence Spark's own CacheManager applies. A genuinely
  * different plan (new scale dir, changed spark.graft.* conf) still
  * swaps.
  *
  * CONTRACT: plan equivalence compares root PATHS, not file listings,
  * so inputs at a given path must be immutable within a JVM (true for
  * /root/testdata and the fingerprint-keyed stream staging). A test
  * that regenerates a fixture in-process must write to a FRESH path
  * (HotGramSpec does) or clearCache() first — otherwise reuse would
  * serve the old corpus.
  */
object CacheOnce {
  private val cached = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def swap(key: String, df: DataFrame): DataFrame = cached.get(key) match {
    case Some(prev)
        if prev.queryExecution.analyzed.sameResult(df.queryExecution.analyzed) =>
      prev
    case _ =>
      cached.remove(key).foreach(_.unpersist(blocking = false))
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      cached.put(key, p)
      p
  }
}
