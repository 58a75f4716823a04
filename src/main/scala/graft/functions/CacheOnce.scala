package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Keyed persist with swap semantics: re-registering a key unpersists the
  * previous DataFrame first, so repeated query invocations (Verify runs
  * every query in one session; Bench re-runs trials) hold at most ONE
  * cached copy per signature table instead of leaking a new one per call.
  */
object CacheOnce {
  private val cached = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def swap(key: String, df: DataFrame): DataFrame = {
    cached.remove(key).foreach(_.unpersist(blocking = false))
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    cached.put(key, p)
    p
  }
}
