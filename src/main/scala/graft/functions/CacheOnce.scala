package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
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
  * ENFORCED contract: plan equivalence compares root PATHS, so a reuse
  * hit additionally re-checks a filesystem fingerprint (mtime + length
  * of each file-source root and EVERY descendant file, captured when
  * the entry was persisted — recursive, so a rewrite nested inside
  * partition subdirectories is caught even when the direct children's
  * metadata is unchanged). A fixture regenerated in-process at a
  * previously cached path therefore SWAPS — recompute, never stale data
  * — instead of relying on specs remembering to use fresh paths
  * (HotGramSpec does anyway). Driver-side fs metadata only; no job.
  * Residual window: a same-millisecond, same-length in-place rewrite of
  * a leaf file is indistinguishable by metadata (content hashing would
  * need a job); no fixture-regeneration path does this.
  */
object CacheOnce {
  private val cached =
    scala.collection.concurrent.TrieMap.empty[String, (DataFrame, Seq[String])]

  /** One line per file-source root: path@mtime:len plus every
    * DESCENDANT file (relative-path@mtime:len, depth-first). Overwriting
    * a dataset rewrites its part files wherever they nest (partition
    * subdirectories included), so any in-place regeneration changes the
    * fingerprint. Fixture roots are small (test/bench staging), so the
    * metadata walk stays driver-cheap. Non-file leaves contribute
    * nothing and are covered by sameResult alone. */
  private def fingerprint(df: DataFrame): Seq[String] = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map { p =>
          val fs = p.getFileSystem(conf)
          if (!fs.exists(p)) s"$p:absent"
          else {
            val st = fs.getFileStatus(p)
            def walk(s: org.apache.hadoop.fs.FileStatus): Seq[String] =
              if (s.isDirectory) fs.listStatus(s.getPath).toSeq.flatMap(walk)
              else Seq(s"${s.getPath.toString.stripPrefix(p.toString)}" +
                s"@${s.getModificationTime}:${s.getLen}")
            val kids = if (st.isDirectory) walk(st).sorted.mkString(",") else ""
            s"$p@${st.getModificationTime}:${st.getLen}|$kids"
          }
        }
        case _ => Seq.empty[String]
      }
    }.flatten
  }

  def swap(key: String, df: DataFrame): DataFrame = {
    val fp = fingerprint(df)
    cached.get(key) match {
      case Some((prev, prevFp))
          if prevFp == fp &&
            prev.queryExecution.analyzed.sameResult(df.queryExecution.analyzed) =>
        prev
      case _ =>
        cached.remove(key).foreach(_._1.unpersist(blocking = false))
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        cached.put(key, (p, fp))
        p
    }
  }
}
