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
  * hit additionally re-checks a BOUNDED filesystem fingerprint: a
  * breadth-first walk over the root's directory tree capped at
  * [[MaxDirs]] listStatus calls, each visited directory contributing
  * ONE aggregate line (own mtime + file-child count, total length, max
  * file mtime). A fixture regenerated in-process at a previously cached
  * path therefore SWAPS — recompute, never stale data — including
  * rewrites nested inside partition subdirectories, which change their
  * directory's aggregate. Driver-side fs metadata only; no job; the
  * walk is O(directories), never O(part-files), and hard-capped so a
  * petabyte table with millions of part files costs at most ~[[MaxDirs]]
  * list calls per re-registration, not a full recursive listing.
  * Residual windows (both outside every fixture-regeneration path):
  * (a) a same-millisecond, same-length in-place rewrite of a leaf file
  * is indistinguishable by metadata (content hashing would need a job);
  * (b) a rewrite nested strictly below the [[MaxDirs]] BFS frontier —
  * frontier directories are recorded by their own mtime only, which an
  * ancestor of the rewritten dir need not change. Fixture trees are
  * tiny (≪ 64 dirs), so in tests the walk is always exhaustive; the cap
  * only engages at production scale, where tables are not silently
  * regenerated under a live cache.
  */
object CacheOnce {
  private val cached =
    scala.collection.concurrent.TrieMap.empty[String, (DataFrame, Seq[String])]

  /** Swap-event log for bench attribution: one (key, reused) entry per
    * swap() call. Bench drains it around each query's timed trials so
    * the artifact records whether a row re-used an already-registered
    * signature table or paid a fresh persist (the r11 verdict's
    * text_bm25_topk-vs-text_tfidf 0.44-vs-1.60 s ambiguity). */
  private val events =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Boolean)]

  def drainEvents(): Seq[(String, Boolean)] = {
    val b = Seq.newBuilder[(String, Boolean)]
    var e = events.poll()
    while (e != null) { b += e; e = events.poll() }
    b.result()
  }

  /** Block-manager materialization state of every registered key:
    * (fraction of cached partitions actually materialized, bytes in
    * memory, bytes on disk). A key whose buffers were never loaded (or
    * evicted wholesale) reads (0, 0, 0) — a trial that then touches it
    * pays the rebuild even though swap() reports a reuse. Driver-side
    * introspection only; no job. */
  def storageSnapshot(): Map[String, (Double, Long, Long)] =
    cached.toMap.map { case (key, (df, _)) =>
      import org.apache.spark.sql.execution.columnar.InMemoryRelation
      val st = try {
        df.queryExecution.withCachedData.collectFirst {
          case i: InMemoryRelation => i.cacheBuilder
        }.filter(_.isCachedColumnBuffersLoaded).flatMap { cb =>
          val rdd = cb.cachedColumnBuffers
          df.sparkSession.sparkContext.getRDDStorageInfo
            .find(_.id == rdd.id)
            .map(i => (if (i.numPartitions == 0) 0.0
                       else i.numCachedPartitions.toDouble / i.numPartitions,
                       i.memSize, i.diskSize))
        }.getOrElse((0.0, 0L, 0L))
      } catch { case _: Throwable => (0.0, 0L, 0L) }
      key -> st
    }

  /** Hard cap on listStatus calls per fingerprint — O(100) stats. */
  private val MaxDirs = 64

  /** One line per file-source root: `rootPath|dir-lines`, where each
    * visited directory yields `relPath@dirMtime:nFiles:totalLen:maxMtime`
    * over its DIRECT file children and each beyond-budget frontier
    * directory yields `relPath@dirMtime:dir`. Relative paths come from
    * URI paths on both sides, so scheme qualification differences
    * between the analyzed root and the listed children cannot embed
    * absolute paths. Non-file leaves contribute nothing and are covered
    * by sameResult alone. */
  private def fingerprint(df: DataFrame): Seq[String] = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map { p =>
          val fs = p.getFileSystem(conf)
          if (!fs.exists(p)) s"$p:absent"
          else {
            val root = fs.getFileStatus(p)
            if (!root.isDirectory) s"$p@${root.getModificationTime}:${root.getLen}"
            else {
              val rootUri = fs.makeQualified(p).toUri.getPath
              def rel(s: org.apache.hadoop.fs.FileStatus): String =
                s.getPath.toUri.getPath.stripPrefix(rootUri)
              val lines = scala.collection.mutable.ArrayBuffer.empty[String]
              val queue = scala.collection.mutable.Queue(root)
              var visited = 0
              while (queue.nonEmpty) {
                val d = queue.dequeue()
                if (visited >= MaxDirs)
                  lines += s"${rel(d)}@${d.getModificationTime}:dir"
                else {
                  visited += 1
                  var n = 0L; var len = 0L; var maxM = 0L
                  fs.listStatus(d.getPath).foreach { k =>
                    if (k.isDirectory) queue += k
                    else {
                      n += 1; len += k.getLen
                      maxM = math.max(maxM, k.getModificationTime)
                    }
                  }
                  lines += s"${rel(d)}@${d.getModificationTime}:$n:$len:$maxM"
                }
              }
              s"$p|${lines.sorted.mkString(",")}"
            }
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
        events.add(key -> true): Unit
        prev
      case _ =>
        cached.remove(key).foreach(_._1.unpersist(blocking = false))
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        cached.put(key, (p, fp))
        events.add(key -> false): Unit
        p
    }
  }
}
