package graft

/** Shared stage-once fixture protocol (StreamRunner waves, the
  * hive-partitioned ppr layout): staging dirs are KEYED BY the source
  * fixture's fingerprint, so regenerated testdata can never be silently
  * replayed stale, and the write lands in a temp dir that is atomically
  * renamed into place, so a concurrent JVM (sbt test + Verify) either
  * sees a complete staging or stages its own temp and adopts the
  * winner's.
  */
object Staging {

  /** Fingerprint of a source parquet path (file or directory):
    * name + size + mtime of every part file, SHA-1-digested (the first
    * 8 bytes, 64 bits). 32-bit String.hashCode was the r13 spelling —
    * a collision after regenerating testdata would silently replay a
    * stale staged fixture, the exact failure the fingerprint exists to
    * prevent. A missing source fails loudly here instead of NPE-ing in
    * listFiles. */
  def fingerprint(path: String): String = {
    val src = new java.io.File(path)
    if (!src.exists()) throw new IllegalArgumentException(
      s"Staging.fingerprint: source path does not exist: $path")
    val fpFiles: Seq[java.io.File] =
      if (src.isDirectory) src.listFiles().toSeq.sortBy(_.getName) else Seq(src)
    val desc = fpFiles.map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|")
    java.security.MessageDigest.getInstance("SHA-1")
      .digest(desc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"${b & 0xff}%02x").mkString
  }

  /** In-JVM lock per staging destination: concurrent threads staging the
    * SAME dest serialize (second thread reuses the first's result), but
    * unrelated fixtures stage in parallel — one global lock would make a
    * multi-second orders repartition block an unrelated stream-wave
    * staging. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Run `write` into a temp dir and atomically rename it to `dest`,
    * unless `dest/_STAGED` already exists (a completed prior staging —
    * reused as-is). Returns `dest`. Races between JVMs resolve to
    * whichever rename wins; the loser deletes its temp. EVERY non-adopted
    * temp dir is deleted — whether `write`, the `_STAGED` marker
    * creation, or the rename fails — so failed stagings never accumulate
    * partial parquet in /tmp (the r13 cleanup only covered `write`). */
  def once(dest: java.nio.file.Path)(write: java.nio.file.Path => Unit): java.nio.file.Path =
    locks.computeIfAbsent(dest.toString, _ => new Object).synchronized {
      if (!java.nio.file.Files.exists(dest.resolve("_STAGED"))) {
        val tmp =
          java.nio.file.Paths.get(s"${dest.toString}_tmp_${System.nanoTime()}")
        var adopted = false
        try {
          write(tmp)
          java.nio.file.Files.createFile(tmp.resolve("_STAGED")): Unit
          try {
            java.nio.file.Files.move(tmp, dest,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            adopted = true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException |
                 _: java.nio.file.FileSystemException =>
              // another JVM staged the same fingerprint first — use theirs
              if (!java.nio.file.Files.exists(dest.resolve("_STAGED")))
                throw new IllegalStateException(s"staging rename to $dest failed")
          }
        } finally {
          if (!adopted && java.nio.file.Files.exists(tmp))
            graft.queries.Registry.rmTree(tmp.toFile)
        }
      }
      dest
    }

  /** Deterministic mtime stamp for staged wave files. FileStreamSource
    * orders files by modification time, and the keep-first dedup
    * semantics of the incremental-curation rows depend on that order —
    * a filesystem silently refusing the stamp would make wave replay
    * nondeterministic, so fail the staging loudly instead (the temp dir
    * is discarded, nothing partial is renamed into place). */
  def stampMtime(f: java.io.File, t: Long): Unit =
    if (!f.setLastModified(t))
      throw new IllegalStateException(
        s"setLastModified($t) failed on $f — staged wave order would be nondeterministic")
}
