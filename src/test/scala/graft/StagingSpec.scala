package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the shared stage-once protocol (Staging.scala) —
  * pure-filesystem, no Spark session. */
class StagingSpec extends AnyFunSuite {

  private def freshDest(tag: String): java.nio.file.Path = {
    val d = java.nio.file.Paths.get(
      s"/tmp/graft_staging_spec/${tag}_${System.nanoTime()}")
    java.nio.file.Files.createDirectories(d.getParent)
    d
  }

  test("once() stages exactly once and reuses the completed dir") {
    val dest = freshDest("reuse")
    var calls = 0
    def write(tmp: java.nio.file.Path): Unit = {
      java.nio.file.Files.createDirectories(tmp)
      java.nio.file.Files.writeString(tmp.resolve("data.txt"), "v1")
      calls += 1
    }
    Staging.once(dest)(write)
    Staging.once(dest)(write)
    assert(calls === 1, "second once() must reuse the completed staging")
    assert(java.nio.file.Files.exists(dest.resolve("_STAGED")))
    assert(java.nio.file.Files.readString(dest.resolve("data.txt")) === "v1")
  }

  test("a failed write() deletes its temp dir before rethrowing") {
    val dest = freshDest("fail")
    val boom = intercept[RuntimeException] {
      Staging.once(dest) { tmp =>
        java.nio.file.Files.createDirectories(tmp)
        java.nio.file.Files.writeString(tmp.resolve("partial.parquet"), "junk")
        throw new RuntimeException("mid-staging failure")
      }
    }
    assert(boom.getMessage === "mid-staging failure")
    // no _tmp_ sibling may survive the failure — leaked partials were
    // the code-review finding this fences
    val siblings = Option(dest.getParent.toFile.listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.startsWith(dest.getFileName.toString + "_tmp_"))
    assert(siblings.isEmpty,
      s"failed staging leaked temp dirs: ${siblings.mkString(", ")}")
    assert(!java.nio.file.Files.exists(dest.resolve("_STAGED")),
      "a failed staging must not look completed")
    // and the destination stages fine on retry
    Staging.once(dest) { tmp =>
      java.nio.file.Files.createDirectories(tmp)
      java.nio.file.Files.writeString(tmp.resolve("data.txt"), "v2")
    }
    assert(java.nio.file.Files.readString(dest.resolve("data.txt")) === "v2")
  }

  test("concurrent once() on the same dest runs write() exactly once") {
    val dest = freshDest("conc")
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        Staging.once(dest) { tmp =>
          java.nio.file.Files.createDirectories(tmp)
          Thread.sleep(50)
          java.nio.file.Files.writeString(tmp.resolve("data.txt"), "c")
          calls.incrementAndGet(): Unit
        }: Unit
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(calls.get() === 1,
      "per-dest lock must serialize same-dest staging to one write")
    assert(java.nio.file.Files.exists(dest.resolve("_STAGED")))
  }

  test("fingerprint() fails loudly on a missing source and tracks content changes") {
    // r13 ADVICE: a missing source must be an explicit error, never an
    // NPE from listFiles; and the digest must change when any part
    // file's size/mtime changes (the stale-replay guard).
    val e = intercept[IllegalArgumentException] {
      Staging.fingerprint("/tmp/graft_staging_spec/definitely_absent_xyz")
    }
    assert(e.getMessage.contains("does not exist"), e.getMessage)

    val src = freshDest("fpsrc")
    java.nio.file.Files.createDirectories(src)
    java.nio.file.Files.writeString(src.resolve("part-0"), "aaaa")
    val fp1 = Staging.fingerprint(src.toString)
    assert(fp1.matches("[0-9a-f]{16}"), s"expected a 64-bit hex digest, got $fp1")
    assert(fp1 === Staging.fingerprint(src.toString), "digest must be stable")
    java.nio.file.Files.writeString(src.resolve("part-0"), "aaaabbbb")
    graft.Staging.stampMtime(src.resolve("part-0").toFile,
      System.currentTimeMillis() + 5000)
    assert(Staging.fingerprint(src.toString) !== fp1,
      "changed part-file size/mtime must change the fingerprint")
  }

  test("failed _STAGED marker creation deletes the temp dir (r13 ADVICE cleanup gap)") {
    // write() succeeds but leaves no directory for the marker — the
    // createFile(_STAGED) throws, and the extended cleanup must still
    // remove whatever write() left behind (here: a FILE at the temp
    // path, the degenerate case the old cleanup never reached).
    val dest = freshDest("marker")
    intercept[java.nio.file.FileSystemException] {
      Staging.once(dest) { tmp =>
        // a plain file where a directory is expected: marker creation
        // under it must fail
        java.nio.file.Files.writeString(tmp, "not-a-dir"): Unit
      }
    }
    val leftovers = Option(dest.getParent.toFile.listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.startsWith(dest.getFileName.toString + "_tmp_"))
    assert(leftovers.isEmpty,
      s"non-adopted temp must be deleted, found: ${leftovers.mkString(",")}")
    assert(!java.nio.file.Files.exists(dest), "dest must not be adopted")
  }
}
