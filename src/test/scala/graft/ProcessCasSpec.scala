package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.Folio

/** Cross-PROCESS pins for the folio commit protocol: FolioSpec's race
  * tests exercise the CAS from threads in one JVM, where the per-path
  * publish monitor serializes before the file lock is ever contested.
  * Here a second JVM (no shared monitors) races the same `_CURRENT`,
  * so the only exclusion left is the `_CURRENT.lock` file lock plus
  * the CAS re-read — the branch the reference's registry covers with
  * process-level locking (/root/reference/file.h:39–310). No Spark
  * needed: the protocol is pure file ops. */
class ProcessCasSpec extends AnyFunSuite {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_proc").toString

  /** The running test JVM's own classpath reaches both class dirs and
    * the Spark jars — hand it to the child verbatim. */
  private def spawn(args: String*): Process =
    new ProcessBuilder(
      (Seq(s"${System.getProperty("java.home")}/bin/java",
        "-cp", System.getProperty("java.class.path"),
        "graft.ProcessCasMain") ++ args): _*)
      .redirectErrorStream(true)
      .start()

  private def readManifest(path: String): String =
    Folio.currentVersion(path).map { v =>
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(s"$path/$v", "_MANIFEST").toPath), "UTF-8")
    }.getOrElse("")

  test("two OS processes racing one _CURRENT: every append survives, versions contiguous") {
    val path = s"${tmp()}/idx"
    val n = 12
    val child = spawn("race", path, "B", n.toString)
    // parent appends its own lines through the same public API — its
    // in-JVM monitor is useless against the child, so winner-intact /
    // loser-loud rests entirely on the cross-process lock + CAS
    var i = 0
    while (i < n) {
      val basis = Folio.currentVersion(path)
      val prev = readManifest(path)
      try {
        Folio.publishArtifactsFrom(path, basis) { vdir =>
          java.nio.file.Files.write(
            new java.io.File(vdir, "_MANIFEST").toPath,
            (prev + s"A-$i\n").getBytes("UTF-8"))
        }
        i += 1
      } catch {
        case _: graft.io.ConcurrentPublishException => Thread.sleep(5)
      }
    }
    assert(child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
      "child JVM did not finish")
    assert(child.exitValue() == 0, {
      val out = new String(child.getInputStream.readAllBytes(), "UTF-8")
      s"child failed:\n$out"
    })
    // no lost update: all 2n lines present exactly once — a silent
    // cross-process interleave of check-and-swap would drop one
    val lines = readManifest(path).split("\n").toSeq.filter(_.nonEmpty)
    val want = (0 until n).flatMap(k => Seq(s"A-$k", s"B-$k"))
    assert(lines.sorted == want.sorted,
      s"lost/duplicated appends across processes: ${lines.sorted}")
    // one version per successful publish, pointer at the last
    assert(Folio.currentVersion(path).contains(f"v${2 * n}%08d"))
    // no losing stage left behind
    val leftovers = new java.io.File(path).listFiles()
      .map(_.getName).filter(_.contains(".stage-")).toSeq
    assert(leftovers.isEmpty, s"stage leftovers: $leftovers")
  }

  test("a commit BLOCKS on another process's _CURRENT.lock (the flock branch)") {
    val path = s"${tmp()}/idx"
    Folio.publishArtifacts(path) { vdir =>
      java.nio.file.Files.write(new java.io.File(vdir, "_MANIFEST").toPath,
        "a\n".getBytes("UTF-8"))
    }
    val marker = s"${tmp()}/held"
    val holdMs = 1500L
    val child = spawn("hold", path, marker, holdMs.toString)
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (!new java.io.File(marker).isFile) {
        assert(System.currentTimeMillis() < deadline, "child never took the lock")
        Thread.sleep(10)
      }
      val t0 = System.currentTimeMillis()
      Folio.publishArtifactsFrom(path, Folio.currentVersion(path)) { vdir =>
        java.nio.file.Files.write(new java.io.File(vdir, "_MANIFEST").toPath,
          "a\nb\n".getBytes("UTF-8"))
      }
      val waited = System.currentTimeMillis() - t0
      // the child held the lock for holdMs from marker-touch; a commit
      // that didn't block across the process boundary would return in
      // milliseconds. Generous floor: scheduling can eat some of the
      // hold before our publish reaches lock().
      assert(waited >= holdMs / 3,
        s"publish returned after ${waited}ms — did not wait for the " +
        "other process's file lock")
      assert(readManifest(path) == "a\nb\n")
    } finally {
      child.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
      child.destroyForcibly()
    }
  }
}
