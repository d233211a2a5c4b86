package graft

/** Second-JVM worker for the cross-process commit-protocol tests
  * (ProcessCasSpec). Two modes:
  *
  *   race <path> <tag> <count> — append `count` lines "<tag>-i" to the
  *     folio's `_MANIFEST` via read-modify-write publishes, retrying on
  *     [[graft.io.ConcurrentPublishException]]. The cross-process
  *     analog of FolioSpec's two-writer race: this JVM's publishes are
  *     serialized against the parent's ONLY by the `_CURRENT.lock` file
  *     lock and the CAS re-read — the in-JVM publish monitor cannot
  *     reach across the process boundary.
  *
  *   hold <path> <marker> <ms> — acquire the folio's `_CURRENT.lock`
  *     file lock directly, touch `marker`, hold the lock for `ms`, then
  *     release and exit. Lets the parent pin that a commit BLOCKS on
  *     another OS process's lock (the flock branch, Folio.scala's
  *     commitStaged) rather than racing past it.
  *
  * No Spark session — the commit protocol is pure file ops, mirroring
  * the reference registry's process-level locking intent
  * (/root/reference/file.h:39–310). */
object ProcessCasMain {
  private def readManifest(path: String): String =
    graft.io.Folio.currentVersion(path).map { v =>
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(s"$path/$v", "_MANIFEST").toPath), "UTF-8")
    }.getOrElse("")

  def main(args: Array[String]): Unit = args(0) match {
    case "race" =>
      val (path, tag, count) = (args(1), args(2), args(3).toInt)
      var i = 0
      while (i < count) {
        val basis = graft.io.Folio.currentVersion(path)
        val prev = readManifest(path)
        try {
          graft.io.Folio.publishArtifactsFrom(path, basis) { vdir =>
            java.nio.file.Files.write(
              new java.io.File(vdir, "_MANIFEST").toPath,
              (prev + s"$tag-$i\n").getBytes("UTF-8"))
          }
          i += 1
        } catch {
          case _: graft.io.ConcurrentPublishException => Thread.sleep(5)
        }
      }
    case "hold" =>
      val (path, marker, ms) = (args(1), args(2), args(3).toLong)
      new java.io.File(path).mkdirs()
      val ch = java.nio.channels.FileChannel.open(
        new java.io.File(path, "_CURRENT.lock").toPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      val lock = ch.lock()
      java.nio.file.Files.write(new java.io.File(marker).toPath,
        "held".getBytes("UTF-8"))
      Thread.sleep(ms)
      lock.release()
      ch.close()
    case other => sys.error(s"unknown mode $other")
  }
}
