package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache-lifetime discipline for the multi-pass operators (minhash/LSH
  * dedup, connected components, IVF): every `persist` is scoped to the
  * operator call. Intermediates are released the moment the — orders of
  * magnitude smaller — result is materialized, so a long-lived shared
  * session never accumulates pinned executor storage across calls (the
  * reference frees its slab pools at the statement boundary,
  * /root/reference/cores.h:72; this is the Spark-session analog).
  */
object Caches {

  /** The one storage level the stack uses: spills instead of OOMing at
    * scale (MLlib's LSH caches at the same level). */
  val lvl: StorageLevel = StorageLevel.MEMORY_AND_DISK

  /** Persist `df` only if the caller didn't already: returns the handle
    * plus whether THIS call owns (and must release) the cache — avoids
    * the double-persist "already cached" churn when ops compose. */
  def acquire(df: DataFrame): (DataFrame, Boolean) =
    if (df.storageLevel == StorageLevel.NONE) (df.persist(lvl), true)
    else (df, false)

  /** Eagerly materialize `result` as a lineage-free checkpoint (results
    * here are pair lists / top-k tables / label maps, tiny relative to
    * their inputs), then release the given intermediate caches.
    * LOCAL checkpoint by default; when the session has a RELIABLE
    * checkpoint dir configured (the multi-executor deployment posture),
    * the seal goes there too — a sealed result backed by executor-local
    * blocks would die with an executor while the caller is still
    * consuming it, the exact failure mode the reliable dir opts out of
    * (r16 review). The returned frame pins only its own data; callers
    * wanting a fully clean session call [[release]] on it after
    * consuming. */
  def seal(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out =
      if (result.sparkSession.sparkContext.getCheckpointDir.isDefined)
        result.checkpoint(eager = true)
      else result.localCheckpoint(true)
    intermediates.foreach(_.unpersist(false))
    out
  }

  /** Release the checkpoint behind a [[seal]]ed (or checkpoint'd) frame.
    * Local checkpoints unpersist their blocks; RELIABLE checkpoints also
    * delete their files — Spark only reaps those via the GC-driven
    * ContextCleaner (and only with cleanCheckpoints=true), so without
    * the explicit delete every CC round would leak permanent files into
    * the checkpoint dir for the life of the session (r16 review). Safe
    * on any DataFrame — non-checkpointed plans are a no-op. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getCheckpointFile.foreach { f =>
          // best-effort hygiene (never fails the caller); hadoop FS so
          // an HDFS/object-store checkpoint dir cleans the same way
          scala.util.Try {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(
              df.sparkSession.sparkContext.hadoopConfiguration
            ).delete(p, true)
          }
        }
        lr.rdd.unpersist(false)
      case _ => ()
    }
}
