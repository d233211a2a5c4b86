package graft.sources

import java.util
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A PARTITIONED, REPLAYABLE feed source — the broker shape of the
  * reference bus's feed-handler fanout (/root/reference/bus.h:119,
  * 166–167: numbered frames a consumer can re-request), which the live
  * TCP socket test cannot exercise (a socket has no offsets: nothing to
  * track, nothing to resume). Layout, one directory per feed partition:
  *
  *   feedDir/p0/chunk-00000001   (one frame per file, lines within)
  *   feedDir/p1/chunk-00000001
  *
  * The stream offset is a per-partition chunk count plus the last
  * consumed chunk's name (`{"p0":{"n":3,"last":"chunk-00000002"}}`),
  * checkpointed by Spark like a broker consumer group: a restarted query
  * resumes from the committed chunk index — never replaying, never
  * skipping, and never MISLABELING (the recorded name detects a listing
  * shifted by deletion) — and a partition directory that appears
  * mid-stream starts from 0 (partition expansion). Each micro-batch plans ONE
  * InputPartition per feed partition covering chunks [from, until):
  * consumption is parallel across feed partitions and ordered within
  * one, the broker contract. File listing and reads go through the
  * Hadoop FileSystem API, so the same source runs on HDFS/S3 paths.
  *
  * Rows are raw frames `(part, chunk, line)` — parsing stays downstream,
  * as with the socket source (the bus carries opaque frames).
  *
  * The feed is APPEND-ONLY: offsets are chunk COUNTS, so deleting any
  * file — even an already-consumed one — shifts the numbering and fails
  * the next batch loudly (see the `require` in planInputPartitions)
  * rather than mislabeling or skipping frames. A broker with retention
  * needs sequence-number offsets; the numbered-file convention can
  * carry those, but the Spark-write population path (uuid part files)
  * cannot, and append-only covers the replay contract this source
  * exists to test.
  *
  * Usage:
  *   spark.readStream.format("graft.sources.ChunkFeedSource")
  *     .option("path", feedDir).load()
  */
class ChunkFeedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "chunkfeed"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkFeedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "chunkfeed requires option 'path'")
    new ChunkFeedTable(path)
  }
}

object ChunkFeedSource {
  val schema: StructType = StructType(Seq(
    StructField("part", StringType, nullable = false),
    StructField("chunk", LongType, nullable = false),
    StructField("line", StringType, nullable = false)))

  /** Per partition: (consumed chunk count, name of the last consumed
    * chunk). The count drives planning; the NAME pins the numbering —
    * deleting any file below a committed offset shifts the sorted
    * listing, and the name check turns that silent mislabeling into a
    * loud failure. Keys sorted — offset equality (which Spark uses to
    * detect "no new data") is textual. */
  case class ChunkOffsets(entries: Map[String, (Long, String)]) extends Offset {
    override def json(): String =
      entries.toSeq.sortBy(_._1)
        .map { case (p, (n, last)) => s""""$p":{"n":$n,"last":"$last"}""" }
        .mkString("{", ",", "}")
  }

  private val entryRe = """"([^"]+)":\{"n":(\d+),"last":"([^"]*)"\}""".r
  def parseOffsets(json: String): ChunkOffsets =
    ChunkOffsets(entryRe.findAllMatchIn(json)
      .map(m => m.group(1) -> (m.group(2).toLong, m.group(3))).toMap)

  /** Chunks of one feed partition, sorted by file name — the frame
    * NUMBERING is the file-name ordering, as with broker segments.
    * Hidden and marker files (`.crc` checksums, `_SUCCESS`) are not
    * frames — same convention as Spark's own file sources, so a chunk
    * directory can be populated by a Spark write. */
  def chunkFiles(fs: FileSystem, partDir: Path): Seq[Path] =
    fs.listStatus(partDir).filter(_.isFile).map(_.getPath)
      .filterNot(p => p.getName.startsWith(".") || p.getName.startsWith("_"))
      .sortBy(_.getName).toSeq
}

private class ChunkFeedTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"chunkfeed($root)"
  override def schema(): StructType = ChunkFeedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = ChunkFeedSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ChunkFeedStream(root)
    }
}

private class ChunkFeedStream(root: String) extends MicroBatchStream {
  import ChunkFeedSource._

  private def fs: FileSystem = {
    val conf = org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration
    new Path(root).getFileSystem(conf)
  }

  /** The consumer starts at the current epoch's BEGINNING: a fresh query
    * (no checkpoint) reads every existing chunk once. */
  override def initialOffset(): Offset = ChunkOffsets(Map.empty)

  override def latestOffset(): Offset = {
    val f = fs
    val rootPath = new Path(root)
    val parts =
      if (!f.exists(rootPath)) Seq.empty
      else f.listStatus(rootPath).filter(_.isDirectory).map(_.getPath).toSeq
    ChunkOffsets(parts.map { p =>
      val files = chunkFiles(f, p)
      p.getName -> (files.length.toLong, files.lastOption.map(_.getName).getOrElse(""))
    }.toMap)
  }

  override def deserializeOffset(json: String): Offset = parseOffsets(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ChunkOffsets].entries
    val until = end.asInstanceOf[ChunkOffsets].entries
    val f = fs
    until.toSeq.sortBy(_._1).flatMap { case (part, (hi, _)) =>
      // unseen partition ⇒ expansion from 0
      val (lo, lastSeen) = from.getOrElse(part, (0L, ""))
      if (hi <= lo) None
      else {
        val all = chunkFiles(f, new Path(root, part))
        // the broker contract is never-skip: if files were removed
        // between offset planning and batch execution, committing `hi`
        // would silently pass over data — fail the batch instead
        require(all.length >= hi,
          s"chunk feed '$part': planned chunks [$lo, $hi) but only " +
          s"${all.length} files remain — frames were deleted under a " +
          "committed offset range (retention passed the consumer)")
        // and never-mislabel: deleting a CONSUMED file shifts the sorted
        // listing so index lo would re-read or skip the wrong frame; the
        // committed last-consumed NAME pins the numbering
        if (lo > 0)
          require(all((lo - 1).toInt).getName == lastSeen,
            s"chunk feed '$part': file #${lo - 1} is now " +
            s"'${all((lo - 1).toInt).getName}' but '$lastSeen' was " +
            "committed — frames were deleted or renamed under a " +
            "committed offset (the feed is append-only)")
        val files = all.slice(lo.toInt, hi.toInt).map(_.toString)
        Some(ChunkRange(part, lo, files): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChunkReaderFactory(new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration))
  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
}

/** Chunks [firstChunk, firstChunk+files.length) of one feed partition. */
case class ChunkRange(part: String, firstChunk: Long, files: Seq[String])
    extends InputPartition

/** Ships the session's Hadoop configuration to the executors: chunk
  * reads must see the same fs.* settings (credentials, endpoints,
  * custom schemes) as the driver-side listing, or an s3a://-style feed
  * authenticates on the driver and fails in every task. */
private class ChunkReaderFactory(conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[ChunkRange]
    new PartitionReader[InternalRow] {
      private var fileIdx = -1
      private var reader: java.io.BufferedReader = null
      private var current: String = null

      private def nextFile(): Boolean = {
        if (reader != null) { reader.close(); reader = null }
        fileIdx += 1
        if (fileIdx >= r.files.length) false
        else {
          val p = new Path(r.files(fileIdx))
          reader = new java.io.BufferedReader(new java.io.InputStreamReader(
            p.getFileSystem(conf.value).open(p),
            java.nio.charset.StandardCharsets.UTF_8))
          true
        }
      }

      override def next(): Boolean = {
        while (true) {
          if (reader == null && !nextFile()) return false
          current = reader.readLine()
          if (current != null) return true
          reader.close(); reader = null
        }
        false
      }

      override def get(): InternalRow = {
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
        row.update(0, UTF8String.fromString(r.part))
        row.setLong(1, r.firstChunk + fileIdx)
        row.update(2, UTF8String.fromString(current))
        row
      }
      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}
