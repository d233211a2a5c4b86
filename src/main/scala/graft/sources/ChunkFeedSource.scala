package graft.sources

import java.util
import com.fasterxml.jackson.databind.ObjectMapper
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
  * Two offset modes, chosen by option `offsets`:
  *
  * `offsets=count` (default) — APPEND-ONLY feeds. The offset is a
  * per-partition chunk count plus the last consumed chunk's name
  * (`{"p0":{"n":3,"last":"chunk-00000002"}}`), checkpointed by Spark
  * like a broker consumer group: a restarted query resumes from the
  * committed chunk index — never replaying, never skipping, and never
  * MISLABELING. Deleting ANY file — even a consumed one — shifts the
  * sorted listing and fails the next batch loudly (both slice ends are
  * pinned by name; see planInputPartitions). File names need not be
  * numbered (a Spark uuid part-file write can populate a partition),
  * but then population must finish before the stream starts: the name
  * pinning turns a file sorting INSIDE a planned range into a loud
  * failure, not wrong data.
  *
  * `offsets=seq` — RETENTION-CAPABLE feeds. Every chunk file name must
  * end in a decimal sequence number (`chunk-00000042`); the number IS
  * the frame identity, so the offset is just the highest consumed
  * sequence (`{"p0":{"seq":42}}`). Retention may delete any prefix of
  * consumed frames — the numbering is name-derived, not listing-derived,
  * so a restarted consumer still resumes exactly after its committed
  * sequence (the re-requestable numbered frames of bus.h:166-167). A
  * gap INSIDE a planned range (frames deleted before consumption, or a
  * producer writing out of sequence order) still fails loudly: the
  * range (lo, hi] must contain exactly hi-lo consecutively numbered
  * files. The driver clamps latestOffset monotonically, so deleting the
  * feed's tail parks the stream instead of regressing the offset.
  *
  * In both modes each micro-batch plans ONE InputPartition per feed
  * partition: consumption is parallel across feed partitions and
  * ordered within one, the broker contract; a partition directory that
  * appears mid-stream starts from its beginning (partition expansion).
  * Offsets are serialized with a real JSON writer (Jackson, already on
  * Spark's classpath) so partition/file names containing quotes or
  * backslashes round-trip instead of corrupting the checkpoint. File
  * listing and reads go through the Hadoop FileSystem API, so the same
  * source runs on HDFS/S3 paths.
  *
  * Rows are raw frames `(part, chunk, line)` — parsing stays downstream,
  * as with the socket source (the bus carries opaque frames).
  *
  * Usage:
  *   spark.readStream.format("graft.sources.ChunkFeedSource")
  *     .option("path", feedDir).option("offsets", "seq").load()
  */
class ChunkFeedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "chunkfeed"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkFeedSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // DSv2 hands getTable the case-PRESERVED map; reader options are
    // case-insensitive by contract (.option("Path", …) must work)
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty, "chunkfeed requires option 'path'")
    val mode = Option(opts.get("offsets")).getOrElse("count")
    require(mode == "count" || mode == "seq",
      s"chunkfeed option 'offsets' must be 'count' or 'seq', got '$mode'")
    new ChunkFeedTable(path, sequenced = mode == "seq")
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
    override def json(): String = {
      val m = new ObjectMapper()
      val root = m.createObjectNode()
      entries.toSeq.sortBy(_._1).foreach { case (p, (n, last)) =>
        val e = root.putObject(p)
        e.put("n", n); e.put("last", last)
      }
      m.writeValueAsString(root)
    }
  }

  /** Sequence-mode offset: per partition, the highest consumed sequence
    * number plus the partition's BASE — the sequence just below the first
    * frame this consumer owes (first-visible-seq − 1, captured ONCE when
    * the partition first entered an offset). Carrying the base in the
    * offset makes planInputPartitions a pure function of (start, end):
    * replaying a batch whose start offset predates the partition derives
    * lo from the committed end offset, never from a fresh listing that
    * retention may have mutated since — identical offsets always mean
    * identical planned sequence ranges (DSv2 replay determinism). */
  case class SeqOffsets(entries: Map[String, (Long, Long)]) extends Offset {
    override def json(): String = {
      val m = new ObjectMapper()
      val root = m.createObjectNode()
      entries.toSeq.sortBy(_._1).foreach { case (p, (h, b)) =>
        val e = root.putObject(p)
        e.put("seq", h); e.put("base", b)
      }
      m.writeValueAsString(root)
    }
  }

  def parseOffsets(json: String): ChunkOffsets = {
    val root = new ObjectMapper().readTree(json)
    val it = root.fields()
    val b = Map.newBuilder[String, (Long, String)]
    while (it.hasNext) {
      val e = it.next()
      b += e.getKey -> (e.getValue.get("n").asLong(), e.getValue.get("last").asText())
    }
    ChunkOffsets(b.result())
  }

  def parseSeqOffsets(json: String): SeqOffsets = {
    val root = new ObjectMapper().readTree(json)
    val it = root.fields()
    val b = Map.newBuilder[String, (Long, Long)]
    while (it.hasNext) {
      val e = it.next()
      // a pre-base checkpoint (older offset format) falls back to base
      // -1: the full from-the-beginning obligation — loud failure if
      // retention already removed frames, never a silent skip
      val base = if (e.getValue.has("base")) e.getValue.get("base").asLong() else -1L
      b += e.getKey -> (e.getValue.get("seq").asLong(), base)
    }
    SeqOffsets(b.result())
  }

  /** Chunks of one feed partition, sorted by file name — the frame
    * NUMBERING is the file-name ordering, as with broker segments.
    * Hidden and marker files (`.crc` checksums, `_SUCCESS`) are not
    * frames — same convention as Spark's own file sources, so a chunk
    * directory can be populated by a Spark write. */
  def chunkFiles(fs: FileSystem, partDir: Path): Seq[Path] =
    fs.listStatus(partDir).filter(_.isFile).map(_.getPath)
      .filterNot(p => p.getName.startsWith(".") || p.getName.startsWith("_"))
      .sortBy(_.getName).toSeq

  private val seqRe = """^.*?(\d+)$""".r

  /** Sequence number of a chunk file name — the trailing decimal run.
    * Sequence mode REQUIRES every chunk to carry one; a stray unnumbered
    * file in the feed directory is a population error, not a frame. */
  def seqOf(p: Path): Long = p.getName match {
    case seqRe(d) => d.toLong
    case _ => throw new IllegalArgumentException(
      s"chunk feed (offsets=seq): file '${p.getName}' has no trailing " +
      "sequence number — sequence mode requires producer-numbered chunks")
  }

  /** (seq → file) for one partition, failing loudly on duplicate
    * sequence numbers (two producers colliding on a frame id). A MISSING
    * partition directory is an empty listing, not an error: retention
    * may legitimately remove a fully-consumed partition wholesale, and
    * the never-skip guards downstream still catch a directory that
    * vanished while frames were owed. */
  def seqFiles(fs: FileSystem, partDir: Path): Seq[(Long, Path)] = {
    if (!fs.exists(partDir)) return Seq.empty
    val files = chunkFiles(fs, partDir).map(p => seqOf(p) -> p)
    val dups = files.groupBy(_._1).filter(_._2.length > 1).keys
    require(dups.isEmpty,
      s"chunk feed '${partDir.getName}': duplicate sequence number(s) " +
      s"${dups.mkString(",")} — frame identity must be unique")
    files.sortBy(_._1)
  }
}

private class ChunkFeedTable(root: String, sequenced: Boolean)
    extends Table with SupportsRead {
  override def name(): String = s"chunkfeed($root)"
  override def schema(): StructType = ChunkFeedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = ChunkFeedSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        if (sequenced) new SeqFeedStream(root, checkpointLocation)
        else new ChunkFeedStream(root)
    }
}

private object FeedFs {
  def fs(root: String): FileSystem = {
    val conf = org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration
    new Path(root).getFileSystem(conf)
  }
  def partDirs(f: FileSystem, root: String): Seq[Path] = {
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).filter(_.isDirectory).map(_.getPath)
      // hidden/marker DIRS are not feed partitions, same convention as
      // chunkFiles above: a transient `_temporary`/`.tmp-*` staging dir
      // at the feed root would otherwise emit its internals as bogus
      // frames and then trip the vanished-partition guard when removed
      .filterNot(p => p.getName.startsWith(".") || p.getName.startsWith("_"))
      .toSeq
  }
  def readerFactory(): PartitionReaderFactory =
    new ChunkReaderFactory(new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.SparkContext.getOrCreate().hadoopConfiguration))
}

/** Count-mode stream: append-only contract (see class scaladoc). */
private class ChunkFeedStream(root: String) extends MicroBatchStream {
  import ChunkFeedSource._

  /** The consumer starts at the current epoch's BEGINNING: a fresh query
    * (no checkpoint) reads every existing chunk once. */
  override def initialOffset(): Offset = ChunkOffsets(Map.empty)

  override def latestOffset(): Offset = {
    val f = FeedFs.fs(root)
    ChunkOffsets(FeedFs.partDirs(f, root).map { p =>
      val files = chunkFiles(f, p)
      p.getName -> (files.length.toLong, files.lastOption.map(_.getName).getOrElse(""))
    }.toMap)
  }

  override def deserializeOffset(json: String): Offset = parseOffsets(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[ChunkOffsets].entries
    val until = end.asInstanceOf[ChunkOffsets].entries
    // a committed partition must still EXIST in the new listing: the
    // plan below iterates `until`, so a wholesale-deleted partition dir
    // would otherwise silently drop out of the offset (and a later
    // recreation would restart its numbering at 0 — the exact
    // never-skip/never-mislabel violation the per-partition shrink
    // guards below catch for surviving dirs)
    val gone = from.keySet -- until.keySet
    require(gone.isEmpty,
      s"chunk feed: committed partition dir(s) ${gone.toSeq.sorted.mkString(", ")} " +
      "vanished from the listing — the feed is append-only; use " +
      "offsets=seq for retention")
    val f = FeedFs.fs(root)
    until.toSeq.sortBy(_._1).flatMap { case (part, (hi, endLast)) =>
      // unseen partition ⇒ expansion from 0
      val (lo, lastSeen) = from.getOrElse(part, (0L, ""))
      // a partition that SHRANK below its committed offset (retention
      // deleted more files than new ones arrived) must not silently
      // plan nothing while Spark commits the regressed offset — that
      // would rebase the numbering and mislabel every later frame
      require(hi >= lo,
        s"chunk feed '$part': listing shows $hi chunks but $lo were " +
        "committed — frames were deleted under a committed offset " +
        "(the feed is append-only; use offsets=seq for retention)")
      if (hi == lo) None
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
        // pin the END of the slice too: latestOffset and this listing
        // are separate calls, so a non-monotonic name landing between
        // them could sort INSIDE [lo, hi) and shift the slice — the
        // recorded name of chunk hi-1 turns that into a loud failure
        require(all((hi - 1).toInt).getName == endLast,
          s"chunk feed '$part': file #${hi - 1} is now " +
          s"'${all((hi - 1).toInt).getName}' but the offset recorded " +
          s"'$endLast' — a file was added or removed inside a planned " +
          "range (populate before starting the stream, or name chunks " +
          "in sorted arrival order)")
        val files = all.slice(lo.toInt, hi.toInt).map(_.toString)
        Some(ChunkRange(part, lo, files): InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = FeedFs.readerFactory()
  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()
}

/** Sequence-mode stream: frame identity is the file name's trailing
  * number, so offsets survive retention deletion of consumed frames.
  *
  * Every emitted offset is ALSO persisted in this stream's own
  * checkpoint directory (the Kafka-source pattern of source-private
  * metadata): Spark does not guarantee deserializeOffset runs before
  * the first latestOffset on restart, and without the seed a partition
  * whose directory retention removed wholesale would drop out of the
  * first post-restart offset, then be resurrected by the monotonic
  * floor with no start entry — planning a range for frames that were
  * legitimately consumed and deleted. Persisting at EMISSION time (not
  * source commit(), which Spark only invokes while constructing the
  * NEXT batch — a cleanly stopped query would never write its last
  * batch's seed) keeps every previously-offset partition in every
  * post-restart offset. Seeding from a never-committed emission is
  * safe: floor is monotonic over listings the frames existed in, and
  * retention's contract only permits deleting CONSUMED prefixes. */
private class SeqFeedStream(root: String, checkpointLocation: String)
    extends MicroBatchStream {
  import ChunkFeedSource._

  /** Monotonic clamp for latestOffset: deleting the feed's TAIL would
    * otherwise regress the listing-derived maximum below a committed
    * sequence, and Spark would commit the regressed offset. Seeded from
    * every checkpoint offset that passes through deserializeOffset and
    * from our own previous answers. Driver-side only, tiny (one long
    * per feed partition). */
  @volatile private var floor: Map[String, Long] = Map.empty
  /** First-wins per-partition base (first-visible-seq − 1, fixed at the
    * moment the partition first entered an offset). Rides in every
    * emitted offset so planning never consults a live listing for lo. */
  @volatile private var bases: Map[String, Long] = Map.empty
  private def raise(m: Map[String, Long]): Unit = synchronized {
    floor = (floor.keySet ++ m.keySet).map { k =>
      k -> math.max(floor.getOrElse(k, -1L), m.getOrElse(k, -1L))
    }.toMap
  }
  private def recordBases(m: Map[String, Long]): Unit = synchronized {
    bases = m ++ bases // first sighting wins; existing entries untouched
  }
  private def seedFrom(o: SeqOffsets): Unit = {
    raise(o.entries.map { case (p, (h, _)) => p -> h })
    recordBases(o.entries.map { case (p, (_, b)) => p -> b })
  }

  /** Source-private copy of the last emitted offset (see class doc).
    * Written on emission (write-temp + rename, the Hadoop
    * atomic-publish idiom), read once at construction. Losing it is
    * safe — the checkpoint offset log carries the same offsets; this
    * copy only closes the listing-before-deserialize window. */
  private val seedFile = new Path(checkpointLocation, "graft-seq-emitted.json")
  @volatile private var lastPersisted: String = null
  private def persistSeed(o: SeqOffsets): Unit = if (o.entries.nonEmpty) {
    val json = o.json()
    if (json != lastPersisted) {
      val f = FeedFs.fs(checkpointLocation)
      val tmp = new Path(checkpointLocation, "graft-seq-emitted.json.tmp")
      val out = f.create(tmp, true)
      try out.write(json.getBytes("UTF-8")) finally out.close()
      // Hadoop delete/rename report failure by RETURNING FALSE, not
      // throwing: only record the seed as persisted when the publish
      // actually landed, so a transient failure retries on the next
      // emission instead of silently leaving a stale seed to re-open
      // the offset-regression window this file exists to close
      f.delete(seedFile, false)
      if (f.rename(tmp, seedFile)) lastPersisted = json
      else System.err.println(
        s"[graft] WARN: chunkfeed seed publish failed (rename $tmp -> " +
        s"$seedFile returned false) — will retry on the next emission; " +
        "until then a restart may consult a stale seed")
    }
  }
  locally {
    val f = FeedFs.fs(checkpointLocation)
    if (f.exists(seedFile)) {
      val in = f.open(seedFile)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      seedFrom(parseSeqOffsets(json))
    }
  }

  override def initialOffset(): Offset = SeqOffsets(Map.empty)

  override def latestOffset(): Offset = {
    val f = FeedFs.fs(root)
    val listed = FeedFs.partDirs(f, root).map { p =>
      val files = seqFiles(f, p)
      p.getName -> (files.lastOption.map(_._1).getOrElse(-1L),
                    files.headOption.map(_._1 - 1).getOrElse(-1L))
    }.toMap
    raise(listed.map { case (p, (h, _)) => p -> h })
    recordBases(listed.collect { case (p, (h, b)) if h >= 0 => p -> b })
    val out = SeqOffsets(floor.filter(_._2 >= 0).map { case (p, h) =>
      p -> (h, bases.getOrElse(p, -1L))
    })
    persistSeed(out)
    out
  }

  override def deserializeOffset(json: String): Offset = {
    val o = parseSeqOffsets(json)
    seedFrom(o)
    o
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[SeqOffsets].entries
    val until = end.asInstanceOf[SeqOffsets].entries
    val f = FeedFs.fs(root)
    until.toSeq.sortBy(_._1).flatMap { case (part, (hi, base)) =>
      // an unseen partition starts just past its committed BASE — the
      // first frame visible when the partition entered the offset; frames
      // retained out before subscription were never this consumer's to
      // read (broker semantics). lo comes from the OFFSET PAIR alone, so
      // replaying (start, end) after a failure plans the identical range
      // even if retention has since deleted the partition's head.
      val lo = from.get(part).map(_._1).getOrElse(base)
      // short-circuit BEFORE listing: a fully-consumed partition whose
      // directory retention removed wholesale must not fail the stream
      // just because another partition has new data
      if (hi <= lo) None
      else {
        val files = seqFiles(f, new Path(root, part))
        val inRange = files.filter { case (s, _) => s > lo && s <= hi }
        // never-skip, seq flavor: the planned range (lo, hi] must hold
        // exactly its consecutive run of frames — an interior gap means
        // frames were deleted BEFORE consumption (retention overtook the
        // consumer) or the producer wrote out of sequence order
        require(inRange.length == hi - lo &&
                inRange.map(_._1) == (lo + 1 to hi),
          s"chunk feed '$part': planned sequences (${lo}, ${hi}] but " +
          s"found [${inRange.map(_._1).mkString(",")}] — frames were " +
          "deleted before consumption or produced out of order")
        Some(SeqChunkRange(part, inRange.map { case (s, p) => (s, p.toString) })
          : InputPartition)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = FeedFs.readerFactory()
  override def commit(end: Offset): Unit = () // offsets live in the checkpoint + seed file
  override def stop(): Unit = ()
}

/** Chunks [firstChunk, firstChunk+files.length) of one feed partition. */
case class ChunkRange(part: String, firstChunk: Long, files: Seq[String])
    extends InputPartition

/** Explicitly-numbered chunks of one feed partition (sequence mode). */
case class SeqChunkRange(part: String, chunks: Seq[(Long, String)])
    extends InputPartition

/** Ships the session's Hadoop configuration to the executors: chunk
  * reads must see the same fs.* settings (credentials, endpoints,
  * custom schemes) as the driver-side listing, or an s3a://-style feed
  * authenticates on the driver and fails in every task. */
private class ChunkReaderFactory(conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    // both range shapes read identically: an ordered list of
    // (chunk number, file) pairs
    val chunks: IndexedSeq[(Long, String)] = partition match {
      case r: ChunkRange =>
        r.files.toIndexedSeq.zipWithIndex.map { case (f, i) => (r.firstChunk + i, f) }
      case r: SeqChunkRange => r.chunks.toIndexedSeq
    }
    val part = partition match {
      case r: ChunkRange => r.part
      case r: SeqChunkRange => r.part
    }
    new PartitionReader[InternalRow] {
      private var fileIdx = -1
      private var reader: java.io.BufferedReader = null
      private var current: String = null

      private def nextFile(): Boolean = {
        if (reader != null) { reader.close(); reader = null }
        fileIdx += 1
        if (fileIdx >= chunks.length) false
        else {
          val p = new Path(chunks(fileIdx)._2)
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
        row.update(0, UTF8String.fromString(part))
        row.setLong(1, chunks(fileIdx)._1)
        row.update(2, UTF8String.fromString(current))
        row
      }
      override def close(): Unit = if (reader != null) reader.close()
    }
  }
}
