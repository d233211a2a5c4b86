package graft.sources

import org.apache.spark.sql.connector.read.streaming.MicroBatchStream

/** KAFKA-SHAPED OFFSET-API CONTRACT for the seq-mode chunk feed: drives
  * [[SeqFeedStream]] through the exact driver-side call sequences
  * Spark's Kafka source must survive (MicroBatchExecution's offset
  * lifecycle) — as DIRECT API calls, not end-to-end queries, so each
  * property is pinned in isolation:
  *
  *   1. latestOffset is monotonic per partition (a regressed listing
  *      never regresses the offset);
  *   2. planInputPartitions is a PURE function of (start, end): the
  *      same offset pair plans the same ranges, call after call, even
  *      after retention deletes a partition's consumed head (replay
  *      determinism / idempotent replanning — exactly-once's core);
  *   3. restart order races: deserializeOffset-then-latestOffset and
  *      latestOffset-FIRST (Spark does not guarantee the order; the
  *      source-private seed file closes the second path);
  *   4. partition expansion: a directory appearing mid-stream enters
  *      the offset with base = first-visible-seq − 1 and planning
  *      starts exactly past the base;
  *   5. offset JSON round-trips bit-exactly (Spark compares offsets
  *      TEXTUALLY to detect "no new data").
  *
  * What this deliberately does NOT cover is transport: a real broker
  * adds network partitions mid-poll, leader elections, and
  * consumer-group rebalances. The delta between this feed and Kafka is
  * that transport layer only — the offset/replay/retention semantics
  * Spark's source API actually exercises are all here (see README
  * "Feed sources" for the precise gap statement).
  */
class ChunkFeedContractSpec extends graft.SparkSpec {
  import ChunkFeedSource._

  private def mkFeed(): (String, String) = (
    java.nio.file.Files.createTempDirectory("graft_contract_feed").toString,
    java.nio.file.Files.createTempDirectory("graft_contract_ckpt").toString)

  private def put(feed: String, part: String, seq: Int, payload: String): Unit = {
    val d = java.nio.file.Paths.get(feed, part)
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.write(d.resolve(f"chunk-$seq%08d"), payload.getBytes("UTF-8"))
  }

  private def rm(feed: String, part: String, seq: Int): Unit =
    java.nio.file.Files.delete(java.nio.file.Paths.get(feed, part, f"chunk-$seq%08d"))

  /** The stream as Spark constructs it (through the Table API). */
  private def stream(feed: String, ckpt: String): MicroBatchStream = {
    val props = new java.util.HashMap[String, String]()
    props.put("path", feed); props.put("offsets", "seq")
    new ChunkFeedSource().getTable(ChunkFeedSource.schema, Array.empty, props)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(props))
      .build().toMicroBatchStream(ckpt)
  }

  private def ranges(s: MicroBatchStream, a: ChunkFeedSource.SeqOffsets,
                     b: ChunkFeedSource.SeqOffsets): Seq[(String, Seq[Long])] =
    s.planInputPartitions(a, b).toSeq.map { p =>
      val r = p.asInstanceOf[SeqChunkRange]
      r.part -> r.chunks.map(_._1)
    }.sortBy(_._1)

  test("latestOffset is monotonic: tail deletion parks, never regresses") {
    val _ = spark // force session (FeedFs needs an active SparkContext)
    val (feed, ckpt) = mkFeed()
    put(feed, "p0", 0, "a"); put(feed, "p0", 1, "b")
    val s = stream(feed, ckpt)
    val o1 = s.latestOffset().asInstanceOf[SeqOffsets]
    assert(o1.entries("p0")._1 == 1L)
    rm(feed, "p0", 1) // tail deleted under the source
    val o2 = s.latestOffset().asInstanceOf[SeqOffsets]
    assert(o2.entries("p0")._1 == 1L,
      "listing-derived max regressed a previously emitted offset")
  }

  test("planInputPartitions is a pure function of (start, end): idempotent replanning") {
    val _ = spark
    val (feed, ckpt) = mkFeed()
    (0 to 3).foreach(i => put(feed, "p0", i, s"x$i"))
    val s = stream(feed, ckpt)
    val zero = s.initialOffset().asInstanceOf[SeqOffsets]
    val end = s.latestOffset().asInstanceOf[SeqOffsets]
    val first = ranges(s, zero, end)
    // Kafka contract: replanning the SAME batch (failure replay) must
    // yield identical splits — call again, and again on a FRESH stream
    assert(ranges(s, zero, end) == first)
    assert(ranges(stream(feed, ckpt), zero, end) == first)
    assert(first == Seq("p0" -> Seq(0L, 1L, 2L, 3L)))
  }

  test("replay after head retention: same offsets, same planned ranges") {
    val _ = spark
    val (feed, ckpt) = mkFeed()
    (0 to 4).foreach(i => put(feed, "p0", i, s"x$i"))
    val s = stream(feed, ckpt)
    val base = s.latestOffset().asInstanceOf[SeqOffsets] // seq 4, base -1
    put(feed, "p0", 5, "x5"); put(feed, "p0", 6, "x6")
    val end = s.latestOffset().asInstanceOf[SeqOffsets]
    val planned = ranges(s, base, end)
    assert(planned == Seq("p0" -> Seq(5L, 6L)))
    // retention deletes the CONSUMED head (0..4) — replaying the same
    // (start, end) after a crash must plan the identical range
    (0 to 4).foreach(i => rm(feed, "p0", i))
    assert(ranges(s, base, end) == planned)
    assert(ranges(stream(feed, ckpt), base, end) == planned)
  }

  test("restart race: latestOffset BEFORE deserializeOffset still carries committed partitions") {
    val _ = spark
    val (feed, ckpt) = mkFeed()
    put(feed, "p0", 0, "a"); put(feed, "p1", 0, "b")
    val s1 = stream(feed, ckpt)
    val committed = s1.latestOffset().asInstanceOf[SeqOffsets]
    assert(committed.entries.keySet == Set("p0", "p1"))
    // p0 consumed and retained out wholesale; p1 gains data
    rm(feed, "p0", 0)
    java.nio.file.Files.delete(java.nio.file.Paths.get(feed, "p0"))
    put(feed, "p1", 1, "c")
    // RESTART, adversarial order: Spark calls latestOffset FIRST.
    // Without the seed file p0 would drop from the emitted offset, then
    // be resurrected with no start entry and plan the consumed range.
    val s2 = stream(feed, ckpt)
    val post = s2.latestOffset().asInstanceOf[SeqOffsets]
    assert(post.entries.contains("p0"),
      "committed partition vanished from the first post-restart offset")
    assert(post.entries("p0")._1 == 0L)
    s2.deserializeOffset(committed.json()) // the log replays afterwards
    assert(ranges(s2, committed, post) == Seq("p1" -> Seq(1L)))
  }

  test("partition expansion: a new directory enters with base = first-visible-seq - 1") {
    val _ = spark
    val (feed, ckpt) = mkFeed()
    put(feed, "p0", 0, "a")
    val s = stream(feed, ckpt)
    val o1 = s.latestOffset().asInstanceOf[SeqOffsets]
    // p1 appears mid-stream with a RETAINED PREFIX (frames 0-2 already
    // aged out before this consumer subscribed): broker semantics say
    // those were never ours to read
    put(feed, "p1", 3, "late"); put(feed, "p1", 4, "later")
    val o2 = s.latestOffset().asInstanceOf[SeqOffsets]
    assert(o2.entries("p1") == (4L, 2L), s"bad expansion entry: ${o2.entries}")
    assert(ranges(s, o1, o2) == Seq("p1" -> Seq(3L, 4L)))
  }

  test("offset JSON round-trips bit-exactly (textual no-new-data compare)") {
    val _ = spark
    val (feed, ckpt) = mkFeed()
    put(feed, "p0", 7, "x")
    val s = stream(feed, ckpt)
    val o = s.latestOffset().asInstanceOf[SeqOffsets]
    val back = s.deserializeOffset(o.json()).asInstanceOf[SeqOffsets]
    assert(back.json() == o.json(),
      "offset JSON must round-trip textually or Spark re-triggers empty batches")
  }
}
