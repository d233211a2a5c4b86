package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg replays to the exact batch answer") {
    val stream = EventStream.hourlyByType(EventStream.readEvents(spark, sf))
    val got = EventStream.runToCompletion(spark, stream, "t_stream_hourly")
      .orderBy("bucket", "event_type").collect().toSeq
    val want = Queries.q14_hourly_buckets(spark, sf)
      .orderBy("bucket", "event_type").collect().toSeq
    assert(got == want)
  }

  test("foreachBatch lands micro-batches in the folio layout batch reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val stream = EventStream.readEvents(spark, sf)
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.io.Folio.appendPartition(batch.drop("ts"), s"$dir/events",
          Seq("event_type"), Seq("ts_ns"))
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // the batch engine reads what the stream wrote — one unified layout
    val back = graft.io.Folio.read(spark, s"$dir/events")
    assert(back.count() == Tables.events(spark, sf).count())
    assert(back.select("event_type").distinct().count() == 5)
  }

  test("stream-stream interval join (clicks enriched with recent purchases)") {
    import org.apache.spark.sql.functions._
    val ev = EventStream.readEvents(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
      col("p_ts") >= col("c_ts") - expr("INTERVAL 10 MINUTES") &&
      col("p_ts") <= col("c_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("t_ss_join").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("t_ss_join").count()
    // batch truth: same join on the static frames
    val evB = Tables.events(spark, sf)
    val cB = evB.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("c_ts"))
    val pB = evB.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val want = cB.join(pB,
      col("user_id") === col("p_user") &&
      col("p_ts") >= col("c_ts") - expr("INTERVAL 10 MINUTES") &&
      col("p_ts") <= col("c_ts")).count()
    assert(got == want && want > 0)
  }

  test("session windows (gap-based) in streaming match batch session counts") {
    import org.apache.spark.sql.functions._
    val agg = EventStream.readEvents(spark, sf)
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("t_sessions").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("t_sessions")
    // session count per user must equal the batch q43 sessionization
    val got = streamed.groupBy("user_id").count().orderBy("user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val want = Queries.q43_sessionize(spark, sf)
      .groupBy("user_id").count().orderBy("user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == want)
  }

  test("sessionsByUser: full row parity with the batch lag-window sessionization") {
    // stronger than the count-parity pin above: every closed session's
    // (start, n_events, duration) must agree with the batch q43 islands
    val got = Queries.q123_stream_sessions(spark, sf).collect().toSeq
    val want = Queries.q43_sessionize(spark, sf)
      .select(col("user_id"), col("session_start"), col("n_events"), col("duration_us"))
      .orderBy(col("user_id"), col("session_start"))
      .collect().toSeq
    assert(got.size == want.size, s"session count: ${got.size} vs ${want.size}")
    assert(got == want)
  }

  test("streaming dedup with watermark drops replayed event ids") {
    import org.apache.spark.sql.functions._
    val ev = EventStream.readEvents(spark, sf)
    val deduped = EventStream.dedupWithinWatermark(ev, Seq("event_id"), "1 hour")
      .groupBy()
      .agg(count(lit(1)).as("n"))
    val q = deduped.writeStream.outputMode("complete")
      .format("memory").queryName("t_dedup").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table("t_dedup").collect()(0).getLong(0)
    assert(n == Tables.events(spark, sf).count()) // fixture ids are unique
  }

  test("streaming dedup: planted duplicates inside the horizon collapse to one") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (event_id, ts_s)
    val stream = input.toDF().toDF("event_id", "ts_s")
      .withColumn("ts", timestamp_seconds(col("ts_s")))
    val deduped = EventStream.dedupWithinWatermark(stream, Seq("event_id"), "10 minutes")
      .select("event_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("t_dedup2").start()
    try {
      input.addData((1L, 1000L), (1L, 1010L), (2L, 1005L)) // dup of 1 in-batch
      q.processAllAvailable()
      input.addData((1L, 1100L), (3L, 1200L))              // dup of 1 cross-batch
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("t_dedup2").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("repetition/quality signals run unchanged on a streaming frame (== batch)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "buy now buy now buy now buy now"),
      (2L, "the quick brown fox jumps over a lazy dog"),
      (3L, ""))
    val input = MemoryStream[(Long, String)]
    val stream = graft.llm.TextOps.withRepetitionSignals(
      input.toDF().toDF("doc_id", "text"), "text")
      .select("doc_id", "top_bigram_frac", "dup_trigram_frac", "word_entropy")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("t_rep").start()
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("t_rep").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val batch = graft.llm.TextOps.withRepetitionSignals(rows.toDF("doc_id", "text"), "text")
      .select("doc_id", "top_bigram_frac", "dup_trigram_frac", "word_entropy").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(streamed == batch && streamed(1L)._1 > 0.5)
  }

  test("classifier scores at ingest: streaming == batch (exact integer sums)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq((1L, "the quick brown fox"), (2L, "buy now buy now"), (3L, "x"))
    val w = graft.llm.TextOps.syntheticWeights(64)
    val input = MemoryStream[(Long, String)]
    // the per-doc groupBy is a stateful streaming aggregate — update mode
    val stream = graft.llm.TextOps.hashedLinearScore(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", w, 1997L, 64)
    val q = stream.writeStream.outputMode("update")
      .format("memory").queryName("t_cls").start()
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("t_cls").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val batch = graft.llm.TextOps.hashedLinearScore(
        rows.toDF("doc_id", "text"), "doc_id", "text", w, 1997L, 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed == batch, s"stream $streamed != batch $batch")
  }

  test("contamination probe: bloom ingest filter runs unchanged on a stream (== batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),          // the benchmark doc
      (1L, "alpha beta gamma delta overlapping prefix here"), // shares a trigram
      (2L, "totally unrelated words with zero shared trigrams at all"),
      (3L, "another clean document nothing in common whatsoever today"))
    val bench = rows.take(1).toDF("doc_id", "text")
    // built once (batch), literal-bound: stateless column algebra
    val probe = graft.llm.Pipeline.contaminationProbe(bench, "text")
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .filter(!probe(col("text")))
      .select("doc_id")
      .writeStream.outputMode("append").format("memory").queryName("t_probe").start()
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("t_probe").as[Long].collect().toSet
    val batch = rows.toDF("doc_id", "text")
      .filter(!probe(col("text"))).select("doc_id").as[Long].collect().toSet
    assert(streamed == batch, "micro-batch and batch plans must agree")
    // at fpp=0.01 on a 4-doc fixture no false positive is plausible:
    // the probe keeps exactly the trigram-disjoint docs
    assert(streamed == Set(2L, 3L))
  }

  test("network feed: live TCP socket source flows through the same ops (bus.h:119)") {
    // the bus's feed-handler fanout over a real network transport: a
    // local TCP server plays the feed, spark's socket source ingests it,
    // and the SAME dedup-within-watermark op the file-replay tests use
    // runs unchanged — the readStream seam is transport-agnostic
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val lines = Seq("1,1000,a", "1,1010,a", "2,1005,b", "3,1200,c") // dup id 1
    @volatile var client: java.net.Socket = null
    val feeder = new Thread(() => {
      try {
        client = server.accept()
        val w = new java.io.PrintWriter(client.getOutputStream, true)
        lines.foreach(w.println)
        w.flush()
      } catch { case _: Throwable => () }
    })
    feeder.setDaemon(true); feeder.start()
    val raw = spark.readStream.format("socket")
      .option("host", "127.0.0.1").option("port", server.getLocalPort).load()
    val parsed = raw.select(split(col("value"), ",").as("f"))
      .select(col("f").getItem(0).cast("long").as("event_id"),
              col("f").getItem(1).cast("long").as("ts_s"))
      .withColumn("ts", timestamp_seconds(col("ts_s")))
    val deduped = EventStream.dedupWithinWatermark(parsed, Seq("event_id"), "10 minutes")
      .select("event_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("t_socket").start()
    try {
      // the source receives asynchronously: poll until the three distinct
      // ids landed (bounded — a hung feed fails the assert, not the build)
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 3 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("t_socket").count()
        if (n < 3) Thread.sleep(200)
      }
      assert(spark.table("t_socket").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    } finally {
      q.stop()
      if (client != null) client.close()
      server.close()
    }
  }

  test("chunk feed: per-partition offsets resume across restart (broker shape, bus.h:119)") {
    // the part of the bus the socket test can't reach: numbered frames a
    // consumer resumes from. Three runs against ONE checkpoint: run 1
    // consumes the initial chunks; chunks arrive while the query is DOWN;
    // run 2 must consume ONLY the new ones (the memory sink is fresh per
    // run, so any replay would show up as extra rows); run 3 with no new
    // data consumes nothing. Partition p2 appears mid-stream — expansion
    // starts it from chunk 0.
    import spark.implicits._
    val feed = java.nio.file.Files.createTempDirectory("graft_chunk_feed").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_chunk_ckpt").toString
    def put(part: String, chunk: Int, lines: String*): Unit = {
      val dir = java.nio.file.Paths.get(feed, part)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve(f"chunk-$chunk%08d"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def runOnce(): Seq[(String, Long, String)] = {
      // foreachBatch (recoverable), not the memory sink (which refuses
      // checkpoint restarts); a fresh buffer per run, so replayed frames
      // would show up as extra rows
      val buf = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
      val q = spark.readStream.format("graft.sources.ChunkFeedSource")
        .option("path", feed).load()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.as[(String, Long, String)].collect()
          buf.synchronized { buf ++= rows }
          ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      buf.synchronized(buf.toSeq.sorted)
    }

    put("p0", 0, "a0", "a1"); put("p1", 0, "b0")
    val run1 = runOnce()
    assert(run1 == Seq(("p0", 0L, "a0"), ("p0", 0L, "a1"), ("p1", 0L, "b0")))

    // frames arrive while the consumer is down — including a NEW partition
    put("p0", 1, "a2"); put("p1", 1, "b1", "b2"); put("p2", 0, "c0")
    val run2 = runOnce()
    assert(run2 == Seq(("p0", 1L, "a2"), ("p1", 1L, "b1"), ("p1", 1L, "b2"),
                       ("p2", 0L, "c0")),
      s"restart must resume from the committed offsets, got $run2")

    val run3 = runOnce()
    assert(run3.isEmpty, s"no new chunks ⇒ no rows, got $run3")
  }

  test("chunk feed: hidden/marker dirs are not partitions; options are case-insensitive") {
    import spark.implicits._
    val feed = java.nio.file.Files.createTempDirectory("graft_chunk_hidden").toString
    def put(part: String, chunk: Int, lines: String*): Unit = {
      val dir = java.nio.file.Paths.get(feed, part)
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.write(dir.resolve(f"chunk-$chunk%08d"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    put("p0", 0, "a0")
    // a Spark-write staging dir and a metadata dir at the feed root:
    // their contents must not surface as frames (and their later
    // removal must not trip the vanished-partition guard)
    put("_temporary", 0, "junk")
    put(".tmp-123", 0, "junk")
    val buf = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
    val q = spark.readStream.format("graft.sources.ChunkFeedSource")
      .option("path", feed).load()
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.as[(String, Long, String)].collect()
        buf.synchronized { buf ++= rows }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(buf.toSeq.sorted == Seq(("p0", 0L, "a0")),
      s"hidden/marker dirs surfaced as feed partitions: ${buf.toSeq.sorted}")
    // DSv2 getTable receives the case-PRESERVED option map; reader
    // options are case-insensitive by contract
    val props = new java.util.HashMap[String, String]()
    props.put("Path", feed); props.put("Offsets", "seq")
    val table = new graft.sources.ChunkFeedSource()
      .getTable(graft.sources.ChunkFeedSource.schema, Array.empty, props)
    assert(table.name().contains(feed), s"got ${table.name()}")
  }

  test("chunk feed: frames deleted under a committed offset fail loudly, never skip") {
    // the never-skip half of the broker contract: the feed is append-only
    // (offsets are counts), so retention deleting ANY file — here a
    // consumed one, which shifts the numbering under the committed
    // offset — must fail the batch instead of mislabeling what remains
    val feed = java.nio.file.Files.createTempDirectory("graft_chunk_ret").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_chunk_ret_ck").toString
    def put(part: String, chunk: Int, lines: String*): Unit = {
      val d = java.nio.file.Paths.get(feed, part)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve(f"chunk-$chunk%08d"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.ChunkFeedSource")
        .option("path", feed).load()
        .writeStream.outputMode("append")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    put("p0", 0, "a0")
    runOnce() // commits offset 1
    put("p0", 1, "a1"); put("p0", 2, "a2")
    java.nio.file.Files.delete(java.nio.file.Paths.get(feed, "p0", "chunk-00000000"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { runOnce() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("frames were deleted")),
      s"expected the never-skip guard, got: ${messages(e)}")
  }

  test("chunk feed: partition shrunk BELOW a committed offset fails loudly (no silent rebase)") {
    // retention deleting more files than new ones arrive leaves hi < lo;
    // planning nothing while Spark commits the regressed offset would
    // rebase the numbering and mislabel every later frame — it must fail
    val feed = java.nio.file.Files.createTempDirectory("graft_chunk_shrink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_chunk_shrink_ck").toString
    def put(part: String, chunk: Int, lines: String*): Unit = {
      val d = java.nio.file.Paths.get(feed, part)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve(f"chunk-$chunk%08d"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.ChunkFeedSource")
        .option("path", feed).load()
        .writeStream.outputMode("append")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    put("p0", 0, "a0"); put("p0", 1, "a1")
    runOnce() // commits offset 2
    java.nio.file.Files.delete(java.nio.file.Paths.get(feed, "p0", "chunk-00000000"))
    // one file remains: hi=1 < lo=2 — the old code planned no work here
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { runOnce() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("deleted under a committed offset")),
      s"expected the shrink guard, got: ${messages(e)}")
  }

  test("chunk feed offsets=seq: retention deletion of consumed frames survives restart (bus.h:166)") {
    // the retention contract count mode cannot offer: frame identity is
    // the file name's sequence number, so deleting consumed chunks does
    // NOT shift anything — a restarted consumer resumes exactly after
    // its committed sequence
    import spark.implicits._
    val feed = java.nio.file.Files.createTempDirectory("graft_seq_feed").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_seq_ckpt").toString
    def put(part: String, seq: Int, lines: String*): Unit = {
      val d = java.nio.file.Paths.get(feed, part)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve(f"chunk-$seq%08d"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def runOnce(): Seq[(String, Long, String)] = {
      val buf = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
      val q = spark.readStream.format("graft.sources.ChunkFeedSource")
        .option("path", feed).option("offsets", "seq").load()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.as[(String, Long, String)].collect()
          buf.synchronized { buf ++= rows }
          ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      buf.synchronized(buf.toSeq.sorted)
    }

    put("p0", 0, "a0"); put("p0", 1, "a1"); put("p1", 5, "b5")
    val run1 = runOnce()
    assert(run1 == Seq(("p0", 0L, "a0"), ("p0", 1L, "a1"), ("p1", 5L, "b5")),
      s"run1: $run1") // p1 starts at its first existing frame, number kept

    // RETENTION while the consumer is down: every consumed p0 frame goes
    // away; new frames 2 and 3 arrive. Count mode fails here by design —
    // seq mode must resume at exactly frame 2.
    java.nio.file.Files.delete(java.nio.file.Paths.get(feed, "p0", "chunk-00000000"))
    java.nio.file.Files.delete(java.nio.file.Paths.get(feed, "p0", "chunk-00000001"))
    put("p0", 2, "a2"); put("p0", 3, "a3")
    val run2 = runOnce()
    assert(run2 == Seq(("p0", 2L, "a2"), ("p0", 3L, "a3")),
      s"seq restart must resume after the committed sequence, got $run2")

    val run3 = runOnce()
    assert(run3.isEmpty, s"no new frames ⇒ no rows, got $run3")
  }

  test("chunk feed offsets=seq: a gap INSIDE a planned range fails loudly") {
    // frames deleted BEFORE consumption (retention overtook the consumer)
    // must not be silently skipped
    val feed = java.nio.file.Files.createTempDirectory("graft_seq_gap").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_seq_gap_ck").toString
    def put(part: String, seq: Int, lines: String*): Unit = {
      val d = java.nio.file.Paths.get(feed, part)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve(f"chunk-$seq%08d"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.ChunkFeedSource")
        .option("path", feed).option("offsets", "seq").load()
        .writeStream.outputMode("append")
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    put("p0", 0, "a0")
    runOnce() // commits seq 0
    put("p0", 1, "a1"); put("p0", 2, "a2"); put("p0", 3, "a3")
    java.nio.file.Files.delete(java.nio.file.Paths.get(feed, "p0", "chunk-00000002"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { runOnce() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("deleted before consumption")),
      s"expected the seq never-skip guard, got: ${messages(e)}")
  }

  test("chunk feed offsets: names with quotes/backslashes round-trip the checkpoint JSON") {
    import graft.sources.ChunkFeedSource._
    val nasty = Map("""p"0""" -> (3L, """chu"nk\01"""), "p\\1" -> (1L, "c\t2"))
    val o = ChunkOffsets(nasty)
    assert(parseOffsets(o.json()).entries == nasty,
      s"count offsets corrupted: ${o.json()}")
    val sn = Map("""p"0""" -> (7L, -1L), "p\\1" -> (2L, 4L))
    assert(parseSeqOffsets(SeqOffsets(sn).json()).entries == sn)
    // a pre-base checkpoint (older offset format) parses with base -1 —
    // the full from-the-beginning obligation, never a silent skip
    assert(parseSeqOffsets("""{"p0":{"seq":9}}""").entries == Map("p0" -> (9L, -1L)))
  }

  test("chunk feed offsets=seq: fully-retained partition dir does not fail other partitions") {
    // retention may remove a fully-consumed partition DIRECTORY wholesale;
    // the next batch (driven by new data elsewhere) must keep running —
    // the removed partition is hi == lo, short-circuited before listing
    import spark.implicits._
    val feed = java.nio.file.Files.createTempDirectory("graft_seq_ret").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_seq_ret_ck").toString
    def put(part: String, seq: Int, lines: String*): Unit = {
      val d = java.nio.file.Paths.get(feed, part)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.write(d.resolve(f"chunk-$seq%08d"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def runOnce(): Seq[(String, Long, String)] = {
      val buf = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()
      val q = spark.readStream.format("graft.sources.ChunkFeedSource")
        .option("path", feed).option("offsets", "seq").load()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = batch.as[(String, Long, String)].collect()
          buf.synchronized { buf ++= rows }
          ()
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      buf.synchronized(buf.toSeq.sorted)
    }
    put("p0", 0, "a0"); put("p1", 0, "b0")
    assert(runOnce() == Seq(("p0", 0L, "a0"), ("p1", 0L, "b0")))
    // p0 retained out entirely (directory and all); p1 gets new data
    org.apache.commons.io.FileUtils.deleteDirectory(
      java.nio.file.Paths.get(feed, "p0").toFile)
    put("p1", 1, "b1")
    assert(runOnce() == Seq(("p1", 1L, "b1")),
      "a wholly-retained consumed partition must not fail the stream")
  }

  test("media decode + aHash run unchanged on a streaming frame (== batch)") {
    // decode-at-ingest: the multimodal codec seam (mapPartitions) and the
    // perceptual signature are row-local, so a feed decodes as it lands
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    def png(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(x, y, if ((x + y) % 2 == 0) rgb else 0)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val rows = Seq((1L, png(0xAABBCC)), (2L, png(0x112233)))
    val input = MemoryStream[(Long, Array[Byte])]
    val stream = graft.llm.Multimodal.aHashSignatures(
      graft.llm.Multimodal.decodeBinaryPartitioned(
        input.toDF().toDF("doc_id", "png"), "doc_id", "png",
        graft.llm.Multimodal.ImageIoCodec(grid = 8)))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("t_media").start()
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("t_media").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.llm.Multimodal.aHashSignatures(
        graft.llm.Multimodal.decodeBinaryPartitioned(
          rows.toDF("doc_id", "png"), "doc_id", "png",
          graft.llm.Multimodal.ImageIoCodec(grid = 8)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch && streamed.size == 2)
  }

  test("streaming media near-dup suppression: re-encoded images collapse by aHash") {
    // the perceptual power at the ingest boundary: the SAME picture at a
    // DIFFERENT resolution produces different bytes (content-hash dedup
    // misses it) but the identical aHash — each grid cell of the scaled
    // copy averages a block of identical pixels — and the signature
    // feeds the standard watermark-bounded dedup state
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    def png(seed: Int, scale: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      val colors = Array.fill(64)(rnd.nextInt(1 << 24))
      val img = new java.awt.image.BufferedImage(8 * scale, 8 * scale,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8 * scale; x <- 0 until 8 * scale)
        img.setRGB(x, y, colors((y / scale) * 8 + (x / scale)))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val a1 = png(5, 1)
    val a2 = png(5, 2) // same picture, 2x resolution
    val b  = png(9, 1) // different picture
    assert(!java.util.Arrays.equals(a1, a2), "re-encode must change the bytes")
    val input = MemoryStream[(Long, Array[Byte])]
    val sigs = graft.llm.Multimodal.aHashSignatures(
        graft.llm.Multimodal.decodeBinaryPartitioned(
          input.toDF().toDF("doc_id", "png"),
          "doc_id", "png", graft.llm.Multimodal.ImageIoCodec(grid = 8)))
      .withColumn("ts", current_timestamp())
    val deduped = EventStream.dedupWithinWatermark(sigs, Seq("simhash"), "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("t_media_dedup").start()
    try {
      input.addData(Seq((1L, a1), (2L, a2), (3L, b)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("t_media_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.size == 2 && kept.contains(3L) &&
      (kept.contains(1L) ^ kept.contains(2L)),
      s"perceptual suppress failed: kept=$kept")
  }

  test("chunk runs unchanged on a streaming frame (== batch): chunk-at-ingest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq((1L, "a b c d e f g"), (2L, "x y"), (3L, ""))
    val input = MemoryStream[(Long, String)]
    val stream = graft.llm.TextOps.chunk(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", 3, 1)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("t_chunk").start()
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val streamed = key(spark.table("t_chunk"))
    val batch = key(graft.llm.TextOps.chunk(
      rows.toDF("doc_id", "text"), "doc_id", "text", 3, 1))
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("unigram-LM scoring at ingest: stream vs static census == batch") {
    // the deployment split: the model (census) is batch-trained on the
    // reference corpus; incoming docs score at ingest via a
    // stream-static join, incl. tokens the census has never seen
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Tables.documents(spark, sf).filter(col("doc_id") < 50)
    val census = graft.llm.TextOps.unigramCensus(corpus, "doc_id", "text")
      .persist()
    val rows = Seq((900L, "the quick brown fox jumps"),
                   (901L, "zzzqx wqqzy unseen gibberish"))
    val input = MemoryStream[(Long, String)]
    val stream = graft.llm.TextOps.unigramScore(
      input.toDF().toDF("doc_id", "text"), census, "doc_id", "text")
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("t_lmscore").start()
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
                 r.getDouble(4))).toSet
    val streamed = key(spark.table("t_lmscore"))
    val batch = key(graft.llm.TextOps.unigramScore(
      rows.toDF("doc_id", "text"), census, "doc_id", "text"))
    assert(streamed == batch && streamed.size == 2)
    // unseen-token doc scores strictly lower mean_p than common words
    val byId = streamed.map(t => t._1 -> t._3).toMap
    assert(byId(901L) < byId(900L), s"gibberish must score lower: $byId")
    census.unpersist()
  }

  test("quantizeInt8 runs unchanged on a streaming frame (== batch)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)),   // zero vector → scale 0, zero codes
      (3L, Seq(127.0f, -63.5f, 1.0f)))
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = graft.llm.Similarity.quantizeInt8(
      input.toDF().toDF("vec_id", "embedding"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("t_quant").start()
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))
    val streamed = spark.table("t_quant").collect().map(key).toMap
    val batch = graft.llm.Similarity.quantizeInt8(rows.toDF("vec_id", "embedding"))
      .collect().map(key).toMap
    assert(streamed == batch && streamed(2L)._2.forall(_ == 0))
  }

  test("pqCodes encodes unchanged on a streaming frame (== batch): encode-at-ingest") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    // codebooks train on a batch corpus; the resulting encode expression
    // is row-local column algebra (slice + MatVecDots + argmax), so the
    // SAME expression runs at ingest — embeddings land as m-int codes
    val rnd = new scala.util.Random(29)
    val corpus = (0 until 40).map(i =>
        (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val books = graft.llm.Similarity.trainPQ(
      corpus.toDF("vec_id", "embedding"), m = 4, ksub = 8)
    val fresh = (100 until 110).map(i =>
        (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.llm.Similarity.pqCodes(col("embedding"), books).as("codes"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("t_pq").start()
    try { input.addData(fresh: _*); q.processAllAvailable() } finally q.stop()
    def key(r: org.apache.spark.sql.Row) = r.getLong(0) -> r.getSeq[Int](1)
    val streamed = spark.table("t_pq").collect().map(key).toMap
    val batch = fresh.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.llm.Similarity.pqCodes(col("embedding"), books).as("codes"))
      .collect().map(key).toMap
    assert(streamed == batch && streamed.size == 10)
  }

  test("meanPool over micro-batches via foreachBatch (== batch per frame)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, Seq(1.0, 2.0, 4.0)),
      (1L, Seq(3.0, 6.0, 8.0)),
      (2L, Seq(10.0, 0.0, -2.0)))
    val input = MemoryStream[(Long, Seq[Double])]
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Seq[Double], Long)]()
    val q = input.toDF().toDF("g", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        buf.synchronized {
          buf ++= graft.llm.Similarity.meanPool(batch, "g", "v").collect()
            .map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2)))
        }
        ()
      }.start()
    // one addData ⇒ one micro-batch ⇒ frame-level pooling == batch pooling
    try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    val batchTruth = graft.llm.Similarity.meanPool(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2))).toSet
    assert(buf.toSet == batchTruth && batchTruth.size == 2)
  }

  test("streaming near-dup suppression collapses simhash-identical docs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)] // (doc_id, text, ts_s)
    val stream = input.toDF().toDF("doc_id", "text", "ts_s")
      .withColumn("ts", timestamp_seconds(col("ts_s")))
    val out = EventStream.nearDupSuppress(stream, "text", "ts", "10 minutes")
      .select("doc_id")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("t_neardup").start()
    try {
      input.addData(
        (1L, "the quick brown fox jumps over the lazy dog", 1000L),
        (2L, "THE  quick   brown fox jumps over the lazy dog", 1010L), // normText-dup of 1
        (3L, "spark catalyst rules and whole stage codegen", 1005L))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("t_neardup").as[Long].collect().toSet
    assert(kept.size == 2 && kept.contains(3L), s"expected 1 survivor per shape, got $kept")
  }

  private def withRocksDb[A](f: => A): A = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val partKey = "spark.sql.shuffle.partitions"
    val prevProv = spark.conf.getOption(provKey)
    val prevPart = spark.conf.get(partKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // state partition count is fixed at query start; 2 keeps the per-
    // partition RocksDB instance load (~2s each) out of the test budget
    spark.conf.set(partKey, "2")
    try f finally {
      spark.conf.set(partKey, prevPart)
      prevProv match {
        case Some(v) => spark.conf.set(provKey, v)
        case None => spark.conf.unset(provKey)
      }
    }
  }

  test("transformWithState last-tick matches mapGroupsWithState on replay") {
    withRocksDb {
      val stream = EventStream.lastTicksTws(
        EventStream.readEvents(spark, sf).drop("ts").withColumnRenamed("ts_ns", "ts_ns"))
      val q = stream.writeStream.outputMode("update")
        .format("memory").queryName("t_tws_last").start()
      try q.processAllAvailable() finally q.stop()
      // final row per key (highest n_events) == the mapGroupsWithState answer
      val got = spark.table("t_tws_last")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("n_events").desc)))
        .filter(col("rn") === 1).drop("rn")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
      val want = EventStream.lastTicks(Tables.events(spark, sf))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
      assert(got == want)
    }
  }

  test("streaming EMA == batch array fold bit-for-bit; regressions skipped") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[EventStream.Tick]
      val q = EventStream.emaByKey(input.toDF(), alpha = 0.25)
        .writeStream.outputMode("append")
        .format("memory").queryName("t_ema").start()
      try {
        // batch 1: two keys, in-batch out-of-order rows (sorted inside)
        input.addData(
          EventStream.Tick(1L, 300L, 9.0), EventStream.Tick(1L, 100L, 1.0),
          EventStream.Tick(1L, 200L, 5.0), EventStream.Tick(2L, 100L, 4.0))
        q.processAllAvailable()
        // batch 2: continuation + a cross-batch REGRESSION (ts 150 < 300)
        // that must be skipped, not applied
        input.addData(
          EventStream.Tick(1L, 400L, 13.0), EventStream.Tick(1L, 150L, 99.0),
          EventStream.Tick(2L, 200L, 8.0))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("t_ema")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      // the batch substrate: Adverbs.ema over the same per-key series
      def fold(xs: Seq[Double]): Seq[Double] =
        xs.tail.scanLeft(xs.head)((p, x) => p + 0.25 * (x - p))
      val k1 = fold(Seq(1.0, 5.0, 9.0, 13.0))
      val k2 = fold(Seq(4.0, 8.0))
      val want = Seq(
        (1L, 100L, k1(0)), (1L, 200L, k1(1)), (1L, 300L, k1(2)), (1L, 400L, k1(3)),
        (2L, 100L, k2(0)), (2L, 200L, k2(1)))
      assert(got == want, s"streaming ema diverged: $got vs $want")
      // and the array-local fold agrees with the same scanLeft exactly
      val arr = Seq(Tuple1(Seq(1.0, 5.0, 9.0, 13.0))).toDF("a")
        .select(graft.ops.Adverbs.ema(col("a"), 0.25)).first().getSeq[Double](0)
      assert(arr == k1)
    }
  }

  test("realtime retrieval: streamed queries probe the persisted IVF index == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // corpus with planted replicas of the two query vectors
    val vecs = (0L until 40L).map { i =>
      val base = Array.tabulate(8)(d => math.sin(i * 7.0 + d).toFloat)
      (i, base.toSeq)
    }
    val corpus = (vecs ++ Seq((900L, vecs(0)._2), (901L, vecs(1)._2)))
      .toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_streamprobe").toString
    graft.llm.Similarity.writeIvfIndex(corpus, s"$path/idx", nLists = 4)
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.llm.Similarity.ivfProbeStream(
        input.toDF().toDF("vec_id", "embedding"), s"$path/idx", 1, nProbe = 2) { out =>
      val rows = out.select("q_id", "cand_id", "sim")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      buf.synchronized { buf ++= rows }
    }
    try {
      input.addData((0L, vecs(0)._2))
      q.processAllAvailable()
      input.addData((1L, vecs(1)._2)) // second batch probes the SAME artifact
      q.processAllAvailable()
    } finally q.stop()
    val got = buf.synchronized(buf.toSeq.sortBy(_._1))
    // each streamed query finds its planted replica at cosine exactly 1.0,
    // identical to the batch probe of the same index
    assert(got == Seq((0L, 900L, 1.0), (1L, 901L, 1.0)), s"got $got")
  }

  test("realtime ingestion: streamed appends retrievable by the next probe; tier preserved") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(d => math.sin(i * 7.0 + d).toFloat).toSeq)
    }
    val path = java.nio.file.Files.createTempDirectory("graft_streamappend").toString
    for (half <- Seq(false, true)) {
      val idx = s"$path/idx_${if (half) "fp16" else "float"}"
      // index built WITHOUT the replica rows — they arrive by stream
      graft.llm.Similarity.writeIvfIndex(vecs.toDF("vec_id", "embedding"),
        idx, nLists = 4, halfPrecision = half)
      val input = MemoryStream[(Long, Seq[Float])]
      val q = graft.llm.Similarity.ivfAppendStream(
        input.toDF().toDF("vec_id", "embedding"), idx)
      try {
        input.addData((900L, vecs(0)._2))
        q.processAllAvailable()
        // per-file-commit visibility: the FIRST append is already
        // probe-able while the stream is still running
        val mid = graft.llm.Similarity.ivfTopKIndexed(spark, idx,
            Seq((0L, vecs(0)._2)).toDF("vec_id", "embedding"), 1, nProbe = 4)
          .select("q_id", "cand_id", "sim").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        assert(mid == Seq((0L, 900L, 1.0)), s"half=$half mid-stream probe: $mid")
        input.addData((901L, vecs(1)._2))
        q.processAllAvailable()
      } finally q.stop()
      // the stored tier survived the appends (fp16 lists stay fp16 —
      // the element type IS the tier marker)
      import org.apache.spark.sql.types.{ArrayType, ShortType, FloatType}
      val elem = spark.read.parquet(s"${graft.llm.Similarity.indexRoot(idx)}/lists")
        .schema("embedding").dataType.asInstanceOf[ArrayType].elementType
      assert(elem == (if (half) ShortType else FloatType),
        s"half=$half tier drifted to $elem")
      // both appended rows retrievable by the next (batch) probe, exact
      val got = graft.llm.Similarity.ivfTopKIndexed(spark, idx,
          Seq((0L, vecs(0)._2), (1L, vecs(1)._2)).toDF("vec_id", "embedding"),
          1, nProbe = 4)
        .select("q_id", "cand_id", "sim").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
      assert(got == Seq((0L, 900L, 1.0), (1L, 901L, 1.0)), s"half=$half: $got")
    }
  }

  test("streaming forward-fill: carry crosses batches, ties carry in order, late ticks emit with the now-carry") {
   withRocksDb {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Option[Double])]
    val filled = EventStream.fillForwardByKey(
      input.toDF().toDF("user_id", "ts_ns", "value"))
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])]()
    val q = filled.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select("user_id", "ts_ns", "filled")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        buf.synchronized { buf ++= rows }
        ()
      }.start()
    try {
      // (2,100) is a TIED pair within one batch: the null tick and a
      // non-null tick share a timestamp — both must emit (nothing is
      // silently dropped) and the non-null one advances the carry in
      // arrival order (the batch window's event_id tiebreak)
      input.addData((1L, 100L, Some(5.0)), (1L, 200L, None),
        (2L, 100L, None), (2L, 100L, Some(3.0)))
      q.processAllAvailable()
      // batch 2: the carry must come from batch 1's state; (1,150) is
      // strictly LATE (clock already at 200) — it still EMITS (own
      // value wins) but must not perturb the carry
      input.addData((1L, 300L, None), (1L, 150L, Some(99.0)),
        (2L, 200L, Some(7.0)), (2L, 300L, None))
      q.processAllAvailable()
      // batch 3: state was NOT rewound by the late ticks
      input.addData((1L, 400L, None))
      q.processAllAvailable()
    } finally q.stop()
    val got = buf.synchronized(buf.toSeq).sortBy(t => (t._1, t._2))
    assert(got == Seq(
      (1L, 100L, Some(5.0)),  // first non-null seeds the carry
      (1L, 150L, Some(99.0)), // late tick emits (own value), carry untouched
      (1L, 200L, Some(5.0)),  // null tick carries, clock advances
      (1L, 300L, Some(5.0)),  // carry survives the batch boundary
      (1L, 400L, Some(5.0)),  // …and was never rewound by the late 99.0
      (2L, 100L, None),       // tied pair: null first (arrival order) …
      (2L, 100L, Some(3.0)),  // … then the non-null advances the carry
      (2L, 200L, Some(7.0)),
      (2L, 300L, Some(7.0))), s"got $got")
   }
  }

  test("streaming on-change conflation: first tick emits, repeats suppress, changes emit across batches") {
   withRocksDb {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val changed = EventStream.onChangeByKey(
      input.toDF().toDF("user_id", "ts_ns", "value"))
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val q = changed.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        buf.synchronized { buf ++= rows }
        ()
      }.start()
    try {
      input.addData((1L, 100L, 5.0), (1L, 200L, 5.0), (1L, 300L, 6.0),
        (2L, 100L, 9.0))
      q.processAllAvailable()
      // the suppression carry crosses the batch boundary: (1,400,6.0)
      // repeats the last EMITTED value and stays suppressed even though
      // the suppressed (1,200,5.0) sits between; (1,500,5.0) is a real
      // change; a strictly-late tick (1,250) is dropped (its change
      // status against history is unknowable with O(1) state)
      input.addData((1L, 400L, 6.0), (1L, 500L, 5.0), (1L, 250L, 7.0),
        (2L, 200L, 9.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = buf.synchronized(buf.toSeq).sortBy(t => (t._1, t._2))
    assert(got == Seq(
      (1L, 100L, 5.0),   // first tick always emits
      (1L, 300L, 6.0),   // change
      (1L, 500L, 5.0),   // change back
      (2L, 100L, 9.0)),  // key 2: first emits, repeat suppressed
      s"got $got")
   }
  }

  test("stateful processors: an equal-ts REDELIVERY neither regresses state nor re-emits") {
   withRocksDb {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val changed = EventStream.onChangeByKey(
      input.toDF().toDF("user_id", "ts_ns", "value"))
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    val q = changed.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        buf.synchronized { buf ++= rows }
        ()
      }.start()
    try {
      // batch 1: tied-ts ticks — (100,8.0) wins the (ts,value) order
      input.addData((1L, 100L, 3.0), (1L, 100L, 8.0))
      q.processAllAvailable()
      // batch 2: an at-least-once source REDELIVERS only the older
      // (100,3.0) — it is behind the state in (ts,value) order and must
      // be dropped, not re-emitted (and must not regress 'last emitted'
      // back to 3.0, which would make the next 8.0 a spurious change)
      input.addData((1L, 100L, 3.0))
      q.processAllAvailable()
      // a genuinely newer tied-ts value still applies and emits
      input.addData((1L, 100L, 9.0))
      q.processAllAvailable()
      input.addData((1L, 100L, 9.0)) // exact redelivery: suppressed
      q.processAllAvailable()
    } finally q.stop()
    val got = buf.synchronized(buf.toSeq)
    assert(got == Seq((1L, 100L, 3.0), (1L, 100L, 8.0), (1L, 100L, 9.0)),
      s"got $got")
   }
  }

  test("bpe tokenize-at-ingest: the replace chain is stateless map work on a stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val merges = Seq(("l", "o"), ("lo", "w"))
    val input = MemoryStream[(Long, String)]
    val toks = graft.llm.TextOps.bpeWordTokens(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", merges)
    val buf = scala.collection.mutable.ArrayBuffer[(Long, Seq[String])]()
    val q = toks.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getSeq[String](1)))
        buf.synchronized { buf ++= rows }
        ()
      }.start()
    try {
      input.addData((1L, "low lower"), (2L, "slow"))
      q.processAllAvailable()
    } finally q.stop()
    val got = buf.synchronized(buf.toSeq).sortBy(t => (t._1, t._2.mkString(" ")))
    assert(got == Seq(
      (1L, Seq("low", "</w>")),            // both merges fire
      (1L, Seq("low", "e", "r", "</w>")),  // prefix merges, tail chars
      (2L, Seq("s", "low", "</w>"))),      // merge fires mid-word
      s"got $got")
    // stream == batch (the deploy invariant: same model, same answer)
    val batch = graft.llm.TextOps.bpeWordTokens(
        Seq((1L, "low lower"), (2L, "slow")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      .sortBy(t => (t._1, t._2.mkString(" "))).toSeq
    assert(batch == got)
  }

  test("streaming rollup: per-batch manifest commits keep the aggregate exact after every batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_rollup_stream").toString
    val input = MemoryStream[(String, Double)]
    val q = EventStream.rollupStream(
      input.toDF().toDF("k", "v"), path, Seq("k"), Seq("v"))
    try {
      input.addData(("a", 1.0), ("a", 3.0), ("b", 2.0))
      q.processAllAvailable()
      // exact after the FIRST batch already
      val mid = graft.io.Folio.rollupRead(spark, path)
        .select(col("k"), col("v_sum").cast("double"))
        .collect().map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq
      assert(mid == Seq(("a", 4.0), ("b", 2.0)), s"mid: $mid")
      input.addData(("a", 5.0), ("c", 7.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.io.Folio.rollupRead(spark, path)
      .select(col("k"), col("n_rows"), col("v_sum").cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(("a", 3L, 9.0), ("b", 1L, 2.0), ("c", 1L, 7.0)), s"got $got")
    // the manifested data is exactly the streamed rows
    assert(graft.io.Folio.rollupDataRead(spark, path).count() == 5L)
  }

  test("streaming rollup: a fresh-checkpoint writer's batch 0 is not shadowed by an older writer's tags") {
    // ADVICE r13: with a single last-tag guard, a SECOND query on the
    // same folio (new checkpoint → batch ids restart at 0) could be
    // silently skipped or double-applied depending on interleaving;
    // writer-scoped tags make both writers exactly-once independently
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_rollup_2w").toString
    val cp1 = java.nio.file.Files.createTempDirectory("graft_rollup_cp1").toString
    val cp2 = java.nio.file.Files.createTempDirectory("graft_rollup_cp2").toString
    val in1 = MemoryStream[(String, Double)]
    val q1 = EventStream.rollupStream(
      in1.toDF().toDF("k", "v"), path, Seq("k"), Seq("v"), Some(cp1))
    try {
      in1.addData(("a", 1.0)); q1.processAllAvailable() // writer 1, batch 0
    } finally q1.stop()
    val in2 = MemoryStream[(String, Double)]
    val q2 = EventStream.rollupStream(
      in2.toDF().toDF("k", "v"), path, Seq("k"), Seq("v"), Some(cp2))
    try {
      in2.addData(("a", 2.0)); q2.processAllAvailable() // writer 2, batch 0
    } finally q2.stop()
    val got = graft.io.Folio.rollupRead(spark, path)
      .select(col("n_rows"), col("v_sum").cast("double")).first()
    assert((got.getLong(0), got.getDouble(1)) == ((2L, 3.0)),
      s"second writer's batch 0 was shadowed or double-applied: $got")
    // both writers' tags are live in the applied set, writer-scoped
    val tags = graft.io.Folio.rollupCommitTags(path)
    assert(tags.size == 2 && tags.forall(_.matches("stream-batch:[0-9a-f]{16}:0")),
      s"tags: $tags")
  }

  test("upgrade replay guard: a LEGACY 'stream-batch:<id>' applied tag still skips the batch") {
    // a pre-writer-id folio tagged its batches without the writer
    // segment; a crash re-delivery straddling that code upgrade replays
    // a batch whose applied tag is in the legacy form — the guard must
    // honor it, or the batch double-applies (rollup double-count)
    val legacyApplied = Set("stream-batch:7")
    // the undecidable skip is LOUD: the suppression lands in the driver
    // log so a drop that was actually fresh data is observable
    val errBuf = new java.io.ByteArrayOutputStream()
    val origErr = System.err
    System.setErr(new java.io.PrintStream(errBuf, true))
    try assert(!EventStream.batchUnapplied(legacyApplied, "deadbeefcafef00d", 7L,
        where = "/folio/x"),
      "legacy-tagged batch 7 must skip for the resuming (progress-free) writer")
    finally System.setErr(origErr)
    val warned = new String(errBuf.toByteArray, "UTF-8")
    assert(warned.contains("shadows writer") && warned.contains("/folio/x"),
      s"legacy shadow skip must warn, got: '$warned'")
    assert(EventStream.batchUnapplied(legacyApplied, "deadbeefcafef00d", 8L))
    // …but a writer with its OWN earlier progress is post-upgrade and
    // merely counted up to the legacy number — its batch must apply
    // (the lingering legacy tag must not shadow fresh writers forever)
    val established = Set("stream-batch:7", "stream-batch:deadbeefcafef00d:6")
    assert(EventStream.batchUnapplied(established, "deadbeefcafef00d", 7L),
      "an established writer's batch 7 must not be shadowed by the legacy tag")
    // the shadow is scoped to the run's FIRST processed batch: a fresh
    // writer that worked through empty batches 0..6 (no tags minted)
    // reaches id 7 with honorLegacy=false and must apply
    assert(EventStream.batchUnapplied(legacyApplied, "deadbeefcafef00d", 7L,
      honorLegacy = false),
      "a later-in-run batch must ignore the legacy tag")
    // checkpoint-pinned writer ids are stable; DEFAULTED ids are fresh
    // per sink start (Spark's temp checkpoint restarts batch ids at 0,
    // so a stable shared id would collide with compacted tag history)
    assert(EventStream.writerIdOf(Some("/cp/x")) ==
           EventStream.writerIdOf(Some("/cp/x")))
    // defaulted ids are minted EPHEMERAL (mint time in the id) so the
    // applied set can age them out instead of growing per restart
    val d1 = EventStream.writerIdOf(None)
    assert(d1 != EventStream.writerIdOf(None) &&
      d1.matches("eph[0-9a-f]+-[0-9a-f]{16}"))
    // age-out: an ephemeral tag older than the retention window expires
    // on the next publish; fresh ephemeral, checkpoint-derived, legacy,
    // and manual tags never do
    import graft.io.Folio.{expiredEphemeralTag, EphemeralTagRetentionMs}
    val now = 1755200000000L
    val oldMs = java.lang.Long.toHexString(now - EphemeralTagRetentionMs - 1)
    val newMs = java.lang.Long.toHexString(now - 1000L)
    assert(expiredEphemeralTag(s"stream-batch:eph$oldMs-0011223344556677:4", now))
    assert(!expiredEphemeralTag(s"stream-batch:eph$newMs-0011223344556677:4", now))
    assert(!expiredEphemeralTag("stream-batch:deadbeefcafef00d:4", now))
    assert(!expiredEphemeralTag("stream-batch:7", now))
    assert(!expiredEphemeralTag("manual", now))
    // writer id is a function of the CHECKPOINT, not its spelling — a
    // respelled restart must not mint a second writer (whose re-delivered
    // batch would pass the replay guard and double-apply)
    assert(EventStream.writerIdOf(Some("/ckpt/a/")) ==
           EventStream.writerIdOf(Some("/ckpt/a")))
    assert(EventStream.writerIdOf(Some("/ckpt//a")) ==
           EventStream.writerIdOf(Some("/ckpt/a")))
    // legacy tags compact to their max alone (one lingers, not one per batch)
    assert(graft.io.Folio.compactTags(
      Seq("stream-batch:3", "stream-batch:7", "stream-batch:w:2", "manual"))
      == Seq("manual", "stream-batch:7", "stream-batch:w:2"))
    // the modern form still guards writer-scoped, not globally
    val modern = Set("stream-batch:aaaaaaaaaaaaaaaa:0")
    assert(!EventStream.batchUnapplied(modern, "aaaaaaaaaaaaaaaa", 0L))
    assert(EventStream.batchUnapplied(modern, "bbbbbbbbbbbbbbbb", 0L),
      "another writer's batch 0 must not be shadowed")
  }

  test("sink CAS-loss retry: a lost commit race redoes the append; exhaustion is loud") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_retry").toString
    // append that LOSES the race twice (simulated: a competing manual
    // append lands first and our basis goes stale), then commits
    var calls = 0
    EventStream.appendGuarded(path, "w1", 0L) { tag =>
      calls += 1
      if (calls <= 2)
        throw new graft.io.ConcurrentPublishException(path, None, Some("v1"))
      graft.io.Folio.appendWithRollup(
        Seq(("k", 1.0)).toDF("k", "v"), path, Seq("k"), Seq("v"), tag)
    }(() => false)
    assert(calls == 3, s"expected 2 losses + 1 commit, got $calls")
    // the commit landed exactly once, tag applied
    assert(graft.io.Folio.rollupRead(spark, path).count() == 1)
    assert(!EventStream.batchUnapplied(
      graft.io.Folio.rollupCommitTags(path), "w1", 0L))
    // an applied batch never re-appends (the replay guard short-circuits)
    var again = 0
    EventStream.appendGuarded(path, "w1", 0L) { _ => again += 1 }(() => false)
    assert(again == 0, "applied batch must not re-append")
    // a perpetually-losing sink fails loudly, not forever
    var always = 0
    intercept[graft.io.ConcurrentPublishException] {
      EventStream.appendGuarded(path, "w2", 5L) { _ =>
        always += 1
        throw new graft.io.ConcurrentPublishException(path, None, Some("v9"))
      }(() => false)
    }
    assert(always == EventStream.MaxCommitRetries)
  }

  test("streaming histogram: live quantiles are exact-bracketed after every batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft_hist_stream").toString
    val (lo, width, n) = (0.0, 10.0, 10)
    val input = MemoryStream[(String, Double)]
    val q = EventStream.histogramStream(
      input.toDF().toDF("k", "v"), path, Seq("k"), "v", lo, width, n)
    val fed = scala.collection.mutable.ArrayBuffer[Double]()
    def p90Row() = graft.io.Folio.histogramQuantiles(
        spark, path, Seq("k"), "v", lo, width, n, Seq(0.9))
      .collect().map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    def checkBracket(): Unit = {
      val Array((rank, est, lob, hib)) = p90Row()
      val exact = fed.sorted.apply((math.max(1,
        math.ceil(0.9 * fed.length).toLong) - 1).toInt)
      assert(rank == math.max(1, math.ceil(0.9 * fed.length).toLong))
      assert(lob <= exact && exact <= hib, s"exact $exact outside [$lob, $hib]")
      assert(est >= lob && est <= hib)
    }
    try {
      val b1 = Seq(3.25, 17.5, 44.0, 91.0, 12.0)
      input.addData(b1.map(("a", _)): _*); q.processAllAvailable()
      fed ++= b1; checkBracket() // live after the FIRST batch
      val b2 = Seq(55.5, 61.0, 8.0, 99.0)
      input.addData(b2.map(("a", _)): _*); q.processAllAvailable()
      fed ++= b2; checkBracket() // and exact-bracketed after the second
    } finally q.stop()
    // the manifested data is exactly the streamed rows
    assert(graft.io.Folio.rollupDataRead(spark, path).count() == fed.length.toLong)
  }

  test("streaming EMA state survives checkpoint restart (fold continues)") {
    withRocksDb {
      import spark.implicits._
      // ticks arrive as CSV lines over the chunk feed (a recoverable
      // source, unlike MemoryStream) so the SAME checkpoint can be
      // resumed — the test pins that the per-key EMA state is RESTORED
      // from RocksDB: the post-restart tick folds on top of the
      // pre-restart recurrence instead of re-seeding
      val feed = java.nio.file.Files.createTempDirectory("graft_ema_feed").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ema_ckpt").toString
      def put(chunk: Int, lines: String*): Unit = {
        val dir = java.nio.file.Paths.get(feed, "p0")
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(f"chunk-$chunk%08d"),
          lines.mkString("\n").getBytes("UTF-8"))
      }
      def runOnce(): Seq[(Long, Long, Double)] = {
        val buf = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
        val ticks = spark.readStream.format("graft.sources.ChunkFeedSource")
          .option("path", feed).load()
          .select(
            split(col("line"), ",").getItem(0).cast("long").as("user_id"),
            split(col("line"), ",").getItem(1).cast("long").as("ts_ns"),
            split(col("line"), ",").getItem(2).cast("double").as("value"))
        val q = EventStream.emaByKey(ticks, alpha = 0.5)
          .writeStream.outputMode("append")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val rows = batch.select("user_id", "ts_ns", "ema")
              .as[(Long, Long, Double)].collect()
            buf.synchronized { buf ++= rows }
            ()
          }
          .option("checkpointLocation", ckpt).start()
        try q.processAllAvailable() finally q.stop()
        buf.synchronized(buf.toSeq.sortBy(t => (t._1, t._2)))
      }
      put(0, "1,100,8.0", "1,200,4.0")
      val run1 = runOnce()
      assert(run1 == Seq((1L, 100L, 8.0), (1L, 200L, 6.0)), s"run1: $run1")
      // a tick arrives while the query is DOWN; after restart the fold
      // must CONTINUE: ema = 6.0 + 0.5·(10 − 6.0) = 8.0 — a re-seeded
      // state would emit 10.0 instead
      put(1, "1,300,10.0")
      val run2 = runOnce()
      assert(run2 == Seq((1L, 300L, 8.0)),
        s"state not restored across restart: $run2")
    }
  }

  test("transformWithState idle timer evicts state (n_events restarts)") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[EventStream.Tick]
      // ProcessingTime mode schedules batches continuously so timers can
      // fire without input — poll the sink with a deadline instead of
      // processAllAvailable (which never quiesces in this mode)
      val q = EventStream.lastTicksTws(input.toDF(), idleTimeoutMs = 1L)
        .writeStream.outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("50 milliseconds"))
        .format("memory").queryName("t_tws_evict").start()
      def awaitRow(ts: Long): Unit = {
        val deadline = System.currentTimeMillis() + 60000
        while (spark.table("t_tws_evict")
                 .filter(col("user_id") === 1L && col("ts_ns") === ts).isEmpty) {
          assert(System.currentTimeMillis() < deadline, s"row ts=$ts never arrived")
          Thread.sleep(50)
        }
      }
      try {
        input.addData(EventStream.Tick(1L, 100L, 1.0))
        awaitRow(100L)
        Thread.sleep(300) // let user 1's idle timer expire and fire
        input.addData(EventStream.Tick(1L, 300L, 3.0))
        awaitRow(300L)
      } finally q.stop()
      val u1 = spark.table("t_tws_evict").filter(col("user_id") === 1L)
        .orderBy(col("ts_ns")).collect()
      assert(u1.map(_.getLong(1)).toSeq == Seq(100L, 300L))
      // state was evicted between the ticks: the counter restarted at 1
      assert(u1.last.getLong(3) == 1L)
    }
  }

  test("stream-static enrichment: dim join inside the stream equals batch") {
    import spark.implicits._
    // the tick-enrichment idiom: a live feed joined to a small static
    // dimension — Spark broadcasts the dim into every micro-batch
    val dim = Seq(("click", 1.0), ("purchase", 5.0), ("view", 0.5),
                  ("signup", 2.0), ("error", 0.0)).toDF("event_type", "weight")
    val enriched = EventStream.readEvents(spark, sf)
      .join(broadcast(dim), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)") * col("weight").cast("decimal(18,2)"))
        .cast("double").as("weighted"))
    val q = enriched.writeStream.outputMode("complete")
      .format("memory").queryName("t_enrich").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("t_enrich").orderBy("event_type").collect().toSeq
    val want = Tables.events(spark, sf)
      .join(broadcast(dim), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(col("value").cast("decimal(18,2)") * col("weight").cast("decimal(18,2)"))
        .cast("double").as("weighted"))
      .orderBy("event_type").collect().toSeq
    assert(got == want)
  }

  test("streaming as-of enrichment equals the batch native as-of join") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      // clicks = trades, purchases = quotes, from the real fixture
      val ev = Tables.events(spark, sf)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("ts_ns"),
          when(col("event_type") === "purchase", "q").otherwise("t").as("kind"),
          col("value"))
      val rows = ev.as[EventStream.MarketRow].collect().toSeq

      val input = MemoryStream[EventStream.MarketRow]
      val q = EventStream.asOfEnrich(input.toDF())
        .writeStream.outputMode("append")
        .format("memory").queryName("t_asof_enrich").start()
      try { input.addData(rows); q.processAllAvailable() } finally q.stop()

      val got = spark.table("t_asof_enrich")
        .orderBy("user_id", "ts_ns")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq

      val trades = ev.filter(col("kind") === "t")
        .select(col("user_id"), col("ts_ns"), col("value").as("trade_value"))
      val quotes = ev.filter(col("kind") === "q")
        .select(col("user_id"), col("ts_ns").as("q_ts"), col("value").as("quote_value"))
      val want = graft.ops.AsOf.joinNative(trades, quotes, Seq("user_id"), "ts_ns", "q_ts")
        .orderBy("user_id", "ts_ns")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
      assert(got == want)
      assert(got.nonEmpty)
    }
  }

  test("streaming as-of: state carries across micro-batches") {
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[EventStream.MarketRow]
      val q = EventStream.asOfEnrich(input.toDF())
        .writeStream.outputMode("append")
        .format("memory").queryName("t_asof_cross").start()
      try {
        input.addData(EventStream.MarketRow(1L, 10L, "q", 100.0))
        q.processAllAvailable()
        input.addData(EventStream.MarketRow(1L, 15L, "t", 7.0),  // matches quote@10
                      EventStream.MarketRow(2L, 15L, "t", 8.0))  // no quote → null
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("t_asof_cross").orderBy("user_id").collect()
      assert(got.length == 2)
      assert(got(0).getLong(0) == 1L && got(0).getLong(3) == 10L &&
             got(0).getDouble(4) == 100.0)
      assert(got(1).getLong(0) == 2L && got(1).isNullAt(3))
    }
  }

  test("last-tick state keeps the latest value per user") {
    val out = EventStream.lastTicks(Tables.events(spark, sf))
    val got = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts_ns").desc)))
      .filter(col("rn") === 1)
      .collect().map(r => (r.getAs[Long]("user_id") -> r.getAs[Long]("ts_ns"))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (u, (ts, _)) => assert(ts == want(u)) }
  }

  test("exactly-once KILL test: feed → transformWithState → foreachBatch → folio, crashed on both sides of the commit, ledger identical to an uncrashed run") {
    // The r17 verdict's ask #4: the seam where exactly-once claims die
    // at 100 TB is the gap between Spark's offset log, the folio commit,
    // and Spark's commit log. Two crash injections on the FULL pipeline
    // (MemoryStream feed → EMA transformWithState → taggedBatchSink →
    // manifest-committed rollup append):
    //   batch 1: crash BEFORE the folio append (offsets logged, nothing
    //     published) — the restart must re-deliver and apply ONCE;
    //   batch 2: crash AFTER the folio append but BEFORE the checkpoint
    //     advance (the at-least-once re-delivery window) — the restart
    //     re-delivers and the (writerId, batchId) guard must SKIP.
    // The pin: rollup ledger, manifested rows, and applied-tag set all
    // identical to an uncrashed twin run fed the same three batches.
    withRocksDb {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val b0 = Seq(EventStream.Tick(1L, 100L, 2.0), EventStream.Tick(2L, 100L, 4.0))
      val b1 = Seq(EventStream.Tick(1L, 200L, 6.0), EventStream.Tick(2L, 200L, 8.0))
      val b2 = Seq(EventStream.Tick(1L, 300L, 10.0))

      // ---- crashed run ----
      val pathA = java.nio.file.Files.createTempDirectory("graft_kill_folio").toString
      val cpA = java.nio.file.Files.createTempDirectory("graft_kill_cp").toString
      val inA = MemoryStream[EventStream.Tick]
      @volatile var poison = "ok" // "before" | "after" | "ok"
      def startA() = EventStream.taggedBatchSink(
          EventStream.emaByKey(inA.toDF(), alpha = 0.5), pathA, Some(cpA)) {
        (batch, tag) =>
          if (poison == "before") {
            poison = "ok"
            throw new RuntimeException("poison: crash BEFORE the folio append")
          }
          graft.io.Folio.appendWithRollup(batch, pathA,
            Seq("user_id"), Seq("ema"), tag)
          if (poison == "after") {
            poison = "ok"
            throw new RuntimeException(
              "poison: crash AFTER folio commit, BEFORE checkpoint advance")
          }
      }
      // batch 0 lands clean
      var qA = startA()
      try { inA.addData(b0: _*); qA.processAllAvailable() } finally qA.stop()
      // batch 1: die before anything publishes
      poison = "before"
      qA = startA()
      inA.addData(b1: _*)
      val e1 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qA.processAllAvailable()
      }
      assert(e1.getMessage.contains("poison"), e1.getMessage)
      // restart: batch 1 re-delivers from the checkpoint and applies once
      qA = startA()
      try qA.processAllAvailable() finally qA.stop()
      // batch 2: die in the at-least-once window (folio committed,
      // checkpoint not advanced)
      poison = "after"
      qA = startA()
      inA.addData(b2: _*)
      val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qA.processAllAvailable()
      }
      assert(e2.getMessage.contains("poison"), e2.getMessage)
      // restart: batch 2 re-delivers; the applied-tag guard must skip it
      qA = startA()
      try qA.processAllAvailable() finally qA.stop()

      // ---- uncrashed twin ----
      val pathB = java.nio.file.Files.createTempDirectory("graft_kill_folioB").toString
      val cpB = java.nio.file.Files.createTempDirectory("graft_kill_cpB").toString
      val inB = MemoryStream[EventStream.Tick]
      val qB = EventStream.rollupStream(
        EventStream.emaByKey(inB.toDF(), alpha = 0.5), pathB,
        Seq("user_id"), Seq("ema"), Some(cpB))
      try {
        inB.addData(b0: _*); qB.processAllAvailable()
        inB.addData(b1: _*); qB.processAllAvailable()
        inB.addData(b2: _*); qB.processAllAvailable()
      } finally qB.stop()

      // ---- the ledgers must be indistinguishable ----
      def ledger(path: String) = graft.io.Folio.rollupRead(spark, path)
        .select(col("user_id"), col("n_rows"), col("ema_sum").cast("double"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      def rows(path: String) = graft.io.Folio.rollupDataRead(spark, path)
        .select(col("user_id"), col("ts_ns"), col("ema").cast("double"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      val (lA, lB) = (ledger(pathA), ledger(pathB))
      assert(lA == lB, s"rollup ledgers diverged:\n  crashed $lA\n  clean   $lB")
      // EMA α=0.5 over the fixture: key 1 → 2, 4, 7; key 2 → 4, 6
      assert(lA == Seq((1L, 3L, 13.0), (2L, 2L, 10.0)), s"absolute ledger: $lA")
      val (rA, rB) = (rows(pathA), rows(pathB))
      assert(rA == rB, s"manifested rows diverged (lost or duplicated batch):\n  crashed $rA\n  clean   $rB")
      // tag sets compact to the latest batch per writer — one writer each
      val (tA, tB) = (graft.io.Folio.rollupCommitTags(pathA),
                      graft.io.Folio.rollupCommitTags(pathB))
      assert(tA.size == tB.size && tA.size == 1,
        s"applied-tag sets: crashed $tA vs clean $tB")
    }
  }
}
