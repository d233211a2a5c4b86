package graft

import org.apache.spark.sql.functions._
import graft.io.Folio
import java.nio.file.Files

/** Mirrors the reference DriveUnitTests round-trips
  * (/root/reference/test.cc:688–902) on partitioned Parquet. */
class FolioSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft_folio").toString

  test("folio write/read round-trip preserves data (test.cc:688)") {
    val dir = tmp()
    val ev = Tables.events(spark, sf).drop("ts") // µs ts re-derivable
    Folio.write(ev, s"$dir/events", Seq("event_type"), Seq("ts_ns"))
    val back = Folio.read(spark, s"$dir/events")
    assert(back.count() == ev.count())
    // decimal sum: order-insensitive exactness (double sum depends on
    // row order, which the folio rewrite legitimately changes)
    def fingerprintOf(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("value").cast("decimal(18,2)")), min("ts_ns"),
             max("ts_ns"), count(lit(1))).collect()(0)
    assert(fingerprintOf(ev) == fingerprintOf(back))
  }

  test("partition pruning: filter on the folio key scans one dir") {
    val dir = tmp()
    Folio.write(Tables.events(spark, sf).drop("ts"),
      s"$dir/events", Seq("event_type"), Seq("ts_ns"))
    val pruned = Folio.read(spark, s"$dir/events")
      .filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    // the scan must carry the partition filter (pruned read, not scan-all)
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    assert(pruned.select("event_type").distinct().count() == 1)
  }

  test("append promotes a new partition without touching old ones") {
    val dir = tmp()
    val ev = Tables.events(spark, sf).drop("ts")
    Folio.write(ev.filter(col("event_type") =!= "error"),
      s"$dir/f", Seq("event_type"), Seq("ts_ns"))
    Folio.appendPartition(ev.filter(col("event_type") === "error"),
      s"$dir/f", Seq("event_type"), Seq("ts_ns"))
    assert(Folio.read(spark, s"$dir/f").count() == ev.count())
  }

  test("compact folds micro-batch small files into one file per partition dir, losslessly") {
    val dir = tmp()
    val ev = Tables.events(spark, sf).drop("ts")
    // simulate a fed folio: 5 micro-batch appends → ≥5 files per dir
    (0 until 5).foreach { b =>
      Folio.appendPartition(ev.filter(col("event_id") % 5 === b),
        s"$dir/f", Seq("event_type"), Seq("ts_ns"))
    }
    val before = Folio.dataFileCount(s"$dir/f")
    assert(before >= 5 * 5, s"staging didn't fragment: $before files")
    def fp(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(col("value").cast("decimal(18,2)")), min("ts_ns"),
             max("ts_ns"), count(lit(1))).collect()(0)
    val want = fp(ev)
    Folio.compact(spark, s"$dir/f", Seq("event_type"), Seq("ts_ns"))
    // published as a version: plain layout migrated, pointer live
    assert(Folio.currentVersion(s"$dir/f").contains("v00000001"))
    val back = Folio.promotedRead(spark, s"$dir/f")
    assert(fp(back) == want)
    // one file per partition value (5 event types)
    assert(Folio.dataFileCount(s"$dir/f") == 5,
      s"expected 5 compacted files, got ${Folio.dataFileCount(s"$dir/f")}")
    // partition pruning survives the versioned layout
    val pruned = back.filter(col("event_type") === "click")
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    // sorted-run property survives: each file's ts_ns is monotone
    val vdir = new java.io.File(s"$dir/f/v00000001")
    val files = Option(vdir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).flatMap(d => d.listFiles())
      .filter(_.getName.endsWith(".parquet"))
    files.foreach { f =>
      val ts = spark.read.parquet(f.getAbsolutePath)
        .select("ts_ns").collect().map(_.getLong(0))
      assert(ts.sameElements(ts.sorted), s"unsorted compacted file ${f.getName}")
    }
    // re-compaction bumps the version and keeps the previous as fallback
    Folio.compact(spark, s"$dir/f", Seq("event_type"), Seq("ts_ns"))
    assert(Folio.currentVersion(s"$dir/f").contains("v00000002"))
    assert(new java.io.File(s"$dir/f/v00000001").isDirectory) // crash fallback
    assert(fp(Folio.promotedRead(spark, s"$dir/f")) == want)
    // filesPerPartition > 1 spreads each dir across at most that many files
    Folio.compact(spark, s"$dir/f", Seq("event_type"), Seq("ts_ns"),
      filesPerPartition = 3)
    assert(Folio.dataFileCount(s"$dir/f") <= 15)
    assert(fp(Folio.promotedRead(spark, s"$dir/f")) == want)
  }

  test("maintenance cycle: appends land INSIDE the live version; compaction folds them") {
    val dir = tmp()
    val ev = Tables.events(spark, sf).drop("ts")
    def batch(b: Int) = ev.filter(col("event_id") % 4 === b)
    // plain growth → first compaction
    (0 until 2).foreach(b => Folio.appendPartition(batch(b), s"$dir/f",
      Seq("event_type"), Seq("ts_ns")))
    Folio.compact(spark, s"$dir/f", Seq("event_type"), Seq("ts_ns")) // v1
    // post-compaction appends must stay VISIBLE (a plain-root append
    // would silently vanish from promotedRead — the guarded footgun)
    (2 until 4).foreach(b => Folio.appendPartition(batch(b), s"$dir/f",
      Seq("event_type"), Seq("ts_ns")))
    assert(Folio.promotedRead(spark, s"$dir/f").count() == ev.count())
    assert(Folio.dataFileCount(s"$dir/f") > 5) // appends fragmented v1
    // second compaction folds the fragments into v2
    Folio.compact(spark, s"$dir/f", Seq("event_type"), Seq("ts_ns")) // v2
    assert(Folio.currentVersion(s"$dir/f").contains("v00000002"))
    assert(Folio.dataFileCount(s"$dir/f") == 5)
    assert(Folio.promotedRead(spark, s"$dir/f").count() == ev.count())
    // a partitioned append into a FLAT version is a loud error
    Folio.compact(spark, s"$dir/f", Nil, Nil, filesPerPartition = 2) // v3 flat
    intercept[IllegalArgumentException] {
      Folio.appendPartition(batch(0), s"$dir/f", Seq("event_type"), Seq("ts_ns"))
    }
  }

  test("vacuum removes strictly-older leftovers; never live, fallback, or NEWER dirs") {
    val dir = tmp()
    import spark.implicits._
    val base = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    Folio.appendWithPromotion(base, s"$dir/t")                    // v1
    Folio.upsertPublish(Seq((1L, 9.0)).toDF("k", "v"), s"$dir/t", Seq("k")) // v2
    // plant: a superseded-era leftover (older than the fallback), an
    // IN-FLIGHT staging dir (newer than _CURRENT — what publishArtifacts
    // looks like mid-build), and a stale tmp
    base.write.parquet(s"$dir/t/v00000000")
    base.write.parquet(s"$dir/t/v00000003")
    java.nio.file.Files.write(new java.io.File(s"$dir/t", "_CURRENT.tmp").toPath,
      "v00000003".getBytes("UTF-8"))
    // only the STRICTLY-older dir and the tmp go; the staged newer dir
    // survives (a cadence vacuum during a long build must not kill it).
    // A YOUNG tmp is protected by the in-flight grace window (it may be
    // a publish's write-then-move in progress) — graceMs = 0 models the
    // stale case
    assert(Folio.vacuum(s"$dir/t") == Seq("v00000000"))
    assert(Folio.vacuum(s"$dir/t", graceMs = 0) == Seq("_CURRENT.tmp"))
    assert(Folio.versions(s"$dir/t") == Seq("v00000001", "v00000002", "v00000003"))
    assert(Folio.promotedRead(spark, s"$dir/t").count() == 2)
    assert(Folio.readVersion(spark, s"$dir/t", "v00000001").count() == 2)
    assert(Folio.vacuum(s"$dir/t").isEmpty)
    // the next publish claims the staged name for itself (Overwrite) and
    // its swap-tail GC then reclaims everything older than its fallback
    Folio.upsertPublish(Seq((2L, 7.0)).toDF("k", "v"), s"$dir/t", Seq("k")) // v3
    assert(Folio.versions(s"$dir/t") == Seq("v00000002", "v00000003"))
    assert(Folio.promotedRead(spark, s"$dir/t").filter(col("k") === 2L)
      .first().getDouble(1) == 7.0)
  }

  test("first-publish crash retry: an orphan vN never double-counts or shadows legacy data") {
    import spark.implicits._
    val dir = tmp()
    // legacy (pre-versioned) data + a CRASHED first publish's leftover
    // version dir, no _CURRENT: the retry must fold ONLY the legacy rows
    // with the batch — unioning the orphan would double-count, and the
    // Overwrite of that same dir would delete files mid-plan
    Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").write.parquet(s"$dir/t")
    Seq((1L, 1.0), (9L, 9.0)).toDF("k", "v").write.parquet(s"$dir/t/v00000001")
    Folio.appendWithPromotion(Seq((3L, 3.0)).toDF("k", "v"), s"$dir/t")
    val got = Folio.promotedRead(spark, s"$dir/t")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == Set((1L, 1.0), (2L, 2.0), (3L, 3.0)), s"crash-retry drifted: $got")
    // a read FAILURE on a populated legacy root must THROW, never
    // publish a v1 that silently hides the existing data
    val dir2 = tmp()
    Seq((1L, 1.0)).toDF("k", "v").write.parquet(s"$dir2/t")
    java.nio.file.Files.writeString(
      new java.io.File(s"$dir2/t", "junk.parquet").toPath, "not parquet")
    intercept[Exception] {
      Folio.appendWithPromotion(Seq((2L, 2.0)).toDF("k", "v"), s"$dir2/t")
    }
    assert(Folio.currentVersion(s"$dir2/t").isEmpty,
      "a failed legacy read must not publish a version")
  }

  test("a cadence vacuum DURING publishArtifacts staging cannot destroy the in-flight version") {
    val dir = tmp()
    import spark.implicits._
    val base = Seq((1L, 1.0)).toDF("k", "v")
    // two published versions so vacuum has a live+fallback pair to keep
    Folio.appendWithPromotion(base, s"$dir/t")                          // v1
    Folio.upsertPublish(Seq((1L, 2.0)).toDF("k", "v"), s"$dir/t", Seq("k")) // v2
    // plant a genuinely stale dir so the mid-publish vacuum has work
    base.write.parquet(s"$dir/t/v00000000")
    // deterministic race: vacuum fires FROM INSIDE the staging write —
    // exactly a cadence job landing during a long index build
    val vname = Folio.publishArtifacts(s"$dir/t") { vdir =>
      java.nio.file.Files.writeString(
        new java.io.File(vdir, "model.json").toPath, "{\"phase\":1}")
      val gone = Folio.vacuum(s"$dir/t")
      assert(gone == Seq("v00000000"),
        s"mid-publish vacuum should reap only the stale dir, got $gone")
      assert(new java.io.File(vdir, "model.json").isFile,
        "vacuum destroyed the in-flight staging dir")
      Seq((9L, 9.0)).toDF("k", "v").write.parquet(s"$vdir/data")
    }
    // the publish completed INTACT: both artifacts live in one version
    val root = s"$dir/t/$vname"
    assert(new java.io.File(root, "model.json").isFile)
    assert(spark.read.parquet(s"$root/data").count() == 1)
    assert(Folio.currentVersion(s"$dir/t").contains(vname))
  }

  test("upsertPublish merges by key copy-on-write; time travel reads the pre-image") {
    val dir = tmp()
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    Folio.appendWithPromotion(base, s"$dir/t") // v1
    val batch = Seq((2L, "B", 99.0), (4L, "d", 40.0)).toDF("k", "s", "v")
    Folio.upsertPublish(batch, s"$dir/t", Seq("k")) // v2
    assert(Folio.currentVersion(s"$dir/t").contains("v00000002"))
    val live = Folio.promotedRead(spark, s"$dir/t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(live == Set((1L, "a", 10.0), (2L, "B", 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
    // the pre-merge image is retained: time travel to v1
    assert(Folio.versions(s"$dir/t") == Seq("v00000001", "v00000002"))
    val before = Folio.readVersion(spark, s"$dir/t", "v00000001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(before == Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
    // another publish GCs v1: reading it now fails LOUDLY
    Folio.upsertPublish(Seq((1L, "A", 11.0)).toDF("k", "s", "v"),
      s"$dir/t", Seq("k")) // v3, GC v1
    assert(Folio.versions(s"$dir/t") == Seq("v00000002", "v00000003"))
    intercept[IllegalArgumentException] {
      Folio.readVersion(spark, s"$dir/t", "v00000001")
    }
    // schema drift is an error, not silent data loss
    intercept[IllegalArgumentException] {
      Folio.upsertPublish(Seq((9L, "x")).toDF("k", "s"), s"$dir/t", Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Folio.upsertPublish(batch, s"$dir/t", Seq("nope"))
    }
  }

  test("appendPartition rejects a partition-column mismatch with the live layout") {
    val dir = tmp()
    import spark.implicits._
    val a = Seq((1L, "x", "2024-01-01"), (2L, "y", "2024-01-02")).toDF("k", "s", "d")
    Folio.write(a, s"$dir/t", Seq("d"), Seq("k"))
    // matching layout appends fine
    Folio.appendPartition(Seq((3L, "z", "2024-01-03")).toDF("k", "s", "d"),
      s"$dir/t", Seq("d"), Seq("k"))
    assert(Folio.read(spark, s"$dir/t").count() == 3)
    // different partition keys would interleave two dir layouts — loud
    val err = intercept[IllegalArgumentException] {
      Folio.appendPartition(Seq((4L, "w", "2024-01-04")).toDF("k", "s", "d"),
        s"$dir/t", Seq("s"), Seq("k"))
    }
    assert(err.getMessage.contains("partition-column mismatch"))
  }

  test("upsertPublish preserves the live version's partition layout") {
    val dir = tmp()
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v")
    Folio.appendWithPromotion(base, s"$dir/t") // v1 flat
    Folio.compact(spark, s"$dir/t", partitionCols = Seq("g")) // v2 partitioned by g
    assert(Folio.partitionColsOnDisk(
      new java.io.File(s"$dir/t", "v00000002")) == Seq("g"))
    Folio.upsertPublish(Seq((2L, "b", 99.0), (3L, "c", 30.0)).toDF("k", "g", "v"),
      s"$dir/t", Seq("k")) // v3 must STAY partitioned by g
    assert(Folio.partitionColsOnDisk(
      new java.io.File(s"$dir/t", "v00000003")) == Seq("g"))
    val live = Folio.promotedRead(spark, s"$dir/t")
      .select("k", "g", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(live == Set((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)))
    // and the partitioned append that failed before the fix now lands
    Folio.appendPartition(Seq((4L, "d", 40.0)).toDF("k", "g", "v"),
      s"$dir/t", Seq("g"), Seq("k"))
    assert(Folio.promotedRead(spark, s"$dir/t").count() == 4)
  }

  test("appendWithPromotion preserves a partitioned live layout (like upsert)") {
    val dir = tmp()
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "g", "v")
    Folio.appendWithPromotion(base, s"$dir/t") // v1 flat
    Folio.compact(spark, s"$dir/t", partitionCols = Seq("g")) // v2 by g
    Folio.appendWithPromotion(Seq((3L, "c", 30.0)).toDF("k", "g", "v"), s"$dir/t")
    // v3 must STAY partitioned by g — an append is never a layout change
    assert(Folio.partitionColsOnDisk(
      new java.io.File(s"$dir/t", "v00000003")) == Seq("g"))
    assert(Folio.promotedRead(spark, s"$dir/t").count() == 3)
  }

  test("publishArtifacts clears a stale crashed staging dir before writing") {
    val dir = tmp()
    // v1 live
    Folio.publishArtifacts(s"$dir/idx") { vdir =>
      java.nio.file.Files.write(new java.io.File(vdir, "a.json").toPath,
        "{}".getBytes("UTF-8"))
    }
    // simulate a CRASHED v2 attempt of a different artifact kind: the
    // staging dir exists with leftovers, but _CURRENT still points at v1
    val stale = new java.io.File(s"$dir/idx", "v00000002")
    stale.mkdirs()
    java.nio.file.Files.write(new java.io.File(stale, "leftover.json").toPath,
      "{}".getBytes("UTF-8"))
    // the retry publishes v2 fresh — the leftover must NOT ride along
    Folio.publishArtifacts(s"$dir/idx") { vdir =>
      java.nio.file.Files.write(new java.io.File(vdir, "b.json").toPath,
        "{}".getBytes("UTF-8"))
    }
    val files = new java.io.File(s"$dir/idx", "v00000002").listFiles().map(_.getName).toSet
    assert(files == Set("b.json"), s"stale artifacts published: $files")
  }

  test("publishArtifacts: versioned stage-and-swap for artifact trees") {
    val dir = tmp()
    val v1 = Folio.publishArtifacts(s"$dir/idx") { vdir =>
      java.nio.file.Files.write(new java.io.File(vdir, "model.json").toPath,
        "{\"v\":1}".getBytes("UTF-8"))
    }
    assert(v1 == "v00000001" && Folio.currentVersion(s"$dir/idx").contains(v1))
    val v2 = Folio.publishArtifacts(s"$dir/idx") { vdir =>
      java.nio.file.Files.write(new java.io.File(vdir, "model.json").toPath,
        "{\"v\":2}".getBytes("UTF-8"))
    }
    assert(Folio.currentVersion(s"$dir/idx").contains(v2))
    // live + previous retained (crash fallback), nothing older
    assert(Folio.versions(s"$dir/idx") == Seq("v00000001", "v00000002"))
    Folio.publishArtifacts(s"$dir/idx") { _ => () }
    assert(Folio.versions(s"$dir/idx") == Seq("v00000002", "v00000003"))
  }

  test("zvalue: monotone in every dimension (Morton order property)") {
    import spark.implicits._
    val grid = (for (x <- 0 until 16; y <- 0 until 16) yield (x, y)).toDF("x", "y")
    val z = grid.withColumn("z", Folio.zvalue(grid, Seq("x", "y"), bits = 4))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // interleave bounds
    assert(z.forall(t => t._3 >= 0 && t._3 < 256))
    assert(z.map(_._3).distinct.length > 200) // quantization didn't collapse
    // dominance order must be preserved: both dims <= → z <=
    for ((x1, y1, z1) <- z; (x2, y2, z2) <- z
         if x1 <= x2 && y1 <= y2)
      assert(z1 <= z2, s"z not monotone: ($x1,$y1)->$z1 vs ($x2,$y2)->$z2")
  }

  test("compactIfFragmented: idle folios skip the rewrite, fragmented ones fold") {
    val dir = tmp()
    val ev = Tables.events(spark, sf).drop("ts")
    (0 until 3).foreach(b => Folio.appendPartition(ev.filter(col("event_id") % 3 === b),
      s"$dir/f", Seq("event_type"), Seq("ts_ns")))
    assert(Folio.compactIfFragmented(spark, s"$dir/f", maxFiles = 10,
      Seq("event_type"), Seq("ts_ns"))) // 15 files > 10 → ran
    assert(Folio.currentVersion(s"$dir/f").contains("v00000001"))
    // now at 5 files: the policy must NOT pay another rewrite
    assert(!Folio.compactIfFragmented(spark, s"$dir/f", maxFiles = 10,
      Seq("event_type"), Seq("ts_ns")))
    assert(Folio.currentVersion(s"$dir/f").contains("v00000001")) // no version churn
  }

  test("zvalue fails at the rim on non-numeric / all-null zorder columns") {
    import spark.implicits._
    val df = Seq((1L, "abc", null.asInstanceOf[java.lang.Double]),
                 (2L, "def", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "s", "v")
    val e1 = intercept[IllegalArgumentException] {
      Folio.zvalue(df, Seq("s"), bits = 4)
    }
    assert(e1.getMessage.contains("'s'"))
    val e2 = intercept[IllegalArgumentException] {
      Folio.withZValue(df, Seq("id", "v"), bits = 4)
    }
    assert(e2.getMessage.contains("'v'"))
  }

  test("z-order compaction prunes on the SECOND dimension; linear sort cannot") {
    val dir = tmp()
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (0 until 4000).map(i =>
      (i.toLong, rnd.nextInt(1000), rnd.nextDouble() * 100))
    val df = rows.toDF("id", "user_id", "value").repartition(4)
    df.write.parquet(s"$dir/lin")
    df.write.parquet(s"$dir/zord")
    Folio.compact(spark, s"$dir/lin", Nil, Seq("user_id"), filesPerPartition = 8)
    Folio.compact(spark, s"$dir/zord", Nil, Nil, filesPerPartition = 8,
      zorderCols = Seq("user_id", "value"))
    def scanned(path: String): (Long, Long) = {
      val q = Folio.promotedRead(spark, path).filter(col("value") > 95.0)
      val hits = q.count()
      q.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[Long] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case other => other.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
        }
      }
      (hits, scans(q.queryExecution.executedPlan).sum)
    }
    val (linHits, linScanned) = scanned(s"$dir/lin")
    val (zHits, zScanned)     = scanned(s"$dir/zord")
    assert(linHits == zHits, "layouts must answer identically")
    assert(linHits > 100, s"fixture degenerate: $linHits hits")
    // linear-by-user row groups all span the full value range → the
    // value predicate prunes nothing; z-order bounds value per z-range
    assert(zScanned < linScanned / 2,
      s"z-order pruning missing: scanned z=$zScanned vs linear=$linScanned")
    info(s"value>95 over 4000 rows: scanned linear=$linScanned z-order=$zScanned (hits=$zHits)")
  }

  test("ZIP_ARRAY = codec choice: zstd folio is smaller than uncompressed") {
    // the reference declares compressed columns as a type (enums.h:256);
    // on Parquet it's a write option — verify it actually engages
    val dir = tmp()
    val docs = Tables.documents(spark, sf)
    docs.write.option("compression", "none").parquet(s"$dir/raw")
    docs.write.option("compression", "zstd").parquet(s"$dir/zstd")
    def bytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val (raw, z) = (bytes(s"$dir/raw"), bytes(s"$dir/zstd"))
    assert(z < raw, s"zstd $z !< raw $raw")
    val back = spark.read.parquet(s"$dir/zstd")
    assert(back.count() == docs.count())
  }

  test("nested data round-trips (test.cc:690–823: [10,20,[30,40]] shapes)") {
    import spark.implicits._
    val dir = tmp()
    val df = Seq(
      (1L, Seq(10, 20), Seq(Seq(30, 40), Seq(50)), Map("a" -> 1, "b" -> 2)),
      (2L, Seq.empty[Int], Seq(Seq.empty[Int]), Map.empty[String, Int])
    ).toDF("id", "flat", "nested", "m")
    df.write.mode("overwrite").parquet(s"$dir/nested")
    val back = spark.read.parquet(s"$dir/nested").orderBy("id")
    val rows = back.collect()
    assert(rows(0).getSeq[Int](1) == Seq(10, 20))
    assert(rows(0).getSeq[Seq[Int]](2) == Seq(Seq(30, 40), Seq(50)))
    assert(rows(0).getMap[String, Int](3) == Map("a" -> 1, "b" -> 2))
    assert(rows(1).getSeq[Int](1).isEmpty)
  }

  test("promote-on-append widens the folio schema (layout.cc:726, test.cc:620)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = tmp()
    // start narrow: int column (the reference starts at int8 and widens;
    // "appending 130 to an untyped array yields INT1_ARRAY")
    val narrow = Seq(1, 2, 3).toDF("x")
    Folio.appendWithPromotion(narrow, s"$dir/t")
    assert(Folio.promotedRead(spark, s"$dir/t").schema("x").dataType == IntegerType)
    // append a batch that needs int64 → whole column promotes
    val wide = Seq(3000000000L, 4L).toDF("x")
    Folio.appendWithPromotion(wide, s"$dir/t")
    val back = Folio.promotedRead(spark, s"$dir/t")
    assert(back.schema("x").dataType == LongType)
    assert(back.count() == 5)
    assert(back.agg(max("x")).collect()(0).getLong(0) == 3000000000L)
    // double batch promotes again (int→float lattice)
    Folio.appendWithPromotion(Seq(1.5).toDF("x"), s"$dir/t")
    assert(Folio.promotedRead(spark, s"$dir/t").schema("x").dataType == DoubleType)
    assert(Folio.promotedRead(spark, s"$dir/t").count() == 6)
  }

  test("promotion publish is crash-safe: stale version dirs never shadow _CURRENT") {
    import spark.implicits._
    val dir = tmp()
    Folio.appendWithPromotion(Seq(1, 2, 3).toDF("x"), s"$dir/t")
    Folio.appendWithPromotion(Seq(4L).toDF("x"), s"$dir/t")
    val v = Folio.currentVersion(s"$dir/t").get
    // simulate a crash mid-promotion: a NEWER version dir fully written
    // but the pointer swap never happened
    val orphan = new java.io.File(s"$dir/t", "v00000099")
    Seq(999L).toDF("x").write.parquet(orphan.getAbsolutePath)
    assert(Folio.currentVersion(s"$dir/t").contains(v)) // pointer untouched
    val back = Folio.promotedRead(spark, s"$dir/t")
    assert(back.count() == 4)                            // reader sees old version
    assert(!back.collect().map(_.getLong(0)).contains(999L))
    // schema mismatches are rejected explicitly, not silently dropped
    intercept[IllegalArgumentException] {
      Folio.appendWithPromotion(Seq((1L, 2L)).toDF("x", "y"), s"$dir/t")
    }
    intercept[IllegalArgumentException] {
      Folio.appendWithPromotion(Seq(1L).toDF("z"), s"$dir/t")
    }
  }

  test("promoting a plain folio migrates it in place (no double-count residue)") {
    import spark.implicits._
    val dir = tmp()
    Seq(1L, 2L).toDF("x").write.parquet(s"$dir/t")
    Folio.appendWithPromotion(Seq(3L).toDF("x"), s"$dir/t")
    // legacy root-level files folded into v1 and removed: only the
    // versioned layout remains
    val names = new java.io.File(s"$dir/t").listFiles().map(_.getName).toSet
    assert(names.forall(n => n.startsWith("_CURRENT") || n.matches("v\\d{8}")),
      s"legacy files survived migration: $names")
    assert(Folio.promotedRead(spark, s"$dir/t").count() == 3)
  }

  test("workspaceLoad resolves promoted folios to the live version only") {
    import spark.implicits._
    val dir = tmp()
    Folio.workspaceSave(Map("t" -> Seq(1L, 2L).toDF("x")), dir)
    // promote twice: the table dir now holds loose files + version dirs;
    // a naive recursive read would count every version's rows
    Folio.appendWithPromotion(Seq(3L).toDF("x"), s"$dir/t")
    Folio.appendWithPromotion(Seq(4L).toDF("x"), s"$dir/t")
    val loaded = Folio.workspaceLoad(spark, dir)
    assert(loaded("t").count() == 4, "workspaceLoad must read only the live version")
    assert(loaded("t").agg(sum("x")).collect()(0).getLong(0) == 10L)
  }

  test("workspace save/load restores all tables (file.cc:994, test.cc:825)") {
    val dir = tmp()
    val t1 = Tables.nation(spark, sf)
    val t2 = Tables.region(spark, sf)
    Folio.workspaceSave(Map("nation" -> t1, "region" -> t2), dir)
    val loaded = Folio.workspaceLoad(spark, dir)
    assert(loaded.keySet == Set("nation", "region"))
    assert(loaded("nation").count() == t1.count())
    // restored as catalog views, queryable by name (the Kerf Tree analog)
    assert(spark.sql("SELECT count(*) FROM nation").collect()(0).getLong(0) == t1.count())
  }

  test("workspace round-trips PROGRAM state: vars + defs rerun after restore (test.cc:825-900)") {
    val dir = tmp()
    val sess = new graft.sql.KerfSql.Interp(spark)
    // scalar, vector, dict, span, and a def with an early return — the
    // full variable surface the reference's Kerf Tree snapshot carries
    sess.run("k: 3; v: til 5; d: {a: 10, b: 20}; sp: 1d2h; " +
      "dt: 2024.01.05T06:00:00['date']; " +
      "def cap(x) { if (x > k) { return k }; x }")
    Folio.workspaceSave(Map("nation" -> Tables.nation(spark, sf)), dir, sess)
    // a FRESH session in a fresh (conceptually: restarted) interpreter
    val restored = new graft.sql.KerfSql.Interp(spark)
    val tables = Folio.workspaceLoad(spark, dir, restored)
    assert(tables.keySet == Set("nation"))
    def one(s: String): Any = restored.run(s).collect()(0).get(0)
    assert(one("k") == 3L)
    assert(one("{[x,y] x+y} fold v") == 10L)
    assert(one("d['a'] + d['b']") == 30L)
    assert(one("2024.01.01 + sp") != null, "span variable must restore as a span")
    // DateType vars (stamp['date'] assignments) must round-trip too —
    // anyNode previously threw on java.sql.Date, failing the WHOLE save
    assert(one("dt").toString == "2024-01-05", s"date var restored as ${one("dt")}")
    // the def reruns: per-row CASE against a restored table
    val df = restored.run("select cap(n_nationkey) as c from nation order n_nationkey limit 5")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 3L))
    // a tables-only workspace (pre-r8 format) loads with the session untouched
    val dir2 = tmp()
    Folio.workspaceSave(Map("nation" -> Tables.nation(spark, sf)), dir2)
    val untouched = new graft.sql.KerfSql.Interp(spark)
    Folio.workspaceLoad(spark, dir2, untouched)
    intercept[Exception] { untouched.run("k") }
  }

  test("rollup folio: incremental merge == full recompute; orphans invisible; vacuum reaps") {
    import spark.implicits._
    val path = tmp()
    val b1 = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("b", Some(2.0))).toDF("k", "v")
    val b2 = Seq(("a", Some(5.0)), ("c", Some(7.0))).toDF("k", "v")
    // nulls: n_rows counts them, v_cnt/min/max/sum skip them
    val b3 = Seq(("b", Option.empty[Double]), ("b", Some(9.0))).toDF("k", "v")
    Seq(b1, b2, b3).foreach(Folio.appendWithRollup(_, path, Seq("k"), Seq("v")))
    val got = Folio.rollupRead(spark, path)
      .select(col("k"), col("n_rows"), col("v_cnt"),
        col("v_sum").cast("double"), col("v_min"), col("v_max"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1).toSeq
    assert(got == Seq(
      ("a", 3L, 3L, 9.0, 1.0, 5.0),
      ("b", 3L, 2L, 11.0, 2.0, 9.0),
      ("c", 1L, 1L, 7.0, 7.0, 7.0)), s"rollup drifted: $got")
    // the data read is exactly the manifested batches
    assert(Folio.rollupDataRead(spark, path).count() == 7L)
    // a crashed append's orphan batch dir is INVISIBLE (never
    // manifested) and reaped by vacuum — data+rollup stay in sync
    Seq(("z", 1.0)).toDF("k", "v").write.parquet(s"$path/batches/b_000orphan")
    assert(Folio.rollupDataRead(spark, path).count() == 7L)
    assert(!Folio.rollupRead(spark, path).collect().exists(_.getString(0) == "z"))
    assert(Folio.rollupVacuum(path) == Nil) // grace window protects young dirs
    assert(Folio.rollupVacuum(path, graceMs = 0) == Seq("b_000orphan"))
    assert(Folio.rollupDataRead(spark, path).count() == 7L)
    // vacuum never touches manifested batches (live or fallback)
    assert(Folio.rollupVacuum(path, graceMs = 0).isEmpty)
    // spec drift is loud: stored rollup tracks (k, v), not (k, w)
    val bad = Seq(("a", 1.0)).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Folio.appendWithRollup(bad, path, Seq("k"), Seq("w"))
    }
    // and a batch missing the declared columns is loud before any write
    intercept[IllegalArgumentException] {
      Folio.appendWithRollup(bad, path, Seq("k"), Seq("v"))
    }
  }

  test("rollup commit tag: the at-least-once replay guard skips a re-delivered batch") {
    import spark.implicits._
    val path = tmp()
    val b = Seq(("a", 1.0), ("a", 3.0)).toDF("k", "v")
    def deliver(writer: String, id: Long): Unit = { // the streaming sink's guard, verbatim
      val tag = s"stream-batch:$writer:$id"
      if (!Folio.rollupCommitTags(path).contains(tag))
        Folio.appendWithRollup(b, path, Seq("k"), Seq("v"), Some(tag))
    }
    deliver("w1", 0)
    assert(Folio.lastRollupCommitTag(path).contains("stream-batch:w1:0"))
    deliver("w1", 0) // crash-replay of the SAME batch: tag applied → skipped
    val once = Folio.rollupRead(spark, path)
      .select(col("n_rows"), col("v_sum").cast("double")).first()
    assert((once.getLong(0), once.getDouble(1)) == ((2L, 4.0)),
      s"replay double-counted: $once")
    assert(Folio.rollupDataRead(spark, path).count() == 2L)
    deliver("w1", 1) // the NEXT batch commits normally
    assert(Folio.rollupDataRead(spark, path).count() == 4L)
    assert(Folio.lastRollupCommitTag(path).contains("stream-batch:w1:1"))
    // INTERLEAVED second writer (its own checkpoint, ids restart at 0):
    // its batch 0 is NOT shadowed by w1's history — it commits…
    deliver("w2", 0)
    assert(Folio.rollupDataRead(spark, path).count() == 6L)
    // …and w1's crash re-delivery of batch 1 still skips even though
    // w2's commit is now the LAST tag (the r13 single-tag guard's hole)
    deliver("w1", 1)
    assert(Folio.rollupDataRead(spark, path).count() == 6L,
      "w1 re-delivery double-appended past an interleaved w2 commit")
    // and w2's own replay skips too
    deliver("w2", 0)
    assert(Folio.rollupDataRead(spark, path).count() == 6L)
    // the applied set is compacted per writer, not batch-count-sized
    assert(Folio.rollupCommitTags(path) ==
      Set("stream-batch:w1:1", "stream-batch:w2:0"))
    // an UNTAGGED publish (a manual dialect append interleaving with the
    // streams) must CARRY the applied set forward, not wipe it — else the
    // next crash re-delivery double-applies (r14 review finding)
    Folio.appendWithRollup(b, path, Seq("k"), Seq("v")) // no tag
    assert(Folio.rollupCommitTags(path) ==
      Set("stream-batch:w1:1", "stream-batch:w2:0"),
      "untagged publish wiped the applied-tag set")
    assert(Folio.lastRollupCommitTag(path).isEmpty,
      "untagged publish must not claim the last-tag face")
    val rowsBefore = Folio.rollupDataRead(spark, path).count()
    deliver("w1", 1) // w1's crash re-delivery STILL skips
    assert(Folio.rollupDataRead(spark, path).count() == rowsBefore,
      "re-delivery double-applied after an untagged publish")
  }

  test("histogram rollup: bounds bracket the exact quantile; grid drift is loud") {
    import spark.implicits._
    val path = tmp()
    val rnd = new scala.util.Random(99L)
    val all = (1 to 900).map(i => (if (i % 3 == 0) "a" else "b",
      math.floor(rnd.nextDouble() * 1000) / 4.0)) // quarter grid, [0, 250)
    val (lo, width, n) = (0.0, 10.0, 25)
    // three appends maintain the same histogram one shot would build
    all.grouped(300).foreach { sl =>
      Folio.appendWithHistogram(sl.toDF("k", "v"), path, Seq("k"), "v",
        lo, width, n)
    }
    val qs = Seq(0.5, 0.9, 0.99)
    val got = Folio.histogramQuantiles(spark, path, Seq("k"), "v",
        lo, width, n, qs)
      .collect().map(r => ((r.getString(0), r.getDouble(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.size == 6) // 2 keys × 3 quantiles, exactly one hit each
    // exact quantile by definition: rank-th smallest (rank = ceil(q·n))
    val byKey = all.groupBy(_._1).map { case (k, xs) =>
      k -> xs.map(_._2).sorted }
    for (k <- Seq("a", "b"); q <- qs) {
      val xs = byKey(k)
      val rank = math.max(1, math.ceil(q * xs.length).toLong)
      val exact = xs((rank - 1).toInt)
      val (gr, est, lob, hib) = got((k, q))
      assert(gr == rank, s"($k,$q): rank $gr != $rank")
      assert(lob <= exact && exact <= hib,
        s"($k,$q): exact $exact outside [$lob, $hib]")
      assert(est >= lob && est <= hib)
      assert(math.abs(est - exact) <= width, s"($k,$q): |$est - $exact| > width")
    }
    // a drifted grid is a different stored column name -> loud schema
    // mismatch from the rollup spec check, and a loud read-side error
    intercept[IllegalArgumentException] {
      Folio.appendWithHistogram(Seq(("a", 1.0)).toDF("k", "v"), path,
        Seq("k"), "v", lo, width + 1, n)
    }
    intercept[IllegalArgumentException] {
      Folio.histogramQuantiles(spark, path, Seq("k"), "v", lo, width + 1, n, qs)
    }
  }

  test("program restore resolves defs regardless of name-sort order (fixpoint rebind)") {
    val dir = tmp()
    val sess = new graft.sql.KerfSql.Interp(spark)
    // callee names sort AFTER their callers (z > b > a) while definition
    // order is callee-first — legal live, but a one-pass name-sorted
    // restore bound a to an Env without b/z and failed after round-trip
    sess.run("def z(x) { x + 1 }")
    sess.run("def b(x) { z(x) * 2 }")
    sess.run("def a(x) { b(x) + 10 }")
    assert(sess.run("a(5)").collect()(0).get(0) == 22L)
    Folio.workspaceSave(Map("nation" -> Tables.nation(spark, sf)), dir, sess)
    val restored = new graft.sql.KerfSql.Interp(spark)
    Folio.workspaceLoad(spark, dir, restored)
    assert(restored.run("a(5)").collect()(0).get(0) == 22L,
      "restored def chain a→b→z must resolve after name-sorted save")
  }

  test("two-writer race: the commit CAS — one wins, the loser errors loudly, no version lost") {
    val dir = tmp()
    val p = s"$dir/idx"
    def manifest(vdir: java.io.File, s: String): Unit =
      java.nio.file.Files.write(new java.io.File(vdir, "_MANIFEST").toPath,
        s.getBytes("UTF-8"))
    def readManifest(): String = {
      val v = Folio.currentVersion(p).get
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(s"$p/$v", "_MANIFEST").toPath), "UTF-8")
    }
    Folio.publishArtifacts(p)(manifest(_, "a"))                 // v1
    // writers A and B both read their basis at v1 (the read-modify-write
    // start of a manifest append); B commits first
    val basis = Folio.currentVersion(p)
    Folio.publishArtifactsFrom(p, basis)(manifest(_, "a\nb"))   // v2 — B wins
    // A's commit, still based on v1, must LOSE LOUDLY — a silent publish
    // here would drop B's manifest entry ('b' gone = data loss)
    intercept[graft.io.ConcurrentPublishException] {
      Folio.publishArtifactsFrom(p, basis)(manifest(_, "a\nc"))
    }
    // the winner's commit is intact; no version skipped or lost; the
    // loser's stage was discarded on the spot
    assert(Folio.currentVersion(p).contains("v00000002"))
    assert(readManifest() == "a\nb", "the race loser clobbered the winner")
    assert(Folio.versions(p) == Seq("v00000001", "v00000002"))
    val leftovers = new java.io.File(p).listFiles()
      .map(_.getName).filter(_.contains(".stage-")).toSeq
    assert(leftovers.isEmpty, s"losing stage not discarded: $leftovers")
    // a retry that re-reads the folio state commits cleanly
    val v3 = Folio.publishArtifactsFrom(p, Folio.currentVersion(p))(
      manifest(_, "a\nb\nc"))
    assert(v3 == "v00000003" && readManifest() == "a\nb\nc")
  }

  test("retention floor: a default-keep publish honors a folio-pinned keep=2") {
    // keep is a property of the FOLIO (_CURRENT.keep), not of one call:
    // a manual default-keep publisher interleaving on a keep=2 folio
    // must not reap the extra fallback a rollup publisher pinned there
    val p = s"${tmp()}/keep"
    def pub(s: String, keep: Int = 1): String =
      Folio.publishArtifactsFrom(p, Folio.currentVersion(p), keep) { v =>
        java.nio.file.Files.write(new java.io.File(v, "m").toPath,
          s.getBytes("UTF-8"))
      }
    pub("1", keep = 2); pub("2", keep = 2); pub("3", keep = 2)
    assert(Folio.versions(p) == Seq("v00000001", "v00000002", "v00000003"))
    pub("4") // default keep=1 — the pinned floor must still hold
    assert(Folio.versions(p) == Seq("v00000002", "v00000003", "v00000004"),
      "a default-keep publish reaped the folio's pinned extra fallback")
  }

  test("applied-set hygiene: ephemeral tags age out by LAST COMMIT, not writer mint") {
    import spark.implicits._
    val path = s"${tmp()}/roll"
    def b(v: Double) = Seq(("k", v)).toDF("k", "v")
    val nowMs = System.currentTimeMillis()
    val freshEph = s"eph${java.lang.Long.toHexString(nowMs)}-aabbccddeeff0022"
    // a writer whose MINT is past retention but which is still alive
    // and committing — the >24h-uptime defaulted query (r16 review):
    // mint-anchored expiry would strip its own just-committed tag
    val oldMintEph = s"eph${java.lang.Long.toHexString(
      nowMs - Folio.EphemeralTagRetentionMs - 60000L)}-aabbccddeeff0011"
    Folio.appendWithRollup(b(1.0), path, Seq("k"), Seq("v"),
      Some(s"stream-batch:$freshEph:0"))
    Folio.appendWithRollup(b(2.0), path, Seq("k"), Seq("v"),
      Some(s"stream-batch:$oldMintEph:3"))
    // commit-time anchoring: the old-mint writer's OWN publish is
    // protected, and so is a bystander publish a moment later
    Folio.appendWithRollup(b(3.0), path, Seq("k"), Seq("v"),
      Some("stream-batch:deadbeefcafef00d:5"))
    val tags1 = Folio.rollupCommitTags(path)
    assert(tags1.contains(s"stream-batch:$oldMintEph:3"),
      s"a LIVE long-uptime writer's tag was stripped (mint-anchored expiry): $tags1")
    assert(tags1.contains(s"stream-batch:$freshEph:0"))
    // now the writer goes quiet: age its recorded commit time out by
    // doctoring the sidecar (what 24h of wall clock would do), then any
    // later publish sweeps it — the applied set stays bounded
    val metaV = Folio.currentVersion(s"$path/meta").get
    val sidecar = new java.io.File(s"$path/meta/$metaV", "_COMMIT_TAG_TIMES")
    val aged = new String(
        java.nio.file.Files.readAllBytes(sidecar.toPath), "UTF-8")
      .split("\n").map { line =>
        if (line.startsWith(s"stream-batch:$oldMintEph:"))
          line.takeWhile(_ != '\t') +
            s"\t${nowMs - Folio.EphemeralTagRetentionMs - 60000L}"
        else line
      }.mkString("\n")
    java.nio.file.Files.write(sidecar.toPath, aged.getBytes("UTF-8"))
    Folio.appendWithRollup(b(4.0), path, Seq("k"), Seq("v"),
      Some("stream-batch:deadbeefcafef00d:6"))
    val tags2 = Folio.rollupCommitTags(path)
    assert(!tags2.exists(_.contains(oldMintEph)),
      s"expired ephemeral tag still in the applied set: $tags2")
    assert(tags2.contains(s"stream-batch:$freshEph:0"),
      "a fresh ephemeral tag (same-run retry guard) must survive")
    assert(tags2.contains("stream-batch:deadbeefcafef00d:6"))
  }

  test("9-digit version names: protocol keeps seeing them (regex, sort, vacuum parse)") {
    // %08d grows past v99999999 — the v\d{8,} match, numeric sort, and
    // whole-digit-run parse must all keep working (a 1s-cadence sink
    // crosses 1e8 versions in ~3 years; silent GC blindness = unbounded
    // disk growth)
    val path = tmp()
    Seq("v99999998", "v99999999", "v100000000").foreach { v =>
      val d = new java.io.File(path, v); d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "x").toPath,
        "1".getBytes("UTF-8"))
    }
    java.nio.file.Files.write(new java.io.File(path, "_CURRENT").toPath,
      "v100000000".getBytes("UTF-8"))
    assert(Folio.versions(path) == Seq("v99999998", "v99999999", "v100000000"),
      s"numeric order broke: ${Folio.versions(path)}")
    // vacuum floor = 1e8 - keep(1): v99999998 reaps, v99999999 (the
    // fallback) and the live version survive
    val gone = Folio.vacuum(path, graceMs = 0L)
    assert(gone.contains("v99999998") && !gone.exists(_.endsWith("99999999")),
      s"vacuum reaped wrong versions: $gone")
    assert(Folio.versions(path) == Seq("v99999999", "v100000000"))
  }

  test("applied-set hygiene: pre-sidecar files fall back to the mint anchor") {
    import spark.implicits._
    val path = s"${tmp()}/roll"
    def b(v: Double) = Seq(("k", v)).toDF("k", "v")
    val nowMs = System.currentTimeMillis()
    val oldEph = s"eph${java.lang.Long.toHexString(
      nowMs - Folio.EphemeralTagRetentionMs - 60000L)}-aabbccddeeff0033"
    Folio.appendWithRollup(b(1.0), path, Seq("k"), Seq("v"),
      Some(s"stream-batch:$oldEph:1"))
    // simulate a pre-sidecar version: delete _COMMIT_TAG_TIMES so the
    // next publish sees the tag with no recorded commit time — expiry
    // must fall back to the writer mint (the only anchor those files
    // recorded) instead of retaining the tag forever
    val metaV = Folio.currentVersion(s"$path/meta").get
    java.nio.file.Files.deleteIfExists(
      new java.io.File(s"$path/meta/$metaV", "_COMMIT_TAG_TIMES").toPath)
    Folio.appendWithRollup(b(2.0), path, Seq("k"), Seq("v"),
      Some("stream-batch:deadbeefcafef00d:9"))
    val tags = Folio.rollupCommitTags(path)
    assert(!tags.exists(_.contains(oldEph)),
      s"pre-sidecar old-mint tag must age out via the mint fallback: $tags")
  }

  test("concurrent rollup appenders with retry: every batch folds exactly once") {
    import spark.implicits._
    val dir = tmp()
    val path = s"$dir/roll"
    val nWriters = 4
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val lost = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to nWriters).map { i =>
      new Thread(() => {
        try {
          val b = Seq(("k", i.toDouble)).toDF("k", "v")
          var done = false
          var tries = 0
          while (!done && tries < 32) {
            tries += 1
            try { Folio.appendWithRollup(b, path, Seq("k"), Seq("v")); done = true }
            catch { case _: graft.io.ConcurrentPublishException => () }
          }
          if (!done) lost.incrementAndGet()
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"unexpected failure kinds: ${errs.toArray.toSeq}")
    assert(lost.get() == 0, "a writer could not commit within the retry budget")
    // each batch folded EXACTLY once: neither a lost append (silent
    // manifest drop) nor a double-fold (stale-base re-merge)
    val row = Folio.rollupRead(spark, path).collect()
    assert(row.length == 1)
    val sumV = row(0).getAs[java.math.BigDecimal]("v_sum").doubleValue()
    assert(sumV == (1 to nWriters).map(_.toDouble).sum,
      s"rollup sum drifted under concurrency: $sumV")
    assert(Folio.rollupDataRead(spark, path).count() == nWriters.toLong)
  }

  test("readers during concurrent appends: every observed snapshot is internally consistent") {
    // the reader-side contract of the commit protocol: a reader may see
    // ANY committed version (and, if it falls >keep versions behind
    // mid-read, fail with the documented stale-snapshot FileNotFound —
    // retryable), but NEVER a torn state where the rollup and its own
    // columns disagree. Every appended row carries v=1.0, so in every
    // consistent snapshot v_sum == n_rows == v_cnt exactly — a torn
    // manifest/rollup pair breaks the equality.
    import spark.implicits._
    val dir = tmp()
    val path = s"$dir/roll"
    Folio.appendWithRollup(Seq(("k", 1.0)).toDF("k", "v"), path,
      Seq("k"), Seq("v")) // seed so readers always have a version
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val torn = new java.util.concurrent.atomic.AtomicInteger(0)
    val snapshots = new java.util.concurrent.atomic.AtomicInteger(0)
    val readers = (1 to 2).map { _ =>
      new Thread(() => {
        try {
          while (!stop.get()) {
            try {
              val r = Folio.rollupRead(spark, path).collect()(0)
              val n = r.getAs[Long]("n_rows")
              val cnt = r.getAs[Long]("v_cnt")
              val s = r.getAs[java.math.BigDecimal]("v_sum").doubleValue()
              if (!(n == cnt && s == n.toDouble)) torn.incrementAndGet()
              snapshots.incrementAndGet()
            } catch {
              // the documented bounded-retention loss — stale snapshot,
              // re-read; anything else is a real failure
              case e: Throwable
                if Option(e.getMessage).exists(m =>
                  m.contains("FileNotFound") || m.contains("does not exist")) => ()
            }
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    val writers = (1 to 3).map { i =>
      new Thread(() => {
        try {
          (1 to 3).foreach { _ =>
            var done = false
            var tries = 0
            while (!done && tries < 32) {
              tries += 1
              try {
                Folio.appendWithRollup(Seq(("k", 1.0)).toDF("k", "v"),
                  path, Seq("k"), Seq("v"))
                done = true
              } catch { case _: graft.io.ConcurrentPublishException => () }
            }
            if (!done) errs.add(new AssertionError(s"writer $i starved"))
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    readers.foreach(_.start()); writers.foreach(_.start())
    writers.foreach(_.join(180000))
    stop.set(true); readers.foreach(_.join(30000))
    assert(errs.isEmpty, s"unexpected failures: ${errs.toArray.toSeq}")
    assert(torn.get() == 0, s"${torn.get()} torn snapshots observed")
    assert(snapshots.get() > 0, "readers never observed a snapshot — vacuous")
    // final state: the seed + 9 concurrent appends, all exactly once
    val fin = Folio.rollupRead(spark, path).collect()(0)
    assert(fin.getAs[Long]("n_rows") == 10L,
      s"expected 10 rows folded, got ${fin.getAs[Long]("n_rows")}")
  }
}
