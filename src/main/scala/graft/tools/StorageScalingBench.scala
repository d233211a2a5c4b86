package graft.tools

import org.apache.spark.sql.functions._

/** Measures the FOLIO STORAGE ops' time-vs-rows curve, the way
  * [[DedupScalingBench]] measures the dedup family: compaction and
  * z-order rewrites are full-data jobs, so the claim to verify is
  * "linear in bytes with a flat protocol overhead" — no quadratic
  * surprise hiding in the repartition or the version publish.
  *
  * Scale points: events at sf0.01 (1×), sf0.1 (10×), and 10× replicas
  * of sf0.1 (100×, ids shifted — same value distribution, same
  * partition-key cardinality, so file-count pressure scales with rows).
  * Each point: fragment the folio with 8 partitioned appends, then
  * measure (a) partitioned compact, (b) flat z-order compact on
  * (user_id, value), (c) key-merge upsertPublish of a 2% correction
  * batch. Run: `sbt "runMain graft.tools.StorageScalingBench [reps]"`.
  * Prints one JSON line per (op, scale). */
object StorageScalingBench {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val spark = graft.Engine.session()
    val out = s"/tmp/graft_storage_scaling/${spark.sparkContext.applicationId}"

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val scales: Seq[(String, Int, String)] = Seq(
      ("sf0.01", 1, "/root/testdata/sf0.01"),
      ("sf0.1", 1, "/root/testdata/sf0.1"),
      (s"sf0.1x$replicas", replicas, "/root/testdata/sf0.1"))

    scales.foreach { case (label, reps, srcDir) =>
      val ev0 = graft.Tables.events(spark, srcDir).drop("ts")
      val ev =
        if (reps == 1) ev0
        else (0 until reps).map(r =>
          ev0.withColumn("event_id", col("event_id") + lit(r * 100000000L)))
          .reduce(_ unionByName _)
      val n = ev.count()
      val folio = s"$out/f_$label"
      // fragment: 8 partitioned appends (the micro-batch feed shape)
      (0 until 8).foreach { b =>
        graft.io.Folio.appendPartition(ev.filter(col("event_id") % 8 === b),
          folio, Seq("event_type"), Seq("ts_ns"))
      }
      val frag = graft.io.Folio.dataFileCount(folio)
      val tCompact = time(graft.io.Folio.compact(spark, folio,
        Seq("event_type"), Seq("ts_ns")))
      val after = graft.io.Folio.dataFileCount(folio)
      println(f"""{"op":"compact_parted","scale":"$label","rows":$n,""" +
        f""""files_before":$frag,"files_after":$after,"sec":$tCompact%.2f}""")
      val tZorder = time(graft.io.Folio.compact(spark, folio, Nil, Nil,
        filesPerPartition = 16, zorderCols = Seq("user_id", "value")))
      println(f"""{"op":"compact_zorder","scale":"$label","rows":$n,""" +
        f""""files_after":${graft.io.Folio.dataFileCount(folio)},"sec":$tZorder%.2f}""")
      val corrections = ev.filter(col("event_id") % 50 === 0)
        .withColumn("value", lit(999.99))
      val tUpsert = time(graft.io.Folio.upsertPublish(corrections, folio,
        Seq("event_id")))
      println(f"""{"op":"upsert_publish","scale":"$label","rows":$n,""" +
        f""""batch":${corrections.count()},"sec":$tUpsert%.2f}""")
    }
    spark.stop()
  }
}
