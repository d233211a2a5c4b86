package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the NATIVE as-of exec's time-vs-rows curve on the real
  * events fixture — [[AsOfRewriteBench]] proved the 265× asymptotic win
  * of the merge exec over the union+window rewrite in isolation; this
  * tool pins the remaining claim, "the exec itself scales ~linearly in
  * event volume", with data instead of plan shape (the same upgrade
  * DedupScalingBench gave the dedup family).
  *
  * Scale points: sf0.1 events (1×) and a user-replicated N× (default
  * 10×). Replication preserves the WORKLOAD SHAPE: each replica shifts
  * user_id by a large stride, so per-key click/purchase densities are
  * exactly the original's — the merge exec's per-key state and per-row
  * work are unchanged, keys grow N×. (Replicating along TIME instead
  * would deepen each key's history but is the same total row count;
  * key-replication matches how a 1000-executor cluster actually grows:
  * more users, not 10×-longer sessions per user.)
  *
  * Inputs are staged to parquet first so each measured run starts from
  * a scan, like the bench queries. Three samples per point — this host
  * swings 5-7× on one unlucky run (SCALING.md variance protocol), so a
  * single sample adjudicates nothing.
  *
  * Run: `sbt "runMain graft.tools.AsOfScalingBench [replicas]"`
  * Prints one JSON line per (op, scale, sample) plus a median line.
  */
object AsOfScalingBench {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val spark = graft.Engine.session()
    val out = s"/tmp/graft_asof_scaling/${spark.sparkContext.applicationId}"
    val base = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select(col("user_id"), col("event_id"), col("event_type"),
              col("ts_us"), col("value"))

    def stage(reps: Int, path: String): String = {
      val scaled =
        if (reps == 1) base
        else (0 until reps).map { r =>
          base.select(
            (col("user_id") + lit(r * 100000000L)).as("user_id"),
            (col("event_id") + lit(r * 100000000L)).as("event_id"),
            col("event_type"), col("ts_us"), col("value"))
        }.reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(path)
      path
    }

    def asofNative(path: String, tolerance: Option[Long]): Long = {
      val ev = spark.read.parquet(path)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_us"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("purchase_ts_us"),
                col("value").as("purchase_value"))
      graft.ops.AsOf.joinNative(clicks, purchases, Seq("user_id"),
          "ts_us", "purchase_ts_us", tolerance = tolerance)
        .count()
    }

    val p1 = stage(1, s"$out/ev_1x")
    val pN = stage(replicas, s"$out/ev_${replicas}x")
    val rows1 = spark.read.parquet(p1).count()
    val rowsN = spark.read.parquet(pN).count()

    // untimed warmup pays codegen/JIT once (the bench convention)
    asofNative(p1, None)

    for ((op, tol) <- Seq(("asof_strict", None),
                          ("asof_tol_1h", Some(3600L * 1000000)))) {
      for ((label, path, rows) <- Seq(("1x", p1, rows1),
                                      (s"${replicas}x", pN, rowsN))) {
        val secs = (1 to 3).map { i =>
          val t0 = System.nanoTime()
          val n = asofNative(path, tol)
          val s = (System.nanoTime() - t0) / 1e9
          println(f"""{"op":"$op","scale":"$label","rows":$rows,"out":$n,"sample":$i,"sec":$s%.2f}""")
          s
        }.sorted
        println(f"""{"op":"$op","scale":"$label","rows":$rows,"median_sec":${secs(1)}%.2f}""")
      }
    }
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(out), true)
    spark.stop()
  }
}
