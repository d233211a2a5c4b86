package graft.tools

import org.apache.spark.sql.functions._

/** Measures the persisted-index AMORTIZATION claim (SCALING.md): the
  * write is the one-time cost, and a stored-index probe beats the
  * train-per-call path because it skips training + assignment/encode.
  * Same decorrelated-replica staging idea as [[DedupScalingBench]]
  * (rotation keeps within-replica geometry, cross-replica pairs
  * decorrelate). Run: `sbt "runMain graft.tools.AnnIndexBench [reps]"`
  * — or pass an explicit CSV of replica counts (`1,16,128,400`) to
  * sweep probe-wall vs corpus size directly. Replica counts past 2·dim
  * repeat transforms (exact-duplicate geometry under fresh ids): fine
  * for the PROBE-COST curve — probe work is nProbe·meanList vectors
  * regardless of duplication — and flagged `geometry_repeats` in the
  * output so recall-shaped conclusions aren't drawn from those points.
  * Prints one JSON line per (op, scale). */
object AnnIndexBench {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.filterNot(_.contains(","))
      .map(_.toInt).getOrElse(10)
    val explicit: Option[Seq[Int]] = args.headOption.filter(_.contains(","))
      .map(_.split(",").map(_.trim.toInt).toSeq)
    val spark = graft.Engine.session()
    val out = s"/tmp/graft_ann_index/${spark.sparkContext.applicationId}"

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // production posture for the comparison: 2 Lloyd passes (training is
    // the cost the index amortizes; iters=1 under-states it)
    val iters = 2
    val scales: Seq[(String, Int)] = explicit match {
      case Some(rs) => rs.map(r => (if (r == 1) "sf0.1" else s"sf0.1x$r", r))
      case None => Seq(("sf0.1", 1), (s"sf0.1x$replicas", replicas),
          (s"sf0.1x${replicas * 10}", replicas * 10))
    }
    scales.foreach { case (label, reps) =>
      val src = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
        .select(col("vec_id"), col("embedding"))
      val dim = src.select(size(col("embedding"))).first().getInt(0)
      val repeats = reps > 2 * dim
      val vecs0 =
        if (reps == 1) src
        else (0 until reps).map { r =>
          // rotation + odd-element sign flip for the second dim block —
          // the DedupScalingBench staging (distinct up to 2·dim reps)
          val rot = r % dim
          val rotated =
            if (rot == 0) col("embedding")
            else concat(slice(col("embedding"), rot + 1, dim - rot),
                        slice(col("embedding"), 1, rot))
          val transformed =
            if ((r / dim) % 2 == 0) rotated
            else zip_with(rotated, sequence(lit(0), lit(dim - 1)),
                   (x, j) => when(j % 2 === 0, x).otherwise(-x))
          src.select((col("vec_id") * reps + r).as("vec_id"),
                     transformed.as("embedding"))
        }.reduce(_ unionByName _)
      vecs0.write.mode("overwrite").parquet(s"$out/vecs_$label")
      val vecs = spark.read.parquet(s"$out/vecs_$label")
      val n = vecs.count()
      val queries = vecs.filter(col("vec_id") % 997 === 0)
      val nq = queries.count()
      val k = math.max(16, (n / 2000L).toInt) // hold mean list ~2k
      val idx = s"$out/idx_$label"
      val tWrite = time(graft.llm.Similarity.writeIvfIndex(vecs, idx,
        nLists = k, iters = iters))
      val tPerCall = time(graft.llm.Similarity
        .ivfTopK(queries, vecs, 5, nLists = k, nProbe = 4, iters = iters).count())
      val tProbe = time(graft.llm.Similarity
        .ivfTopKIndexed(spark, idx, queries, 5, nProbe = 4).count())
      // the pruning regime: a SMALL batch probes a strict subset of the
      // lists, so the partition filter actually skips directories (a big
      // batch covers every list and saves only the training/assign work)
      val small = vecs.filter(col("vec_id") % 997 === 0).limit(3)
      val tPerCallSmall = time(graft.llm.Similarity
        .ivfTopK(small, vecs, 5, nLists = k, nProbe = 4, iters = iters).count())
      val tProbeSmall = time(graft.llm.Similarity
        .ivfTopKIndexed(spark, idx, small, 5, nProbe = 4).count())
      println(f"""{"scale":"$label","rows":$n,"queries":$nq,"nLists":$k,""" +
        f""""geometry_repeats":$repeats,""" +
        f""""write_sec":$tWrite%.2f,"train_per_call_sec":$tPerCall%.2f,""" +
        f""""indexed_probe_sec":$tProbe%.2f,""" +
        f""""small_batch_per_call_sec":$tPerCallSmall%.2f,""" +
        f""""small_batch_probe_sec":$tProbeSmall%.2f}""")
    }
    spark.stop()
  }
}
