package graft.tools

import org.apache.spark.sql.functions._

/** Time-vs-rows curves for the round-11 dedup members, the
  * [[DedupScalingBench]] discipline: the claim to verify is that
  * blocked-Levenshtein fuzzy join and video perceptual near-dup stay
  * ~linear in input (block/band shuffles + bounded per-block work), with
  * no quadratic surprise as replicas multiply. Scale points are id-shifted
  * replicas of the sf corpus: same value distribution, same block-key
  * cardinality growth as a real corpus scaling up.
  * Run: `sbt "runMain graft.tools.FuzzyVideoScalingBench [sfDir]"`.
  * Prints one JSON line per (op, scale). */
object FuzzyVideoScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Engine.session()
    import spark.implicits._

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ----- fuzzy join: titles from documents, replicated with id shifts
    val titles = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("title"))
    for (reps <- Seq(1, 4, 16)) {
      val corpus = (0 until reps).map(r =>
          titles.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"), col("title")))
        .reduce(_ unionByName _)
      val n = corpus.count()
      val sec = time {
        graft.llm.Dedup.fuzzyPairs(corpus, "doc_id", "title", maxDist = 3)
          .count()
      }
      println(s"""{"op":"fuzzy_join","rows":$n,"sec":${math.round(sec * 1000) / 1000.0}}""")
    }

    // ----- video near-dup: synthetic multi-frame GIFs (the q149 family)
    def gifs(n: Int) = spark.range(n).as[Long].mapPartitions { it =>
      it.map { id =>
        val nf = 1 + (id % 4).toInt
        (id, graft.llm.Multimodal.synthGif(
          (0 until nf).map(k => ((7 * id + 13 * k) % 64).toInt)))
      }
    }.toDF("doc_id", "gif")
    for (n <- Seq(256, 1024, 4096)) {
      val vids = gifs(n)
      val sec = time {
        graft.llm.Multimodal.videoPerceptualPairs(vids, "doc_id", "gif").count()
      }
      println(s"""{"op":"video_neardup","videos":$n,"sec":${math.round(sec * 1000) / 1000.0}}""")
    }
    spark.stop()
  }
}
