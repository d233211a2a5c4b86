package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures the persisted LSH index's CENTRAL claim with data: probe
  * cost is O(batch), not O(corpus) — growing the indexed corpus 10×
  * must leave the probe wall-clock ~flat (the stored bands are filtered
  * map-side by the broadcast batch; only the hit set proceeds), while
  * re-running the batch engine over corpus ∪ batch grows with the
  * corpus. Corpus scale-up uses [[DedupScalingBench]]'s replica-mangled
  * blow-up (disjoint shingle sets across replicas — band-collision
  * structure per replica identical to the original, so candidate volume
  * per probe doc is flat by construction, which is exactly the regime
  * the claim is about; boilerplate-skew regimes are the maxBucket
  * guard's job, measured separately by the batch bench).
  *
  * Run: `sbt "runMain graft.tools.DedupIndexScalingBench [replicasCsv]"`
  * (default 1,4,16). Prints one JSON line per scale point:
  * corpus rows, index-build sec, probe sec, probe pairs, and the
  * batch-engine-on-the-union sec at the same point for contrast.
  */
object DedupIndexScalingBench {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 4, 16))
    val spark = graft.Engine.session()
    val base = s"/tmp/graft_lshidx_scaling/${spark.sparkContext.applicationId}"
    val src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))

    // fixed probe batch at every scale point: 500 corpus docs under
    // shifted ids and the replica-0 mangle — each probes exactly its
    // replica-0 corpus copy (jaccard 1.0), so true hit volume is flat
    // across scale points by construction
    val batch = src.filter(col("doc_id") < 500)
      .select((col("doc_id") + 50000000L).as("doc_id"),
        regexp_replace(col("text"), "(\\w+)", "r0_$1").as("text"))
    batch.write.mode("overwrite").parquet(s"$base/batch")
    val probeDf = spark.read.parquet(s"$base/batch")

    def corpusAt(r: Int, path: String): DataFrame = {
      val scaled = (0 until r).map { i =>
        src.select((col("doc_id") * r + i).as("doc_id"),
          regexp_replace(col("text"), "(\\w+)", s"r${i}_$$1").as("text"))
      }.reduce(_ unionByName _)
      scaled.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val v = f
      (v, (System.nanoTime() - t0) / 1e9)
    }

    // untimed warmup: pay JIT/codegen once so the 1× point isn't cold
    locally {
      val w = s"$base/warm"
      graft.llm.Dedup.indexAppend(probeDf.limit(200), "doc_id", "text", w)
      graft.llm.Dedup.indexProbe(probeDf.limit(200), "doc_id", "text", w,
        jaccardThreshold = 0.2).count()
    }

    reps.foreach { r =>
      val corpus = corpusAt(r, s"$base/corpus_$r")
      val n = corpus.count()
      val idx = s"$base/idx_$r"
      val (_, buildSec) = timed {
        graft.llm.Dedup.indexAppend(corpus, "doc_id", "text", idx)
      }
      val (pairs, probeSec) = timed {
        graft.llm.Dedup.indexProbe(probeDf, "doc_id", "text", idx,
          jaccardThreshold = 0.2).count()
      }
      // contrast: the batch engine pays the whole union per run
      val (_, batchSec) = timed {
        graft.llm.Dedup.minhashPairs(corpus.unionByName(probeDf),
          "doc_id", "text", jaccardThreshold = 0.2).count()
      }
      println(s"""{"op":"lsh_index","replicas":$r,"corpus_rows":$n,""" +
        s""""build_sec":${f"$buildSec%.2f"},"probe_sec":${f"$probeSec%.2f"},""" +
        s""""probe_pairs":$pairs,"batch_engine_union_sec":${f"$batchSec%.2f"}}""")
    }
    spark.stop()
  }
}
