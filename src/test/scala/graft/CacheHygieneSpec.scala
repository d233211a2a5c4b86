package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity}
import graft.ops.Caches

/** Cache-lifetime contract (graft.ops.Caches): the dedup/similarity stack
  * releases every intermediate persist the moment its (small) result is
  * sealed, and `Caches.release` frees the sealed result itself — a
  * long-lived shared session accumulates ZERO pinned storage per call.
  * (Round-2 symptom this pins against: `CacheManager: Asked to cache
  * already cached data` churn + monotonically growing storage memory.) */
class CacheHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def cachedRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("minhashPairs → clusters → ivfTopK → cosineNearDupPairs leave no caches behind") {
    val before = cachedRddIds

    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river"),
      (1L, "the quick brown fox jumps over the lazy dog near the sea"),
      (2L, "spark catalyst optimizer rules and whole stage codegen output"),
      (3L, "the quick brown fox jumps over the lazy dog near the river")
    ).toDF("doc_id", "text")
    val rnd = new scala.util.Random(5)
    val vecs = (0 until 40).map { i =>
      (i.toLong, Seq.fill(8)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")

    val pairs  = Dedup.minhashPairs(docs, "doc_id", "text", jaccardThreshold = 0.3)
    val labels = Dedup.clusters(pairs)
    val ivf    = Similarity.ivfTopK(vecs.filter(col("vec_id") < 2), vecs, 3,
                                    nLists = 4, nProbe = 2)
    val nd     = Similarity.cosineNearDupPairs(vecs, threshold = 0.5)
    val sh     = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
    // decontaminate seals only its tiny dirty-id list; the corpus-sized
    // clean result stays an uncached lazy anti-join (collect() here
    // consumes it without pinning corpus-scale storage)
    val dc     = graft.llm.Pipeline.decontaminate(
                   docs, docs.filter(col("doc_id") === 0), "doc_id", "text")

    // the media near-dup paths ride the same seal discipline: the
    // per-clip hash-set persist and the band engine's caches must all
    // release with the result
    val au = graft.llm.Multimodal.audioPerceptualPairs(
      Seq((1L, graft.llm.Multimodal.synthWav(7L, 0.9)),
          (2L, graft.llm.Multimodal.synthWav(7L, 0.3))).toDF("doc_id", "wav"),
      "doc_id", "wav")

    val results = Seq(pairs, labels, ivf, nd, sh, dc, au)
    results.foreach(_.collect()) // consume

    // only the sealed results themselves may still hold storage
    val leaked = cachedRddIds -- before
    assert(leaked.size <= results.size,
      s"intermediate caches leaked: ${leaked.size} live RDDs for ${results.size} results")

    // and release() drops those too — back to the pre-call baseline
    results.foreach(Caches.release)
    assert(cachedRddIds == before,
      s"sealed results not releasable: ${(cachedRddIds -- before).mkString(",")}")
  }
}
