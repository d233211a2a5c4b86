package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Multimodal, Similarity, TextOps}

object LlmOpsSpec {
  /** A "real" codec stand-in: features derived from blob length only —
    * top-level so the closure ships without the spec instance. */
  final case class LenCodec(dims: Int = 2) extends graft.llm.Multimodal.MediaCodec {
    def decode(bytes: Array[Byte]): Array[Double] =
      Array.tabulate(dims)(i => (bytes.length * (i + 1)).toDouble)
  }
}

class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "completely different content about spark catalyst optimizer rules and codegen"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),   // exact dup of 0
    (4L, "THE  QUICK   brown fox jumps over the lazy dog near the river bank today") // case/ws dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeps min id") {
    val g = Dedup.exact(docs, "doc_id", "text").collect()
    val big = g.find(_.getLong(2) == 3L) // group of 0,3,4
    assert(big.isDefined && big.get.getLong(1) == 0L)
    assert(g.length == 3) // {0,3,4}, {1}, {2}
  }

  test("exactBinary dedups byte-identical blobs, keeps min id") {
    val a = Array[Byte](1, 2, 3)
    val b = Array[Byte](1, 2, 3)      // same content, different array
    val c = Array[Byte](1, 2, 4)
    val g = Dedup.exactBinary(
        Seq((5L, a), (9L, b), (7L, c)).toDF("doc_id", "blob"),
        "doc_id", "blob")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(g == Set((5L, 2L), (7L, 1L))) // {5,9} keep 5; {7} alone
  }

  test("minhash LSH finds the planted near-dup pair and skips unrelated") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((0L, 3L))) // near+exact dups collide
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("clusters: star contraction closes transitive near-dup chains") {
    val pairs = Seq((0L, 1L, 0.9), (1L, 2L, 0.9), (5L, 6L, 0.8))
      .toDF("id_a", "id_b", "jaccard")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L))
  }

  test("clusters: empty pair list converges immediately to an empty labeling") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    assert(Dedup.clusters(empty).count() == 0)
  }

  test("minhash tolerates empty and single-token documents") {
    val edge = Seq((0L, ""), (1L, "word"), (2L, "word"), (3L, "   ")).toDF("doc_id", "text")
    // must not throw (empty shingle arrays, sequence() down-count guard);
    // the two identical one-token docs are the only candidate pair
    val pairs = Dedup.minhashPairs(edge, "doc_id", "text", jaccardThreshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => Set(a, b).subsetOf(Set(0L, 1L, 2L, 3L)) })
    assert(pairs.contains((1L, 2L)))
  }

  test("clusters: a 64-deep chain closes in O(log n) star rounds") {
    // naive min-label propagation needs 63 rounds here; large/small-star
    // must converge inside a 10-round budget
    val chain = (0L until 63L).map(i => (i, i + 1, 1.0))
      .toDF("id_a", "id_b", "jaccard")
    val got = Dedup.clusters(chain, maxIters = 10).collect()
    assert(got.length == 64 && got.forall(_.getLong(1) == 0L))
  }

  test("clusters: a reliable checkpoint dir switches rounds to lineage-safe checkpoint()") {
    // localCheckpoint blocks die with their executor; when the session
    // has a reliable checkpoint dir (the multi-executor deployment
    // posture) the CC loop must write its rounds THERE, so executor
    // loss mid-loop recomputes from files instead of failing the job
    val sc = spark.sparkContext
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    val prev = sc.getCheckpointDir
    // private[spark] var — public at the JVM level; restored in finally
    // so the shared test session keeps its local[*] default
    val setter = sc.getClass.getMethod("checkpointDir_$eq", classOf[Option[String]])
    sc.setCheckpointDir(dir)
    try {
      val chain = (0L until 63L).map(i => (i, i + 1, 1.0))
        .toDF("id_a", "id_b", "jaccard")
      val labels = Dedup.clusters(chain, maxIters = 10)
      val got = labels.collect()
      assert(got.length == 64 && got.forall(_.getLong(1) == 0L),
        "labels must be identical under reliable checkpointing")
      // the RESULT rides the reliable dir too (a local-checkpoint seal
      // would die with an executor while the caller is consuming it)
      val resultFiles = labels.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.getCheckpointFile
      }.flatten
      assert(resultFiles.nonEmpty,
        "sealed CC result is not reliably checkpointed under a checkpoint dir")
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "CC rounds did not checkpoint to the reliable dir")
      // releasing the result sweeps the LAST files: intermediate rounds
      // were already deleted as the loop released them — the dir must
      // not grow one rdd-N per round for the life of the session
      graft.ops.Caches.release(labels)
      val left = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(left == 0,
        s"checkpoint dir leaks $left files after release (per-round growth)")
    } finally setter.invoke(sc, prev)
  }

  test("clusters: structural convergence detects the fixpoint on the round that reaches it") {
    // r18 optimization pin: convergence is the star-forest STRUCTURE of
    // the edge set, not a round-over-round signature compare — so the
    // loop never pays a confirming extra round. Observable contract:
    //  - disjoint pairs are stars after the INITIAL smallStar → zero
    //    loop rounds, so even maxIters = 0 succeeds;
    //  - a 3-chain needs exactly one round (the signature shape needed
    //    two: one to reach the fixpoint, one to observe it unchanged).
    val pairs = Seq((1L, 0L), (2L, 3L), (9L, 8L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs, maxIters = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L, 8L -> 8L, 9L -> 8L))
    val chain3 = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    val got3 = Dedup.clusters(chain3, maxIters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got3 == Map(0L -> 0L, 1L -> 0L, 2L -> 0L))
  }

  test("clusters: hitting maxIters THROWS instead of returning split clusters") {
    val chain = (0L until 63L).map(i => (i, i + 1, 1.0))
      .toDF("id_a", "id_b", "jaccard")
    val ex = intercept[IllegalStateException] {
      Dedup.clusters(chain, maxIters = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("dropNearDuplicates keeps one witness per cluster, singletons untouched") {
    val all = (0L to 6L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L, 0.9), (1L, 2L, 0.9), (5L, 6L, 0.8))
      .toDF("id_a", "id_b", "jaccard")
    val kept = Dedup.dropNearDuplicates(all, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L, 5L))
  }

  test("keepBestPerCluster elects max-score (tie min-id) winners; singletons survive") {
    // cluster {0,1,2}: doc 1 has the best score → wins over min-id 0;
    // cluster {5,6}: scores tie → min id 5 wins; 3,4 are singletons
    val all = Seq((0L, "a", 10.0), (1L, "b", 50.0), (2L, "c", 30.0),
                  (3L, "d", 1.0), (4L, "e", 2.0),
                  (5L, "f", 7.0), (6L, "g", 7.0))
      .toDF("doc_id", "text", "score")
    val pairs = Seq((0L, 1L, 0.9), (1L, 2L, 0.9), (5L, 6L, 0.8))
      .toDF("id_a", "id_b", "jaccard")
    val won = Dedup.keepBestPerCluster(all, "doc_id", "score", pairs)
      .select("doc_id", "cluster", "n_members")
      .as[(Long, Long, Long)].collect().toSet
    assert(won == Set((1L, 0L, 3L), (3L, 3L, 1L), (4L, 4L, 1L), (5L, 5L, 2L)))
  }

  test("cosine near-dup pairs: same-cluster vectors pair, cross-cluster never") {
    val rnd = new scala.util.Random(3)
    def jitter(center: Array[Float]): Seq[Float] =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val ca = Array.fill(16)(0f); ca(0) = 1f
    val cb = Array.fill(16)(0f); cb(8) = 1f
    val vecs = ((0 until 20).map(i => (i.toLong, jitter(ca))) ++
                (20 until 40).map(i => (i.toLong, jitter(cb))))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(vecs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => (a < 20) == (b < 20) },
      "cross-cluster pair leaked through the cosine threshold")
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    val sigs = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(3L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(1L)) < ham(sigs(0L), sigs(2L)))
  }

  test("brute-force cosine top-k ranks by similarity") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(vecs.filter(col("vec_id") === 0), vecs, 3)
      .orderBy("rk").select("cand_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
    // a ZERO vector's cosine is NaN, which Spark orders GREATER than
    // everything — unguarded it would steal rank 1 from every true
    // neighbor and pass >= thresholds as a false near-dup pair
    val withZero = vecs.unionByName(
      Seq((9L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val gz = Similarity.bruteForceTopK(
        withZero.filter(col("vec_id") === 0), withZero, 3)
      .orderBy("rk").select("cand_id").as[Long].collect().toSeq
    assert(gz == Seq(1L, 2L, 3L), s"zero vector polluted top-k: $gz")
  }

  test("LSH ANN exactly equals brute-force top-k on planted-margin clusters") {
    // two tight clusters around orthogonal centers; LSH must recover
    // same-cluster neighbors. (The fixture embeddings are isotropic
    // random — sim≈0.37 tops — where any LSH has weak recall by math,
    // so the recall assertion needs planted structure.)
    val rnd = new scala.util.Random(7)
    def jitter(center: Array[Float]): Seq[Float] =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val ca = Array.fill(16)(0f); ca(0) = 1f
    val cb = Array.fill(16)(0f); cb(8) = 1f
    val vecs = ((0 until 50).map(i => (i.toLong, jitter(ca))) ++
                (50 until 100).map(i => (i.toLong, jitter(cb))))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
    // planted margin: same-cluster cosine >= 0.95, cross-cluster <= 0.5,
    // so the true top-5 is unambiguous and the approx answer must EQUAL
    // the brute-force golden — full rows (q_id, rk, cand_id, sim), not a
    // recall bound (exact-golden style of reference test.cc:330-346)
    val exact = Similarity.bruteForceTopK(q, vecs, 5).orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val approx = Similarity.lshTopK(q, vecs, 5, nBits = 8, tables = 8)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(exact.forall(_._3 < 50)) // brute force finds same-cluster only
    assert(approx == exact,
      s"LSH top-k != brute-force golden:\n  lsh=$approx\n  bf=$exact")
  }

  test("IVF ANN exactly equals brute-force top-k on planted-margin clusters") {
    val rnd = new scala.util.Random(11)
    def jitter(center: Array[Float]): Seq[Float] =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val ca = Array.fill(16)(0f); ca(0) = 1f
    val cb = Array.fill(16)(0f); cb(8) = 1f
    val vecs = ((0 until 50).map(i => (i.toLong, jitter(ca))) ++
                (50 until 100).map(i => (i.toLong, jitter(cb))))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
    // same planted-margin argument as the LSH test: the probed lists
    // must contain the whole home cluster, so the answer must EQUAL the
    // brute-force golden row-for-row
    val exact = Similarity.bruteForceTopK(q, vecs, 5).orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // nProbe=3 is provably sufficient: with 2 planted clusters and 4
    // centroids, the home cluster occupies at most 3 lists (the foreign
    // points claim >= 1 centroid), and home sub-centroids rank above the
    // foreign one by the cosine margin — so 3 probes cover home entirely
    val ivf = Similarity.ivfTopK(q, vecs, 5, nLists = 4, nProbe = 3)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(ivf == exact,
      s"IVF top-k != brute-force golden:\n  ivf=$ivf\n  bf=$exact")
  }

  test("PQ codes: length m, range [0, ksub), identical vectors code identically") {
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 40).map(i =>
        (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val books = Similarity.trainPQ(vecs, m = 4, ksub = 8)
    assert(books.length == 4 && books.forall(_.length == 8) &&
           books.forall(_.forall(_.length == 4)))
    val twin = vecs.filter(col("vec_id") === 0)
      .withColumn("vec_id", col("vec_id") + 1000L)
    val codes = vecs.unionByName(twin)
      .select(col("vec_id"), Similarity.pqCodes(col("embedding"), books).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
    assert(codes(0L) == codes(1000L)) // same vector, same codes — ADC minimality
  }

  test("pqDecode reconstructs planted-cluster vectors to high cosine") {
    val rnd = new scala.util.Random(17)
    def jitter(center: Array[Float]): Seq[Float] =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val ca = Array.fill(16)(0f); ca(0) = 1f
    val cb = Array.fill(16)(0f); cb(8) = 1f
    val vecs = ((0 until 50).map(i => (i.toLong, jitter(ca))) ++
                (50 until 100).map(i => (i.toLong, jitter(cb))))
      .toDF("vec_id", "embedding")
    val books = Similarity.trainPQ(vecs, m = 8, ksub = 16)
    val minCos = vecs
      .select(Similarity.pqDecode(
        Similarity.pqCodes(col("embedding"), books), books).as("rec"),
        col("embedding"))
      .select(Similarity.cosine(col("rec"), col("embedding")).as("c"))
      .agg(min(col("c"))).head().getDouble(0)
    assert(minCos > 0.9, s"worst reconstruction cosine $minCos")
  }

  test("PQ-ADC ANN exactly equals brute-force top-k on planted-margin clusters") {
    val rnd = new scala.util.Random(19)
    def jitter(center: Array[Float]): Seq[Float] =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val ca = Array.fill(16)(0f); ca(0) = 1f
    val cb = Array.fill(16)(0f); cb(8) = 1f
    val vecs = ((0 until 50).map(i => (i.toLong, jitter(ca))) ++
                (50 until 100).map(i => (i.toLong, jitter(cb))))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
    // rerank=50 makes the ADC prefilter provably sufficient: every
    // same-cluster candidate's ADC beats every cross-cluster one by the
    // planted margin (reconstruction error ≪ inter-cluster distance), so
    // the 49 home docs all survive and re-rank equals the brute golden
    val exact = Similarity.bruteForceTopK(q, vecs, 5).orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val pq = Similarity.pqTopK(q, vecs, 5, m = 8, ksub = 16, rerank = 50)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(pq == exact,
      s"PQ top-k != brute-force golden:\n  pq=$pq\n  bf=$exact")
  }

  test("IVF-PQ ANN exactly equals brute-force top-k on planted-margin clusters") {
    val rnd = new scala.util.Random(23)
    def jitter(center: Array[Float]): Seq[Float] =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val ca = Array.fill(16)(0f); ca(0) = 1f
    val cb = Array.fill(16)(0f); cb(8) = 1f
    val vecs = ((0 until 50).map(i => (i.toLong, jitter(ca))) ++
                (50 until 100).map(i => (i.toLong, jitter(cb))))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
    // probe coverage follows the IVF test's argument (nProbe=3 of
    // nLists=4 covers the home cluster); rerank=50 then makes the ADC
    // prefilter sufficient as in the PQ test — so the composed path must
    // also EQUAL the brute-force golden row-for-row
    val exact = Similarity.bruteForceTopK(q, vecs, 5).orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val ivfpq = Similarity.ivfPqTopK(q, vecs, 5, nLists = 4, nProbe = 3,
        m = 8, ksub = 16, rerank = 50)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(ivfpq == exact,
      s"IVF-PQ top-k != brute-force golden:\n  ivfpq=$ivfpq\n  bf=$exact")
  }

  test("PQ and IVF-PQ exclude NULL-embedding candidates from the coded index") {
    // 100 real vectors + 100 NULL embeddings, rerank=50: before the null
    // exclusion, every null candidate encoded to codes-of-nulls whose NULL
    // __adc sorted NULLS FIRST — all 50 prefilter slots went to null rows
    // and the output degenerated to null sims. Post-fix both tiers must
    // equal the brute-force golden over the non-null candidates.
    val rnd = new scala.util.Random(29)
    def jitter(center: Array[Float]): Seq[Float] =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val ca = Array.fill(16)(0f); ca(0) = 1f
    val cb = Array.fill(16)(0f); cb(8) = 1f
    val vecs = ((0 until 50).map(i => (i.toLong, Option(jitter(ca)))) ++
                (50 until 100).map(i => (i.toLong, Option(jitter(cb)))) ++
                (100 until 200).map(i => (i.toLong, Option.empty[Seq[Float]])))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 0)
    val exact = Similarity.bruteForceTopK(
        q, vecs.filter(col("embedding").isNotNull), 5).orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val pq = Similarity.pqTopK(q, vecs, 5, m = 8, ksub = 16, rerank = 50)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(pq == exact, s"PQ with null candidates != golden:\n  pq=$pq\n  bf=$exact")
    val ivfpq = Similarity.ivfPqTopK(q, vecs, 5, nLists = 4, nProbe = 3,
        m = 8, ksub = 16, rerank = 50)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(ivfpq == exact,
      s"IVF-PQ with null candidates != golden:\n  ivfpq=$ivfpq\n  bf=$exact")
  }

  test("IVF ANN works on sparse non-zero-based ids (no density assumption)") {
    // ids are hashed-style: start high, stride 7 — the round-2 seeder
    // (filter(id < nLists)) would find zero seeds here and abort
    val rnd = new scala.util.Random(13)
    def jitter(center: Array[Float]): Seq[Float] =
      center.map(c => c + (rnd.nextFloat() - 0.5f) * 0.1f).toSeq
    val ca = Array.fill(16)(0f); ca(0) = 1f
    val cb = Array.fill(16)(0f); cb(8) = 1f
    val vecs = ((0 until 50).map(i => (1000000L + i * 7L, jitter(ca))) ++
                (50 until 100).map(i => (1000000L + i * 7L, jitter(cb))))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 1000000L)
    val got = Similarity.ivfTopK(q, vecs, 5, nLists = 4, nProbe = 2).collect()
    assert(got.length == 5)
    // all nearest neighbors of a cluster-A query are cluster-A ids
    assert(got.forall(_.getLong(2) < 1000000L + 50 * 7L))
  }

  test("multimodal partitioned decode: bounded-memory iterator path") {
    import graft.llm.Multimodal
    val out = Multimodal.decodePartitioned(Tables.documents(spark, sf), "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "n_bytes", "features"))
    val rows = out.orderBy("doc_id").limit(3).collect()
    assert(rows.forall(_.getSeq[Double](2).length == 8))
    // deterministic: same input → same features
    val again = Multimodal.decodePartitioned(Tables.documents(spark, sf), "doc_id", "text")
      .orderBy("doc_id").limit(3).collect()
    assert(rows.map(_.getSeq[Double](2)).toSeq == again.map(_.getSeq[Double](2)).toSeq)
    assert(out.count() == Tables.documents(spark, sf).count())
  }

  test("ImageIoCodec: real PNG decode recovers constructed colors per grid cell") {
    import graft.llm.Multimodal
    // left half red, right half blue — grid=2 pools each half exactly
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xFF0000 else 0x0000FF)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val f = Multimodal.ImageIoCodec(grid = 2).decode(baos.toByteArray)
    assert(f(0) == 8.0 && f(1) == 4.0)
    assert(f(2) == 255.0 && f(3) == 0.0 && f(4) == 0.0)   // top-left cell: red
    assert(f(5) == 0.0 && f(6) == 0.0 && f(7) == 255.0)   // top-right cell: blue
    assert(f(8) == 255.0 && f(11) == 0.0)                 // bottom row mirrors
  }

  test("WavCodec: real WAV parse recovers rate/frames/duration; sine RMS = A/sqrt2") {
    import graft.llm.Multimodal
    import javax.sound.sampled._
    val rate = 8000f; val n = 8000; val amp = 0.5
    val pcm = Array.ofDim[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (amp * math.sin(2 * math.Pi * 440 * i / rate) * 32767).toInt
      pcm(2 * i) = (s & 0xFF).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    val f = Multimodal.WavCodec().decode(baos.toByteArray)
    assert(f(0) == 8000.0 && f(1) == 1.0 && f(2) == 8000.0 && f(3) == 1.0)
    assert(math.abs(f(4) - amp / math.sqrt(2)) < 0.01, s"rms ${f(4)}")
  }

  test("multimodal codec seam: a custom decoder drops in unchanged") {
    import graft.llm.Multimodal
    val out = Multimodal.decodePartitioned(docs, "doc_id", "text", LlmOpsSpec.LenCodec())
      .orderBy("doc_id").collect()
    assert(out.forall(r => r.getSeq[Double](2) ==
      Seq(r.getInt(1).toDouble, r.getInt(1) * 2.0)))
  }

  test("token counts: edge cases") {
    val df = Seq("", "   ", "one", "a b  c").toDF("t")
    val got = df.select(TextOps.tokenCount(col("t"))).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 1, 3))
  }

  test("language id picks marker-heavy language") {
    val df = Seq((1L, "der hund und die katze sind schnell schon")).toDF("doc_id", "text")
    val got = TextOps.languageId(df, "doc_id", "text").collect()(0).getString(1)
    assert(got == "de")
  }

  test("repetition signals separate looping text from varied text") {
    val df = Seq(
      (0L, "buy now buy now buy now buy now buy now"),        // pure loop
      (1L, "the quick brown fox jumps over one lazy dog"),    // all distinct
      (2L, ""), (3L, "word")                                   // degenerate
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val loop = got(0); val varied = got(1)
    // "buy now"×5: bigrams = [buy now, now buy, …] — "buy now" occurs 5/9
    assert(loop.getDouble(1) > 0.5 && varied.getDouble(1) < 0.2)
    // trigram dup: loop has 8 trigrams, 2 distinct → 0.75; varied all distinct → 0
    assert(loop.getDouble(2) > 0.7 && varied.getDouble(2) == 0.0)
    // entropy: two words uniform = ln 2 ≈ 0.693 < ln 9 of 9 distinct
    assert(loop.getDouble(3) < varied.getDouble(3))
    assert(math.abs(loop.getDouble(3) - math.log(2)) < 1e-6)
    // degenerate docs produce zeros, not NaN/error
    assert(got(2).getDouble(1) == 0.0 && got(2).getDouble(3) == 0.0)
    assert(got(3).getDouble(2) == 0.0)
  }

  test("tf-idf damps corpus-wide boilerplate, surfaces unique terms") {
    val df = Seq(
      (0L, "common common common unique0"),
      (1L, "common common unique1 unique1"),
      (2L, "common unique2 xx yy")
    ).toDF("doc_id", "text")
    val top = TextOps.tfIdfTerms(df, "doc_id", "text", 1)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // "common" appears in every doc → idf = ln(1) = 0 → never the top term
    assert(top == Map(0L -> "unique0", 1L -> "unique1", 2L -> "unique2"))
  }

  test("int8 quantization: bounded error, clamp, zero vector, roundtrip") {
    val df = Seq(
      (0L, Seq(1.0f, -2.0f, 0.5f, 127.0f)),
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(-0.003f, 0.001f, 0.002f, -0.001f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df)
      .withColumn("dq", Similarity.dequantize(col("q"), col("scale")))
    val rows = q.join(df, Seq("vec_id")).orderBy("vec_id")
      .select(col("vec_id"), col("scale"), col("q"), col("dq"), col("embedding"))
      .collect()
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val qs = r.getSeq[Int](2)
      val dq = r.getSeq[Double](3)
      val orig = r.getSeq[Float](4).map(_.toDouble)
      assert(qs.forall(v => v >= -127 && v <= 127))
      // reconstruction error ≤ scale/2 per element (the rounding bound)
      orig.zip(dq).foreach { case (o, d) =>
        assert(math.abs(o - d) <= scale / 2 + 1e-12, s"err ${math.abs(o - d)} scale $scale")
      }
    }
    // zero vector → scale 0, all-zero codes, exact roundtrip
    val z = rows(1)
    assert(z.getDouble(1) == 0.0 && z.getSeq[Int](2).forall(_ == 0) &&
           z.getSeq[Double](3).forall(_ == 0.0))
    // max-magnitude element maps to ±127 exactly
    assert(rows(0).getSeq[Int](2).last == 127)
  }

  test("meanPool: exact elementwise group means, partition-invariant") {
    val df = Seq(
      (1L, Seq(1.0, 2.0, 4.0)),
      (1L, Seq(3.0, 6.0, 8.0)),
      (2L, Seq(10.0, 0.0, -2.0))
    ).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.meanPool(d, "g", "v").orderBy("group_key").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getLong(2))).toSeq
    val got = run(df)
    assert(got == Seq(
      (1L, Seq(2.0, 4.0, 6.0), 2L),
      (2L, Seq(10.0, 0.0, -2.0), 1L)))
    assert(run(df.repartition(7)) == got)
  }

  test("meanPool: ragged groups FAIL FAST instead of averaging a lie") {
    // dimension drift (a 3-vec and a 2-vec in one group) must throw, not
    // silently average position 2 over one contributor
    val ragged = Seq(
      (1L, Seq(1.0, 2.0, 4.0)),
      (1L, Seq(3.0, 6.0))
    ).toDF("g", "v")
    val e = intercept[Exception] {
      Similarity.meanPool(ragged, "g", "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ragged group")), s"wrong error: $e")
    // an EMPTY vector (failed upstream embedding) also fails fast — a
    // plain posexplode would drop it silently and average 2-of-3 chunks
    val withEmpty = Seq(
      (1L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0)), (1L, Seq.empty[Double])
    ).toDF("g", "v")
    val e2 = intercept[Exception] {
      Similarity.meanPool(withEmpty, "g", "v").collect()
    }
    assert(msgs(e2).exists(_.contains("empty or null vector")), s"wrong error: $e2")
    // a NULL vector column likewise
    val withNull = Seq((1L, Some(Seq(1.0, 2.0))), (1L, None))
      .toDF("g", "v")
    val e3 = intercept[Exception] {
      Similarity.meanPool(withNull, "g", "v").collect()
    }
    assert(msgs(e3).exists(_.contains("empty or null vector")), s"wrong error: $e3")
    // equal-length groups are untouched by the guard
    val ok = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0)), (2L, Seq(9.0, 9.0)))
      .toDF("g", "v")
    assert(Similarity.meanPool(ok, "g", "v").collect().length == 2)
  }

  test("autoNBits holds bucket occupancy constant as the corpus grows") {
    import Similarity.autoNBits
    assert(autoNBits(2000) == 10)     // small corpora keep the default
    assert(autoNBits(200000) == 14)   // the measured SCALING.md point
    assert(autoNBits(20000000) == 21)
    // occupancy n/2^bits stays within [target/2, target] once past the floor
    for (n <- Seq(100000L, 1000000L, 100000000L)) {
      val occ = n.toDouble / (1L << autoNBits(n))
      assert(occ <= 16.0 && occ > 7.9, s"occupancy $occ at n=$n")
    }
  }

  test("nBits=0 default auto-sizes the dial yet stays exact on planted replicas") {
    // the DEFAULT path (no caller hint) now runs count() → autoNBits; a
    // 200k corpus would pick 14 bits without anyone asking (pinned above).
    // Exactness is bit-count-independent for exact replicas — identical
    // vectors have identical sketches in EVERY table — so the default
    // path must return the same pair set as an explicit fixed width.
    import spark.implicits._
    val base = (0L until 64L).map(i => i -> Array.tabulate(16)(j =>
      if (j == (i % 16).toInt) 1.0f else 0.01f * ((i + j) % 7))).toDF("vec_id", "embedding")
    val planted = base.filter(col("vec_id") < 8)
      .withColumn("vec_id", col("vec_id") + lit(1000L))
    val corpus = base.unionByName(planted)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val auto = pairSet(Similarity.cosineNearDupPairs(corpus, threshold = 0.999))
    val fixed = pairSet(Similarity.cosineNearDupPairs(corpus, threshold = 0.999, nBits = 10))
    assert(auto == fixed, "auto-sized dial changed the exact-replica pair set")
    assert((0L until 8L).forall(i => auto.contains(i -> (i + 1000L))),
      s"planted replica pair missing from $auto")
  }

  // ---- exact-equality tier for the permanent rows-only ANN queries ----
  // q33/q46 can't be DuckDB-oracled (xxhash64-seeded sketches, LSH recall
  // has no SQL twin) — but a MARGIN fixture makes exact top-k equality
  // provable in-JVM: 4 orthogonal clusters, jitter ±0.01, so every
  // within-cluster cosine is ≥0.95 and every cross-cluster cosine ≤0.5.
  // With k=5 < cluster size, the true top-k is margin-separated from
  // everything a candidate generator could confuse it with; any ANN whose
  // probe set reaches the query's own cluster returns EXACTLY the brute
  // answer. The twin replicates Similarity's arithmetic bit-for-bit:
  // per-element double cast, left-to-right dot fold, d/na/nb division
  // order, HALF_UP rounding at 6 dp, (sim desc, cand_id asc) ranking.

  private def marginFixture(seed: Int): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    val dim = 16
    def jitter(axis: Int): Seq[Float] = {
      val v = Array.fill(dim)(0f); v(axis) = 1f
      v.map(c => c + (rnd.nextFloat() - 0.5f) * 0.02f).toSeq
    }
    (0 until 40).map(i => (i.toLong, jitter((i % 4) * 4)))
  }

  private def twinTopK(vecs: Seq[(Long, Seq[Float])], qIds: Seq[Long],
                       k: Int): Seq[(Long, Long, Long, Double)] = {
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def sim(a: Seq[Float], b: Seq[Float]): Double = {
      val d = dot(a, b) / math.sqrt(dot(a, a)) / math.sqrt(dot(b, b))
      java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val byId = vecs.toMap
    qIds.flatMap { q =>
      vecs.filter(_._1 != q)
        .map { case (id, v) => (id, sim(byId(q), v)) }
        .sortBy { case (id, s) => (-s, id) }
        .take(k).zipWithIndex
        .map { case ((id, s), i) => (q, (i + 1).toLong, id, s) }
    }
  }

  private def proveMargin(vecs: Seq[(Long, Seq[Float])]): Unit = {
    // the exhaustiveness argument, asserted rather than assumed: same-
    // cluster cosine ≥0.95, cross-cluster ≤0.5 — an empty gap means the
    // true top-k (k < cluster size) can't be displaced by any candidate
    // the ANN might miss or add
    def rawSim(a: Seq[Float], b: Seq[Float]): Double = {
      def d(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / math.sqrt(d(a, a)) / math.sqrt(d(b, b))
    }
    for ((ia, va) <- vecs; (ib, vb) <- vecs if ia < ib) {
      val s = rawSim(va, vb)
      if (ia % 4 == ib % 4) assert(s >= 0.95, s"within-cluster $ia/$ib sim=$s")
      else assert(s <= 0.5, s"cross-cluster $ia/$ib sim=$s")
    }
  }

  test("cosine near-dup pairs: exact pair-SET equality on the margin fixture") {
    // completeness, not just soundness: at a mid-gap threshold (0.7,
    // between cross ≤0.5 and within ≥0.95) the true answer is exactly
    // every within-cluster pair — 4 · C(10,2) = 180 — and the LSH-
    // bucketed op must return that set with bit-exact cosines
    val vecs = marginFixture(31)
    proveMargin(vecs)
    def sim(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]): Double = {
        var acc = 0.0; var i = 0
        while (i < x.length) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
        acc
      }
      val d = dot(a, b) / math.sqrt(dot(a, a)) / math.sqrt(dot(b, b))
      java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    val expect = (for ((ia, va) <- vecs; (ib, vb) <- vecs
                       if ia < ib && sim(va, vb) >= 0.7)
                  yield (ia, ib, sim(va, vb))).toSet
    assert(expect.size == 4 * 45, s"fixture structure broke: ${expect.size}")
    val got = Similarity.cosineNearDupPairs(vecs.toDF("vec_id", "embedding"),
        threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }

  test("LSH ANN: exact top-k equality on the margin fixture") {
    val vecs = marginFixture(23)
    proveMargin(vecs)
    val df = vecs.toDF("vec_id", "embedding")
    val expect = twinTopK(vecs, Seq(0L, 1L, 2L, 3L), k = 5)
    val got = Similarity.lshTopK(df.filter(col("vec_id") < 4), df, 5,
        nBits = 8, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == expect.sortBy(t => (t._1, t._2)),
      s"LSH diverged from brute twin:\n got=$got\n exp=$expect")
  }

  test("IVF ANN: exact top-k equality on the margin fixture") {
    val vecs = marginFixture(29)
    proveMargin(vecs)
    val df = vecs.toDF("vec_id", "embedding")
    val expect = twinTopK(vecs, Seq(0L, 1L, 2L, 3L), k = 5)
    // nProbe=2 ⊇ the query's own list: near-identical vectors assign to
    // the same list whatever the trained centroids are, so the probe set
    // always contains every true top-k candidate
    val got = Similarity.ivfTopK(df.filter(col("vec_id") < 4), df, 5,
        nLists = 4, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(got == expect.sortBy(t => (t._1, t._2)),
      s"IVF diverged from brute twin:\n got=$got\n exp=$expect")
  }

  test("IVF ANN: second Lloyd iteration preserves exact top-k (recall-vs-iters)") {
    // the iters dial adds one assignment+means scan per pass with the
    // same centroids-only driver state; on the margin fixture recall is
    // exact at iters=1, and MUST STAY exact at iters=2 — tighter
    // centroids can reshuffle list boundaries but near-identical vectors
    // still co-assign, so nProbe ⊇ own-list keeps the true top-k reachable
    val vecs = marginFixture(31)
    val df = vecs.toDF("vec_id", "embedding")
    val expect = twinTopK(vecs, Seq(0L, 1L, 2L, 3L), k = 5).sortBy(t => (t._1, t._2))
    for (it <- Seq(1, 2)) {
      val got = Similarity.ivfTopK(df.filter(col("vec_id") < 4), df, 5,
          nLists = 4, nProbe = 2, iters = it)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq.sortBy(t => (t._1, t._2))
      assert(got == expect, s"IVF diverged from brute twin at iters=$it")
    }
    // the dial changes the MODEL deterministically: same fixture, same
    // iters => same centroid matrix (reproducible training)
    val c2a = Similarity.trainCentroids(df, nLists = 4, iters = 2)
    val c2b = Similarity.trainCentroids(df, nLists = 4, iters = 2)
    assert(c2a.map(_.toSeq).toSeq == c2b.map(_.toSeq).toSeq,
      "trainCentroids must be deterministic at fixed iters")
  }

  test("semDedup: cluster-then-prune drops exactly the planted copies") {
    // organic corpus: 30 seeded random 16-dim vectors; margin asserted
    // (max organic cosine < 0.9), so at τ=0.95 the only qualifying pairs
    // are the planted exact copies — victims/witnesses are closed-form
    val rnd = new scala.util.Random(7)
    val dim = 16
    val base = (0 until 30).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() - 0.5f)))
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def sim(a: Seq[Float], b: Seq[Float]): Double =
      dot(a, b) / math.sqrt(dot(a, a)) / math.sqrt(dot(b, b))
    val maxOrganic = (for ((ia, va) <- base; (ib, vb) <- base if ia < ib)
                      yield sim(va, vb)).max
    assert(maxOrganic < 0.9, s"fixture margin broke: $maxOrganic")
    // two copies of 8 also near-dup EACH OTHER; min-witness must still
    // elect the original (8 < 101)
    val copies = Seq(3, 8, 8, 21).zipWithIndex.map { case (src, i) =>
      ((100 + i).toLong, base(src)._2) }
    val all = (base ++ copies).toDF("vec_id", "embedding")
    val victims = Similarity.semDedupVictims(all, threshold = 0.95,
        nClusters = 5, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(victims == Set((100L, 3L, 1.0), (101L, 8L, 1.0),
                          (102L, 8L, 1.0), (103L, 21L, 1.0)),
      s"victims=$victims")
    val kept = Similarity.semDedup(all, threshold = 0.95,
        nClusters = 5, iters = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 30L).toSet)
  }

  test("semDedup: victim set is partition-invariant (1 vs 7 partitions)") {
    // centroid means are fp-order-sensitive across partitionings, but
    // victimhood only depends on co-clustering of ≥τ pairs — and
    // identical vectors co-cluster under ANY centroid set, while the
    // margin keeps organic pairs far from τ. The ANSWER must not move.
    val rnd = new scala.util.Random(17)
    val base = (0 until 24).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val copies = Seq(2, 9, 15).zipWithIndex.map { case (src, i) =>
      ((100 + i).toLong, base(src)._2) }
    val df = (base ++ copies).toDF("vec_id", "embedding")
    def victims(parts: Int) =
      Similarity.semDedupVictims(df.repartition(parts), threshold = 0.95,
          nClusters = 4, iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val v1 = victims(1)
    assert(v1 == Set((100L, 2L, 1.0), (101L, 9L, 1.0), (102L, 15L, 1.0)))
    assert(victims(7) == v1)
  }

  test("semDedupKeepBest: full pair graph elects one max-score winner per component") {
    // chain component {2,3,4}: cos(2,4) and cos(3,4) above τ=0.8,
    // cos(2,3) below — node 3's only qualifying neighbor has a LARGER
    // id, so the min-witness victim edges MISS it (it is no victim), but
    // the component election must still see it as a member
    val dim = 16
    def vec(theta: Double): Seq[Float] = {
      val v = Array.fill(dim)(0f)
      v(0) = math.cos(theta).toFloat; v(1) = math.sin(theta).toFloat
      v.toSeq
    }
    val rows = Seq(
      (2L, vec(0.0), 10.0),
      (3L, vec(math.toRadians(50)), 99.0), // best quality in the chain
      (4L, vec(math.toRadians(25)), 20.0),
      (7L, vec(math.toRadians(160)), 5.0)) // unrelated singleton
    val df = rows.toDF("vec_id", "embedding", "score")
    // min-id semantics: 3 generates no victim edge → {2,3} survive
    val minId = Similarity.semDedup(df, threshold = 0.8, nClusters = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(2L, 3L, 7L))
    // keep-best semantics: the WHOLE component {2,3,4} elects 3
    val best = Similarity.semDedupKeepBest(df, "score", threshold = 0.8,
        nClusters = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(best == Set(3L, 7L))
  }

  test("semDedup: maxCluster guard passes oversized clusters through un-deduped") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 20).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val all = (base :+ (100L, base(5)._2)).toDF("vec_id", "embedding")
    // every cluster oversized at maxCluster=1 → conservative no-drop
    val victims = Similarity.semDedupVictims(all, threshold = 0.95,
        nClusters = 4, iters = 1, maxCluster = 1)
    assert(victims.count() == 0)
    // and the survivor form then keeps everything
    assert(Similarity.semDedup(all, threshold = 0.95, nClusters = 4,
      iters = 1, maxCluster = 1).count() == 21)
  }

  test("semDedup: NULL embeddings pass through — never victims, never witnesses") {
    val rnd = new scala.util.Random(13)
    val base = (0 until 12).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val withNull = base.map { case (id, v) => (id, Option(v)) } ++
      Seq((50L, Option.empty[Seq[Float]]), (51L, Option(base(2)._2)))
    val df = withNull.toDF("vec_id", "embedding")
    val victims = Similarity.semDedupVictims(df, threshold = 0.95,
        nClusters = 3, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(victims == Set((51L, 2L)))
    val kept = Similarity.semDedup(df, threshold = 0.95, nClusters = 3, iters = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(50L) && !kept.contains(51L) && kept.size == 13)
  }

  test("GIF frame sampler: real demux, stride sampling, exact planted luma") {
    def gif(lumas: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
      writer.setOutput(ios); writer.prepareWriteSequence(null)
      lumas.foreach { g =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val rgb = (g << 16) | (g << 8) | g
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); ios.close(); writer.dispose()
      baos.toByteArray
    }
    val df = Seq((1L, gif(Seq(10, 20, 30, 40, 50), 6, 4)),
                 (2L, gif(Seq(99), 3, 5))).toDF("doc_id", "gif")
    val got = graft.llm.Multimodal.sampleFramesPartitioned(df, "doc_id", "gif", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
                           r.getDouble(4))).toSet
    assert(got == Set((1L, 0, 6, 4, 10.0), (1L, 2, 6, 4, 30.0),
                      (1L, 4, 6, 4, 50.0), (2L, 0, 3, 5, 99.0)))
    intercept[IllegalArgumentException] {
      graft.llm.Multimodal.sampleFramesPartitioned(df, "doc_id", "gif", 0)
    }
  }

  test("image resize: binary→binary transform re-decodes at the new dims") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val df = Seq((1L, png(16, 8, 0x64C832)), (2L, png(3, 3, 0x000000)))
      .toDF("doc_id", "png")
    val out = graft.llm.Multimodal.resizePartitioned(df, "doc_id", "png", 4, 4)
    // the output blob column flows through the SAME codec seam
    val dec = graft.llm.Multimodal.decodeBinaryPartitioned(out, "doc_id", "png",
        graft.llm.Multimodal.ImageIoCodec(grid = 1))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2)).toMap
    assert(dec(1L) == Seq(4.0, 4.0, 100.0, 200.0, 50.0)) // solid survives exactly
    assert(dec(2L).take(2) == Seq(4.0, 4.0))             // upscale too
    intercept[IllegalArgumentException] {
      graft.llm.Multimodal.resizePartitioned(df, "doc_id", "png", 0, 4)
    }
  }

  test("perceptual aHash: signature equals the planted mask; pairs = planted set") {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }
    // the q129 margin, ASSERTED not assumed: every organic mask pair
    // (and planted-vs-unrelated) differs in > 3 bits, and no mask is
    // degenerate (all-set/all-clear would pin the mean to one side)
    val masks = (0L until 40L).map(id => id -> mix(id * 1337L + 7L)).toMap
    masks.values.foreach(m => assert(
      java.lang.Long.bitCount(m) > 0 && java.lang.Long.bitCount(m) < 64))
    val allSigs = masks ++ (0L until 40L by 5).map(id =>
      (id + 1000L) -> (masks(id) ^ (3L << (id % 62).toInt)))
    for ((ia, ma) <- allSigs; (ib, mb) <- allSigs
         if ia < ib && !(ib == ia + 1000L && ia % 5 == 0)) {
      val d = java.lang.Long.bitCount(ma ^ mb)
      assert(d > 3, s"margin broke: masks $ia,$ib at hamming $d")
    }
    def png(mask: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (c <- 0 until 64) {
        val l = if (((mask >>> (63 - c)) & 1L) == 1L) 200 else 50
        img.setRGB(c % 8, c / 8, (l << 16) | (l << 8) | l)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    // the decoded aHash must reproduce each mask BIT-FOR-BIT
    val blobs = allSigs.toSeq.map { case (id, m) => (id, png(m)) }
      .toDF("doc_id", "png")
    val sigs = graft.llm.Multimodal.aHashSignatures(
        graft.llm.Multimodal.decodeBinaryPartitioned(blobs, "doc_id", "png",
          graft.llm.Multimodal.ImageIoCodec(grid = 8)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs == allSigs, "aHash diverged from the planted masks")
    // and the blocked pair search returns exactly the planted pairs
    val pairs = graft.llm.Multimodal.perceptualPairs(blobs, "doc_id", "png")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == (0L until 40L by 5).map(id => (id, id + 1000L, 2)).toSet)
  }

  test("video near-dup: padded copy pairs at its true Jaccard, threshold dials") {
    def gif(patterns: Seq[Int]): Array[Byte] = graft.llm.Multimodal.synthGif(patterns)
    val vids = Seq(
      (1L, gif(Seq(10, 20))),        // two frames
      (2L, gif(Seq(10, 20, 30))),    // same two + one extra (padded copy)
      (3L, gif(Seq(50)))             // unrelated
    ).toDF("doc_id", "gif")
    // frame hashes are a pure function of pixels: shared frames collide
    val fh = Multimodal.sampleFrameHashesPartitioned(vids, "doc_id", "gif")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(fh((1L, 0)) == fh((2L, 0)) && fh((1L, 1)) == fh((2L, 1)))
    assert(fh((1L, 0)) != fh((3L, 0)))
    // padded copy: |{h10,h20}| ∩ |{h10,h20,h30}| / union = 2/3
    val loose = Multimodal.videoPerceptualPairs(vids, "doc_id", "gif",
        jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1000) / 1000)).toSet
    assert(loose == Set((1L, 2L, 0.667)), s"got $loose")
    // tight threshold drops the padded pair
    assert(Multimodal.videoPerceptualPairs(vids, "doc_id", "gif",
      jaccardThreshold = 0.9).count() == 0)
  }

  test("audio near-dup: volume-invariant envelope hash; padded copy at true Jaccard") {
    def wav(seed: Long, scale: Double, windows: Int = 4): Array[Byte] =
      graft.llm.Multimodal.synthWav(seed, scale, windows)
    val clips = Seq(
      (1L, wav(7L, 0.9)),   // the original
      (2L, wav(7L, 0.3)),   // gain-rescaled copy — the perceptual dup
      (3L, wav(7L, 0.9, windows = 6)), // padded copy: 4 shared + 2 extra
      (4L, wav(99L, 0.9))   // unrelated pattern
    ).toDF("doc_id", "wav")
    // window hashes are volume-invariant: rescaling changes no bit
    val ah = Multimodal.sampleAudioHashesPartitioned(clips, "doc_id", "wav")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    (0 until 4).foreach(w => assert(ah((1L, w)) == ah((2L, w)),
      s"volume rescale flipped window $w"))
    assert(ah((1L, 0)) != ah((4L, 0)), "distinct patterns collided")
    // exact copy pairs at 1.0; padded copy at 4/6; unrelated absent
    val pairs = Multimodal.audioPerceptualPairs(clips, "doc_id", "wav",
        jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1000) / 1000)).toSet
    assert(pairs == Set((1L, 2L, 1.0), (1L, 3L, 0.667), (2L, 3L, 0.667)),
      s"got $pairs")
    assert(Multimodal.audioPerceptualPairs(clips, "doc_id", "wav",
      jaccardThreshold = 0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((1L, 2L)))
  }

  test("fuzzyPairs: planted typo found, prefix-block miss documented, skew guard") {
    val df = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brawn fox jumps"),   // 1 substitution past the prefix → pair
      (3L, "Xhe quick brown fox jumps"),   // first-char edit → different block → MISS
      (4L, "completely different text here"),
      (5L, "the quick brown fox jum")      // 2 deletions from (1) → pair
    ).toDF("doc_id", "title")
    val got = Dedup.fuzzyPairs(df, "doc_id", "title", maxDist = 3, prefixLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1), (1L, 5L, 2), (2L, 5L, 3)),
      s"unexpected pair set: $got") // (3) missed by design: the recall contract
    // skew guard: a degenerate block larger than maxBlock yields NO pairs
    val boiler = (1 to 10).map(i => (i.toLong, s"prefix00 tail $i")).toDF("doc_id", "title")
    assert(Dedup.fuzzyPairs(boiler, "doc_id", "title",
      maxDist = 3, prefixLen = 8, maxBlock = 4).count() == 0)
    // under the cap the same block pairs normally
    assert(Dedup.fuzzyPairs(boiler, "doc_id", "title",
      maxDist = 3, prefixLen = 8, maxBlock = 64).count() > 0)
    intercept[IllegalArgumentException] {
      Dedup.fuzzyPairs(df, "doc_id", "title", maxDist = 0)
    }
  }

  test("hashedLinearScore: partition-invariant, exact-sum, loud guards") {
    val df = Seq((1L, "the quick brown fox"), (2L, "lazy dog"), (3L, "the the the"))
      .toDF("doc_id", "text")
    val w = TextOps.syntheticWeights(64)
    def run(d: org.apache.spark.sql.DataFrame) =
      TextOps.hashedLinearScore(d, "doc_id", "text", w, scale = 1997L, dim = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val a = run(df)
    // scores are deterministic under repartitioning (exact integer sum —
    // no fp fold order) and bounded in [-0.5, 0.5)
    assert(a == run(df.repartition(7)))
    assert(a.forall(t => t._3 >= -0.5 && t._3 < 0.5))
    assert(a.map(_._2) == Seq(4L, 2L, 3L)) // token counts
    // identical token multiset ⇒ identical score regardless of doc
    val same = Seq((10L, "dog lazy"), (11L, "lazy dog")).toDF("doc_id", "text")
    val s2 = run(same)
    assert(s2(0)._3 == s2(1)._3)
    intercept[IllegalArgumentException] {
      TextOps.hashedLinearScore(df, "doc_id", "text", w, scale = 1997L, dim = 128)
    }
    intercept[IllegalArgumentException] {
      TextOps.hashedLinearScore(df, "doc_id", "text", w, scale = 0L, dim = 64)
    }
  }

  test("chunk: windows advance by stride, trailing short, short docs one chunk") {
    val df = Seq((1L, "a b c d e"), (2L, "x"), (3L, "a b c d")).toDF("doc_id", "text")
    val got = TextOps.chunk(df, "doc_id", "text", chunkSize = 3, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (1L, 0L, 3L, "a b c"), (1L, 1L, 3L, "c d e"),       // stride 2, full cover
      (2L, 0L, 1L, "x"),                                  // short doc: one chunk
      (3L, 0L, 3L, "a b c"), (3L, 1L, 2L, "c d")))        // trailing chunk short
    intercept[IllegalArgumentException] {
      TextOps.chunk(df, "doc_id", "text", chunkSize = 2, overlap = 2)
    }
  }

  test("bpe: training learns the classic merge sequence; apply tokenizes with it") {
    // the Sennrich et al. corpus {low×5, lower×2, newest×6, widest×3};
    // expected sequence hand-computed under OUR deterministic tie-break
    // (cnt desc, then (l, r) lexicographic): es 9, est 9, est</w> 9,
    // lo 7, low 7, then the three-way cnt-6 tie (e,w)/(n,e)/(w,est</w>)
    // resolves to (e, w)
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = TextOps.bpeTrain(docs, "text", 6)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w")), s"merge sequence: $merges")
    // tokenize with the learned model: newest → [n, ew, est</w>],
    // widest → [w, i, d, est</w>], low → [low, </w>] (low</w> was
    // never merged — its count 5 lost the round-6 tie)
    val toks = TextOps.bpeWordTokens(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    assert(toks(7L) == Seq("n", "ew", "est</w>"))
    assert(toks(13L) == Seq("w", "i", "d", "est</w>"))
    assert(toks(0L) == Seq("low", "</w>"))
    assert(toks(5L) == Seq("low", "e", "r", "</w>"))
    // the repeat-run merge: 'aaaa' under (a,a) merges BOTH pairs (the
    // doubled-separator invariant; a shared-boundary representation
    // would merge only alternate pairs)
    val rep = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val rt = TextOps.bpeWordTokens(rep, "doc_id", "text", Seq(("a", "a")))
      .collect().map(_.getSeq[String](1)).toSet
    assert(rt == Set(Seq("aa", "aa", "</w>"), Seq("aa", "a", "</w>")), s"got $rt")
    // per-doc counts: each fired merge shrinks n_tokens by one
    val c7 = TextOps.bpeApply(docs.filter(col("doc_id") === 7), "doc_id", "text", merges)
      .first()
    assert((c7.getLong(1), c7.getLong(2)) == ((1L, 3L)))
    // '|' is the separator — sanitized to a space before tokenizing
    val pipe = Seq((1L, "ab|ab")).toDF("doc_id", "text")
    val pt = TextOps.bpeWordTokens(pipe, "doc_id", "text", Seq(("a", "b")))
      .collect().map(_.getSeq[String](1)).toSeq
    assert(pt == Seq(Seq("ab", "</w>"), Seq("ab", "</w>")), s"got $pt")
    // early stop: minCount prunes the long tail
    val tiny = Seq((1L, "xy")).toDF("doc_id", "text")
    assert(TextOps.bpeTrain(tiny, "text", 5, minCount = 2).count() == 0L)
  }

  test("bpe encode: ids in document order, UNK = -1, vocab ranked by frequency") {
    val docs = Seq((1L, "low low slow"), (2L, "low")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"))
    val vocab = TextOps.bpeVocab(docs, "text", merges)
    val v = vocab.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._2)
    // 'low' fully merges to one token low</w> (freq 3); 'slow' merges
    // its tail too: [s, low</w>] — so the vocab is low</w> (cnt 4) then s
    assert(v == Seq(("low</w>", 0L, 4L), ("s", 1L, 1L)), s"vocab: $v")
    val enc = TextOps.bpeEncode(docs, "doc_id", "text", merges, vocab)
      .collect().map(r => (r.getLong(0), (r.getSeq[Long](1), r.getLong(2)))).toMap
    // document order: low low s·low</w> → 0 0 1 0
    assert(enc(1L) == ((Seq(0L, 0L, 1L, 0L), 4L)), s"doc1: ${enc(1L)}")
    assert(enc(2L) == ((Seq(0L), 1L)), s"doc2: ${enc(2L)}")
    // unseen tokens encode as -1 (UNK), never a silent drop
    val unk = TextOps.bpeEncode(Seq((9L, "zz")).toDF("doc_id", "text"),
        "doc_id", "text", merges, vocab)
      .collect().map(r => r.getSeq[Long](1)).head
    assert(unk == Seq(-1L, -1L, -1L), s"unk: $unk")
  }

  test("perceptron: separates a planted corpus; trained table deploys through classify") {
    // planted separable corpus: good docs use one vocabulary, bad
    // another (distinct md5 buckets with overwhelming probability)
    val good = Seq("alpha beta gamma", "beta gamma alpha", "gamma alpha beta")
    val bad = Seq("omega psi chi", "psi chi omega", "chi omega psi")
    val docs = (good.map((_, true)) ++ bad.map((_, false))).zipWithIndex
      .map { case ((t, l), i) => (i.toLong, t, l) }.toDF("doc_id", "text", "lbl")
    val w = TextOps.perceptronTrain(docs, "doc_id", "text", "lbl",
      dim = 64, epochs = 5, scale = 1997L)
    assert(w.count() == 64L)
    // deploy: the trained table drives the SAME scorer the classify
    // verb uses — every good doc must outscore every bad one, and the
    // sign convention must hold (good > 0 > bad: weights above/below
    // the scale/2 center)
    val arr = new Array[Long](64)
    w.collect().foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    val scored = TextOps.hashedLinearScore(docs, "doc_id", "text", arr, 1997L, 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val (gs, bs) = (good.indices.map(i => scored(i.toLong)),
                    bad.indices.map(i => scored((i + 3).toLong)))
    assert(gs.min > bs.max, s"not separated: good=$gs bad=$bs")
    assert(gs.forall(_ > 0) && bs.forall(_ < 0), s"sign drifted: good=$gs bad=$bs")
    // epoch-1-from-zero law: the update is the label-weighted bucket
    // census on the grid (the q176 oracle's closed form)
    val e1 = TextOps.perceptronTrain(docs, "doc_id", "text", "lbl",
        dim = 64, epochs = 1, scale = 1997L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val census = docs.select(col("doc_id"),
        when(col("lbl"), 1L).otherwise(-1L).as("y"),
        explode(graft.llm.Dedup.tokens(col("text"))).as("tok"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("tok")), 1, 6), 16, 10).cast("long"), lit(64)))
      .groupBy("bucket").agg(sum(col("y")).as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (0 until 64).foreach { b =>
      val want = math.max(0L, math.min(1996L, 998L + census.getOrElse(b.toLong, 0L)))
      assert(e1(b.toLong) == want, s"bucket $b: ${e1(b.toLong)} != $want")
    }
  }

  test("incremental semantic dedup: probe → filter → append closes the ingest loop") {
    val vecs = marginFixture(43)
    val df = vecs.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_semidx").toString + "/idx"
    Similarity.writeIvfIndex(df, path, nLists = 4, iters = 2)
    // a batch of EXACT copies under shifted ids: every one is a semantic
    // dup of its original at cosine exactly 1.0
    val copies = df.filter(col("vec_id") < 6)
      .withColumn("vec_id", col("vec_id") + lit(1000L))
    val hits = Similarity.semDedupProbe(spark, path, copies, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._2).toSeq
    assert(hits == (0 until 6).map(i => (i.toLong, i + 1000L, 1.0)),
      s"hits: $hits")
    // the organic (isotropic) fixture bulk never reaches τ against a
    // DISJOINT probe half — rotate ids so no probe equals its own copy
    val organic = df.filter(col("vec_id") >= 6 && col("vec_id") < 12)
      .withColumn("vec_id", col("vec_id") + lit(2000L))
      .withColumn("embedding", reverse(col("embedding"))) // decorrelate
    assert(Similarity.semDedupProbe(spark, path, organic, tau = 0.99)
      .count() == 0)
    // ingest loop: append the survivors; a re-send of them now HITS
    Similarity.appendToIvfIndex(organic, path)
    val resend = organic.withColumn("vec_id", col("vec_id") + lit(3000L))
    val second = Similarity.semDedupProbe(spark, path, resend, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(second == (6 until 12).map(i => (i + 2000L, i + 5000L)),
      s"second: $second")
    // SAME-ID re-delivery (an at-least-once source re-sending a row
    // verbatim) must still flag the duplicate — the kNN self-pair
    // filter does not apply to the DEDUP face (r14 review finding)
    val verbatim = df.filter(col("vec_id") < 3)
    val selfHits = Similarity.semDedupProbe(spark, path, verbatim, tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(selfHits == (0 until 3).map(i => (i.toLong, i.toLong, 1.0)),
      s"same-id re-delivery not flagged: $selfHits")
  }

  test("persisted IVF index: probe equals the train-per-call answer exactly") {
    val vecs = marginFixture(41)
    val df = vecs.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
    Similarity.writeIvfIndex(df, s"$path/idx", nLists = 4, iters = 2)
    // stored model == retrained model (deterministic training)
    val stored = Similarity.readIvfCentroids(s"$path/idx")
    val fresh = Similarity.trainCentroids(df, nLists = 4, iters = 2)
    assert(stored.map(_.toSeq).toSeq == fresh.map(_.toSeq).toSeq)
    val qs = df.filter(col("vec_id") < 4)
    val indexed = Similarity.ivfTopKIndexed(spark, s"$path/idx", qs, 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    val direct = Similarity.ivfTopK(qs, df, 5, nLists = 4, nProbe = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(indexed == direct, "stored-layout probe diverged from train-per-call")
    intercept[IllegalArgumentException] {
      Similarity.readIvfCentroids(s"$path/nowhere")
    }
    // incremental maintenance: a new EXACT copy appended to the stored
    // index must assign to its original's list (pure function of the
    // vector) and surface at similarity 1.0 on the next probe
    val copy = Seq((900L, vecs.find(_._1 == 0L).get._2)).toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(copy, s"$path/idx")
    val again = Similarity.ivfTopKIndexed(spark, s"$path/idx",
        df.filter(col("vec_id") === 0L), 1, nProbe = 1)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(again.toSeq == Seq((900L, 1.0)),
      s"appended replica not found by the stored index: ${again.toSeq}")
  }

  test("index re-train publishes a new version atomically (_CURRENT swap)") {
    val vecs = marginFixture(43)
    val df = vecs.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_ivfver").toString
    Similarity.writeIvfIndex(df, s"$path/idx", nLists = 4, iters = 1)
    assert(graft.io.Folio.currentVersion(s"$path/idx").contains("v00000001"))
    // a RE-TRAIN (different nLists) lands as v2 — readers resolve through
    // _CURRENT, so model+data always come from ONE immutable version and
    // a crash mid-rewrite would have left v1 live and intact
    Similarity.writeIvfIndex(df, s"$path/idx", nLists = 2, iters = 1)
    assert(graft.io.Folio.currentVersion(s"$path/idx").contains("v00000002"))
    assert(Similarity.readIvfCentroids(s"$path/idx").length == 2)
    assert(new java.io.File(s"$path/idx/v00000002/lists").isDirectory)
    val qs = df.filter(col("vec_id") === 0L)
    val got = Similarity.ivfTopKIndexed(spark, s"$path/idx", qs, 1, nProbe = 2)
      .collect()
    assert(got.nonEmpty, "probe against the re-trained live version failed")
  }

  test("fp16 IVF index: smallint lists, replica exact at 1.0, append matches tier") {
    val vecs = marginFixture(59)
    val df = vecs.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_ivffp16").toString
    Similarity.writeIvfIndex(df, s"$path/idx", nLists = 4, halfPrecision = true)
    // the tier is the schema: stored lists are array<smallint>
    val stored = spark.read.parquet(
      s"${Similarity.indexRoot(s"$path/idx")}/lists")
    assert(stored.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ShortType, containsNull = true))
    // append detects and matches the stored tier (float batch packs)
    val copy = Seq((900L, vecs.find(_._1 == 0L).get._2)).toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(copy, s"$path/idx")
    val got = Similarity.ivfTopKIndexed(spark, s"$path/idx",
        df.filter(col("vec_id") === 0L), 1, nProbe = 1)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((900L, 1.0)),
      s"fp16-tier replica not exact: ${got.toSeq}")
  }

  test("in-flight probe survives a concurrent re-train (fallback version retained)") {
    val vecs = marginFixture(61)
    val df = vecs.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_ivfconc").toString
    Similarity.writeIvfIndex(df, s"$path/idx", nLists = 4)
    // a LAZY probe plan resolved against v1 (single root resolution)
    val probe = Similarity.ivfTopKIndexed(spark, s"$path/idx",
      df.filter(col("vec_id") === 0L), 1, nProbe = 2)
    // re-train publishes v2 while the probe is in flight; v1 is RETAINED
    // as the crash fallback, so the resolved plan still reads real files
    Similarity.writeIvfIndex(df, s"$path/idx", nLists = 2)
    assert(graft.io.Folio.versions(s"$path/idx") ==
      Seq("v00000001", "v00000002"))
    assert(probe.collect().nonEmpty,
      "probe resolved before the republish must still execute")
  }

  test("persisted PQ index: codes-only probe equals the train-per-call answer") {
    val vecs = marginFixture(47)
    val df = vecs.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_pqidx").toString
    Similarity.writePqIndex(df, s"$path/idx", m = 4, ksub = 8, iters = 2)
    val stored = Similarity.readPqCodebooks(s"$path/idx")
    val fresh = Similarity.trainPQ(df, m = 4, ksub = 8, iters = 2)
    assert(stored.map(_.map(_.toSeq).toSeq).toSeq ==
           fresh.map(_.map(_.toSeq).toSeq).toSeq)
    val qs = df.filter(col("vec_id") < 4)
    def key(df2: org.apache.spark.sql.DataFrame) = df2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    val indexed = key(Similarity.pqTopKIndexed(spark, s"$path/idx", qs, df, 5))
    val direct = key(Similarity.pqTopK(qs, df, 5, m = 4, ksub = 8, iters = 2))
    assert(indexed == direct, "stored-codes probe diverged from train-per-call")
    intercept[IllegalArgumentException] {
      Similarity.readPqCodebooks(s"$path/nowhere")
    }
  }

  test("persisted IVF-PQ index: pruned+coded probe equals the train-per-call answer") {
    val vecs = marginFixture(53)
    val df = vecs.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpqidx").toString
    Similarity.writeIvfPqIndex(df, s"$path/idx", nLists = 4, m = 4, ksub = 8,
      iters = 2)
    val qs = df.filter(col("vec_id") < 4)
    def key(df2: org.apache.spark.sql.DataFrame) = df2.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    val indexed = key(Similarity.ivfPqTopKIndexed(spark, s"$path/idx", qs, df,
      5, nProbe = 2))
    val direct = key(Similarity.ivfPqTopK(qs, df, 5, nLists = 4, nProbe = 2,
      m = 4, ksub = 8, iters = 2))
    assert(indexed == direct, "on-disk IVF-PQ probe diverged from train-per-call")
  }

  test("NULL-text docs: empty fingerprint (no [null] phantom), null-vec rows drop from topK") {
    // NULL text: the empty-string clamp alone misses it (length(null)===0
    // is NULL, and greatest(null, 0) IGNORES the null) — every null-text
    // doc would share the phantom fingerprint [null] and pair with each
    // other, the exact trap the clamp closes for ""
    val edge = Seq((0L, null: String), (1L, null: String), (2L, "a real document"))
      .toDF("doc_id", "text")
    val fps = TextOps.fingerprint(edge, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(0L).isEmpty && fps(1L).isEmpty,
      s"null-text docs must fingerprint to NO grams: $fps")
    // null-vec rows drop on both sides of the exact scan, matching the
    // LSH/IVF faces — a null query must not emit k fabricated rows
    // ranked by cand_id with sim = null
    val vecs = Seq(
      (0L, null: Seq[Float]),
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(vecs, vecs, 2)
    assert(got.filter(col("q_id") === 0L).count() == 0,
      "null-vec query fabricated top-k rows")
    assert(got.filter(col("cand_id") === 0L).count() == 0,
      "null-vec candidate surfaced in someone's top-k")
    assert(got.filter(col("q_id") === 1L).count() == 2)
  }

  test("int8 quantization fails fast on ±Inf (silent all-NaN reconstruction otherwise)") {
    // scale = Inf: every finite element quantizes to 0 and dequantize
    // reconstructs 0·Inf = NaN across the whole vector — same poisoning
    // class as NaN, must be equally loud
    val df = Seq((0L, Seq(1.0f, Float.PositiveInfinity))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.quantizeInt8(df).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("non-finite"),
      s"got: ${e.getMessage}")
  }

  test("fingerprint survives small edits (winnowing overlap)") {
    val fp = TextOps.fingerprint(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val overlap01 = (fp(0L) & fp(1L)).size.toDouble / fp(0L).size
    val overlap02 = (fp(0L) & fp(2L)).size.toDouble / fp(0L).size
    assert(fp(0L) == fp(3L))          // identical text → identical sketch
    assert(overlap01 > 0.5)           // near-dup → high overlap
    assert(overlap02 < 0.2)           // unrelated → low overlap
  }

  test("empty/short docs: zero tokens, simhash 0, empty/whole-text fingerprints") {
    val edge = Seq((0L, ""), (1L, "   "), (2L, "hi"), (3L, "a real document here"))
      .toDF("doc_id", "text")
    // tokens: [""]-free — empty docs produce ZERO tokens
    val tok = edge.select(col("doc_id"), size(Dedup.tokens(col("text"))).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(tok(0L) == 0 && tok(1L) == 0 && tok(2L) == 1 && tok(3L) == 4)
    // simhash: the documented 'empty docs get signature 0' now holds —
    // two empty docs must NOT form a hamming-0 pair via a phantom token
    val sigs = Dedup.simhash(edge, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == 0L && sigs(1L) == 0L, s"empty-doc simhash: $sigs")
    assert(sigs(3L) != 0L)
    // fingerprint: empty → no grams; shorter-than-k → one whole-text gram
    val fps = TextOps.fingerprint(edge, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(0L).isEmpty && fps(1L).isEmpty, s"empty-doc fingerprint: $fps")
    assert(fps(2L).length == 1)
    // the unigram census sees no phantom "" token
    val census = TextOps.unigramCensus(edge, "doc_id", "text")
    assert(census.filter(col("tok") === "").count() == 0)
  }

  test("hamming blocking refuses maxHamming > 3 (pigeonhole recall bound)") {
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 4)
    }
    assert(e.getMessage.contains("maxHamming <= 3"), e.getMessage)
  }

  test("keepBestPerCluster is id-type-agnostic: string ids elect winners too") {
    val all = Seq(("d0", 10.0), ("d1", 50.0), ("d2", 30.0), ("d9", 1.0))
      .toDF("doc_id", "score")
    val pairs = Seq(("d0", "d1"), ("d1", "d2")).toDF("id_a", "id_b")
    val won = Dedup.keepBestPerCluster(all, "doc_id", "score", pairs)
      .select("doc_id", "n_members").as[(String, Long)].collect().toSet
    assert(won == Set(("d1", 3L), ("d9", 1L)),
      s"string-id clusters must elect the max-score winner, got $won")
  }

  test("IVF/PQ training accepts non-Long id columns (int ids)") {
    val vecs = (0 until 40).map(i =>
      (i, Array.tabulate(8)(d => if (d == i % 4) 1.0 else 0.01 * i)))
      .toDF("vec_id", "embedding")
    // int vec_id: the seed sort must not getLong-crash; probe answers
    val got = Similarity.ivfTopK(vecs.limit(2), vecs, k = 1,
      nLists = 4, nProbe = 4)
    assert(got.count() == 2)
    val books = Similarity.trainPQ(vecs, m = 2, ksub = 4)
    assert(books.length == 2 && books(0).length == 4)
  }

  test("audio decode refuses non-16-bit-LE-PCM WAVs loudly") {
    // an 8-bit PCM WAV: decodes fine in javax.sound but would pair
    // bytes wrongly in the 16-bit loop — must be loud, not garbage
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val samples = Array.tabulate[Byte](800)(i => (128 + 100 * math.sin(i / 10.0)).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, samples.length),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val e = intercept[IllegalArgumentException] {
      Multimodal.WavCodec().decode(bos.toByteArray)
    }
    assert(e.getMessage.contains("16-bit little-endian"), e.getMessage)
  }

  test("aHashSignatures refuses a features column from a different codec layout") {
    val blobs = Seq((1L, "x".getBytes("UTF-8"))).toDF("doc_id", "data")
    val decoded = Multimodal.decodeBinaryPartitioned(
      blobs.withColumn("__blob", col("data")), "doc_id", "__blob",
      LlmOpsSpec.LenCodec(2)) // 2 features ≠ 2 + 3·64
    val e = intercept[IllegalArgumentException] {
      Multimodal.aHashSignatures(decoded).collect()
    }
    assert(e.getMessage.contains("feature layout"), e.getMessage)
  }
}
