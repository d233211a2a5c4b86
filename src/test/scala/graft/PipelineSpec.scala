package graft

import org.apache.spark.sql.functions._
import graft.llm.Pipeline

/** Corpus-pipeline operators: redaction, sampling, packing, contamination. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val init: Unit =
    Tables.documents(spark, sf).createOrReplaceTempView("graft_docs")

  test("redactPii scrubs emails, IPs, and phones; clean text untouched") {
    val df = Seq(
      "mail me at jane.doe+x@sub.example.co.uk today",
      "server 10.0.255.3 then call +44-20 7946 0958 now",
      "no pii here at all").toDF("t")
    val got = df.select(Pipeline.redactPii(col("t"))).as[String].collect()
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "server <IP> then call <PHONE> now")
    assert(got(2) == "no pii here at all")
  }

  test("hashSample is deterministic, repartition-invariant, and ~rate-sized") {
    val docs = Tables.documents(spark, sf)
    val key = concat(col("doc_id").cast("string"), lit(":"), col("source"))
    val a = Pipeline.hashSample(docs, key, "29").select("doc_id").as[Long].collect().toSet
    val b = Pipeline.hashSample(docs.repartition(7), key, "29")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    val n = docs.count().toDouble
    assert(a.size > n * 0.08 && a.size < n * 0.25, s"~16% expected, got ${a.size}/$n")
  }

  test("hashSample/stratifiedSample reject non-lowercase-hex ceilings loudly") {
    // md5() emits lowercase hex; 'C0' compared lexicographically against it
    // silently skewed the rate to ~0 — the API must be as strict as the
    // dialect's sample verb
    val docs = Tables.documents(spark, sf)
    val key = col("doc_id").cast("string")
    intercept[IllegalArgumentException] { Pipeline.hashSample(docs, key, "C0") }
    intercept[IllegalArgumentException] { Pipeline.hashSample(docs, key, "0x") }
    intercept[IllegalArgumentException] { Pipeline.hashSample(docs, key, "") }
    intercept[IllegalArgumentException] {
      Pipeline.stratifiedSample(docs, col("lang"), key, Seq("en" -> "10", "de" -> "G"))
    }
    // lowercase hex still passes through unchanged
    assert(Pipeline.hashSample(docs, key, "29").count() > 0)
  }

  test("packChunks: chunk = start-offset window; per-stream independent") {
    // tokens: 3, 4, 2, 5 → starts 0, 3, 7, 9 → ctx=5 chunks 0, 0, 1, 1
    val docs = Seq(
      ("s1", 1L, "a b c"), ("s1", 2L, "d e f g"), ("s1", 3L, "h i"),
      ("s1", 4L, "j k l m n"), ("s2", 1L, "x y z")
    ).toDF("source", "doc_id", "text")
    val got = Pipeline.packChunks(docs, "source", "doc_id", "text", 5)
      .select("source", "doc_id", "chunk_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("s1", 1L, 0L), ("s1", 2L, 0L), ("s1", 3L, 1L),
                      ("s1", 4L, 1L), ("s2", 1L, 0L)))
  }

  test("graft SQL surface: registered macros plan the same expression as the Column API") {
    init
    // Engine.session registers these for every session
    val r = spark.sql(
      "SELECT graft_redact_pii('mail a@b.co or 1.2.3.4') AS red, " +
      "       graft_token_count('a b  c') AS n, " +
      "       graft_norm_text('  A  B ') AS t, " +
      "       graft_hamming(7, 1) AS h, " +
      "       graft_cosine(array(1.0, 0.0), array(0.0, 1.0)) AS cos").collect()(0)
    assert(r.getString(0) == "mail <EMAIL> or <IP>")
    assert(r.getLong(1) == 3L)
    assert(r.getString(2) == "a b")
    assert(r.getInt(3) == 2) // bit_count yields int
    assert(r.getDouble(4) == 0.0)
    // macro == Column API: identical results on real data
    val viaSql = spark.sql("SELECT md5(graft_clean_text(text)) AS m FROM graft_docs ORDER BY m")
    val viaCol = Tables.documents(spark, sf)
      .select(md5(graft.llm.TextOps.cleanText(col("text"))).as("m")).orderBy("m")
    assert(viaSql.collect().toSeq == viaCol.collect().toSeq)
    // the native dedup map stage from plain SQL: shingle → sign, same
    // trees as the Column API (width must be a literal)
    val sqlSig = spark.sql(
      "SELECT graft_minhash_signature(graft_shingle_hashes(" +
      "graft_norm_text(text), 3), 16) AS sig FROM graft_docs ORDER BY md5(CAST(sig AS STRING))")
    val colSig = Tables.documents(spark, sf).select(
        graft.llm.Dedup.minhashSignature(graft.functions.ShingleHashes.shingleHashes(
          graft.llm.Dedup.normText(col("text")), 3), 16).as("sig"))
      .orderBy(md5(col("sig").cast("string")))
    assert(sqlSig.collect().map(_.getSeq[Long](0)).toSeq ==
           colSig.collect().map(_.getSeq[Long](0)).toSeq)
    val bad = intercept[Exception] {
      spark.sql("SELECT graft_minhash_signature(array(1L), length('xx')) AS s").collect()
    }
    assert(bad.getMessage.contains("literal integer"))
  }

  test("mixCorpora: reproducible weighted mixture, schema/collision guards") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    def mix(d: org.apache.spark.sql.DataFrame) = graft.llm.Pipeline.mixCorpora(
      Seq(("a", d.filter(col("doc_id") % 2 === 0), "80"),
          ("b", d.filter(col("doc_id") % 2 === 1), "40")),
      col("doc_id").cast("string"))
    val got = mix(docs).groupBy("mix_source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~50% / ~25% of each half; exact counts are engine-deterministic
    assert(got("a") > 0 && got("b") > 0 && got("a") > got("b"))
    // the mixture is partitioning-invariant (md5, not rand)
    val rep = mix(docs.repartition(13)).groupBy("mix_source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == got)
    // schema drift across sources is an error
    intercept[IllegalArgumentException] {
      graft.llm.Pipeline.mixCorpora(
        Seq(("a", docs, "80"), ("b", docs.drop("text"), "40")),
        col("doc_id").cast("string"))
    }
    // provenance-column collision is an error
    intercept[IllegalArgumentException] {
      graft.llm.Pipeline.mixCorpora(Seq(("a", docs, "80")),
        col("doc_id").cast("string"), sourceCol = "text")
    }
  }

  test("topTerms: exact counts, term tie-break") {
    val docs = Seq((1L, "b a a b c"), (2L, "z z y")).toDF("doc_id", "text")
    val got = graft.llm.TextOps.topTerms(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set((1L, 1L, "a", 2L), (1L, 2L, "b", 2L), // a before b on ties
                      (2L, 1L, "z", 2L), (2L, 2L, "y", 1L)))
  }

  test("decontaminate is EXACT and fpp-independent: bloom only prefilters") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta something else entirely here"), // shares a trigram
      (2L, "totally unrelated words with zero shared trigrams at all"),
      (3L, "another clean document nothing in common whatsoever today")
    ).toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") === 0)
    def clean(fpp: Double) = Pipeline.decontaminate(corpus, bench, "doc_id", "text",
        n = 3, maxShared = 0, fpp = fpp)
      .select("doc_id").as[Long].collect().toSet
    val tight = clean(0.01)
    // bench doc shares all its own shingles, doc 1 shares one trigram
    assert(tight == Set(2L, 3L))
    // a sloppy bloom (fpp=0.5 floods the confirm join) changes NOTHING:
    // exactness is join-confirmed, fpp only tunes prefilter selectivity
    assert(clean(0.5) == tight)
    // threshold: doc 1 shares few shingles — a loose maxShared readmits
    // it but never the benchmark doc itself
    val loose = Pipeline.decontaminate(corpus, bench, "doc_id", "text",
        n = 3, maxShared = 2, fpp = 0.01).select("doc_id").as[Long].collect().toSet
    assert(loose.contains(1L) && !loose.contains(0L))
    // a WILDLY wrong size hint (bloom sized for 1 item → saturated)
    // still yields the exact answer: the confirm join decides
    val hinted = Pipeline.decontaminate(corpus, bench, "doc_id", "text",
        n = 3, maxShared = 0, fpp = 0.01, expectedBenchItems = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(hinted == tight)
  }

  test("stratifiedSample: per-stratum rates, recipe-absent strata drop, invariant") {
    val docs = Tables.documents(spark, sf)
    val key = concat(col("doc_id").cast("string"), lit(":"), col("lang"))
    val rates = Seq("en" -> "10", "zh" -> "ff")
    val got = Pipeline.stratifiedSample(docs, col("lang"), key, rates)
    val langs = got.select("lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "zh")), s"non-recipe strata must drop: $langs")
    // each stratum is exactly its own hashSample cut
    val en = Pipeline.hashSample(docs.filter(col("lang") === "en"), key, "10")
      .select("doc_id").as[Long].collect().toSet
    assert(got.filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet == en)
    // zh at ceiling "ff" keeps ~all (md5 prefix < "ff" misses only "ff*")
    val zhAll = docs.filter(col("lang") === "zh").count()
    val zhKept = got.filter(col("lang") === "zh").count()
    assert(zhKept >= zhAll * 9 / 10)
    // partition-invariance (the q64 contract, stratified)
    val rep = Pipeline.stratifiedSample(docs.repartition(11), col("lang"), key, rates)
      .select("doc_id").as[Long].collect().toSet
    assert(rep == got.select("doc_id").as[Long].collect().toSet)
  }

  test("shardAssignment: deterministic, dense ranks, partition-invariant") {
    val docs = Tables.documents(spark, sf)
    val a = Pipeline.shardAssignment(docs, col("doc_id").cast("string"), 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // pure function of (key, salt): any input partitioning, same shards
    val b = Pipeline.shardAssignment(docs.repartition(13), col("doc_id").cast("string"), 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
    // every shard's positions are exactly 1..n (dense, no gaps or dups)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1 to rows.size).toSeq,
        s"shard $shard ranks not dense")
    }
    // a different salt reshuffles (not a degenerate constant mapping)
    val salted = Pipeline.shardAssignment(docs, col("doc_id").cast("string"), 8, salt = "other")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(salted != a)
  }

  test("writeShards: shard=k layout, files ordered by pos") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Pipeline.writeShards(docs, col("doc_id").cast("string"), 4, path)
    val back = spark.read.parquet(path)
    val expect = Pipeline.shardAssignment(docs, col("doc_id").cast("string"), 4)
    assert(back.count() == docs.count())
    // per-shard content equals the assignment (partitionBy dirs are real)
    val b3 = back.filter(col("shard") === 3).select("doc_id").as[Long].collect().toSet
    val e3 = expect.filter(col("shard") === 3).select("doc_id").as[Long].collect().toSet
    assert(b3 == e3 && b3.nonEmpty)
    // within a shard's files, rows ride in shuffle order (pos ascending
    // per file — the order a trainer streams)
    import org.apache.spark.sql.expressions.Window
    val disorder = back
      .withColumn("__f", input_file_name())
      .withColumn("__prev", lag(col("pos"), 1).over(
        Window.partitionBy(col("__f")).orderBy(monotonically_increasing_id())))
      .filter(col("__prev").isNotNull && col("__prev") >= col("pos"))
    assert(disorder.count() == 0, "file row order must follow pos")
  }

  test("temperatureThresholds: integer-safe T=2 recipe flattens size skew") {
    val t = Pipeline.temperatureThresholds(
      Seq("big" -> 10000L, "small" -> 100L), resolution = 4096L).toMap
    // keep rate ∝ 1/sqrt(n), rarest keeps all: big at 10%, small at 100%
    // → kept counts ~1000 vs 100 (10:1 mixture, not the raw 100:1)
    assert(t("small") == 4096L && t("big") == 4096L / 10)
    // degenerate guard: empty strata clamp, no divide-by-zero
    assert(Pipeline.temperatureThresholds(Seq("a" -> 0L)).toMap.apply("a") == 4096L)
    val docs = Tables.documents(spark, sf)
    val counts = docs.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val mixed = Pipeline.temperatureMix(docs, col("lang"),
      concat(col("doc_id").cast("string"), lit("#"), col("lang")),
      Pipeline.temperatureThresholds(counts))
    // rare langs keep a HIGHER fraction than common ones (the point of T)
    val kept = mixed.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val frac = counts.toMap.map { case (l, n) =>
      l -> kept.getOrElse(l, 0L).toDouble / n }
    val cm = counts.toMap
    val (rare, common) = (counts.minBy(_._2)._1, counts.maxBy(_._2)._1)
    assert(cm(common) > 2 * cm(rare), "fixture should be skewed")
    assert(frac(rare) > frac(common),
      s"temperature must favor rare strata: $frac")
    // resolution drift is LOUD: the draw is pinned to [0,4096), so
    // thresholds built at another resolution would silently warp every
    // keep rate (e.g. 65536-built thresholds keep 100% of everything)
    val e1 = intercept[IllegalArgumentException] {
      Pipeline.temperatureMix(docs, col("lang"), col("doc_id").cast("string"),
        Pipeline.temperatureThresholds(counts, resolution = 65536L))
    }
    assert(e1.getMessage.contains("outside"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Pipeline.temperatureMix(docs, col("lang"), col("doc_id").cast("string"),
        Seq("a" -> 1L), resolution = 1024L)
    }
    assert(e2.getMessage.contains("4096"), e2.getMessage)
  }

  test("packChunks refuses inputs already carrying n_tokens/chunk_id") {
    import spark.implicits._
    val withN = Seq(("s", 1L, "a b c", 3L)).toDF("st", "ord", "text", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      Pipeline.packChunks(withN, "st", "ord", "text", 4)
    }
    assert(e.getMessage.contains("n_tokens"), e.getMessage)
  }

  test("dropRepeatedSegments: shared spans cut, order kept, all-boilerplate docs drop") {
    // k=2 segments: doc 0/1 share 'aa bb' and 'cc dd'; doc 2 is doc 0
    // verbatim (every segment shared → drops); doc 3 is untouched
    val docs = Seq(
      (0L, "aa bb cc dd own1 tail1"),
      (1L, "aa bb cc dd own2 tail2"),
      (2L, "aa bb cc dd own1 tail1"),
      (3L, "uu vv ww xx yy zz")
    ).toDF("doc_id", "text")
    val got = Pipeline.dropRepeatedSegments(docs, "doc_id", "text",
        tokensPerSeg = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // docs 0 and 2 are identical → their OWN tails repeat too (2 docs)
    assert(!got.contains(0L) && !got.contains(2L),
      "verbatim replicas are fully boilerplate and must vanish")
    assert(got(1L) == "own2 tail2", "survivors reassemble in original order")
    assert(got(3L) == "uu vv ww xx yy zz", "unique docs pass through verbatim")
    // repartitioning must not change the result (determinism contract)
    val re = Pipeline.dropRepeatedSegments(docs.repartition(5), "doc_id", "text",
        tokensPerSeg = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re == got)
    // ragged tail: last segment shorter than k still round-trips
    val ragged = Seq((0L, "p q r"), (1L, "s t u")).toDF("doc_id", "text")
    val rg = Pipeline.dropRepeatedSegments(ragged, "doc_id", "text",
        tokensPerSeg = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rg == Map(0L -> "p q r", 1L -> "s t u"))
  }

  test("repeatedSegments: census counts DISTINCT docs, not occurrences") {
    // 'aa bb' twice inside doc 0 but only there → below minDocs=2
    val docs = Seq(
      (0L, "aa bb aa bb"),
      (1L, "cc dd mm nn"),
      (2L, "cc dd oo pp")
    ).toDF("doc_id", "text")
    val census = Pipeline.repeatedSegments(docs, "doc_id", "text",
        tokensPerSeg = 2, minDocs = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census == Map("cc dd" -> 2L),
      s"within-doc repeats must not count as corpus repeats: $census")
  }

  test("capPerStratum: absolute per-stratum ceiling, deterministic, invariant") {
    val docs = Tables.documents(spark, sf)
    val key = concat(col("doc_id").cast("string"), lit("|"), col("source"))
    val capped = Pipeline.capPerStratum(docs, col("source"), key, maxRows = 10)
    val bySrc = capped.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    bySrc.foreach { case (s, n) =>
      assert(n == math.min(10L, full(s)), s"source $s: kept $n of ${full(s)}")
    }
    assert(bySrc.keySet == full.keySet, "small strata must survive whole")
    val a = capped.select("doc_id").as[Long].collect().toSet
    val b = Pipeline.capPerStratum(docs.repartition(7), col("source"), key, 10)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "the cap membership must not depend on partitioning")
  }

  test("contamination: planted benchmark doc scores 1.0, clean docs absent") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta something else entirely here"), // partial overlap
      (2L, "totally unrelated words with zero shared trigrams at all")
    ).toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") === 0)
    val got = Pipeline.contamination(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(0L) == 1.0)
    assert(got.contains(1L) && got(1L) > 0 && got(1L) < 1.0)
    assert(!got.contains(2L)) // semi-join: clean docs don't appear
  }
}
