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
