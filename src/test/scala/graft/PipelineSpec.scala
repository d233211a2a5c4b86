package graft

import org.apache.spark.sql.functions._
import graft.llm.Pipeline

/** Corpus-pipeline operators: redaction, sampling, packing, contamination. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

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
