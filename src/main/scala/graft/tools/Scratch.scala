package graft.tools

import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** Throwaway profiling harness for local iteration (not part of the
  * library surface; driver never runs it). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCRATCH $name: ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    // stage 1: shingle hashes only
    val hashed = docs
      .select(col("doc_id"), graft.llm.Dedup.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), graft.llm.Dedup.shinglesFromTokens(col("__toks"), 3).as("sh"))
      .select(col("doc_id"), array_distinct(transform(col("sh"), s => xxhash64(s))).as("shh"))
    time("hashed")(hashed.count())
    time("avg_shh")(hashed.select(avg(size(col("shh")))).collect().map(r => { println(r); 1L }).sum)
    // stage 2: + signatures
    val sigs = hashed.select(col("doc_id"), graft.llm.Dedup.minhashSignature(col("shh"), 32).as("sig"))
    time("sigs")(sigs.count())
    // stage 3: banded
    val banded = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(7)),
        b => xxhash64(b, concat_ws(",", slice(col("sig"), b * 4 + 1, lit(4))))))
        .as(Seq("band_id", "band_hash")))
    time("banded")(banded.count())
    // candidate pairs
    val oversize = banded.groupBy(col("band_id"), col("band_hash"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 64)
    val bucketed = banded.join(broadcast(oversize.select("band_id", "band_hash")),
      Seq("band_id", "band_hash"), "left_anti")
    val a = bucketed.select(col("band_id"), col("band_hash"), col("doc_id").as("id_a"))
    val b = bucketed.select(col("band_id"), col("band_hash"), col("doc_id").as("id_b"))
    val cands = a.join(b, Seq("band_id", "band_hash")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    time("cands")(cands.count())
    // full pipeline
    time("full")(graft.llm.Dedup.minhashPairs(docs, "doc_id", "text", jaccardThreshold = 0.2).count())
    spark.stop()
  }
}
