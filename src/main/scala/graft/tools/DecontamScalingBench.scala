package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what the bloom prefilter in [[graft.llm.Pipeline.decontaminate]]
  * actually buys at scale — and proves, on the big fixture, that it buys
  * it WITHOUT changing the answer.
  *
  * Fixture: the [[DedupScalingBench]] replica-mangling trick scales the
  * sf corpus 10× with disjoint shingle sets per replica (workload shape
  * preserved, no accidental cross-replica contamination), and the
  * benchmark is every doc with id % 5 == 0 — a LARGE eval set (20% of
  * docs), the regime the bloom path exists for (a small benchmark is
  * [[graft.llm.Pipeline.contamination]]'s broadcast-set territory).
  *
  * Arms, identical output contract (the clean corpus id set):
  *  - `bloom`: the production path — distributed BloomFilterAggregate,
  *    map-side mightContain prefilter, exact semi-join confirm;
  *  - `nobloom`: the same exact semi-join with NO prefilter — every
  *    corpus shingle pays the confirm join.
  * The tool ASSERTS the two id sets are equal (exactness at scale, not
  * just on the 4-doc spec fixture), then prints one JSON line per arm
  * with rows / benchmark shingles / seconds, plus the prefilter's
  * survivor fraction — the number that scales to the 100 TB story: the
  * confirm join's input shrinks to ~(true hits + fpp · clean).
  *
  * Run: `sbt "runMain graft.tools.DecontamScalingBench [sfDir] [replicas]"`
  */
object DecontamScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = graft.Engine.session()
    val out = s"/tmp/graft_decontam_scaling/${spark.sparkContext.applicationId}"

    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    val scaled =
      if (replicas == 1) src.select(col("doc_id"), col("text"))
      else (0 until replicas).map { r =>
        src.select(
          (col("doc_id") * replicas + r).as("doc_id"),
          regexp_replace(col("text"), "(\\w+)", s"r${r}_$$1").as("text"))
      }.reduce(_ unionByName _)
    scaled.write.mode("overwrite").parquet(out)
    val corpus = spark.read.parquet(out)
    val benchmark = corpus.filter(col("doc_id") % 5 === 0)
    val nRows = corpus.count()

    def shingled(df: DataFrame): DataFrame = df.select(col("doc_id"),
      graft.functions.ShingleHashes.shingleHashes(
        graft.llm.Dedup.normText(col("text")), 3).as("__shh"))
    val bench = shingled(benchmark).select(explode(col("__shh")).as("s")).distinct()
    val nBench = bench.count()
    val corpShingles = shingled(corpus)
      .select(col("doc_id"), explode(col("__shh")).as("s"))
    val nCorpShingles = corpShingles.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // ----- bloom arm: the production operator ---------------------------
    val (bloomIds, bloomSec) = timed {
      graft.llm.Pipeline.decontaminate(corpus, benchmark, "doc_id", "text",
          n = 3, maxShared = 0, fpp = 0.01)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    println(s"""{"op":"decontam_bloom","rows":$nRows,"bench_shingles":$nBench,"clean":${bloomIds.size},"sec":${math.round(bloomSec * 10) / 10.0}}""")

    // ----- nobloom arm: identical confirm join, no prefilter ------------
    val (plainIds, plainSec) = timed {
      val contaminated = corpShingles
        .join(bench, Seq("s"), "left_semi")
        .select("doc_id").distinct()
      corpus.join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    println(s"""{"op":"decontam_nobloom","rows":$nRows,"bench_shingles":$nBench,"clean":${plainIds.size},"sec":${math.round(plainSec * 10) / 10.0}}""")

    require(bloomIds == plainIds,
      s"bloom and exact arms disagree: ${bloomIds.size} vs ${plainIds.size} clean docs")

    // ----- prefilter selectivity: the scale number ----------------------
    val nBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(math.max(nBench, 1L), 0.01)
    val agg = new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      org.apache.spark.sql.GraftColumnGlue.toCatalystExpr(col("s")),
      org.apache.spark.sql.catalyst.expressions.Literal(math.max(nBench, 1L)),
      org.apache.spark.sql.catalyst.expressions.Literal(nBits)).toAggregateExpression()
    val bytes = bench.select(org.apache.spark.sql.GraftColumnGlue.toColumn(agg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val mc = org.apache.spark.sql.GraftColumnGlue.toColumn(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(bytes,
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.GraftColumnGlue.toCatalystExpr(col("s"))))
    val survivors = corpShingles.filter(mc).count()
    println(s"""{"op":"decontam_prefilter","corp_shingles":$nCorpShingles,"survivors":$survivors,"bloom_kb":${bytes.length >> 10},"frac":${math.round(1000.0 * survivors / math.max(nCorpShingles, 1L)) / 1000.0}}""")

    spark.stop()
  }
}
