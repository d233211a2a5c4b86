package graft.tools

import org.apache.spark.sql.functions._

/** BPE cost curves over corpus size — the claim behind
  * [[graft.llm.TextOps.bpeTrain]]/[[graft.llm.TextOps.bpeApply]]:
  * training touches the corpus ONCE (the distinct-word census); every
  * merge round then works on the VOCAB-bounded table, so growing the
  * corpus 100× should grow train time only through that single census
  * pass while the per-round cost stays flat; apply is map-only
  * scan-speed. The vocabulary is held constant across sizes (the
  * production shape: corpora grow, vocabularies don't). Run:
  * `sbt "runMain graft.tools.BpeScalingBench"`. */
object BpeScalingBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session()

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val words = Seq("spark", "sparse", "parse", "park", "shark",
      "scala", "table", "stable", "label", "cable")
    def corpus(n: Int) = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(j =>
        element_at(typedLit(words),
          (pmod(col("id") * 31 + j * 7, lit(10)) + 1).cast("int"))): _*).as("text"))

    // train once on a slice for the fixed apply model (the deploy split)
    val merges = graft.llm.TextOps.bpeTrain(corpus(1000), "text", 8)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq

    println("docs,census_sec,train8_sec,apply8_sec")
    for (n <- Seq(10000, 100000, 1000000)) {
      val c = corpus(n)
      val tCensus = timeIt(graft.llm.TextOps.bpeWordCensus(c, "text").count())
      val tTrain = timeIt(graft.llm.TextOps.bpeTrain(c, "text", 8).count())
      val tApply = timeIt(graft.llm.TextOps.bpeApply(c, "doc_id", "text", merges)
        .agg(sum(col("n_tokens"))).first())
      println(s"$n,$tCensus,$tTrain,$tApply")
    }
    spark.stop()
  }
}
