package graft.tools

import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** Scratch profiler for stage-level timing (not part of the library API). */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    docs.count() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }

    import graft.llm.Dedup
    time("tokens") {
      docs.select(Dedup.tokens(col("text")).as("t")).agg(sum(size(col("t")))).count()
    }
    time("shingles") {
      docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), Dedup.shinglesFromTokens(col("__toks"), 3).as("sh"))
        .agg(sum(size(col("sh")))).count()
    }
    time("shingleHashes+distinct") {
      docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), Dedup.shinglesFromTokens(col("__toks"), 3).as("sh"))
        .select(col("doc_id"), array_distinct(Dedup.shingleHashes(col("sh"))).as("shh"))
        .agg(sum(size(col("shh")))).count()
    }
    val shhFrame = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), Dedup.shinglesFromTokens(col("__toks"), 3).as("sh"))
      .select(col("doc_id"), Dedup.shingleHashes(col("sh")).as("shh"))
    time("explode-count-only") {
      shhFrame.select(explode(col("shh")).as("s")).count()
    }
    time("explode+groupBy") {
      shhFrame.select(explode(col("shh")).as("s")).groupBy(col("s")).count().count()
    }
    time("staged explode+groupBy") {
      val staged = shhFrame.persist()
      val n = staged.select(explode(col("shh")).as("s")).groupBy(col("s")).count().count()
      staged.unpersist(); n
    }
    time("explode-from-longs") {
      val longs = shhFrame.select(col("doc_id"), col("shh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      longs.count()
      val n = longs.select(explode(col("shh")).as("s")).groupBy(col("s")).count().count()
      longs.unpersist(); n
    }
    time("chain-noop-write") {
      shhFrame.write.format("noop").mode("overwrite").save(); 0L
    }
    time("explode-noop-write") {
      shhFrame.select(explode(col("shh")).as("s")).write.format("noop").mode("overwrite").save(); 0L
    }
    println("==== explain of explode-count-only ====")
    println(shhFrame.select(explode(col("shh")).as("s")).queryExecution.executedPlan.toString.take(4000))
    time("minhash-sign") {
      docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), Dedup.shinglesFromTokens(col("__toks"), 3).as("sh"))
        .select(col("doc_id"), array_distinct(Dedup.shingleHashes(col("sh"))).as("shh"))
        .select(col("doc_id"), Dedup.minhashSignature(col("shh"), 32).as("sig"))
        .agg(sum(size(col("sig")))).count()
    }
    spark.stop()
  }
}
