package graft.tools
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    val dir = "/root/testdata/sf0.01"
    val docs = Tables.fanOut(Tables.documents(spark, dir))
    val (_, caches) = graft.llm.Dedup.minhashPairsPlan(docs, "doc_id", "text")
    val banded = caches(1)
    val plan = banded.queryExecution.optimizedPlan.toString
    val nSig = "array_min".r.findAllIn(plan).length
    println(s"PLANCHECK array_min occurrences in banded plan: $nSig (32 = staged once, 256 = inlined per band)")
    caches.foreach(_.unpersist())
    spark.stop()
  }
}
