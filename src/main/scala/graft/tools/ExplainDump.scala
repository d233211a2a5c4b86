package graft.tools

import graft.{Engine, Queries, SparkEntry}

/** Dev tool: dump the executed physical plan of one query (after an
  * action, so AQE's final plan is shown). `runMain graft.tools.ExplainDump
  * <queryName> [sfDir]`. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_agg_pricing")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session()
    val df = Queries.all(name)(spark, dir)
    df.collect()
    // format "formatted" explain plus the adaptive executed plan
    df.explain("formatted")
    println("\n=== executedPlan (post-AQE) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
