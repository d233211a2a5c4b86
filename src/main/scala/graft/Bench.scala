package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session()
    // untimed warmup: pays one-off session/codegen/JIT costs so per-query
    // numbers reflect steady state (first-run victim was +6s of warmup)
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    // optional comma-separated prefix filter for local iteration, e.g.
    // SPARK_GRAFT_ONLY=q29,q33 — driver runs unfiltered
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // a throwing query must NOT report as a fast success: its name lands
    // in "failures" (and on stderr) so a regression can't shrink the total
    val failures = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          failures += name
          System.err.println(s"BENCH FAILURE $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Keep the WHOLE line under the driver's 2000-char tail window
    // (BENCH_r06.json was truncated → parsed:null, q01–q27 invisible):
    // short keys (the qNN prefix is unique) + integer milliseconds.
    val qs = results.map { case (k, v) =>
      val short = k.takeWhile(_ != '_')
      s"\"" + short + "\":" + math.round(v * 1000)
    }.mkString("{", ",", "}")
    val fails = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${math.round(total * 1000) / 1000.0},"unit":"sec","qunit":"ms","queries":$qs,"failures":$fails,"sf":"$sfDir"}""")
    spark.stop()
  }
}
