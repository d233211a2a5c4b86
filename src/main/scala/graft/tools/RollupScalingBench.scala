package graft.tools

import org.apache.spark.sql.functions._

/** Rollup-folio cost curves — the claims behind
  * [[graft.io.Folio.appendWithRollup]]: an append costs the BATCH (its
  * write + one vocab-sized partial merged with the stored rollup —
  * never a rescan of the history), and the maintained-aggregate READ
  * is flat regardless of how much history the folio holds. The
  * contrast column recomputes the aggregate from all manifested rows —
  * the cost a rollup-less design pays per query. Run:
  * `sbt "runMain graft.tools.RollupScalingBench"`. */
object RollupScalingBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session()

    def timeIt(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def batch(n: Int, salt: Int) = spark.range(n)
      .select(concat(lit("k"), pmod(col("id") + salt, lit(64))).as("k"),
        (col("id") % 997).cast("double").as("v"))

    println("batch_rows,append_sec,rollup_read_sec,full_recompute_sec,history_rows")
    for (n <- Seq(10000, 100000, 1000000)) {
      val path = java.nio.file.Files
        .createTempDirectory(s"graft_rusb_$n").toString
      // three appends at this batch size; report the LAST append's cost
      // (the history behind it is largest there)
      var tAppend = 0.0
      for (i <- 1 to 3)
        tAppend = timeIt(graft.io.Folio.appendWithRollup(
          batch(n, i), path, Seq("k"), Seq("v")))
      val tRead = timeIt(graft.io.Folio.rollupRead(spark, path).collect())
      val tFull = timeIt(graft.io.Folio.rollupDataRead(spark, path)
        .groupBy("k").agg(count(lit(1)), sum(col("v").cast("decimal(38,6)")),
          min(col("v")), max(col("v"))).collect())
      println(s"$n,$tAppend,$tRead,$tFull,${3L * n}")
    }
    spark.stop()
  }
}
