package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: steal-window-immune cost proxy for optimization work — runs
  * queries and reports the DETERMINISTIC execution-shape counters (jobs
  * submitted, stages run, tasks launched, shuffle bytes) instead of wall
  * clock. Host contention inflates seconds but cannot change how many
  * jobs/stages/shuffles a query plan executes, so round-over-round diffs
  * of these counters adjudicate a structural optimization (fewer rounds,
  * fewer exchanges, fewer sequential actions) even inside a steal window.
  *
  * `runMain graft.tools.PlanStats <sfDir> q54,q113` — runs each query
  * TWICE and reports the second run (first pays per-JVM one-off builds).
  */
object PlanStats {
  private class Counter extends SparkListener {
    val jobs = new AtomicLong
    val stages = new AtomicLong
    val tasks = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(s.stageInfo.numTasks)
      val m = s.stageInfo.taskMetrics
      if (m != null) {
        shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def snap: (Long, Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, shufRead.get, shufWrite.get)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    val spark = graft.Engine.session()
    val c = new Counter
    spark.sparkContext.addSparkListener(c)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      (1 to 2).foreach { pass =>
        org.apache.spark.GraftBenchGlue.drainListeners(spark.sparkContext)
        val before = c.snap
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val ms = (System.nanoTime() - t0) / 1000000
        org.apache.spark.GraftBenchGlue.drainListeners(spark.sparkContext)
        val after = c.snap
        if (pass == 2) println(
          s"PLANSTATS $n jobs=${after._1 - before._1} stages=${after._2 - before._2} " +
          s"tasks=${after._3 - before._3} srKB=${(after._4 - before._4) >> 10} " +
          s"swKB=${(after._5 - before._5) >> 10} ms=$ms")
      }
    }
    spark.stop()
  }
}
