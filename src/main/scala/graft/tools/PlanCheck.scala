package graft.tools
import org.apache.spark.sql.functions._
import graft.Engine
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session()
    import spark.implicits._
    Seq(("a", 10L, 1.0), ("a", 20L, 2.0)).toDF("sym", "t_ts", "px").createOrReplaceTempView("trades_v")
    Seq(("a", 5L, 100.0), ("a", 18L, 101.0)).toDF("sym", "q_ts", "bid").createOrReplaceTempView("quotes_v")
    val df = spark.sql(
      """SELECT sym, t_ts, px, q_ts, bid FROM (
           SELECT t.sym, t.t_ts, t.px, q.q_ts, q.bid,
                  row_number() OVER (PARTITION BY t.sym, t.t_ts, t.px ORDER BY q.q_ts DESC) AS rn
           FROM trades_v t JOIN quotes_v q
             ON t.sym = q.sym AND q.q_ts <= t.t_ts)
         WHERE rn = 1 ORDER BY sym, t_ts""")
    println("==== OPTIMIZED ====")
    println(df.queryExecution.optimizedPlan.toString)
    spark.stop()
  }
}
