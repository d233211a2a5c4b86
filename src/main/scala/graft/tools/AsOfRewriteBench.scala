package graft.tools

import org.apache.spark.sql.functions._

/** Measures WHY AsOfRewriteRule exists: the row_number-over-join idiom
  * materializes every (left row, earlier right row) pair per key —
  * O(n²/k) — before keeping one, while the rewritten native merge is
  * O(n log n) (one shuffle+sort per side, O(1) state). Times the SAME
  * query text on synthetic single-digit-key data at doubling per-key
  * sizes; the un-rewritten window path is obtained by adding a
  * deterministic tie-breaker to the ORDER BY (a documented
  * rule-disabling condition), which does not change the result on the
  * unique timestamps generated here.
  *
  * Run: `sbt "runMain graft.tools.AsOfRewriteBench [perKey1,perKey2,…]"`
  * Prints one JSON line per size with both wall times.
  */
object AsOfRewriteBench {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(2000, 4000, 8000))
    val spark = graft.Engine.session()
    import spark.implicits._

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
    }

    sizes.foreach { perKey =>
      val keys = 3
      // unique, interleaved timestamps per key: ts = i*keys + key
      val trades = (0 until keys).flatMap(k =>
        (0 until perKey).map(i => (s"k$k", (i.toLong * keys + k) * 2 + 1)))
        .toDF("sym", "t_ts")
      val quotes = (0 until keys).flatMap(k =>
        (0 until perKey).map(i => (s"k$k", (i.toLong * keys + k) * 2, i * 0.5)))
        .toDF("sym", "q_ts", "bid")
      trades.createOrReplaceTempView("rb_trades")
      quotes.createOrReplaceTempView("rb_quotes")
      def idiom(orderTail: String) =
        s"""SELECT sym, t_ts, q_ts, bid FROM (
              SELECT t.sym, t.t_ts, q.q_ts, q.bid,
                     row_number() OVER (PARTITION BY t.sym, t.t_ts
                                        ORDER BY q.q_ts DESC$orderTail) AS rn
              FROM rb_trades t JOIN rb_quotes q
                ON t.sym = q.sym AND q.q_ts <= t.t_ts)
            WHERE rn = 1"""
      val rewritten = spark.sql(idiom(""))
      require(rewritten.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[graft.plans.AsOfJoinPlan]), "rewrite did not fire")
      val windowed = spark.sql(idiom(", q.bid ASC")) // tie-breaker: rule off
      require(!windowed.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[graft.plans.AsOfJoinPlan]), "tie-breaker failed to disable")
      val (tNative, nN) = time(rewritten.count())
      val (tWindow, nW) = time(windowed.count())
      require(nN == nW, s"paths disagree: $nN vs $nW")
      println(f"""{"per_key":$perKey,"keys":$keys,"rows":$nN,""" +
        f""""native_sec":$tNative%.2f,"window_sec":$tWindow%.2f,""" +
        f""""speedup":${tWindow / tNative}%.1f}""")
    }
    spark.stop()
  }
}
