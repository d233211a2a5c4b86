package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.AsOfJoinExec

/** The automatic as-of rewrite (plans.AsOfRewriteRule): a plain-SQL
  * row_number-over-join idiom must silently become the native merge exec,
  * produce identical results, and refuse to fire when any soundness
  * condition fails. */
class AsOfRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 4.0), ("b", 25L, 5.0),
    ("c", 5L, 6.0) // before any quote: dropped by the inner-join idiom
  ).toDF("sym", "t_ts", "px")

  private def quotes = Seq(
    ("a", 5L, 100.0), ("a", 18L, 101.0), ("a", 30L, 102.0),
    ("b", 10L, 200.0), ("b", 25L, 201.0),
    ("c", 50L, 300.0)
  ).toDF("sym", "q_ts", "bid")

  private def idiom(orderDir: String, cmp: String): String =
    s"""SELECT sym, t_ts, px, q_ts, bid FROM (
          SELECT t.sym, t.t_ts, t.px, q.q_ts, q.bid,
                 row_number() OVER (PARTITION BY t.sym, t.t_ts, t.px
                                    ORDER BY q.q_ts $orderDir) AS rn
          FROM trades_v t JOIN quotes_v q
            ON t.sym = q.sym AND q.q_ts $cmp t.t_ts)
        WHERE rn = 1 ORDER BY sym, t_ts"""

  private def hasAsOfExec(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists(_.isInstanceOf[graft.plans.AsOfJoinPlan])

  private def register(): Unit = {
    trades.createOrReplaceTempView("trades_v")
    quotes.createOrReplaceTempView("quotes_v")
  }

  test("backward idiom rewrites to AsOfJoinExec with identical results") {
    register()
    val df = spark.sql(idiom("DESC", "<="))
    assert(hasAsOfExec(df), "expected AsOfJoinExec in the rewritten plan")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("a", 10L, 5L, 100.0), ("a", 20L, 18L, 101.0), ("a", 30L, 30L, 102.0),
      ("b", 15L, 10L, 200.0), ("b", 25L, 25L, 201.0)))
    // trade ("c",5) has no quote at-or-before → absent, like the idiom
  }

  test("forward idiom (ASC, >=) rewrites and matches the window answer") {
    register()
    val df = spark.sql(idiom("ASC", ">="))
    assert(hasAsOfExec(df))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a", 10L, 18L), ("a", 20L, 30L), ("a", 30L, 30L),
      ("b", 15L, 25L), ("b", 25L, 25L), ("c", 5L, 50L)))
  }

  test("strict backward (<) excludes the equal-timestamp quote") {
    register()
    val df = spark.sql(idiom("DESC", "<"))
    assert(hasAsOfExec(df))
    val a30 = df.collect().find(r => r.getString(0) == "a" && r.getLong(1) == 30L).get
    assert(a30.getLong(3) == 18L) // not the ts-equal 30L quote
  }

  test("duplicate left rows collapse to one — window semantics preserved") {
    register()
    val dupTrades = trades.union(trades.filter(col("sym") === "a" && col("t_ts") === 10L))
    dupTrades.createOrReplaceTempView("trades_v")
    val df = spark.sql(idiom("DESC", "<="))
    assert(hasAsOfExec(df))
    val n = df.collect().count(r => r.getString(0) == "a" && r.getLong(1) == 10L)
    assert(n == 1, "duplicated left row must produce one output row, as the window form does")
  }

  test("rewrite equals the un-rewritten window answer on the events fixture") {
    val spark2 = spark
    import spark2.implicits._
    val ev = Tables.events(spark, sf).select(col("user_id"), col("ts_ns"))
      .filter(col("user_id") < 20)
    val lhs = ev.filter(col("ts_ns") % 3 === 0).limit(500)
    val rhs = ev.filter(col("ts_ns") % 3 =!= 0).limit(2000)
      .withColumnRenamed("ts_ns", "r_ts").withColumnRenamed("user_id", "r_uid")
    lhs.createOrReplaceTempView("trades_v2")
    rhs.createOrReplaceTempView("quotes_v2")
    val q =
      """SELECT user_id, ts_ns, r_ts FROM (
           SELECT t.user_id, t.ts_ns, q.r_ts,
                  row_number() OVER (PARTITION BY t.user_id, t.ts_ns
                                     ORDER BY q.r_ts DESC) AS rn
           FROM trades_v2 t JOIN quotes_v2 q
             ON t.user_id = q.r_uid AND q.r_ts <= t.ts_ns)
         WHERE rn = 1"""
    val rewritten = spark.sql(q)
    assert(hasAsOfExec(rewritten))
    // ground truth independent of ALL as-of machinery: join + max per key
    // (only the matched timestamp is projected, so max() IS the as-of)
    val truth = lhs.join(rhs, lhs("user_id") === rhs("r_uid") && rhs("r_ts") <= lhs("ts_ns"))
      .groupBy(lhs("user_id"), col("ts_ns")).agg(max(col("r_ts")).as("r_ts"))
    assert(rewritten.collect().toSet == truth.collect().toSet)
  }

  test("q74 (the oracled bench query) actually takes the rewrite path") {
    assert(hasAsOfExec(Queries.q74_asof_rewrite(spark, sf)))
  }

  test("property: rewritten SQL equals brute force on random instances") {
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 4) {
      val keys = Seq("a", "b", "c")
      val lefts = (0 until 30).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(40).toLong, i.toLong))
      // unique (k, rt) so equal-ts nondeterminism cannot differ
      val rights = rnd.shuffle(
        (for (k <- keys :+ "d"; t <- 0 until 40) yield (k, t.toLong)).toList)
        .take(20).map { case (k, t) => (k, t, t * 10.0 + keys.indexOf(k)) }
      lefts.toDF("k", "t", "lid").createOrReplaceTempView("pl_v")
      rights.toDF("k", "rt", "px").createOrReplaceTempView("pr_v")

      val df = spark.sql(
        """SELECT lid, px FROM (
             SELECT l.k, l.t, l.lid, r.px,
                    row_number() OVER (PARTITION BY l.k, l.t, l.lid ORDER BY r.rt DESC) AS rn
             FROM pl_v l JOIN pr_v r ON l.k = r.k AND r.rt <= l.t)
           WHERE rn = 1""")
      assert(hasAsOfExec(df), s"rule did not fire on trial $trial")
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      // inner flavor: unmatched lefts absent
      val want = lefts.flatMap { case (k, t, lid) =>
        val cands = rights.filter(row => row._1 == k && row._2 <= t)
        if (cands.isEmpty) None else Some(lid -> cands.maxBy(_._2)._3)
      }.toMap
      assert(got == want, s"diverged on trial $trial")
    }
  }

  // ---- negative cases: the rule must NOT fire ----

  test("no rewrite when partition keys do not cover the left side") {
    register()
    val df = spark.sql(
      """SELECT sym, t_ts, q_ts FROM (
           SELECT t.sym, t.t_ts, q.q_ts,
                  row_number() OVER (PARTITION BY t.sym ORDER BY q.q_ts DESC) AS rn
           FROM trades_v t JOIN quotes_v q
             ON t.sym = q.sym AND q.q_ts <= t.t_ts)
         WHERE rn = 1""")
    assert(!hasAsOfExec(df))
  }

  test("no rewrite for rn = 2, wrong order direction, or extra predicates") {
    register()
    val rn2 = spark.sql(idiom("DESC", "<=").replace("rn = 1", "rn = 2"))
    assert(!hasAsOfExec(rn2))
    // backward comparison but ASC ordering picks the EARLIEST quote — a
    // different query; must stay a window
    val wrongDir = spark.sql(idiom("ASC", "<="))
    assert(!hasAsOfExec(wrongDir))
    // a residual TWO-SIDED predicate cannot commute with top-1 → no fire
    val twoSided = spark.sql(idiom("DESC", "<=")
      .replace("q.q_ts <= t.t_ts", "q.q_ts <= t.t_ts AND q.bid > t.px"))
    assert(!hasAsOfExec(twoSided))
  }

  test("single-side extra predicate pushes down and still rewrites soundly") {
    register()
    // the optimizer pushes q.bid > 100.5 into the right child before the
    // rule fires; filtering the right side commutes with per-left top-1,
    // so the rewrite IS sound — and must pick the best QUALIFYING quote
    val df = spark.sql(idiom("DESC", "<=")
      .replace("q.q_ts <= t.t_ts", "q.q_ts <= t.t_ts AND q.bid > 100.5"))
    assert(hasAsOfExec(df))
    val a20 = df.collect().find(r => r.getString(0) == "a" && r.getLong(1) == 20L).get
    assert(a20.getDouble(4) == 101.0) // 100.0 quote excluded by the predicate
    val a10 = df.collect().find(r => r.getString(0) == "a" && r.getLong(1) == 10L)
    assert(a10.isEmpty) // only the 100.0 quote was at-or-before 10
  }

  test("null equality keys never match — inner-join semantics preserved") {
    // In the original inner join `t.sym = q.sym` a null sym never matches
    // (ternary-logic false). The native exec's RowOrdering would treat
    // null == null as equal, so the rewrite must filter null keys on both
    // sides; otherwise a null-keyed trade would pick up a null-keyed
    // quote and survive the IsNotNull(rightTs) inner-flavor filter.
    val nTrades = trades.union(Seq((null.asInstanceOf[String], 40L, 9.0)).toDF("sym", "t_ts", "px"))
    val nQuotes = quotes.union(Seq((null.asInstanceOf[String], 35L, 400.0)).toDF("sym", "q_ts", "bid"))
    nTrades.createOrReplaceTempView("trades_v")
    nQuotes.createOrReplaceTempView("quotes_v")
    val df = spark.sql(idiom("DESC", "<="))
    assert(hasAsOfExec(df), "rule must still fire on nullable-key inputs")
    val got = df.collect()
    assert(!got.exists(_.isNullAt(0)), "null-keyed left rows must not appear in the output")
    // and the non-null rows are untouched
    assert(got.count(_.getString(0) == "a") == 3 && got.count(_.getString(0) == "b") == 2)
  }

  test("no rewrite when the order key has a tie-breaker") {
    register()
    val df = spark.sql(idiom("DESC, q.bid ASC", "<="))
    assert(!hasAsOfExec(df))
  }

  // ---- widened shapes: timestamp axes + tolerance bands ----

  private def tsOf(s: String) = java.sql.Timestamp.valueOf(s)

  private def registerTs(): Unit = {
    Seq(
      ("a", tsOf("2024-01-01 10:00:00"), 1.0),
      ("a", tsOf("2024-01-01 12:00:00"), 2.0),
      ("b", tsOf("2024-01-01 11:00:00"), 3.0)
    ).toDF("sym", "t_ts", "px").createOrReplaceTempView("tst_v")
    Seq(
      ("a", tsOf("2024-01-01 09:45:00"), 100.0), // 15 min before the 10:00 trade
      ("a", tsOf("2024-01-01 10:30:00"), 101.0), // 90 min before the 12:00 trade
      ("b", tsOf("2024-01-01 08:00:00"), 200.0)  // 3 h before the 11:00 trade
    ).toDF("sym", "q_ts", "bid").createOrReplaceTempView("qst_v")
  }

  test("TIMESTAMP axes rewrite and match the window answer") {
    registerTs()
    val df = spark.sql(
      """SELECT sym, t_ts, q_ts, bid FROM (
           SELECT t.sym, t.t_ts, t.px, q.q_ts, q.bid,
                  row_number() OVER (PARTITION BY t.sym, t.t_ts, t.px
                                     ORDER BY q.q_ts DESC) AS rn
           FROM tst_v t JOIN qst_v q
             ON t.sym = q.sym AND q.q_ts <= t.t_ts)
         WHERE rn = 1 ORDER BY sym, t_ts""")
    assert(hasAsOfExec(df), "rule must fire on TimestampType axes")
    val got = df.collect().map(r => (r.getString(0), r.getTimestamp(2).toString))
    assert(got.toSeq == Seq(
      ("a", "2024-01-01 09:45:00.0"),
      ("a", "2024-01-01 10:30:00.0"),
      ("b", "2024-01-01 08:00:00.0")))
  }

  test("interval tolerance on timestamp axes maps to the exec's tolerance") {
    registerTs()
    val df = spark.sql(
      """SELECT sym, t_ts, q_ts, bid FROM (
           SELECT t.sym, t.t_ts, t.px, q.q_ts, q.bid,
                  row_number() OVER (PARTITION BY t.sym, t.t_ts, t.px
                                     ORDER BY q.q_ts DESC) AS rn
           FROM tst_v t JOIN qst_v q
             ON t.sym = q.sym AND q.q_ts <= t.t_ts
                AND q.q_ts >= t.t_ts - INTERVAL '1' HOUR)
         WHERE rn = 1 ORDER BY sym, t_ts""")
    assert(hasAsOfExec(df), "rule must fire with an interval tolerance")
    val asOf = df.queryExecution.optimizedPlan.collectFirst {
      case p: graft.plans.AsOfJoinPlan => p }.get
    assert(asOf.tolerance.contains(3600L * 1000 * 1000), "tolerance must be the interval in µs")
    // 15-min-stale quote kept; 90-min and 3-h stale quotes out of band
    val got = df.collect().map(r => (r.getString(0), r.getTimestamp(1).toString))
    assert(got.toSeq == Seq(("a", "2024-01-01 10:00:00.0")))
  }

  test("long tolerance (rt >= t - K) rewrites; strict bound tightens to K-1") {
    register()
    val tol = spark.sql(idiom("DESC", "<=")
      .replace("q.q_ts <= t.t_ts", "q.q_ts <= t.t_ts AND q.q_ts >= t.t_ts - 5"))
    assert(hasAsOfExec(tol), "rule must fire with a long tolerance")
    // trade (a,10): best quote 5 is 5 old → kept at K=5
    val got = tol.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(got.contains(("a", 10L, 5L)))
    // trade (b,15): best quote 10 is 5 old → in at K=5 …
    assert(got.contains(("b", 15L, 10L)))

    // … but OUT under the strict spelling q_ts > t_ts - 5 (≡ age <= 4)
    val strict = spark.sql(idiom("DESC", "<=")
      .replace("q.q_ts <= t.t_ts", "q.q_ts <= t.t_ts AND q.q_ts > t.t_ts - 5"))
    assert(hasAsOfExec(strict))
    val asOf = strict.queryExecution.optimizedPlan.collectFirst {
      case p: graft.plans.AsOfJoinPlan => p }.get
    assert(asOf.tolerance.contains(4L), "strict bound must fold to K-1")
    val gotStrict = strict.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(!gotStrict.contains(("b", 15L)))
    assert(gotStrict.contains(("a", 30L))) // age-0 match unaffected
  }

  test("tolerance + rewrite equals the un-rewritten window on random instances") {
    val rnd = new scala.util.Random(76)
    for (trial <- 1 to 3) {
      val keys = Seq("a", "b")
      val lefts = (0 until 25).map(i => (keys(rnd.nextInt(2)), rnd.nextInt(40).toLong, i.toLong))
      val rights = rnd.shuffle(
        (for (k <- keys; t <- 0 until 40) yield (k, t.toLong)).toList)
        .take(25).map { case (k, t) => (k, t, t * 10.0) }
      lefts.toDF("k", "t", "lid").createOrReplaceTempView("tol_l_v")
      rights.toDF("k", "rt", "px").createOrReplaceTempView("tol_r_v")
      val df = spark.sql(
        """SELECT lid, px FROM (
             SELECT l.k, l.t, l.lid, r.px,
                    row_number() OVER (PARTITION BY l.k, l.t, l.lid ORDER BY r.rt DESC) AS rn
             FROM tol_l_v l JOIN tol_r_v r
               ON l.k = r.k AND r.rt <= l.t AND r.rt >= l.t - 7)
           WHERE rn = 1""")
      assert(hasAsOfExec(df), s"rule did not fire on trial $trial")
      val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = lefts.flatMap { case (k, t, lid) =>
        val cands = rights.filter(row => row._1 == k && row._2 <= t && row._2 >= t - 7)
        if (cands.isEmpty) None else Some(lid -> cands.maxBy(_._2)._3)
      }.toMap
      assert(got == want, s"diverged on trial $trial")
    }
  }

  test("q76 (the oracled timestamp+tolerance bench query) takes the rewrite path") {
    assert(hasAsOfExec(Queries.q76_asof_ts_tol(spark, sf)))
  }

  test("idiom SQL over sorted bucketed folios: rewritten AND shuffle-free") {
    // the full 100 TB story in one plan: a plain-SQL user writes the
    // row_number idiom over parted+sorted folio tables — the rule swaps
    // in the native exec, and the bucketed scans' reported partitioning
    // satisfies BOTH the left dedup aggregate (subset rule) and the
    // exec's clustering, so NOTHING shuffles
    Seq("rw_clicks_b", "rw_purch_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(s"spark-warehouse/$t")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      if (d.exists()) rm(d)
    }
    val ev = Tables.events(spark, sf).withColumn("ts_us", expr("ts_ns div 1000"))
    graft.io.Folio.writeSortedTable(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_us")),
      "rw_clicks_b", Seq("user_id"), Seq("ts_us"))
    graft.io.Folio.writeSortedTable(
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_ts"), col("value").as("p_value")),
      "rw_purch_b", Seq("user_id"), Seq("p_ts"))
    val df = spark.sql(
      """SELECT user_id, event_id, ts_us, p_ts, p_value FROM (
           SELECT c.user_id, c.event_id, c.ts_us, p.p_ts, p.p_value,
                  row_number() OVER (PARTITION BY c.user_id, c.event_id, c.ts_us
                                     ORDER BY p.p_ts DESC) AS rn
           FROM rw_clicks_b c JOIN rw_purch_b p
             ON c.user_id = p.user_id AND p.p_ts <= c.ts_us)
         WHERE rn = 1""")
    assert(hasAsOfExec(df))
    df.collect()
    // AQE prints the final AND the initial plan — assert on the final only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("Exchange hashpartitioning"),
      s"idiom over bucketed folios must not shuffle:\n$plan")
    // the right side must come off the scan merge-ready; the left dedup
    // aggregate legitimately re-sorts its (wider) grouping output
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(sorts <= 1, s"expected at most the left dedup re-sort, got $sorts:\n$plan")
  }

  // ---- LEFT OUTER flavor ----

  private def outerIdiom(extra: String = ""): String =
    s"""SELECT sym, t_ts, px, q_ts, bid FROM (
          SELECT t.sym, t.t_ts, t.px, q.q_ts, q.bid,
                 row_number() OVER (PARTITION BY t.sym, t.t_ts, t.px
                                    ORDER BY q.q_ts DESC) AS rn
          FROM trades_v t LEFT JOIN quotes_v q
            ON t.sym = q.sym AND q.q_ts <= t.t_ts$extra)
        WHERE rn = 1 ORDER BY sym, t_ts"""

  test("LEFT OUTER idiom rewrites; unmatched trades survive null-padded") {
    register()
    val df = spark.sql(outerIdiom())
    assert(hasAsOfExec(df), "rule must fire on the left-outer idiom")
    val got = df.collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    assert(got == Seq(
      ("a", 10L, 5L), ("a", 20L, 18L), ("a", 30L, 30L),
      ("b", 15L, 10L), ("b", 25L, 25L),
      ("c", 5L, null))) // before any quote: KEPT with null quote
  }

  test("LEFT OUTER with null-axis trades: padded, never spuriously matched") {
    val nTrades = trades
      .union(Seq((null.asInstanceOf[String], 40L, 9.0)).toDF("sym", "t_ts", "px"))
      .union(Seq(("a", null.asInstanceOf[java.lang.Long], 8.0))
        .toDF("sym", "t_ts", "px"))
    val nQuotes = quotes
      .union(Seq((null.asInstanceOf[String], 35L, 400.0)).toDF("sym", "q_ts", "bid"))
    nTrades.createOrReplaceTempView("trades_v")
    nQuotes.createOrReplaceTempView("quotes_v")
    val df = spark.sql(outerIdiom())
    assert(hasAsOfExec(df))
    val got = df.collect()
    // the null-sym and null-ts trades are present exactly once, null-padded
    val nullSym = got.filter(_.isNullAt(0))
    assert(nullSym.length == 1 && nullSym.head.isNullAt(3) && nullSym.head.isNullAt(4),
      "null-keyed trade must survive padded, not match the null-keyed quote")
    val nullTs = got.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(nullTs.length == 1 && nullTs.head.isNullAt(3))
    // and the real rows are untouched
    assert(got.count(r => !r.isNullAt(0) && r.getString(0) == "a" && !r.isNullAt(1)) == 3)
  }

  test("LEFT OUTER with tolerance: stale best match comes back as a pad") {
    register()
    val df = spark.sql(outerIdiom(" AND q.q_ts >= t.t_ts - 5"))
    assert(hasAsOfExec(df))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(got(("a", 10L, 5L)))   // age 5 within K=5
    assert(got(("a", 20L, 18L)))  // age 2
    assert(got(("c", 5L, null)))  // no quote at all → pad
    // ("b", 25) has quote 25 (age 0) — in; all trades present
    assert(got.size == 6)
  }

  test("property: LEFT OUTER rewrite equals brute force on random instances") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 3) {
      val keys = Seq("a", "b", "c")
      val lefts = (0 until 30).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(40).toLong, i.toLong))
      val rights = rnd.shuffle(
        (for (k <- keys; t <- 0 until 40) yield (k, t.toLong)).toList)
        .take(18).map { case (k, t) => (k, t, t * 10.0 + keys.indexOf(k)) }
      lefts.toDF("k", "t", "lid").createOrReplaceTempView("po_l_v")
      rights.toDF("k", "rt", "px").createOrReplaceTempView("po_r_v")
      val df = spark.sql(
        """SELECT lid, px FROM (
             SELECT l.k, l.t, l.lid, r.px,
                    row_number() OVER (PARTITION BY l.k, l.t, l.lid ORDER BY r.rt DESC) AS rn
             FROM po_l_v l LEFT JOIN po_r_v r ON l.k = r.k AND r.rt <= l.t)
           WHERE rn = 1""")
      assert(hasAsOfExec(df), s"rule did not fire on trial $trial")
      val got = df.collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      val want = lefts.map { case (k, t, lid) =>
        val cands = rights.filter(row => row._1 == k && row._2 <= t)
        lid -> (if (cands.isEmpty) null else cands.maxBy(_._2)._3)
      }.toMap
      assert(got == want, s"diverged on trial $trial")
    }
  }

  test("q79 (the oracled outer bench query) takes the rewrite path") {
    assert(hasAsOfExec(Queries.q79_asof_outer(spark, sf)))
  }

  test("no rewrite for RIGHT or FULL outer joins") {
    register()
    val ro = spark.sql(outerIdiom().replace("LEFT JOIN", "RIGHT JOIN"))
    assert(!hasAsOfExec(ro))
    val fo = spark.sql(outerIdiom().replace("LEFT JOIN", "FULL JOIN"))
    assert(!hasAsOfExec(fo))
  }

  // ---- widened shapes: negatives ----

  test("no rewrite when the band is on the wrong side (not a tolerance)") {
    register()
    // q_ts >= t_ts + 5 alongside backward q_ts <= t_ts is an empty band,
    // not a staleness tolerance — must stay a window, not drop a predicate
    val df = spark.sql(idiom("DESC", "<=")
      .replace("q.q_ts <= t.t_ts", "q.q_ts <= t.t_ts AND q.q_ts >= t.t_ts + 5"))
    assert(!hasAsOfExec(df))
  }

  test("no rewrite for a year-month interval tolerance (calendar arithmetic)") {
    registerTs()
    val df = spark.sql(
      """SELECT sym, t_ts, q_ts FROM (
           SELECT t.sym, t.t_ts, t.px, q.q_ts,
                  row_number() OVER (PARTITION BY t.sym, t.t_ts, t.px
                                     ORDER BY q.q_ts DESC) AS rn
           FROM tst_v t JOIN qst_v q
             ON t.sym = q.sym AND q.q_ts <= t.t_ts
                AND q.q_ts >= t.t_ts - INTERVAL '1' MONTH)
         WHERE rn = 1""")
    assert(!hasAsOfExec(df))
  }

  test("no rewrite when axis types are mixed or unsupported") {
    register()
    // double axes: not a long-domain merge
    val dTrades = trades.withColumn("t_ts", col("t_ts").cast("double"))
    val dQuotes = quotes.withColumn("q_ts", col("q_ts").cast("double"))
    dTrades.createOrReplaceTempView("trades_v")
    dQuotes.createOrReplaceTempView("quotes_v")
    val df = spark.sql(idiom("DESC", "<="))
    assert(!hasAsOfExec(df))
  }
}
