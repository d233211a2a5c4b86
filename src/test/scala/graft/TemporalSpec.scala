package graft

import org.apache.spark.sql.functions._
import graft.functions.Temporal
import graft.functions.Temporal.Span

/** Temporal algebra goldens mirroring /root/reference/test.cc:295–328
  * span/stamp cases and horology.h literal semantics. */
class TemporalSpec extends SparkSpec {

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.cast("string")).collect()(0).getString(0)

  test("span literals parse and add: 12_y + 12_y = 24_y (horology.h:4)") {
    assert(Span.parse("12y") + Span.parse("12y") == Span.y(24))
    assert(Span.parse("1y2m") == Span(months = 14))
    assert(Span.parse("3d4h5i20s") == Span.d(3) + Span.h(4) + Span.i(5) + Span.s(20))
    assert(Span.parse("330t1u10n") == Span(nanos = 330000000L + 1000L + 10L))
  }

  test("span arithmetic: t - t = 0 span (test.cc:299)") {
    assert(Span.parse("5h") - Span.parse("5h") == Span())
    assert(-Span.parse("2m") == Span(months = -2))
    assert(Span.parse("1h") * 24 == Span.d(1))
  }

  test("stamp literals: year/month/date/datetime forms (lexer.h:247)") {
    assert(one(Temporal.stampLit("2020y")) == "2020-01-01 00:00:00")
    assert(one(Temporal.stampLit("2020.02m")) == "2020-02-01 00:00:00")
    assert(one(Temporal.stampLit("2016.02.03")) == "2016-02-03 00:00:00")
    assert(one(Temporal.stampLit("2016.02.03T12:34:56.1")) == "2016-02-03 12:34:56.1")
  }

  test("stamp + span per granularity (verbs.cc:121–204 case matrix)") {
    val base = Temporal.stampLit("2020.01.31")
    assert(one(Temporal.addSpan(base, Span.m(1))) == "2020-02-29 00:00:00") // clamped
    assert(one(Temporal.addSpan(base, Span.y(1) + Span.d(1))) == "2021-02-01 00:00:00")
    assert(one(Temporal.addSpan(base, Span.h(25))) == "2020-02-01 01:00:00")
    assert(one(Temporal.subSpan(base, Span.d(31))) == "2019-12-31 00:00:00")
  }

  test("truncation to each granularity (enums.h:203–212)") {
    val t = Temporal.stampLit("2016.02.03T12:34:56.123456")
    assert(one(Temporal.truncTo(t, Temporal.Year)) == "2016-01-01 00:00:00")
    assert(one(Temporal.truncTo(t, Temporal.Month)) == "2016-02-01 00:00:00")
    assert(one(Temporal.truncTo(t, Temporal.Day)) == "2016-02-03 00:00:00")
    assert(one(Temporal.truncTo(t, Temporal.Minute)) == "2016-02-03 12:34:00")
    assert(one(Temporal.truncTo(t, Temporal.Millis)) == "2016-02-03 12:34:56.123")
  }

  test("stamp difference is an exact span (µs)") {
    val a = Temporal.stampLit("2016.02.03T13:00:00")
    val b = Temporal.stampLit("2016.02.03T12:00:00")
    assert(one(Temporal.diffNs(a, b)) == (3600L * 1000000000L).toString)
  }

  test("span rendering with Kerf suffixes (presented.h:150–185)") {
    assert(Temporal.formatSpan(Span.d(1) + Span.h(2) + Span.i(3) + Span.s(4)) ==
      "1d2h3i4s0t0u0n")
    assert(Temporal.formatSpan(Span.y(2) + Span.m(1)) == "2y1m0d0h0i0s0t0u0n")
  }

  test("ns-axis span add is exact (addSpanNs)") {
    val df = Tables.events(spark, sf).select(col("ts_ns"))
    val moved = df.select((Temporal.addSpanNs(col("ts_ns"), Span.parse("1h")) - col("ts_ns")).as("d"))
      .distinct().collect()
    assert(moved.length == 1 && moved(0).getLong(0) == 3600L * 1000000000L)
  }

  // ── ns fidelity (DIALECT.md "Nanosecond contract"): off-grid ticks ──

  test("ns fidelity: as-of on LongType axes resolves ticks 1 ns apart") {
    import spark.implicits._
    // quotes 1 ns apart, NOT on the µs grid — a µs-floored engine would
    // see them as one instant and pick arbitrarily
    val base = 1455000000000000001L // …001 ns: off-grid
    val quotes = Seq(("a", base, 10.0), ("a", base + 1, 20.0))
      .toDF("sym", "q_ts", "bid")
    val trades = Seq(("a", base), ("a", base + 1), ("a", base + 2))
      .toDF("sym", "t_ts")
    val got = graft.ops.AsOf.join(trades, quotes, Seq("sym"),
        "t_ts", "q_ts", Seq("bid"))
      .orderBy("t_ts").select("bid").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(10.0, 20.0, 20.0), s"got $got")
    // 1 ns tolerance: the trade 2 ns after a quote must MISS it
    val tol = graft.ops.AsOf.join(trades, quotes, Seq("sym"),
        "t_ts", "q_ts", Seq("bid"), tolerance = Some(1L))
      .orderBy("t_ts").select("bid").collect().map(r =>
        if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(tol == Seq(Some(10.0), Some(20.0), Some(20.0)), s"tol $tol")
    val tol0 = graft.ops.AsOf.join(trades.filter(col("t_ts") === base + 2),
        quotes.filter(col("q_ts") === base), Seq("sym"),
        "t_ts", "q_ts", Seq("bid"), tolerance = Some(1L))
      .select("bid").collect()
    assert(tol0.length == 1 && tol0(0).isNullAt(0),
      "a 2 ns stale quote matched a 1 ns tolerance")
  }

  test("ns fidelity: stamp() floors to the µs grid; nanos()/long() invert on it") {
    import spark.implicits._
    // off-grid ns epochs, including PRE-EPOCH (floor ≠ truncate there)
    val xs = Seq(1455000000000000999L, 1455000000000001001L, -999L, -1001L)
    xs.toDF("x").createOrReplaceTempView("nsfid")
    val rows = graft.sql.KerfSql.run(spark,
      "select x, nanos(stamp(x)) as rt, long(stamp(x)) as lg from nsfid order x")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (x, rt, lg) =>
      val floored = x - java.lang.Math.floorMod(x, 1000L)
      assert(rt == floored, s"stamp($x) round-tripped to $rt, want $floored")
      assert(lg == floored, s"long(stamp($x)) = $lg, want $floored")
    }
    // on-grid values round-trip to themselves exactly
    val onGrid = graft.sql.KerfSql.run(spark,
      "select count(*) as n from nsfid where nanos(stamp(x - (x % 1000))) == x - (x % 1000)")
      .collect()(0).getLong(0)
    assert(onGrid == xs.length.toLong)
  }

  test("ns fidelity: window verbs are pure integer algebra on off-grid ticks") {
    import spark.implicits._
    val base = 7000000000000000003L // off-grid, near Long-safe magnitude
    Seq(("u", base, 1.0), ("u", base + 1, 1.0), ("u", base + 3, 2.0))
      .toDF("user_id", "ts_ns", "value").createOrReplaceTempView("nswin")
    val got = graft.sql.KerfSql.run(spark,
      "select user_id, ts_ns, deltas(ts_ns) as gap, differs(value) as chg " +
      "from nswin group user_id order ts_ns")
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toSeq
    // deltas: first row has no prior (null), then exact 1 ns and 2 ns
    // gaps; differs: tick 2 repeats the value → false
    assert(got == Seq((base, -1L, true), (base + 1, 1L, false), (base + 3, 2L, true)),
      s"got $got")
  }
}
