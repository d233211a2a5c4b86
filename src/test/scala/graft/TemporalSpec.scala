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
}
