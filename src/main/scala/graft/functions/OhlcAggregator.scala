package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY §2.10: Kerf fold with an arbitrary
  * lambda → `Aggregator[IN,BUF,OUT]`): one-pass OHLC. The buffer is
  * constant-size, merge is associative — Spark runs it partial+final
  * exactly like a built-in, so it scales like `sum` (map-side combine,
  * no row shuffle beyond the group key). */
object OhlcAggregator {

  case class Tick(ts: Long, value: Double)
  case class Buf(openTs: Long, open: Double, high: Double, low: Double,
                 closeTs: Long, close: Double, n: Long)
  case class Ohlc(open: Double, high: Double, low: Double, close: Double, n: Long)

  val empty: Buf = Buf(Long.MaxValue, 0.0, Double.NegativeInfinity,
                       Double.PositiveInfinity, Long.MinValue, 0.0, 0L)

  val ohlc: Aggregator[Tick, Buf, Ohlc] = new Aggregator[Tick, Buf, Ohlc] {
    def zero: Buf = empty
    // TIED timestamps tie-break on VALUE (open keeps the min value at
    // the earliest ts, close the max value at the latest ts) — the
    // lastTickUpdate determinism rule: which tick arrives or merges
    // first is post-shuffle order, not stable across replays, so the
    // result must be a pure function of the data, never of `a` vs `b`
    private def openBeats(ts: Long, v: Double, ts2: Long, v2: Double) =
      ts < ts2 || (ts == ts2 && v < v2)
    private def closeBeats(ts: Long, v: Double, ts2: Long, v2: Double) =
      ts > ts2 || (ts == ts2 && v > v2)
    def reduce(b: Buf, t: Tick): Buf = Buf(
      if (openBeats(t.ts, t.value, b.openTs, b.open)) t.ts else b.openTs,
      if (openBeats(t.ts, t.value, b.openTs, b.open)) t.value else b.open,
      math.max(b.high, t.value),
      math.min(b.low, t.value),
      if (closeBeats(t.ts, t.value, b.closeTs, b.close)) t.ts else b.closeTs,
      if (closeBeats(t.ts, t.value, b.closeTs, b.close)) t.value else b.close,
      b.n + 1)
    def merge(a: Buf, b: Buf): Buf = Buf(
      if (!openBeats(b.openTs, b.open, a.openTs, a.open)) a.openTs else b.openTs,
      if (!openBeats(b.openTs, b.open, a.openTs, a.open)) a.open else b.open,
      math.max(a.high, b.high),
      math.min(a.low, b.low),
      if (!closeBeats(b.closeTs, b.close, a.closeTs, a.close)) a.closeTs else b.closeTs,
      if (!closeBeats(b.closeTs, b.close, a.closeTs, a.close)) a.close else b.close,
      a.n + b.n)
    def finish(b: Buf): Ohlc = Ohlc(b.open, b.high, b.low, b.close, b.n)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Ohlc] = Encoders.product[Ohlc]
  }
}
