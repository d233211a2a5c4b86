package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Table-ordered EMA as an INCREMENTAL window aggregate — the unfold
  * adverb down the rows (/root/reference/adverbs.h:76–120) in the form
  * a running window frame can evaluate in O(n) per partition: Spark's
  * UNBOUNDED PRECEDING..CURRENT ROW frame feeds each new row through
  * `reduce` exactly once (no re-scan), so the per-key cost is one
  * multiply-add per tick — the same recurrence `EventStream.emaByKey`
  * runs per micro-batch, here as a batch window function (and the
  * engine behind the dialect's `emas(α, x)` window verb).
  *
  * BIT-IDENTICAL to [[EmaScan]] and the q138/q144 oracles: the update
  * is the literal prev + α·(x − prev) association. A null tick poisons
  * the tail (`dead`), matching the scan's semantics. `merge` THROWS:
  * a running window frame never merges partial states, and the EMA
  * recurrence is order-sensitive, so any path that would merge (a
  * grouped aggregate misuse) must fail loudly rather than return an
  * order-dependent number. */
object EmaWindowAgg {

  case class Buf(seen: Boolean, dead: Boolean, ema: Double)

  private def agg(alpha: Double): Aggregator[java.lang.Double, Buf, java.lang.Double] =
    new Aggregator[java.lang.Double, Buf, java.lang.Double] {
      def zero: Buf = Buf(seen = false, dead = false, 0.0)
      def reduce(b: Buf, x: java.lang.Double): Buf =
        if (b.dead) b
        else if (x == null) Buf(seen = b.seen, dead = true, b.ema)
        else if (!b.seen) Buf(seen = true, dead = false, x.doubleValue)
        else Buf(seen = true, dead = false,
          b.ema + alpha * (x.doubleValue - b.ema))
      def merge(a: Buf, b: Buf): Buf =
        throw new UnsupportedOperationException(
          "ema is order-sensitive: use it over an ORDERED window " +
          "(emas(alpha, x) in a windowed select), never as a grouped aggregate")
      def finish(b: Buf): java.lang.Double =
        if (!b.seen || b.dead) null else b.ema
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** Column form: apply over a running frame —
    * `EmaWindowAgg.emas(0.25)(col("x")).over(w.rowsBetween(unboundedPreceding, currentRow))`. */
  def emas(alpha: Double)(x: Column): Column = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    udaf(agg(alpha), Encoders.DOUBLE).apply(x.cast("double"))
  }
}
