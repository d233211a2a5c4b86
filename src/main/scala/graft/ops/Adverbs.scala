package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The Kerf adverb family (/root/reference/adverbs.h) re-expressed on two
  * Spark substrates:
  *
  *  - **array-local**: an adverb applied to an array column rewrites to a
  *    higher-order function (`transform`/`aggregate`) — stays inside one
  *    row, codegen'd, shuffle-free;
  *  - **table-ordered**: an adverb applied down a table's rows rewrites to
  *    a window over an explicit (key, order) — one shuffle on the key,
  *    which is the distributed meaning of Kerf's implicit row order.
  *
  * fold   = adverbs.h:34–71 (over);    scan    = adverbs.h:76–120 (unfold)
  * each   = adverbs.h:125–134 (map);   eachprior = adverbs.h:157–206
  * mapleft/mapright = adverbs.h:139–152; mapcores = adverbs.h:211–295
  * (mapcores needs no analog: Spark tasks ARE the segmented parallel map).
  */
object Adverbs {

  // ----- array-local (within one row) -----

  /** over/fold with seed: `fold(arr)(+)` ≡ adverbs.h:58–71. */
  def fold(arr: Column, zero: Column)(f: (Column, Column) => Column): Column =
    aggregate(arr, zero, f)

  /** monadic fold: seeds with the first element (adverbs.h:34–55). */
  def fold1(arr: Column)(f: (Column, Column) => Column): Column =
    when(size(arr) === 0, lit(null))
      .otherwise(aggregate(slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
        element_at(arr, 1), f))

  /** unfold/scan: all running prefixes (adverbs.h:76–120).
    * scan([1,2,3], +) = [1,3,6]. Empty in → empty out: unguarded,
    * sequence(1, 0) would count DOWN (Spark defaults step to -1 when
    * start > stop) and emit two spurious prefixes. */
  def scan(arr: Column, zero: Column)(f: (Column, Column) => Column): Column =
    when(size(arr) === 0, array()).otherwise(
      transform(sequence(lit(1), size(arr)),
        i => aggregate(slice(arr, lit(1), i), zero, f)))

  /** Exponential moving average — the tick-DB scan specialization
    * (q-family `ema`): ema₀ = x₀, emaᵢ = emaᵢ₋₁ + α·(xᵢ − emaᵢ₋₁), as
    * ONE native O(n) pass ([[graft.functions.EmaScan]]). The recurrence
    * is evaluated in exactly that prev + α·(x − prev) association so an
    * oracle replaying the same expression tree reproduces it bit-for-bit
    * (α dyadic → no rounding surprises). Empty in → empty out; a null
    * element poisons the tail (the fold's accumulator goes null).
    *
    * The former `aggregate(… concat …)` fold copied the whole
    * accumulator per element — O(n²) inside one task, which forced a
    * maxLen raise_error guard. The native scan retires that guard: the
    * only bound left is the row's own size, the same contract as every
    * other array column. Genuinely unbounded per-key streams still
    * belong on [[scanRows]]'s windowed substrate or
    * `EventStream.emaByKey` (transformWithState). */
  def ema(arr: Column, alpha: Double): Column =
    graft.functions.EmaScan.ema(arr, alpha)

  /** each/mapdown: elementwise (adverbs.h:125–134). */
  def each(arr: Column)(f: Column => Column): Column = transform(arr, f)

  /** eachprior/mapback: f(x[i], x[i-1]), first element paired with seed
    * (adverbs.h:157–206: mapback(range(4),4) with `-` = [-4,1,1,1]). */
  def eachPrior(arr: Column, seed: Column)(f: (Column, Column) => Column): Column =
    // empty-guarded: zip_with pads the shorter side, so an unguarded empty
    // input would yield one spurious element f(null, seed)
    when(size(arr) === 0, array()).otherwise(
      zip_with(arr, concat(array(seed), slice(arr, lit(1), greatest(size(arr) - 1, lit(0)))), f))

  /** mapleft/mapright: fix one side, iterate the other (adverbs.h:139–152). */
  def mapRight(x: Column, arr: Column)(f: (Column, Column) => Column): Column =
    transform(arr, y => f(x, y))
  def mapLeft(arr: Column, y: Column)(f: (Column, Column) => Column): Column =
    transform(arr, x => f(x, y))

  // ----- table-ordered (down the rows, distributed) -----

  private def ordered(keys: Seq[Column], order: Seq[Column]) =
    Window.partitionBy(keys: _*).orderBy(order: _*)

  /** Running fold down rows: scan as a frame-bounded window agg. */
  def scanRows(df: DataFrame, keys: Seq[Column], order: Seq[Column],
               out: String)(agg: Column): DataFrame =
    df.withColumn(out, agg.over(ordered(keys, order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** eachprior down rows: f(current, previous) via lag. */
  def eachPriorRows(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                    value: Column, out: String)
                   (f: (Column, Column) => Column): DataFrame =
    df.withColumn(out, f(value, lag(value, 1).over(ordered(keys, order))))
}
