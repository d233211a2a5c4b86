package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the tick-DB essential the reference's SQL surface promises
  * but never implements (parser reserves the SQL surface,
  * /root/reference/lexer.h:103–104; parted-table query remarks
  * /root/reference/presented.h:409–430). Matches each left row with the
  * latest right row at-or-before (or strictly-before) its timestamp,
  * per key, within an optional tolerance.
  *
  * Implementation: union+window rewrite (SURVEY §7.4 phase 1) — ONE
  * shuffle of each side on the key columns, then a per-key sorted window
  * with `last(payload, ignoreNulls)`. No broadcast, no driver-side state;
  * at 100 TB each input shuffles exactly once on the join key, the lower
  * bound for non-copartitioned as-of. Pre-bucketed inputs elide the
  * exchange entirely.
  *
  * The strict/non-strict distinction is purely the sort position of
  * right rows at equal timestamps: right sorts before left for `<=`
  * (visible to the window frame), after left for `<` (invisible).
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightCols: Seq[String],
           strict: Boolean = false, tolerance: Option[Long] = None): DataFrame = {
    val ts = "__asof_ts"; val side = "__asof_side"; val payload = "__asof_payload"
    val rightSide = if (strict) 2 else 0 // left = 1

    // ts columns must share one orderable numeric type (epoch ns/µs longs
    // by convention here — timestamp→long would truncate to seconds).
    val r = right.select(
      keys.map(col) :+ col(rightTs).as(ts) :+ lit(rightSide).as(side) :+
      struct(col(rightTs).as("__rts") +: rightCols.map(col): _*).as(payload): _*)
    val payloadType = r.schema(payload).dataType

    val l = left
      .withColumn(ts, col(leftTs))
      .withColumn(side, lit(1))
      .withColumn(payload, lit(null).cast(payloadType))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col(side) === 1)

    val withTol = tolerance match {
      case Some(t) => matched.withColumn(payload,
        when(col(payload).isNotNull &&
             col(ts) - col(payload).getField("__rts") <= t,
             col(payload)))
      case None => matched
    }

    rightCols.foldLeft(
      withTol.withColumn(s"${rightTs}_matched", col(payload).getField("__rts"))
    ) { (df, c) => df.withColumn(c, col(payload).getField(c)) }
      .drop(ts, side, payload)
  }
}
