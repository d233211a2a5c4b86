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
           strict: Boolean = false, tolerance: Option[Long] = None,
           forward: Boolean = false): DataFrame = {
    // same collision contract as joinNative's doc, enforced: the
    // attach-fold below is withColumn, which REPLACES an existing left
    // column of the same name in place — a caller attaching a right
    // 'px' onto a left table that has its own 'px' would silently
    // clobber trade prices with quote prices (null when unmatched)
    rightCols.foreach(c =>
      require(!left.columns.contains(c),
        s"as-of right column '$c' collides with a left column — rename " +
        "one side before joining"))
    // the synthesized match-timestamp output is a withColumn too — a
    // left column of that name (e.g. a previous as-of's output chained
    // back in) would be clobbered the same way
    require(!left.columns.contains(s"${rightTs}_matched"),
      s"as-of output column '${rightTs}_matched' collides with a left " +
      "column — rename it before joining")
    val ts = "__asof_ts"; val side = "__asof_side"; val payload = "__asof_payload"
    // visibility of right rows at equal ts is purely their sort position
    // relative to left (=1): backward frame looks back (right before left
    // for <=), forward frame looks ahead (right after left for >=)
    val rightSide =
      if (forward) { if (strict) 0 else 2 }
      else         { if (strict) 2 else 0 }

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

    val w0 = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(side).asc)
    val w =
      if (forward) w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pick =
      if (forward) first(col(payload), ignoreNulls = true)
      else last(col(payload), ignoreNulls = true)

    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn(payload, pick.over(w))
      .filter(col(side) === 1)

    val delta =
      if (forward) col(payload).getField("__rts") - col(ts)
      else col(ts) - col(payload).getField("__rts")
    val withTol = tolerance match {
      case Some(t) => matched.withColumn(payload,
        when(col(payload).isNotNull && delta <= t, col(payload)))
      case None => matched
    }

    rightCols.foldLeft(
      withTol.withColumn(s"${rightTs}_matched", col(payload).getField("__rts"))
    ) { (df, c) => df.withColumn(c, col(payload).getField(c)) }
      .drop(ts, side, payload)
  }

  /** Native physical as-of join (graft.plans.AsOfJoinExec): same backward
    * semantics as [[join]], but as a first-class operator — sort-merge
    * two-pointer scan per co-partition, O(1) state, no union/window
    * machinery. ts columns must be LongType epochs (ns/µs). Right-side
    * columns must not collide with left names (rename beforehand).
    * Requires the session built by [[graft.Engine]] (strategy injected). */
  def joinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 strict: Boolean = false, tolerance: Option[Long] = None,
                 forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.GraftColumnGlue._
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    val spark = left.sparkSession
    // timestamps are µs-longs internally, so the merge exec reads them
    // via getLong either way; anything else has no defined merge axis
    val okTypes: Set[org.apache.spark.sql.types.DataType] =
      Set(LongType, TimestampType, TimestampNTZType)
    val lt = left.schema(leftTs).dataType
    val rt = right.schema(rightTs).dataType
    require(okTypes.contains(lt) && rt == lt,
      s"joinNative expects matching LongType (epoch ns/µs) or Timestamp ts columns, got $lt/$rt")
    // key types must match PER POSITION: the plan is grafted below the
    // analyzer (no implicit cast gets inserted), so an int-vs-long key
    // pair would hash equal values to DIFFERENT partitions
    // (ClusteredDistribution's int and long murmur paths) and the merge
    // would silently miss matches — loud beats wrong
    keys.foreach { k =>
      val (lk, rk) = (left.schema(k).dataType, right.schema(k).dataType)
      require(lk == rk,
        s"joinNative key '$k' type mismatch: $lk (left) vs $rk (right) — " +
        "cast one side first (no analyzer coercion runs under the native plan)")
    }
    // Re-alias the whole right side: in the self-join case both inputs
    // share attribute exprIds (same lineage), which would make the
    // combined output ambiguous. toDF() allocates fresh exprIds.
    val sfx = "__graft_r"
    val r2 = right.toDF(right.columns.map(_ + sfx): _*)
    val rightKeyExprs = keys.map(k => toExpr(r2(k + sfx)))
    val plan = graft.plans.AsOfJoinPlan(
      planOf(left), planOf(r2),
      keys.map(k => toExpr(left(k))), rightKeyExprs,
      toExpr(left(leftTs)), toExpr(r2(rightTs + sfx)), strict, tolerance, forward)
    // drop the right-side key attrs (same values as left's)
    val rightKeyIds = rightKeyExprs.collect {
      case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.exprId
    }.toSet
    val pruned = org.apache.spark.sql.catalyst.plans.logical.Project(
      plan.output.filterNot(a => rightKeyIds.contains(a.exprId)), plan)
    val df = ofRows(spark, pruned)
    df.toDF(df.columns.map(_.stripSuffix(sfx)): _*)
  }
}
