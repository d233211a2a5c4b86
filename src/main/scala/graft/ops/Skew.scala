package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew weapons for the 100 TB design point (BASELINE north-star).
  * AQE's skew-join splitting handles sort-merge joins at runtime; these
  * cover the two cases it doesn't:
  *
  *  - [[saltedAgg]]: a groupBy where one key holds a large share of all
  *    rows (the "null key" / "empty string" / hot-symbol problem). Split
  *    the hot key across S sub-keys, aggregate twice; both passes are
  *    map-side-combining hash aggs, so the hot reducer shrinks by S.
  *  - [[saltedJoin]]: a shuffle equi-join with a hot key where neither
  *    side broadcasts: replicate the small side S×, salt the big side
  *    uniformly.
  *
  * Salt is deterministic (hash of stable columns, not rand()) so retries
  * and speculative tasks agree — nondeterministic salt breaks exactly-
  * once shuffle semantics under task retry at scale.
  */
object Skew {

  /** Deterministic salt in [0, buckets) from arbitrary stable cols. */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase aggregation: partial by (keys, salt), final by keys.
    * `partials` maps each output name to (phase1 agg of input, phase2
    * re-agg of the phase-1 column) — e.g. sum/sum, count/sum, min/min. */
  def saltedAgg(df: DataFrame, keys: Seq[Column], saltFrom: Seq[Column],
                buckets: Int)
               (partials: Seq[(String, Column, String => Column)]): DataFrame = {
    val p1 = df
      .withColumn("__salt", salt(buckets, saltFrom: _*))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head._2.as(partials.head._1),
           partials.tail.map(p => p._2.as(p._1)): _*)
    p1.groupBy(keys: _*)
      .agg(partials.head._3(partials.head._1).as(partials.head._1),
           partials.tail.map(p => p._3(p._1).as(p._1)): _*)
  }

  /** Salted shuffle join: big side gets a deterministic salt from a
    * high-cardinality column; small side is replicated across all S salt
    * values. Join key becomes (key, salt) → the hot key spreads over S
    * reducers. Use when the small side is too big to broadcast. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFrom: Column, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    // outer types that preserve the REPLICATED side would emit each
    // unmatched small row `buckets` times — reject rather than be wrong
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti").contains(
        joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin: '$joinType' would duplicate unmatched replicated rows; " +
      "only inner/left/left_semi/left_anti are sound")
    val b = big.withColumn("__salt", salt(buckets, saltFrom))
    val s = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}
