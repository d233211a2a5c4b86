package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated fixtures (TESTDATA.md). Each is a lazy
  * DataFrame over parquet — the Spark analog of the reference's
  * memory-mapped drive objects (/root/reference/file.cc:935–990): nothing
  * is materialized until an action, scans are partition/row-group pruned.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Fan a CPU-heavy-per-row stage out to all cores when the byte-based
    * split heuristic under-partitions (a 0.5 MB parquet of 50k documents
    * is one partition — and one core — however expensive the per-row
    * work). No-op when the input is already split at least as wide as the
    * cluster, so it costs nothing at real scale where inputs arrive as
    * many files; locally it converts serial minhash/sketch stages into
    * 32-way parallel ones. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** events.parquet stores ts as timestamp[ns] (Kerf STAMP_DATETIME,
    * /root/reference/enums.h:166). With `nanosAsLong` the raw read yields
    * a LongType `ts`; we expose BOTH:
    *   - `ts_ns`: exact nanosecond long (full Kerf fidelity),
    *   - `ts`:    µs TimestampType (for date_trunc/window built-ins).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      // NB: integer `div`, not `/` — ns epochs (~1.7e18) overflow double's
      // 53-bit mantissa, so float division silently corrupts the low µs.
}
