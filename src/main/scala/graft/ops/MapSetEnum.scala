package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kerf's grouped container types re-expressed relationally:
  *
  *  - MAP (key-list + value-list with lazy hash upgrade,
  *    /root/reference/presented.h:437–524) → `MapType` column ops for
  *    row-local maps; a broadcast 2-column DataFrame for table-scale
  *    lookup (the broadcast-hash-join threshold IS the "hash upgrade").
  *  - SET (dedup-on-append, presented.cc:475–503) → `array_distinct` /
  *    `dropDuplicates`.
  *  - ENUM_INTERN (unique-key set + index vector, presented.h:545–557) →
  *    a dictionary DataFrame + integer codes; Parquet dictionary encoding
  *    gives the storage win for free, this gives cross-file stable codes.
  *  - AFFINE (O(1) arithmetic range, presented.h:560–580) →
  *    `spark.range` (a lazy Range plan: O(1) driver state, splits
  *    computed per-partition).
  */
object MapSetEnum {

  // ----- MAP (row-local column ops) -----

  /** amend_one: m[k] := v (presented.cc:534–563 cow_amend semantics). */
  def mapAmend(m: Column, k: Column, v: Column): Column =
    map_concat(map_filter(m, (key, _) => key =!= k), map(k, v))

  /** delete_one (presented.cc:707–768). */
  def mapDelete(m: Column, k: Column): Column =
    map_filter(m, (key, _) => key =!= k)

  def mapKeys(m: Column): Column = map_keys(m)
  def mapValues(m: Column): Column = map_values(m)
  def mapLookup(m: Column, k: Column): Column = element_at(m, k)

  // ----- SET -----

  def setAppend(s: Column, v: Column): Column =
    when(array_contains(s, v), s).otherwise(concat(s, array(v)))
  def setUnion(a: Column, b: Column): Column = array_union(a, b)
  def member(s: Column, v: Column): Column = array_contains(s, v)

  // ----- ENUM_INTERN (table-scale) -----

  /** Build the intern dictionary: distinct values → dense stable codes
    * (ordered by value for determinism). One shuffle over distinct values
    * — tiny by definition of "enum-like". */
  def internTable(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).as("value")).distinct()
      .withColumn("code",
        row_number().over(Window.orderBy(col("value"))).cast("int") - 1)

  /** Replace the value column with its intern code via broadcast join —
    * the ENUM_INTERN index vector, distributed. Dict columns are aliased
    * internally so an input column named `value`/`code` survives (drop by
    * name would remove BOTH same-named columns). */
  def applyIntern(df: DataFrame, dict: DataFrame, valueCol: String): DataFrame = {
    val d = dict.select(col("value").as("__intern_value"), col("code").as("__intern_code"))
    // null-SAFE equality: internTable's distinct() keeps a null value
    // and codes it like any other; a null-unsafe === would silently
    // drop every null-valued row from the inner join (shrunken output,
    // no code ever observed for null)
    df.join(broadcast(d), df(valueCol) <=> d("__intern_value"))
      .drop("__intern_value")
      .withColumnRenamed("__intern_code", s"${valueCol}_code")
  }

  // ----- AFFINE -----

  /** AFFINE_RANGE(n, base, imult) = [base, base+imult, ...] — O(1) state,
    * materialized per-partition (slop.h:1060–1068; test.cc:438–456). */
  def affineRange(spark: SparkSession, n: Long, base: Long, imult: Long): DataFrame =
    spark.range(n).select((col("id") * imult + base).as("value"))
}
