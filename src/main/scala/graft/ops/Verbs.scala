package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Pervasive (rank-polymorphic) arithmetic — the reference applies unit
  * ops through automatic conformable recursion over unit×list, list×unit,
  * list×list (/root/reference/verbs.cc:32–83, combiner cases at 45).
  *
  * Spark's Column algebra is already pervasive over *rows*; this module
  * adds the array-column dimension: a verb dispatches on the static
  * DataTypes to plain column ops, `transform` (unit×array / array×unit),
  * or `zip_with` (array×array, zip semantics like Kerf list×list),
  * recursing through nested arrays. All codegen'd; no UDFs.
  */
object Verbs {

  private def isArr(t: DataType) = t.isInstanceOf[ArrayType]
  private def elem(t: DataType) = t.asInstanceOf[ArrayType].elementType

  /** Generic pervasive dyad: needs the static types of both sides
    * (verbs.cc:32–69's four-way unit/list dispatch, done at plan time). */
  def pervade(ta: DataType, tb: DataType)(a: Column, b: Column)
             (f: (Column, Column) => Column): Column = (isArr(ta), isArr(tb)) match {
    case (false, false) => f(a, b)
    case (true, false)  => transform(a, x => pervade(elem(ta), tb)(x, b)(f))
    case (false, true)  => transform(b, y => pervade(ta, elem(tb))(a, y)(f))
    case (true, true)   => zip_with(a, b, (x, y) => pervade(elem(ta), elem(tb))(x, y)(f))
  }

  /** Pervasive monad (negate etc., verbs.cc:207–255). */
  def pervadeUnary(t: DataType)(a: Column)(f: Column => Column): Column =
    if (isArr(t)) transform(a, x => pervadeUnary(elem(t))(x)(f)) else f(a)

  // The three verbs the reference actually implements (+ derived -):
  def add(ta: DataType, tb: DataType)(a: Column, b: Column): Column =
    pervade(ta, tb)(a, b)(_ + _)
  def mul(ta: DataType, tb: DataType)(a: Column, b: Column): Column =
    pervade(ta, tb)(a, b)(_ * _)
  def neg(t: DataType)(a: Column): Column = pervadeUnary(t)(a)(c => -c)
  def sub(ta: DataType, tb: DataType)(a: Column, b: Column): Column =
    pervade(ta, tb)(a, b)(_ - _)

  /** range/til (verbs.cc:86–91): lazy affine sequence as an array column.
    * range(0) is EMPTY (test.cc:350) — unguarded, sequence(0, -1) would
    * count DOWN (Spark defaults step to -1 when start > stop). */
  def rangeArr(n: Column): Column = {
    val nn = n.cast("long")
    when(nn <= 0, array().cast("array<bigint>"))
      .otherwise(sequence(lit(0L), nn - 1L))
  }
}
