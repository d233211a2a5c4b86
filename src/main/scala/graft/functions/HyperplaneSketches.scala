package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** ALL per-table hyperplane sketches of a vector in ONE native pass:
  * table t's sketch packs the sign bits of projections
  * [t·nBits, (t+1)·nBits) — `bit b = 1 iff Σ_i vec[i]·w[t·nBits+b][i] >
  * 0`. The full LSH map stage (project → sign → pack, for every table)
  * fused over a primitive `double[][]` weight matrix.
  *
  * Replaces a three-layer staged pipeline: a projections column (so the
  * lambda-blind optimizer wouldn't inline and re-evaluate it per table —
  * the no-CSE-inside-higher-order-functions trap), `tables` sibling
  * pack columns of interpreted `aggregate(zip_with(slice(…)))`, and a
  * posexplode. With the whole computation inside one expression the
  * staging discipline disappears along with the CodegenFallback.
  *
  * Semantics match the chained form ([[graft.llm.Similarity
  * .hyperplaneSketch]], pinned in ExtensionSpec): a null element or
  * length-mismatched vector yields ZERO sketches for every table (the
  * chain's `when(null > 0, bit).otherwise(0)` path); a null vector
  * yields null. */
case class HyperplaneSketches(child: Expression, matrix: Array[Array[Double]],
                              nBits: Int) extends UnaryExpression {

  require(nBits >= 1 && nBits <= 64, "nBits must be in [1, 64]")
  require(matrix.nonEmpty && matrix.length % nBits == 0,
    "matrix rows must be tables * nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sketches expects array<numeric>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val elemDt =
    child.dataType.asInstanceOf[ArrayType].elementType

  private def toDouble(arr: ArrayData, i: Int): Double = elemDt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
  }

  def compute(input: ArrayData): ArrayData = {
    val tables = matrix.length / nBits
    val n = input.numElements()
    val dim = matrix(0).length
    var bad = n != dim
    var i = 0
    while (!bad && i < n) { if (input.isNullAt(i)) bad = true; i += 1 }
    val sigs = new Array[Long](tables)
    if (bad) return new GenericArrayData(sigs) // all-zero sketches
    val v = new Array[Double](n)
    i = 0
    while (i < n) { v(i) = toDouble(input, i); i += 1 }
    var p = 0
    while (p < matrix.length) {
      val row = matrix(p)
      var acc = 0.0
      i = 0
      while (i < n) { acc += v(i) * row(i); i += 1 }
      if (acc > 0) sigs(p / nBits) |= 1L << (p % nBits)
      p += 1
    }
    new GenericArrayData(sigs)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hpsk", this, classOf[HyperplaneSketches].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HyperplaneSketches {
  /** Column API: per-table sketches, `array<long>` of length `tables`. */
  def sketches(vec: Column, matrix: Array[Array[Double]], nBits: Int): Column =
    GraftColumnGlue.toColumn(HyperplaneSketches(
      GraftColumnGlue.toExpr(vec), matrix, nBits))
}
