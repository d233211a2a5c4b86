package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All row-dots of a PLAN-TIME double matrix against a vector column, as
  * ONE native codegen pass: `out[r] = Σ_i vec[i]·m[r][i]` — the staged
  * projection pass of the similarity stack (hyperplane sketches probe
  * `tables·nBits` planes per row; IVF assignment probes `nLists`
  * centroids per row).
  *
  * The column form it replaces — `transform(typedLit(matrix), p =>
  * dot(vec, p))` — keeps the per-plane dot native but drives it through
  * an interpreted `transform` lambda (higher-order functions are
  * CodegenFallback): one boxed invocation per plane per row, and the
  * literal matrix is re-materialized as Catalyst array values instead of
  * primitive `double[][]`. This expression holds the matrix as a plain
  * JVM object and runs the whole (plane × dim) loop fused — the same
  * fallback-removal precedent as [[DotProduct]]/[[SimHash64]].
  *
  * BIT-IDENTICAL per element to [[DotProduct]]'s fold (pinned in
  * ExtensionSpec): left-to-right double accumulation from 0.0, elements
  * cast to double before multiplying. A null vector → null result; a
  * null ELEMENT or a length mismatch makes every per-plane dot null
  * (exactly what `dot` returns per plane in the column form). */
case class MatVecDots(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  require(matrix.nonEmpty, "matrix must have at least one row")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"matvec_dots expects array<numeric>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

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

  /** Invoked from both interpreted eval and generated code (via a
    * reference object — the matrix rides along as a plain double[][]). */
  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val rows = matrix.length
    val dim = matrix(0).length
    var bad = n != dim
    var i = 0
    while (!bad && i < n) { if (input.isNullAt(i)) bad = true; i += 1 }
    if (bad) return new GenericArrayData(new Array[Any](rows)) // all-null dots
    val v = new Array[Double](n)
    i = 0
    while (i < n) { v(i) = toDouble(input, i); i += 1 }
    val out = new Array[Any](rows)
    var r = 0
    while (r < rows) {
      val row = matrix(r)
      var acc = 0.0
      i = 0
      while (i < n) { acc += v(i) * row(i); i += 1 }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matvec", this, classOf[MatVecDots].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MatVecDots {
  /** Column API: dots of every matrix row against the vector column. */
  def matVecDots(vec: Column, matrix: Array[Array[Double]]): Column =
    GraftColumnGlue.toColumn(MatVecDots(GraftColumnGlue.toExpr(vec), matrix))
}
