package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Σ a[i]·b[i] as a NATIVE codegen expression — the vector-math hot path
  * of the similarity stack (cosine top-k, LSH/IVF re-rank, quantization
  * drift), replacing an `aggregate(zip_with(…))` fold whose higher-order
  * lambdas are CodegenFallback (interpreted, boxing a Double per
  * element). The generated code is one fused primitive loop over the two
  * `ArrayData`, so a 100 TB candidate re-rank stays inside whole-stage
  * codegen.
  *
  * Semantics are BIT-IDENTICAL to the fold it replaces (the DuckDB
  * oracle twins replicate that fold, so this must not drift):
  * left-to-right double accumulation from 0.0; elements cast to double
  * before multiplying; NULL result on null/length-mismatched inputs or
  * any null element (zip_with pads the shorter side with nulls and
  * `null * x` poisons the fold). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t: NumericType, _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects two arrays of numeric elements, " +
      s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val lt = elemType(left).get
  private lazy val rt = elemType(right).get

  private def toDouble(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = toDouble(x, i, lt)
      val yv = toDouble(y, i, rt)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def conv(v: String, dt: DataType): String = dt match {
        case _: DecimalType => s"$v.toDouble()"
        case _ => s"(double)($v)"
      }
      val lGet = conv(CodeGenerator.getValue(a, lt, i), lt)
      val rGet = conv(CodeGenerator.getValue(b, rt, i), rt)
      s"""
        final int $n = $a.numElements();
        if ($b.numElements() != $n) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += $lGet * $rGet;
          }
          if (!${ev.isNull}) ${ev.value} = $acc;
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object DotProduct {
  /** Column API: exact drop-in for the aggregate(zip_with(…)) fold.
    * (Reaches SQL as `graft_dot`/`graft_cosine` via GraftFunctions.) */
  def dot(a: Column, b: Column): Column =
    GraftColumnGlue.toColumn(DotProduct(
      GraftColumnGlue.toExpr(a), GraftColumnGlue.toExpr(b)))
}
