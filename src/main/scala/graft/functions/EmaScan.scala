package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exponential moving average over an array column as ONE native O(n)
  * pass — the q-family `ema` scan (reference substrate: the unfold
  * adverb, /root/reference/adverbs.h:76–120, specialised to the tick-DB
  * smoother).
  *
  * The `aggregate(… concat(acc, array(…)))` fold it replaces copies the
  * whole accumulator array per element — O(n²) element copies inside a
  * single task, which is why the old implementation needed a
  * bounded-series guard (maxLen raise_error). This expression walks the
  * input once into a primitive double[], so the cost is the array's own
  * size: the contract is now simply "the series fits in a row", the same
  * bound every array column already lives under. Genuinely unbounded
  * per-key streams still belong on the windowed substrate
  * (Adverbs.scanRows) or `EventStream.emaByKey` (transformWithState).
  *
  * BIT-IDENTICAL to the fold it replaces (q138's DuckDB recursive-CTE
  * oracle replays the same tree, so this must not drift): ema₀ = x₀,
  * emaᵢ = emaᵢ₋₁ + α·(xᵢ − emaᵢ₋₁) — exactly that prev + α·(x − prev)
  * association, elements cast to double first, left to right. IEEE
  * doubles make the Java loop and the Catalyst fold the same machine
  * ops in the same order. NULL array → null; empty → empty; a null
  * ELEMENT poisons the tail (the fold's `prev` goes null and stays
  * null), reproduced here as nulls from the first null index on. */
case class EmaScan(child: Expression, alpha: Double)
    extends UnaryExpression {

  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t: NumericType, _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ema expects an array of numeric elements, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    EmaScan.compute(input.asInstanceOf[ArrayData], elemType.get, alpha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType.get, "org.apache.spark.sql.types.DataType")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.EmaScan.compute($c, $et, $alpha)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object EmaScan {

  private def toDouble(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case DoubleType => arr.getDouble(i)
    case FloatType => arr.getFloat(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
  }

  /** One sequential pass; see class doc for the exact fold semantics.
    * The no-null fast path returns a primitive-backed array (the hot
    * case: tick series have no null prices); the poisoned-tail case
    * boxes only because the result itself contains nulls. */
  def compute(arr: ArrayData, et: DataType, alpha: Double): ArrayData = {
    val n = arr.numElements()
    val vals = new Array[Double](n)
    var i = 0
    var prev = 0.0
    while (i < n && !arr.isNullAt(i)) {
      val x = toDouble(arr, i, et)
      prev = if (i == 0) x else prev + alpha * (x - prev)
      vals(i) = prev
      i += 1
    }
    if (i == n) return new GenericArrayData(vals)
    // null element at i: the fold's accumulator goes null there and
    // every later step is null + α·(x − null) = null
    val out = new Array[Any](n)
    var j = 0
    while (j < i) { out(j) = vals(j); j += 1 }
    new GenericArrayData(out)
  }

  /** Column API: drop-in for the old aggregate-fold formulation. */
  def ema(arr: Column, alpha: Double): Column =
    GraftColumnGlue.toColumn(EmaScan(GraftColumnGlue.toExpr(arr), alpha))
}
