package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The int8 embedding codec as NATIVE codegen expressions — the storage
  * scale path of the similarity stack (quantize → 4×-smaller store →
  * dequantize → search), replacing a column-algebra pipeline whose
  * `exists`/`transform` lambdas are CodegenFallback (interpreted, one
  * boxed call per vector ELEMENT per row — the r16 q104 regression:
  * adding one `exists()` guard pass doubled the interpreted per-element
  * work and took the query 735 → 2369 ms). Each expression here is one
  * primitive JVM loop invoked once per row from generated code — the
  * same fallback-removal precedent as [[DotProduct]]/[[MatVecDots]].
  *
  * Semantics are BIT-IDENTICAL to the column form they replace (pinned
  * in ExtensionSpec against the retained column-algebra twins; the
  * DuckDB oracles replicate the same arithmetic):
  *
  *  - scale = max over non-null elements of |v_i| (double), / 127.0;
  *    NULL if the vector is null, empty, or all-null-elements.
  *  - any non-finite element FAILS FAST (a NaN would poison scale
  *    silently; ±Inf makes scale Inf, every finite element quantizes to
  *    0 and dequantize reconstructs 0·Inf = NaN across the vector). The
  *    trigger is equivalent to testing the already-computed max:
  *    maxAbs is NaN iff some element is NaN (NaN propagates through
  *    max), Inf iff some |element| is Inf — so the guard costs ZERO
  *    extra passes.
  *  - q_i = floor(v_i/scale + 0.5) clamped to ±127 (floor(x+0.5) is the
  *    one rounding rule that is bit-identical across engines — no
  *    HALF_EVEN/HALF_UP divergence); null element → null code (in the
  *    zero-scale branch too); scale 0 (zero vector) → all non-null
  *    elements code to 0; scale null → all codes null.
  *  - dequantize: q_i · scale, null element or null scale → null element.
  */
object Int8Codec {

  /** Per-vector symmetric int8 scale = max|v|/127, failing fast on any
    * non-finite element. `id` (string) only feeds the error message. */
  case class Int8Scale(vec: Expression, id: Expression) extends BinaryExpression {
    override def left: Expression = vec
    override def right: Expression = id
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, id.dataType) match {
      case (ArrayType(_: NumericType, _), StringType) => TypeCheckResult.TypeCheckSuccess
      case (v, i) => TypeCheckResult.TypeCheckFailure(
        s"int8_scale expects (array<numeric>, string), got (${v.simpleString}, ${i.simpleString})")
    }

    @transient private lazy val elemDt =
      vec.dataType.asInstanceOf[ArrayType].elementType

    /** Boxed Double so null (no non-null elements) survives the codegen
      * seam; one box per ROW, not per element. */
    def compute(input: ArrayData, idv: UTF8String): java.lang.Double = {
      val n = input.numElements()
      var maxAbs = -1.0 // any real |x| >= 0 beats the sentinel
      var seen = false
      var i = 0
      while (i < n) {
        if (!input.isNullAt(i)) {
          val a = math.abs(NumericArrays.toDouble(input, i, elemDt))
          // NaN: a > maxAbs is false, so propagate explicitly
          if (java.lang.Double.isNaN(a)) maxAbs = Double.NaN
          else if (!java.lang.Double.isNaN(maxAbs) && a > maxAbs) maxAbs = a
          seen = true
        }
        i += 1
      }
      if (!seen) return null
      if (java.lang.Double.isNaN(maxAbs) || maxAbs > Double.MaxValue)
        throw new IllegalStateException(
          "quantizeInt8: non-finite element in vector of " +
            (if (idv == null) "null" else idv.toString) + " — fix upstream embeddings")
      java.lang.Double.valueOf(maxAbs / 127.0)
    }

    override def eval(input: InternalRow): Any = {
      val v = vec.eval(input)
      if (v == null) null
      else compute(v.asInstanceOf[ArrayData], id.eval(input).asInstanceOf[UTF8String])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("int8scale", this, classOf[Int8Scale].getName)
      val vEv = vec.genCode(ctx)
      val iEv = id.genCode(ctx)
      val boxed = ctx.freshName("boxedScale")
      ev.copy(code = code"""
        ${vEv.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${vEv.isNull}) {
          ${iEv.code}
          java.lang.Double $boxed = $ref.compute(${vEv.value},
            ${iEv.isNull} ? null : ${iEv.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }
      """)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(vec = l, id = r)
  }

  /** q_i = clamp(floor(v_i/scale + 0.5), ±127) as int; see object doc
    * for the null/zero-scale contract. */
  case class Int8Codes(vec: Expression, scale: Expression) extends BinaryExpression {
    override def left: Expression = vec
    override def right: Expression = scale
    override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, scale.dataType) match {
      case (ArrayType(_: NumericType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (v, s) => TypeCheckResult.TypeCheckFailure(
        s"int8_codes expects (array<numeric>, double), got (${v.simpleString}, ${s.simpleString})")
    }

    @transient private lazy val elemDt =
      vec.dataType.asInstanceOf[ArrayType].elementType

    def compute(input: ArrayData, scaleBoxed: java.lang.Double): ArrayData = {
      val n = input.numElements()
      val out = new Array[Any](n)
      if (scaleBoxed == null) return new GenericArrayData(out) // all-null codes
      val s = scaleBoxed.doubleValue()
      var i = 0
      if (s == 0.0) {
        // zero vector: every non-null element codes to 0; null elements
        // stay null (same null contract as the non-zero path — r17's
        // zero-scale branch was the lone null-coercing case, flagged by
        // the r17 ADVICE and fixed on both faces)
        while (i < n) { if (!input.isNullAt(i)) out(i) = 0; i += 1 }
      } else {
        while (i < n) {
          if (!input.isNullAt(i)) {
            val x = NumericArrays.toDouble(input, i, elemDt)
            out(i) = math.max(-127.0, math.min(127.0, math.floor(x / s + 0.5))).toInt
          }
          i += 1
        }
      }
      new GenericArrayData(out)
    }

    override def eval(input: InternalRow): Any = {
      val v = vec.eval(input)
      if (v == null) null
      else compute(v.asInstanceOf[ArrayData],
        scale.eval(input).asInstanceOf[java.lang.Double])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("int8codes", this, classOf[Int8Codes].getName)
      val vEv = vec.genCode(ctx)
      val sEv = scale.genCode(ctx)
      ev.copy(code = code"""
        ${vEv.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${vEv.isNull}) {
          ${sEv.code}
          ${ev.isNull} = false;
          ${ev.value} = $ref.compute(${vEv.value},
            ${sEv.isNull} ? null : (java.lang.Double) ${sEv.value});
        }
      """)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(vec = l, scale = r)
  }

  /** Reconstruct doubles: q_i · scale; null element or null scale →
    * null element (the `transform(q, x => x*scale)` contract). */
  case class DequantizeInt8(codes: Expression, scale: Expression) extends BinaryExpression {
    override def left: Expression = codes
    override def right: Expression = scale
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = (codes.dataType, scale.dataType) match {
      case (ArrayType(_: NumericType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (c, s) => TypeCheckResult.TypeCheckFailure(
        s"int8_dequantize expects (array<numeric>, double), got (${c.simpleString}, ${s.simpleString})")
    }

    @transient private lazy val elemDt =
      codes.dataType.asInstanceOf[ArrayType].elementType

    def compute(input: ArrayData, scaleBoxed: java.lang.Double): ArrayData = {
      val n = input.numElements()
      val out = new Array[Any](n)
      if (scaleBoxed != null) {
        val s = scaleBoxed.doubleValue()
        var i = 0
        while (i < n) {
          if (!input.isNullAt(i))
            out(i) = NumericArrays.toDouble(input, i, elemDt) * s
          i += 1
        }
      }
      new GenericArrayData(out)
    }

    override def eval(input: InternalRow): Any = {
      val c = codes.eval(input)
      if (c == null) null
      else compute(c.asInstanceOf[ArrayData],
        scale.eval(input).asInstanceOf[java.lang.Double])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("int8dq", this, classOf[DequantizeInt8].getName)
      val cEv = codes.genCode(ctx)
      val sEv = scale.genCode(ctx)
      ev.copy(code = code"""
        ${cEv.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${cEv.isNull}) {
          ${sEv.code}
          ${ev.isNull} = false;
          ${ev.value} = $ref.compute(${cEv.value},
            ${sEv.isNull} ? null : (java.lang.Double) ${sEv.value});
        }
      """)
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(codes = l, scale = r)
  }

  // ----- Column API -----

  def scaleOf(vec: Column, id: Column): Column =
    GraftColumnGlue.toColumn(Int8Scale(
      GraftColumnGlue.toExpr(vec), GraftColumnGlue.toExpr(id)))

  def codesOf(vec: Column, scale: Column): Column =
    GraftColumnGlue.toColumn(Int8Codes(
      GraftColumnGlue.toExpr(vec), GraftColumnGlue.toExpr(scale)))

  def dequantize(codes: Column, scale: Column): Column =
    GraftColumnGlue.toColumn(DequantizeInt8(
      GraftColumnGlue.toExpr(codes), GraftColumnGlue.toExpr(scale)))
}

/** Shared primitive-element accessor for the vector-math expressions. */
private[functions] object NumericArrays {
  def toDouble(arr: ArrayData, i: Int, dt: DataType): Double = dt match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
  }
}
