package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen kernels for the product-quantization hot loops —
  * found by the round-18 structural CodegenFallback net. The PQ stack
  * had three interpreted HOF chains:
  *
  *  - ENCODE (per corpus row — the big one): per subspace,
  *    `zip_with(matVecDots(slice(v), cb), half, (d,h) => d-h)` then
  *    `array_position(_, array_max(_))` — m interpreted zips + argmax
  *    scans over every candidate vector;
  *  - LUT build (per query row): `zip_with(dots, half, (d,h) => h-d)`;
  *  - ADC scan (per candidate×query pair — the q114/q115 inner loop):
  *    `aggregate(zip_with(codes, lut, (c,row) => element_at(row, c+1)),
  *    0.0, +)`.
  *
  * Each becomes one primitive loop invoked from generated code, with
  * bit-identical semantics (ExtensionSpec pins them against inline
  * column twins; the codebooks ride along as plain `double[][][]`
  * reference objects, like [[MatVecDots]]'s matrix). */
object PqKernels {

  /** PQ encode: per subspace, the index of the codeword maximizing
    * `dot(subvec, c) − |c|²/2` (first-index tie-break — the
    * array_position contract; Spark's double total order).
    *
    * Null regimes, matching the column chain exactly: a NULL vector
    * encodes to a NON-null array of m null codes (`array(...)` of m
    * null positions — the "codes of nulls" the ADC null-sort comment
    * documents); a subspace whose slice is short (dim mismatch) or
    * contains a null element yields a null code for that subspace. */
  case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
      extends UnaryExpression {
    require(books.nonEmpty && books(0).nonEmpty && books(0)(0).nonEmpty,
      "PqEncode needs non-empty codebooks")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(_: NumericType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<numeric>, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
    override def nullable: Boolean = false // null vector → array of null codes

    @transient private lazy val elemDt =
      child.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val halves: Array[Array[Double]] =
      books.map(_.map(c => c.map(x => x * x).sum / 2.0))

    def compute(input: ArrayData): ArrayData = {
      val m = books.length
      val out = new Array[Any](m)
      if (input == null) return new GenericArrayData(out)
      val dsub = books(0)(0).length
      val n = input.numElements()
      var s = 0
      while (s < m) {
        val base = s * dsub
        var ok = base + dsub <= n
        var i = base
        while (ok && i < base + dsub) { if (input.isNullAt(i)) ok = false; i += 1 }
        if (ok) {
          val v = new Array[Double](dsub)
          i = 0
          while (i < dsub) { v(i) = NumericArrays.toDouble(input, base + i, elemDt); i += 1 }
          val cb = books(s)
          val half = halves(s)
          var best = 0
          var bestScore = Double.NaN
          var first = true
          var c = 0
          while (c < cb.length) {
            val row = cb(c)
            var acc = 0.0
            i = 0
            while (i < dsub) { acc += v(i) * row(i); i += 1 }
            val score = acc - half(c)
            if (first || ArrayKernels.cmpD(score, bestScore) > 0) {
              best = c; bestScore = score; first = false
            }
            c += 1
          }
          out(s) = best
        }
        s += 1
      }
      new GenericArrayData(out)
    }

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      compute(if (v == null) null else v.asInstanceOf[ArrayData])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqenc", this, classOf[PqEncode].getName)
      val cEv = child.genCode(ctx)
      ev.copy(code = code"""
        ${cEv.code}
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $ref.compute(${cEv.isNull} ? null : ${cEv.value});
      """,
        isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `out[i] = const[i] − arr[i]` — the per-query ADC LUT row
    * (`zip_with(dots, half, (d,h) => h−d)` with zip_with's null-pad
    * regime: null element → null, length mismatch → null beyond the
    * shorter side; result length max(|const|, |arr|)). */
  case class SubFromConst(child: Expression, const: Array[Double])
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sub_from_const expects array<double>, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

    def compute(input: ArrayData): ArrayData = {
      val n = input.numElements()
      val len = math.max(n, const.length)
      val out = new Array[Any](len)
      var i = 0
      while (i < len) {
        if (i < n && i < const.length && !input.isNullAt(i))
          out(i) = const(i) - input.getDouble(i)
        i += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("sfc", this, classOf[SubFromConst].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** ADC score: `Σ_s lut[s][codes[s]]` — the PQ probe's inner loop over
    * every (candidate, query) pair. Column-twin regimes: either side
    * null → null; length mismatch → null (zip_with pad); null code or
    * null LUT row or null LUT cell → null; an out-of-range code throws
    * (ANSI element_at). */
  case class AdcScore(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"adc_score expects (array<int>, array<array<double>>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
      }
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    /** Boxed so null (any null link in the chain) survives the codegen
      * seam; one box per pair, not per subspace. */
    def compute(codes: ArrayData, lut: ArrayData): java.lang.Double = {
      val n = codes.numElements()
      if (n != lut.numElements()) return null
      var acc = 0.0
      var s = 0
      while (s < n) {
        if (codes.isNullAt(s) || lut.isNullAt(s)) return null
        val row = lut.getArray(s)
        val c = codes.getInt(s)
        if (c < 0 || c >= row.numElements())
          throw new ArrayIndexOutOfBoundsException(
            s"adc_score: code $c out of range for LUT row of ${row.numElements()} " +
              "(ANSI element_at contract)")
        if (row.isNullAt(c)) return null
        acc += row.getDouble(c)
        s += 1
      }
      java.lang.Double.valueOf(acc)
    }

    override def eval(input: InternalRow): Any = {
      val c = left.eval(input)
      if (c == null) return null
      val l = right.eval(input)
      if (l == null) return null
      compute(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("adc", this, classOf[AdcScore].getName)
      val cEv = left.genCode(ctx)
      val lEv = right.genCode(ctx)
      val boxed = ctx.freshName("boxedAdc")
      ev.copy(code = code"""
        ${cEv.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${cEv.isNull}) {
          ${lEv.code}
          if (!${lEv.isNull}) {
            java.lang.Double $boxed = $ref.compute(${cEv.value}, ${lEv.value});
            if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
          }
        }
      """)
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // ----- Column API -----

  def pqEncode(vec: Column, books: Array[Array[Array[Double]]]): Column =
    GraftColumnGlue.toColumn(PqEncode(GraftColumnGlue.toExpr(vec), books))

  def subFromConst(arr: Column, const: Array[Double]): Column =
    GraftColumnGlue.toColumn(SubFromConst(GraftColumnGlue.toExpr(arr), const))

  def adcScore(codes: Column, lut: Column): Column =
    GraftColumnGlue.toColumn(AdcScore(
      GraftColumnGlue.toExpr(codes), GraftColumnGlue.toExpr(lut)))
}
