package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IEEE 754 binary16 (half-precision) STORAGE tier for embeddings — the
  * reference stores f16 vectors natively (FLOAT1_ARRAY,
  * /root/reference/enums.h:196; slab.h:307–324). Parquet has no
  * half-precision physical type, so the convention is the SHORT BIT
  * PATTERN: `graft_half_pack` narrows array<float|double> to
  * array<smallint> (INT(16)-annotated pages whose 16 significant bits
  * dictionary/RLE-compress far below the float32 column's — float
  * mantissas defeat dictionary encoding, two-byte patterns feed it),
  * `graft_half_unpack` widens back to
  * array<float>. Both are native codegen expressions (one static call
  * per row, primitive loops — no boxing, no higher-order lambdas).
  *
  * Round-trip contract: pack∘unpack is IDENTITY on the bit pattern, so
  * two identical input vectors decode to identical floats — planted-
  * replica closed forms (cosine exactly 1.0) survive the tier, which is
  * what q143 oracles. Precision: round-half-up at bit 13; relative
  * error ≤ 2^-11 for normal values (|x| ∈ [6.1e-5, 65504]); overflow →
  * ±inf, NaN → canonical qNaN (0x7e00). Composes with the int8/PQ
  * tiers: fp16 is the lossless-enough archival layer, PQ the
  * scan-layer compression. */
case class HalfPack(child: Expression) extends UnaryExpression {

  private lazy val elemIsDouble = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_half_pack expects array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(ShortType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    HalfPack.pack(input.asInstanceOf[ArrayData], elemIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HalfPack.pack($c, $elemIsDouble)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HalfPack {

  /** float → binary16 bits. Round-half-up at the dropped 13 bits;
    * overflow → ±inf; NaN canonicalized to 0x7e00 (payload bits do not
    * survive — one NaN on disk, the hash-stability convention). */
  def floatToHalf(f: Float): Short = {
    val fbits = java.lang.Float.floatToIntBits(f)
    val sign = (fbits >>> 16) & 0x8000
    val absBits = fbits & 0x7fffffff
    // NaN drops the SIGN too: a computed -NaN packing to 0xfe00 would
    // put a second NaN pattern on disk and break content-hash dedup of
    // otherwise-identical vectors — ONE canonical qNaN (0x7e00)
    if (absBits > 0x7f800000) return 0x7e00.toShort           // NaN
    if (absBits == 0x7f800000) return (sign | 0x7c00).toShort // ±inf
    val v = absBits + 0x1000                                  // round half up
    if (v >= 0x47800000) return (sign | 0x7c00).toShort       // overflow → inf
    if (v >= 0x38800000) return (sign | ((v - 0x38000000) >>> 13)).toShort
    if (absBits < 0x33000000) return sign.toShort             // underflow → ±0
    val e = absBits >>> 23                                    // half subnormal
    (sign | ((((absBits & 0x7fffff) | 0x800000) + (0x800000 >>> (e - 102))) >>> (126 - e))).toShort
  }

  def pack(arr: ArrayData, fromDouble: Boolean): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val f = if (fromDouble) arr.getDouble(i).toFloat else arr.getFloat(i)
        out(i) = floatToHalf(f)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Decode the binary16 bit-pattern tier back to array<float> — the scan-
  * side expression: `unpack(h)` feeds the same cosine/dot pipeline as a
  * native float column. Exact (every binary16 value is exactly
  * representable in binary32). */
case class HalfUnpack(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ShortType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_half_unpack expects array<smallint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(FloatType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    HalfUnpack.unpack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HalfUnpack.unpack($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HalfUnpack {

  /** binary16 bits → float (exact widening; public-domain normalization
    * of the subnormal branch). */
  def halfToFloat(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits & 0x8000) << 16
    val exp = bits & 0x7c00
    var mant = bits & 0x03ff
    if (exp == 0x7c00)                                        // inf / nan
      return java.lang.Float.intBitsToFloat(sign | 0x7f800000 | (mant << 13))
    if (exp != 0)                                             // normal
      return java.lang.Float.intBitsToFloat(sign | (((exp + 0x1c000) | mant) << 13))
    if (mant == 0)                                            // ±0
      return java.lang.Float.intBitsToFloat(sign)
    var e = 0x1c400                                           // subnormal
    while ((mant & 0x400) == 0) { mant <<= 1; e -= 0x400 }
    java.lang.Float.intBitsToFloat(sign | ((e | (mant & 0x3ff)) << 13))
  }

  def unpack(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) out(i) = halfToFloat(arr.getShort(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

object Half {
  /** Column API: `pack` at write, `unpack` at scan. */
  def pack(c: Column): Column =
    GraftColumnGlue.toColumn(HalfPack(GraftColumnGlue.toExpr(c)))
  def unpack(c: Column): Column =
    GraftColumnGlue.toColumn(HalfUnpack(GraftColumnGlue.toExpr(c)))
}
