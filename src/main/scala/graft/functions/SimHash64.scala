package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash of a token-hash array as ONE native codegen pass —
  * the sign-sum sketch of the dedup tier (SURVEY §2 SimHash row;
  * same stream-hash family as the reference, /root/reference/hash.cc).
  *
  * The column-algebra form it replaces builds 64 independent
  * `aggregate(tokenHashes, …)` expressions (one per bit) — higher-order
  * functions are CodegenFallback, so every row walked the token array 64
  * times through interpreted lambda evaluation. This expression computes
  * all 64 bit-sums in one primitive (token × bit) loop: zero allocation
  * beyond a 64-int counter block, no interpretation — the same
  * fallback-removal precedent as [[DotProduct]] and [[MinHashSignature]].
  *
  * BIT-IDENTICAL to the column form (pinned in LlmOpsSpec): bit i of the
  * signature is set iff Σ over elements of (+1 if bit i of the element
  * is set, else −1) is > 0. NULL elements count −1 on every bit (the
  * column form's `when(null === 1, +1).otherwise(−1)` path) and an empty
  * array yields signature 0. Null input → null. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHash64 {

  /** All 64 sign-sums in one (token × bit) loop. Arithmetic vs logical
    * shift is immaterial under `& 1`. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 64) { counts(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          counts(b) += (((h >>> b) & 1L).toInt << 1) - 1 // +1 set, −1 clear
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  /** Column API: 64-bit simhash of a token-hash array. */
  def simhash64(tokenHashes: Column): Column =
    GraftColumnGlue.toColumn(SimHash64(GraftColumnGlue.toExpr(tokenHashes)))
}
