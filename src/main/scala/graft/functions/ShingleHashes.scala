package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle hashes of a NORMALIZED text column, as a
  * native expression — the map-stage workhorse of the dedup family
  * (MinHash banding, decontamination).
  *
  * The column-algebra chain it replaces (split → per-shingle
  * `concat_ws(" ", slice(tokens, i, n))` → `xxhash64` → `array_distinct`)
  * allocates a token array, a string per shingle, and two intermediate
  * arrays per row, and evaluates interpreted (higher-order functions are
  * CodegenFallback). After [[graft.llm.Dedup.normText]] every shingle is
  * BY CONSTRUCTION a byte range of the normalized text (single spaces,
  * no edge whitespace), so this expression hashes token windows IN PLACE
  * over the UTF8String's bytes — zero per-shingle allocation — with
  * Spark's own XXH64 (seed 42), making each hash BIT-IDENTICAL to
  * `xxhash64(shingle_string)`. Output order is first occurrence;
  * duplicates are dropped (hash-set identity == string identity up to
  * 64-bit collision, the same equivalence the whole minhash stack
  * already stands on).
  *
  * Matches the chain's edge semantics: fewer than n tokens hashes the
  * whole string (including "" for an empty document). Null text → null.
  * The heavy loop lives in [[ShingleHashes.compute]]; codegen emits one
  * static call per row, keeping the surrounding stage fused. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects a string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ShingleHashes {

  /** One pass over the normalized text's bytes: token starts are the
    * positions after each ' '; shingle i spans tokens [i, i+n) =
    * bytes [starts(i), ends(i+n-1)); each window hashes via XXH64 with
    * Spark's xxhash64 seed. Distinct by first occurrence. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val numBytes = s.numBytes()
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    // token boundaries (normText guarantees single spaces, no edges)
    val starts = new java.util.ArrayList[Integer]()
    starts.add(0)
    var i = 0
    while (i < numBytes) {
      if (s.getByte(i) == ' '.toByte) starts.add(i + 1)
      i += 1
    }
    val nTokens = starts.size()
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    if (nTokens < n) {
      // fewer than n tokens: one shingle = the whole (possibly empty) text
      out.add(XXH64.hashUnsafeBytes(base, offset, numBytes, 42L))
    } else {
      var t = 0
      while (t <= nTokens - n) {
        val from = starts.get(t)
        val to = if (t + n < nTokens) starts.get(t + n) - 1 else numBytes
        val h = XXH64.hashUnsafeBytes(base, offset + from, to - from, 42L)
        if (seen.add(h)) out.add(h)
        t += 1
      }
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** Column API: distinct n-gram shingle hashes of an ALREADY-normalized
    * string (apply [[graft.llm.Dedup.normText]] first). */
  def shingleHashes(normalizedText: Column, n: Int): Column =
    GraftColumnGlue.toColumn(ShingleHashes(
      GraftColumnGlue.toExpr(normalizedText), n))
}
