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
    // token boundaries (normText guarantees single spaces, no edges) —
    // a growable PRIMITIVE int array: the boxed ArrayList/HashSet
    // formulation allocated one Integer per token and ~two boxed Longs
    // per distinct shingle on the hottest map stage in the dedup family
    var starts = new Array[Int](16)
    starts(0) = 0
    var nTokens = 1
    var i = 0
    while (i < numBytes) {
      if (s.getByte(i) == ' '.toByte) {
        if (nTokens == starts.length)
          starts = java.util.Arrays.copyOf(starts, nTokens << 1)
        starts(nTokens) = i + 1
        nTokens += 1
      }
      i += 1
    }
    if (nTokens < n) {
      // fewer than n tokens: one shingle = the whole (possibly empty) text
      return new GenericArrayData(
        Array(XXH64.hashUnsafeBytes(base, offset, numBytes, 42L)))
    }
    val nShingles = nTokens - n + 1
    // open-addressing long set at load factor <= 0.5 (power-of-two cap;
    // a used[] presence plane sidesteps the 0-as-empty-sentinel trap)
    var cap = 4
    while (cap < (nShingles << 1)) cap <<= 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val mask = cap - 1
    val out = new Array[Long](nShingles)
    var outN = 0
    var t = 0
    while (t < nShingles) {
      val from = starts(t)
      val to = if (t + n < nTokens) starts(t + n) - 1 else numBytes
      val h = XXH64.hashUnsafeBytes(base, offset + from, to - from, 42L)
      var idx = java.lang.Long.hashCode(h) & mask
      var dup = false
      while (used(idx) && !dup) {
        if (table(idx) == h) dup = true
        else idx = (idx + 1) & mask
      }
      if (!dup) {
        used(idx) = true; table(idx) = h
        out(outN) = h; outN += 1
      }
      t += 1
    }
    new GenericArrayData(
      if (outN == nShingles) out else java.util.Arrays.copyOf(out, outN))
  }

  /** Column API: distinct n-gram shingle hashes of an ALREADY-normalized
    * string (apply [[graft.llm.Dedup.normText]] first). */
  def shingleHashes(normalizedText: Column, n: Int): Column =
    GraftColumnGlue.toColumn(ShingleHashes(
      GraftColumnGlue.toExpr(normalizedText), n))
}
