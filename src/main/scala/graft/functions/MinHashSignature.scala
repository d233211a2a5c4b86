package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** H-seed MinHash signature of a shingle-hash array, as ONE native
  * codegen pass — the other half of the dedup map stage (the first half
  * is [[ShingleHashes]]).
  *
  * The column-algebra form it replaces —
  * `transform(sequence(0, H-1), s => array_min(transform(shh, h =>
  * xxhash64(s, h))))` — walks the shingle array H times through
  * interpreted higher-order functions (CodegenFallback), allocating an
  * H-element array of N-element arrays of boxed longs per row before the
  * minima are taken. This expression computes all H minima in one fused
  * (shingle × seed) loop over primitive longs: zero intermediate
  * allocation, no interpretation.
  *
  * BIT-IDENTICAL to the column form: Spark's `xxhash64(s, h)` folds
  * left — `XXH64.hashInt(s, 42)` then `XXH64.hashLong(h, ·)` — so the
  * per-seed prefix is a constant, precomputed once per signature width
  * and cached (same hash family the reference seeds its stream hash
  * with, /root/reference/hash.cc:1–145). MinHashAgg's sketch and the
  * LSH banding stack sit on the same family (pinned in ExtensionSpec).
  *
  * Null input → null. An EMPTY input yields the fold identity
  * (Long.MaxValue per seed) — deterministic, unlike the column form's
  * array of null minima; unreachable from the pipeline anyway, since
  * [[ShingleHashes]] emits at least one hash even for an empty
  * document. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1, "signature width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSignature.compute($c, $numHashes)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignature {

  /** Per-seed hash prefixes `XXH64.hashInt(s, 42)` for s in [0, H) —
    * constants of the signature width, cached across rows. */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()

  private def seeds(h: Int): Array[Long] =
    seedCache.computeIfAbsent(h, width => {
      val a = new Array[Long](width)
      var s = 0
      while (s < width) { a(s) = XXH64.hashInt(s, 42L); s += 1 }
      a
    })

  /** All H minima in one (shingle × seed) loop; empty input → the fold
    * identity (see class doc). A NULL element matches Spark's xxhash64
    * fold exactly: null children are SKIPPED, so the element's per-seed
    * candidate is the bare seed prefix (never reachable from
    * [[ShingleHashes]] output, but callers can feed any array<bigint>). */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val pre = seeds(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var s = 0
        while (s < numHashes) {
          if (pre(s) < mins(s)) mins(s) = pre(s)
          s += 1
        }
      } else {
        val h = arr.getLong(i)
        var s = 0
        while (s < numHashes) {
          val v = XXH64.hashLong(h, pre(s))
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API: H-seed minhash signature of a shingle-hash array. */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    GraftColumnGlue.toColumn(MinHashSignature(
      GraftColumnGlue.toExpr(shingleHashes), numHashes))
}
