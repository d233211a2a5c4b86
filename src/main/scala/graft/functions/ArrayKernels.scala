package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the per-row array shapes the round-18
  * STRUCTURAL CodegenFallback net exposed (CodegenCoverageSpec): each
  * replaces an interpreted higher-order-function chain that ran once
  * per SCANNED row — one boxed virtual call per array element per row,
  * the exact tax that regressed q104 in r16 — with one primitive JVM
  * loop invoked from generated code. Same fallback-removal precedent as
  * [[DotProduct]]/[[MatVecDots]]/[[Int8Codec]].
  *
  * Every kernel is BIT-IDENTICAL to the column-algebra chain it
  * replaces (pinned in ExtensionSpec against inline column twins),
  * including the null regimes, Spark's double total order (NaN
  * greatest, NaN==NaN, -0.0==0.0 — `SQLOrderingUtil.compareDoubles`
  * semantics), and first-occurrence tie-breaks. */
object ArrayKernels {

  /** Spark SQL's double comparison: -0.0 == 0.0, NaN == NaN, NaN
    * greater than everything (SQLOrderingUtil.compareDoubles). */
  private[functions] def cmpD(a: Double, b: Double): Int =
    if (a == b) 0 else java.lang.Double.compare(a, b)

  // -----------------------------------------------------------------
  // CountInSet — replaces size(filter(arr, x => x.isInCollection(set)))
  // -----------------------------------------------------------------

  /** Count of non-null elements contained in a plan-time string set.
    * Language-ID marker scoring and the stopword ratio ran this as an
    * interpreted ArrayFilter per row (5 of them, for language-ID).
    * Null array → null (ANSI `size(null)`); null elements don't count
    * (the filter predicate is null → dropped). */
  case class CountInSet(child: Expression, items: Seq[String])
      extends UnaryExpression {
    require(items.nonEmpty, "CountInSet needs at least one item")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"count_in_set expects array<string>, got ${other.simpleString}")
    }
    override def dataType: DataType = IntegerType

    @transient private lazy val set: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](items.size * 2)
      items.foreach(i => s.add(UTF8String.fromString(i)))
      s
    }

    def compute(input: ArrayData): Int = {
      val n = input.numElements()
      var c = 0
      var i = 0
      while (i < n) {
        if (!input.isNullAt(i) && set.contains(input.getUTF8String(i))) c += 1
        i += 1
      }
      c
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("cis", this, classOf[CountInSet].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // -----------------------------------------------------------------
  // TopKIndices — replaces the shared IVF/PQ probe-selection chain
  //   slice(transform(array_sort(zip_with(sims, sequence(0, n-1),
  //     (s, i) => struct(-s, i))), p => p.cid), 1, k)
  // -----------------------------------------------------------------

  /** Indices of the k largest doubles, descending, first-index tie-break
    * (== ascending (negated-value, index) struct sort). All four ANN
    * probe paths ran this as ZipWith+ArraySort+ArrayTransform per query
    * row. Null array → null (the column chain's zip_with(null, …));
    * a null ELEMENT negates to a null struct field, which Spark's
    * ascending struct order puts FIRST — faithfully: null sims win the
    * probe slots before any real sim. */
  case class TopKIndices(child: Expression, k: Int) extends UnaryExpression {
    require(k > 0, s"k must be positive, got $k")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"top_k_indices expects array<double>, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

    def compute(input: ArrayData): ArrayData = {
      val n = input.numElements()
      val idx = Array.range(0, n)
      // ascending (negsim, cid): null negsim first, then compareDoubles
      val sorted = idx.sortWith { (a, b) =>
        val an = input.isNullAt(a); val bn = input.isNullAt(b)
        if (an && bn) a < b
        else if (an) true
        else if (bn) false
        else {
          val c = cmpD(-input.getDouble(a), -input.getDouble(b))
          if (c != 0) c < 0 else a < b
        }
      }
      new GenericArrayData(sorted.take(math.min(k, n)).map(i => i: Any))
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("topk", this, classOf[TopKIndices].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // -----------------------------------------------------------------
  // SegmentsOf — replaces transform(sequence(0, ceil(n/k)-1),
  //                i => array_join(slice(toks, i*k+1, k), " "))
  // -----------------------------------------------------------------

  /** Consecutive k-element groups of a token array, each space-joined —
    * the repeated-span segmenter's per-row loop. Null array → null;
    * empty → empty; null elements are skipped by the join exactly as
    * `array_join` skips them (no separator doubling). */
  case class SegmentsOf(child: Expression, k: Int) extends UnaryExpression {
    require(k > 0, s"k must be positive, got $k")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"segments_of expects array<string>, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    def compute(input: ArrayData): ArrayData = {
      val n = input.numElements()
      if (n == 0) return new GenericArrayData(Array.empty[Any])
      val nSeg = (n + k - 1) / k
      val out = new Array[Any](nSeg)
      var s = 0
      while (s < nSeg) {
        val sb = new java.lang.StringBuilder
        var i = s * k
        val end = math.min(i + k, n)
        var first = true
        while (i < end) {
          if (!input.isNullAt(i)) {
            if (!first) sb.append(' ')
            sb.append(input.getUTF8String(i).toString)
            first = false
          }
          i += 1
        }
        out(s) = UTF8String.fromString(sb.toString)
        s += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("segs", this, classOf[SegmentsOf].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // -----------------------------------------------------------------
  // MaxAbsDiff — replaces aggregate(zip_with(a, b, (x,y) => abs(x-y)),
  //                0.0, (acc, v) => greatest(acc, v))
  // -----------------------------------------------------------------

  /** Elementwise max |a_i − b_i| folded from 0.0 — the int8 round-trip
    * error metric. Either array null → null; pairs with a null side (or
    * length-padding) are skipped (`greatest(acc, null)` keeps acc); NaN
    * diffs take the fold (NaN is greatest) — all exactly the column
    * fold's regime. */
  case class MaxAbsDiff(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(_: NumericType, _), ArrayType(_: NumericType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"max_abs_diff expects (array<numeric>, array<numeric>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
      }
    override def dataType: DataType = DoubleType

    @transient private lazy val lDt =
      left.dataType.asInstanceOf[ArrayType].elementType
    @transient private lazy val rDt =
      right.dataType.asInstanceOf[ArrayType].elementType

    def compute(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i)) {
          val d = math.abs(
            NumericArrays.toDouble(a, i, lDt) - NumericArrays.toDouble(b, i, rDt))
          if (cmpD(d, acc) > 0) acc = d
        }
        i += 1
      }
      acc
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("mad", this, classOf[MaxAbsDiff].getName)
      defineCodeGen(ctx, ev, (a, b) => s"$ref.compute($a, $b)")
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  // -----------------------------------------------------------------
  // WinnowFingerprint — replaces the two staged per-row transforms of
  // TextOps.fingerprint (k-gram xxhash64 rolling set + window-min
  // winnowing + distinct + sort)
  // -----------------------------------------------------------------

  /** Winnowing fingerprint (Schleimer et al., SIGMOD'03) of an already
    * NORMALIZED text column, as one primitive loop:
    *
    *  - empty text → empty array; 0 < length < k → [xxhash64(text)]
    *  - else gram hashes h_i = xxhash64(text[i..i+k)) (codepoint
    *    substring, Spark's seed-42 xxhash64 — bit-identical to the
    *    `xxhash64(substr(...))` column), window minima over each of the
    *    max(n−w, 0)+1 leading windows of w grams (`slice` clamps the
    *    tail exactly like the column form), then distinct + ascending
    *    sort.
    *
    * Null text → null (the caller coalesces null to "" first). */
  case class WinnowFingerprint(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_fingerprint expects string, got ${other.simpleString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    def compute(t: UTF8String): ArrayData = {
      val n = t.numChars()
      if (n == 0) return new GenericArrayData(Array.empty[Any])
      if (n < k)
        return new GenericArrayData(
          Array[Any](XxHash64Function.hash(t, StringType, 42L)))
      val nGrams = n - (k - 1)
      val hashes = new Array[Long](nGrams)
      var i = 0
      while (i < nGrams) {
        // substringSQL is 1-based and codepoint-indexed — the exact
        // semantics of Column.substr the column form hashed
        hashes(i) = XxHash64Function.hash(
          t.substringSQL(i + 1, k), StringType, 42L)
        i += 1
      }
      val nWin = math.max(nGrams - w, 0) + 1
      val mins = new Array[Long](nWin)
      var j = 0
      while (j < nWin) {
        var m = hashes(j)
        var x = j + 1
        val end = math.min(j + w, nGrams)
        while (x < end) { if (hashes(x) < m) m = hashes(x); x += 1 }
        mins(j) = m
        j += 1
      }
      java.util.Arrays.sort(mins)
      // distinct on the sorted array
      var uniq = 0
      var p = 0
      while (p < nWin) {
        if (p == 0 || mins(p) != mins(p - 1)) uniq += 1
        p += 1
      }
      val out = new Array[Any](uniq)
      var o = 0
      p = 0
      while (p < nWin) {
        if (p == 0 || mins(p) != mins(p - 1)) { out(o) = mins(p); o += 1 }
        p += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowFingerprint].getName)
      defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // ----- Column API -----

  def countInSet(arr: Column, items: Seq[String]): Column =
    GraftColumnGlue.toColumn(CountInSet(GraftColumnGlue.toExpr(arr), items))

  def topKIndices(sims: Column, k: Int): Column =
    GraftColumnGlue.toColumn(TopKIndices(GraftColumnGlue.toExpr(sims), k))

  def segmentsOf(tokens: Column, k: Int): Column =
    GraftColumnGlue.toColumn(SegmentsOf(GraftColumnGlue.toExpr(tokens), k))

  def maxAbsDiff(a: Column, b: Column): Column =
    GraftColumnGlue.toColumn(MaxAbsDiff(
      GraftColumnGlue.toExpr(a), GraftColumnGlue.toExpr(b)))

  def winnowFingerprint(text: Column, k: Int, w: Int): Column =
    GraftColumnGlue.toColumn(WinnowFingerprint(GraftColumnGlue.toExpr(text), k, w))
}
