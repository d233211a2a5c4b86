package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Seeded counter-based RNG — the Spark-native answer to the reference's
  * per-thread PCG streams (/root/reference/rng.h:18–29, rng.cc, pcg/).
  *
  * The reference keeps MUTABLE per-thread generator state
  * (`The_Thread_RNGs`, rng.h:38) and offers `seed_fixed` for
  * reproducibility (rng.h:21–22). Mutable stream state is exactly what a
  * distributed engine cannot have: task retries, speculative execution,
  * and partition re-planning would all re-draw different values, so a
  * "random" column would not survive its own recomputation. The
  * COUNTER-BASED form keeps the reproducibility contract and drops the
  * state: `randU64(seed, i)` is a pure function of (seed, counter), so
  * any row can be recomputed anywhere, any number of times, identically
  * — and draws are order-free across partitions (no sequential stream to
  * serialize through).
  *
  * The generator is SplitMix64 (Steele/Lea/Flood, public domain; the
  * standard seeder of the xoshiro family): state_i = seed + (i+1)·γ with
  * γ = 0x9E3779B97F4A7C15, output = mix64(state_i). Java long arithmetic
  * wraps mod 2^64, which is the algorithm's native ring. The [0,1)
  * conversion is the standard 53-bit one — `(u64 >>> 11) · 2⁻⁵³` — the
  * same formula the reference uses (rng.h:29).
  *
  * Everything downstream is COMPOSITION, not new operators:
  *  - Bernoulli sample: `WHERE randu01(seed, key) < p` — pushed to the
  *    scan like any predicate; no shuffle, survives retries.
  *  - Exact-n sample: `ORDER BY randu64(seed, key), key LIMIT n` — a
  *    per-partition top-n heap (TakeOrderedAndProject), never a full
  *    sort, at any scale.
  *  - Train/val/test split: fold = first index whose cumulative weight
  *    exceeds `randu01(seed, key)` — one scalar per row, deterministic
  *    under re-runs, consistent across tables sharing the key.
  *
  * Seeding by a KEY COLUMN (not a row position) is deliberate: Spark has
  * no stable row order, so `monotonically_increasing_id` would tie the
  * draw to a physical plan. A draw keyed on domain identity is stable
  * under repartitioning, and consistent across any table carrying the
  * same key.
  */
object Rng {
  final val Golden = 0x9E3779B97F4A7C15L

  /** SplitMix64 finalizer (public-domain constants). */
  def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** i-th draw of the seed's stream, as a uniform 64-bit word. */
  def randU64(seed: Long, i: Long): Long = mix64(seed + (i + 1L) * Golden)

  /** i-th draw as a double on [0,1), 53-bit precision (rng.h:29). */
  def randU01(seed: Long, i: Long): Double =
    (randU64(seed, i) >>> 11) * (1.0 / 9007199254740992.0)

  /** Column face: uniform 64-bit word from (seed, counter/key). */
  def randu64(seed: Column, i: Column): Column =
    GraftColumnGlue.toColumn(RandU64(
      GraftColumnGlue.toExpr(seed), GraftColumnGlue.toExpr(i)))

  /** Column face: uniform double on [0,1) from (seed, counter/key). */
  def randu01(seed: Column, i: Column): Column =
    GraftColumnGlue.toColumn(RandU01(
      GraftColumnGlue.toExpr(seed), GraftColumnGlue.toExpr(i)))
}

/** Native codegen: one multiply-xorshift chain per row, inside
  * whole-stage codegen (a Column-algebra form would ANSI-throw on the
  * deliberate wrapping multiplies). */
case class RandU64(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"randu64 expects (bigint, bigint), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any, i: Any): Any =
    Rng.randU64(s.asInstanceOf[Long], i.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, i) => s"graft.functions.Rng.randU64($s, $i)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The [0,1) face as its own expression so the >>> 11 stays in Java
  * (logical shift; Column shiftrightunsigned would work but this keeps
  * one leaf per draw). */
case class RandU01(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"randu01 expects (bigint, bigint), got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(s: Any, i: Any): Any =
    Rng.randU01(s.asInstanceOf[Long], i.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, i) => s"graft.functions.Rng.randU01($s, $i)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
