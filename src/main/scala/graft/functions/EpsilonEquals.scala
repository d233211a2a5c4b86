package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftColumnGlue
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** Kerf's float equality as a NATIVE Catalyst expression with codegen
  * (SURVEY §7.4: custom `Expression` tier): epsilon-relative compare
  * `|a-b| <= ε·max(|a|,|b|)` (/root/reference/grade.cc:9,41) under Kerf's
  * null/NaN regime where int-null == float-NaN == null compare EQUAL
  * (/root/reference/test.cc:102–108, kerf.h:211–233).
  *
  * Never null-producing: missingness is a comparable value in Kerf, not
  * SQL three-valued logic. The generated code is branch-light and inlines
  * into whole-stage codegen — this is the (b) tier of the extension
  * preference order, used when Column combinators would cost a when-chain
  * per operand. */
case class EpsilonEquals(left: Expression, right: Expression, eps: Double)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"eps_eq expects (double, double), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    val aMissing = a == null || a.asInstanceOf[Double].isNaN
    val bMissing = b == null || b.asInstanceOf[Double].isNaN
    if (aMissing || bMissing) aMissing && bMissing
    else {
      val x = a.asInstanceOf[Double]; val y = b.asInstanceOf[Double]
      // epsilon branch is FINITE-only: |Inf - finite| <= eps·Inf holds,
      // so an overflow-produced infinity would otherwise equal everything
      x == y || (!x.isInfinite && !y.isInfinite &&
        math.abs(x - y) <= eps * math.max(math.abs(x), math.abs(y)))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = left.genCode(ctx)
    val b = right.genCode(ctx)
    val aM = ctx.freshName("aMissing")
    val bM = ctx.freshName("bMissing")
    ev.copy(
      code = code"""
        ${a.code}
        ${b.code}
        boolean $aM = ${a.isNull} || Double.isNaN(${a.value});
        boolean $bM = ${b.isNull} || Double.isNaN(${b.value});
        boolean ${ev.value} = ($aM || $bM)
          ? ($aM && $bM)
          : (${a.value} == ${b.value} ||
             (!Double.isInfinite(${a.value}) && !Double.isInfinite(${b.value}) &&
              Math.abs(${a.value} - ${b.value}) <=
                $eps * Math.max(Math.abs(${a.value}), Math.abs(${b.value}))));
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object EpsilonEquals {
  /** The reference's own E (grade.cc:9: `F E=0.00000000000000000001`).
    * Note what that constant MEANS: 1e-20 relative is below the minimum
    * relative spacing of distinct doubles (2⁻⁵² ≈ 2.2e-16), so for
    * finite normalized values the epsilon branch can never fire —
    * reference Kerf equality is EFFECTIVELY EXACT equality plus the
    * null==NaN regime. We reproduce that faithfully as the default
    * (r17: was 1e-14, a materially more tolerant equality than the
    * reference — the ADVICE fidelity gap); callers who want a USABLE
    * tolerance pass `eps` explicitly (q82 does, at 1e-14 ≈ 45·DBL_EPSILON
    * — the "small multiple of DBL_EPSILON" the reference comment
    * suggests as the alternative). */
  val KerfE: Double = 1e-20

  /** Column API: `eps_eq($"a", $"b")`. Inputs cast to double. */
  def eps_eq(a: Column, b: Column, eps: Double = KerfE): Column =
    GraftColumnGlue.toColumn(EpsilonEquals(
      GraftColumnGlue.toExpr(a.cast("double")),
      GraftColumnGlue.toExpr(b.cast("double")), eps))

  /** Register as SQL function `eps_eq(a, b[, eps])` for the session.
    * The r17 default change (1e-14 → the reference's E = 1e-20) made the
    * two-arg form effectively exact equality; the three-arg overload is
    * the migration path for SQL callers who relied on a usable tolerance
    * (`eps_eq(a, b, 1e-14)`) — the r17 ADVICE ask. `eps` must be a
    * constant (foldable): it compiles into the generated code. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "eps_eq",
      { exprs =>
        def dbl(e: Expression) =
          org.apache.spark.sql.catalyst.expressions.Cast(e, DoubleType)
        exprs match {
          case Seq(a, b) => EpsilonEquals(dbl(a), dbl(b), KerfE)
          case Seq(a, b, e) =>
            val eps = if (e.foldable) dbl(e).eval(null) else null
            require(eps != null,
              s"eps_eq: third argument must be a constant numeric epsilon, got ${e.sql}")
            EpsilonEquals(dbl(a), dbl(b), eps.asInstanceOf[Double])
          case _ => throw new IllegalArgumentException(
            s"eps_eq expects 2 or 3 arguments, got ${exprs.size}")
        }
      },
      "built-in")
}
