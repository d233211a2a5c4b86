package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Kerf's ordering/equality semantics (/root/reference/grade.cc,
  * kerf.h:39, test.cc:102–108), exposed as opt-in column transforms.
  * Default engine semantics stay Spark/ANSI (the DuckDB oracle defines
  * t2 correctness — SURVEY §7.5.1); these shims reproduce reference
  * behavior where a caller wants Kerf-mode exactly.
  */
object KerfOrdering {

  /** Sort key under which NaN orders SMALLEST (Spark natively sorts NaN
    * largest; Kerf: FLOAT_NANS_COMPARE_AS_SMALLEST, grade.cc:15–26).
    * Use: df.orderBy(nanSmallestAsc(col)). Null and NaN coincide at the
    * bottom — which is exactly Kerf, where null==NaN (test.cc:102–108). */
  def nanSmallestAsc(c: Column): Column =
    when(isnan(c), lit(null).cast("double")).otherwise(c).asc_nulls_first
  def nanSmallestDesc(c: Column): Column =
    when(isnan(c), lit(null).cast("double")).otherwise(c).desc_nulls_last

  /** Kerf equality: int null == float NaN ("NANs are equal in Kerf",
    * test.cc:102–108); otherwise numeric equality. */
  def kerfEq(a: Column, b: Column): Column = {
    val aNull = a.isNull || isnan(a)
    val bNull = b.isNull || isnan(b)
    (aNull && bNull) || (!aNull && !bNull && a === b)
  }

  /** Epsilon-relative float equality: |a-b| <= E*max(|a|,|b|)
    * (grade.cc:9,41; default E is the reference's own 1e-20 — see
    * [[EpsilonEquals.KerfE]] for why that is effectively exact). The
    * epsilon branch applies to FINITE pairs only: with a NaN operand,
    * `NaN <= NaN` is TRUE under Spark's NaN-equals-NaN ordering (so NaN
    * would epsilon-equal every number), and with an infinite operand
    * `Inf <= eps·Inf` holds (so +Inf would equal every finite and -Inf).
    * NaN==NaN and Inf==Inf still hold, via kerfEq's exact branch. */
  def epsEq(a: Column, b: Column, eps: Double = EpsilonEquals.KerfE): Column = {
    val inf = lit(Double.PositiveInfinity)
    // finiteness is anchored on the NULL-INCLUSIVE missing test, not
    // bare isnan: isnan(null) is false, so `!isnan(null) && abs(null)
    // =!= inf` leaks SQL-null and a mixed null/finite pair would make
    // the whole predicate null instead of Kerf's definite FALSE
    // (missingness is a comparable value, never three-valued logic —
    // the same contract the codegen EpsilonEquals keeps)
    val aNull = a.isNull || isnan(a)
    val bNull = b.isNull || isnan(b)
    val finite = !aNull && !bNull && abs(a) =!= inf && abs(b) =!= inf
    kerfEq(a, b) || (finite && abs(a - b) <= lit(eps) * greatest(abs(a), abs(b)))
  }

  /** Three-way compare with Kerf total-order rules for doubles:
    * NaN/null smallest, then numeric (grade.cc:2–69). */
  def kerfCompare(a: Column, b: Column): Column = {
    val aKey = when(a.isNull || isnan(a), lit(Double.NegativeInfinity)).otherwise(a)
    val bKey = when(b.isNull || isnan(b), lit(Double.NegativeInfinity)).otherwise(b)
    when(epsEq(a, b), 0).when(aKey < bKey, -1).otherwise(1)
  }

  /** Kerf truthiness: 0, 0.0, '\0', nil are falsy (slop.h:919–943,
    * test.cc:195–204). */
  def truthy(c: Column): Column =
    c.isNotNull && !isnan(c.cast("double")) && c.cast("double") =!= 0.0
}
