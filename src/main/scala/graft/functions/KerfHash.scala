package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kerf's representational hashing/equality (/root/reference/
  * hash.h:23–27, enums.h:98–143): hash and equality see the VALUE, not
  * the storage width — `[1,2,3]` as int8 vector hashes the same as int64
  * (`hash.h:23 "width-insensitive"`); int 1 equals float 1.0.
  *
  * Spark's xxhash64 is width-sensitive (hashes the raw bytes of the
  * static type), so representational hashing = canonicalize first:
  * integral types → long, fractional → double (integral-valued doubles
  * collapse to the long image, preserving int==float equality), strings/
  * binary as-is, arrays elementwise.
  */
object KerfHash {

  /** Canonical form whose bytes are width-independent: every numeric
    * value renders to one tagged string ("n:1" for int8/int64/1.0 alike —
    * the representational class NUMBER, enums.h:117–121), strings carry
    * their own "s:" tag (classes must be DISJOINT: a raw string that
    * happens to spell "n:1" must not collide with the number 1 — user
    * text and log lines do contain such shapes), arrays canonicalize
    * elementwise. */
  def canonical(c: Column, t: DataType): Column = t match {
    case ByteType | ShortType | IntegerType | LongType =>
      concat(lit("n:"), c.cast(LongType).cast(StringType))
    case FloatType | DoubleType =>
      // integral-valued floats canonicalize like the integer (int==float)
      when(c.isNull, lit(null).cast(StringType))
        .when(c.cast(DoubleType) === c.cast(DoubleType).cast(LongType).cast(DoubleType),
              concat(lit("n:"), c.cast(LongType).cast(StringType)))
        .otherwise(concat(lit("n:"), c.cast(DoubleType).cast(StringType)))
    case StringType => concat(lit("s:"), c)
    case ArrayType(et, _) => transform(c, x => canonical(x, et))
    case _ => c
  }

  /** Width-insensitive 64-bit hash (same xxhash family as the reference's
    * stream hash, hash.cc:1–145). */
  def representational(c: Column, t: DataType): Column =
    xxhash64(canonical(c, t))

  /** Representational equality: value-level, across widths. */
  def reprEq(a: Column, ta: DataType, b: Column, tb: DataType): Column =
    canonical(a, ta) === canonical(b, tb)
}
