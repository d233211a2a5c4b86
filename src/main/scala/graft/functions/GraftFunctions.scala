package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnGlue.{toColumn, toCatalystExpr}

/** The graft library surface for plain `spark.sql` users: every
  * single-pass text/pipeline helper registered as a SQL "macro" — the
  * builder splices the SAME composed Catalyst expression tree the Column
  * API builds (codegen'd, no UDFs), so `SELECT graft_redact_pii(text)`
  * and `Pipeline.redactPii(col("text"))` are literally one plan.
  *
  * Only few-reference helpers are registered (cosine references each arg
  * 2-3× — free for attribute args, the normal SQL call shape): anything
  * that must STAGE an intermediate attribute (simhash's 64 aggregates
  * over one token-hash array, fingerprinting) is exposed through the
  * DataFrame API instead — a macro would inline the staged tree once per
  * consumer (the no-CSE-in-lambda rule), silently multiplying per-row
  * cost. */
object GraftFunctions {

  private def unary(spark: SparkSession, name: String)(f: Column => Column): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        require(exprs.length == 1, s"$name takes 1 argument")
        toCatalystExpr(f(toColumn(exprs.head)))
      },
      "built-in")

  private def binary(spark: SparkSession, name: String)(f: (Column, Column) => Column): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        require(exprs.length == 2, s"$name takes 2 arguments")
        toCatalystExpr(f(toColumn(exprs(0)), toColumn(exprs(1))))
      },
      "built-in")

  /** (column, literal-int) shape — the native dedup expressions carry
    * their width as a constructor parameter, so the SQL form demands a
    * literal (a per-row width has no meaning for a fixed-width sketch). */
  private def withIntLit(spark: SparkSession, name: String)(f: (Column, Int) => Column): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{IntegerType, LongType}
        require(exprs.length == 2, s"$name takes 2 arguments")
        val n = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case Literal(v: Long, LongType) => v.toInt
          case other => throw new IllegalArgumentException(
            s"$name: second argument must be a literal integer, got $other")
        }
        toCatalystExpr(f(toColumn(exprs.head), n))
      },
      "built-in")

  /** (column, literal-double) shape — EmaScan carries α as a
    * constructor parameter (it parameterizes the fold, it isn't data). */
  private def withDoubleLit(spark: SparkSession, name: String)
                           (f: (Column, Double) => Column): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}
        require(exprs.length == 2, s"$name takes 2 arguments")
        val a = exprs(1) match {
          case Literal(v: Double, DoubleType) => v
          case Literal(v: Int, IntegerType) => v.toDouble
          case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) => v.toDouble
          case other => throw new IllegalArgumentException(
            s"$name: second argument must be a literal number, got $other")
        }
        toCatalystExpr(f(toColumn(exprs.head), a))
      },
      "built-in")

  /** Register the whole graft function surface on a session. */
  def registerAll(spark: SparkSession): Unit = {
    unary(spark, "graft_norm_text")(graft.llm.Dedup.normText)
    unary(spark, "graft_clean_text")(graft.llm.TextOps.cleanText)
    unary(spark, "graft_redact_pii")(graft.llm.Pipeline.redactPii)
    unary(spark, "graft_token_count")(c => graft.llm.TextOps.tokenCount(c).cast("long"))
    unary(spark, "graft_subword_count")(c => graft.llm.TextOps.subwordCount(c).cast("long"))
    binary(spark, "graft_hamming")(graft.llm.Dedup.hamming)
    binary(spark, "graft_dot")(graft.llm.Similarity.dot)
    binary(spark, "graft_cosine")(graft.llm.Similarity.cosine)
    // the native dedup map stage, SQL-reachable: shingle a NORMALIZED
    // text (compose with graft_norm_text) and sign a shingle-hash array
    withIntLit(spark, "graft_shingle_hashes")(
      (c, n) => ShingleHashes.shingleHashes(c, n))
    withIntLit(spark, "graft_minhash_signature")(
      (c, h) => MinHashSignature.minhashSignature(c, h))
    // fp16 storage tier (FLOAT1_ARRAY, enums.h:196): pack at write,
    // unpack at scan
    unary(spark, "graft_half_pack")(Half.pack)
    unary(spark, "graft_half_unpack")(Half.unpack)
    withDoubleLit(spark, "graft_ema")(graft.ops.Adverbs.ema)
    EpsilonEquals.register(spark)
    MinHashAgg.register(spark)
  }
}
