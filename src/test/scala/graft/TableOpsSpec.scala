package graft

import org.apache.spark.sql.functions._
import graft.ops.TableOps
import graft.functions.KerfOrdering

class TableOpsSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
    .toDF("k", "name", "v")

  test("update rewrites only matching rows (lexer.h:103 update)") {
    val got = TableOps.update(base, col("k") === 2, "v" -> lit(99.0))
      .orderBy("k").select("v").as[Double].collect().toSeq
    assert(got == Seq(10.0, 99.0, 30.0))
  }

  test("update evaluates predicate and ALL set expressions on PRE-update values") {
    // SQL semantics: `set v = 0, name = 'X' where v > 15` must update
    // name on the same rows even though v was zeroed in the same statement
    val got = TableOps.update(base, col("v") > 15, "v" -> lit(0.0), "name" -> lit("X"))
      .orderBy("k").collect().map(r => (r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", 10.0), ("X", 0.0), ("X", 0.0)))
    // set expressions read the ORIGINAL row, not earlier-set columns
    val swap = TableOps.update(base, lit(true), "v" -> (col("v") + 1), "k" -> (col("v").cast("int")))
      .orderBy("name").collect().map(r => (r.getInt(0), r.getDouble(2))).toSeq
    assert(swap == Seq((10, 11.0), (20, 21.0), (30, 31.0)))
  }

  test("applyIntern keeps an unrelated column named 'value'") {
    val df = Seq(("x", 1.5), ("y", 2.5), ("x", 3.5)).toDF("sym", "value")
    val dict = graft.ops.MapSetEnum.internTable(df, "sym")
    val coded = graft.ops.MapSetEnum.applyIntern(df, dict, "sym")
    assert(coded.columns.contains("value"), "user 'value' column was dropped")
    assert(coded.agg(sum("value")).collect()(0).getDouble(0) == 7.5)
  }

  test("saltedJoin rejects join types that would duplicate replicated rows") {
    intercept[IllegalArgumentException] {
      graft.ops.Skew.saltedJoin(base, base, Seq("k"), col("k"), 4, joinType = "right")
    }
  }

  test("delete removes matching rows") {
    assert(TableOps.delete(base, col("v") > 15).count() == 1)
  }

  test("insert appends by name") {
    val rows = Seq((4, "d", 40.0)).toDF("k", "name", "v")
    assert(TableOps.insert(base, rows).count() == 4)
  }

  test("upsert replaces same-key rows and inserts new ones") {
    val incoming = Seq((2, "B", 22.0), (4, "d", 40.0)).toDF("k", "name", "v")
    val got = TableOps.upsert(base, incoming, Seq("k"))
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, "a", 10.0), (2, "B", 22.0), (3, "c", 30.0), (4, "d", 40.0)))
  }

  test("select combinator chains where/group/order/limit (parser.h:541)") {
    val got = TableOps.select(base,
      where = Some(col("v") >= 10),
      group = Seq(lit(1).as("g")),
      aggs = Seq(sum("v").as("total")),
      order = Seq(col("total")))
    assert(got.collect()(0).getAs[Double]("total") == 60.0)
  }

  test("kerf truthiness: 0/0.0/nil falsy (test.cc:195)") {
    val df = Seq[(java.lang.Double, Int)]((0.0, 0), (1.5, 1), (null, 0), (Double.NaN, 0))
      .toDF("x", "want")
    val got = df.select((KerfOrdering.truthy(col("x")) === (col("want") === 1)).as("ok"))
      .as[Boolean].collect()
    assert(got.forall(identity))
  }

  test("kerfEq: null == NaN (test.cc:102–108)") {
    val df = Seq[(java.lang.Double, java.lang.Double)]((null, Double.NaN))
      .toDF("a", "b")
    assert(df.select(KerfOrdering.kerfEq(col("a"), col("b"))).as[Boolean].collect()(0))
  }

  test("epsEq/kerfCompare: NaN and Infinity never epsilon-equal finite values") {
    // Spark orders NaN == NaN and largest, so the naive epsilon formula
    // evaluates NaN <= NaN = true — NaN would equal EVERY number; same
    // for Inf <= eps*Inf. The finite guard pins these out.
    val df = Seq[(java.lang.Double, java.lang.Double, Boolean)](
      (Double.NaN, 5.0, false),
      (Double.NaN, Double.NaN, true),
      (Double.PositiveInfinity, 1.0, false),
      (Double.PositiveInfinity, Double.NegativeInfinity, false),
      (Double.PositiveInfinity, Double.PositiveInfinity, true),
      (Double.NegativeInfinity, Double.NegativeInfinity, true),
      (1.0, 1.0 + 1e-21, true),
      (1.0, 1.2, false)
    ).toDF("a", "b", "want")
    val bad = df.filter(
      KerfOrdering.epsEq(col("a"), col("b")) =!= col("want")).collect()
    assert(bad.isEmpty, s"epsEq drifted on: ${bad.mkString(", ")}")
    // the three-way compare orders NaN smallest, Inf largest — never 0
    val cmp = Seq((Double.NaN, 5.0), (Double.PositiveInfinity, 5.0))
      .toDF("a", "b")
      .select(KerfOrdering.kerfCompare(col("a"), col("b")))
      .as[Int].collect().toSeq
    assert(cmp == Seq(-1, 1), s"kerfCompare: $cmp")
  }
}
