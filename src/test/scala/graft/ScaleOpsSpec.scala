package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Scale-path operators: salting and sketch aggregates. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows on one hot key — the shape that melts a single reducer
  private lazy val skewed = spark.range(10000)
    .select((when(col("id") % 10 =!= 0, lit("HOT")).otherwise(col("id").cast("string"))).as("k"),
            col("id").cast("double").as("v"))

  test("saltedAgg matches plain groupBy on skewed data") {
    val plain = skewed.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAgg(skewed, Seq(col("k")), Seq(col("v")), 8)(Seq(
        ("s", sum(col("v").cast("decimal(18,2)")), (c: String) => sum(col(c))),
        ("n", count(lit(1)), (c: String) => sum(col(c)))))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin matches plain join on skewed key") {
    val dim = Seq(("HOT", "hot-dim"), ("0", "zero-dim")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k")).groupBy("label").count()
      .orderBy("label").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), col("v"), 8)
      .groupBy("label").count().orderBy("label").collect().toSeq
    assert(salted == plain)
  }

  test("saltedAgg plan: two shuffles, the first on (keys, salt)") {
    // the whole point of salting is shuffle SHAPE: phase 1 must exchange
    // on (k, __salt) — spreading the hot key over `buckets` reducers —
    // and phase 2 re-aggregates the tiny per-(key, salt) partials on k
    val df = Skew.saltedAgg(skewed, Seq(col("k")), Seq(col("v")), 8)(Seq(
      ("s", sum(col("v").cast("decimal(18,2)")), (c: String) => sum(col(c))),
      ("n", count(lit(1)), (c: String) => sum(col(c)))))
    df.collect()
    // the AQE plan string repeats the tree under "== Initial Plan ==" —
    // count exchanges in the final section only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 2, s"two-phase salted agg should shuffle twice, saw $exchanges:\n$p")
    assert("hashpartitioning\\(k[#\\d]*, __salt".r.findFirstIn(p).isDefined,
      s"phase-1 exchange is not on (k, __salt):\n$p")
  }

  test("salt is deterministic (retry-safe), never rand()") {
    val a = skewed.select(Skew.salt(16, col("v")).as("s")).collect().map(_.getInt(0))
    val b = skewed.select(Skew.salt(16, col("v")).as("s")).collect().map(_.getInt(0))
    assert(a.toSeq == b.toSeq)
    assert(a.toSet.size > 1)
  }

  test("sketch aggregates: approx_count_distinct within rsd, approx quantiles sane") {
    val li = Tables.lineitem(spark, sf)
    val exact = li.select(countDistinct("l_orderkey")).collect()(0).getLong(0)
    val approx = li.select(approx_count_distinct("l_orderkey", 0.02)).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
    val Array(q1, med, q3) = li.stat.approxQuantile("l_quantity", Array(0.25, 0.5, 0.75), 0.01)
    assert(q1 <= med && med <= q3 && q1 >= 1 && q3 <= 50)
  }
}
