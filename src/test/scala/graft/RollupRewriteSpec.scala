package graft

import org.apache.spark.sql.functions._
import graft.io.Folio

/** Aggregate navigation (plans/RollupRewriteRule): mergeable
  * aggregates over a rollup-backed view must re-aggregate the
  * maintained rollup instead of scanning the history — and every
  * soundness gate must leave the plan untouched. */
class RollupRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def mkRollup(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft_nav").toString
    // integer-valued doubles: decimal-exact sums == fp sums, so the
    // rewritten and unrewritten answers are bit-identical here
    Seq(("a", 1L, 2.0), ("a", 2L, 4.0), ("b", 1L, 6.0)).toDF("k", "j", "v")
      .pipe(Folio.appendWithRollup(_, path, Seq("k", "j"), Seq("v")))
    Seq(("a", 1L, 8.0), ("c", 3L, 10.0)).toDF("k", "j", "v")
      .pipe(Folio.appendWithRollup(_, path, Seq("k", "j"), Seq("v")))
    path
  }
  implicit private class Piper[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }

  test("navigation: mergeable aggregates read the rollup; gates hold") {
    val path = mkRollup()
    Folio.rollupDataView(spark, path, "ru_nav")
    spark.conf.set("spark.graft.rollup.rewrite", "true")
    try {
      val q = spark.sql(
        "SELECT k, count(*) AS n, sum(v) AS sv, min(v) AS mn, " +
        "max(v) AS mx, count(v) AS cv, avg(v) AS av " +
        "FROM ru_nav GROUP BY k ORDER BY k")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("/meta/") && !plan.contains("/batches/"),
        s"navigation did not take the rollup:\n$plan")
      val rows = q.collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5),
        r.getDouble(6))).toSeq
      assert(rows == Seq(
        ("a", 3L, 14.0, 2.0, 8.0, 3L, 14.0 / 3.0),
        ("b", 1L, 6.0, 6.0, 6.0, 1L, 6.0),
        ("c", 1L, 10.0, 10.0, 10.0, 1L, 10.0)), s"got $rows")
      // SUBSET-key grouping and the GLOBAL aggregate re-merge the
      // rollup (the partials are mergeable by construction)
      val g = spark.sql("SELECT sum(v) AS sv, count(*) AS n FROM ru_nav")
      assert(g.queryExecution.executedPlan.toString.contains("/meta/"))
      val gr = g.first()
      assert((gr.getDouble(0), gr.getLong(1)) == ((30.0, 5L)))
      // gate: a FILTER disables navigation (the rollup covers all rows)
      val f = spark.sql(
        "SELECT k, sum(v) AS sv FROM ru_nav WHERE v > 3 GROUP BY k")
      assert(f.queryExecution.executedPlan.toString.contains("/batches/"),
        "filtered aggregate must scan the history")
      assert(f.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
        Set(("a", 12.0), ("b", 6.0), ("c", 10.0)))
      // gate: DISTINCT disables
      val d = spark.sql(
        "SELECT k, count(DISTINCT v) AS dv FROM ru_nav GROUP BY k")
      assert(d.queryExecution.executedPlan.toString.contains("/batches/"))
      // gate: a non-tracked aggregate (stddev) disables
      val s = spark.sql("SELECT k, stddev(v) AS sd FROM ru_nav GROUP BY k")
      assert(s.queryExecution.executedPlan.toString.contains("/batches/"))
      // gate: flag off → untouched
      spark.conf.set("spark.graft.rollup.rewrite", "false")
      val off = spark.sql("SELECT k, sum(v) AS sv FROM ru_nav GROUP BY k")
      assert(off.queryExecution.executedPlan.toString.contains("/batches/"))
    } finally {
      spark.conf.unset("spark.graft.rollup.rewrite")
      graft.plans.RollupRewriteRule.clear()
    }
  }

  test("navigation stays CURRENT: an append after registration re-binds or bails") {
    val path = mkRollup()
    Folio.rollupDataView(spark, path, "ru_nav2")
    spark.conf.set("spark.graft.rollup.rewrite", "true")
    try {
      // append AFTER registration: the OLD view's scan no longer covers
      // the live manifest, so the stale-scan aggregate must NOT
      // navigate (it would over-count) — the fresh view does
      Seq(("a", 9L, 100.0)).toDF("k", "j", "v")
        .pipe(Folio.appendWithRollup(_, path, Seq("k", "j"), Seq("v")))
      val stale = spark.sql("SELECT sum(v) AS sv FROM ru_nav2")
      assert(stale.queryExecution.executedPlan.toString.contains("/batches/"),
        "stale scan must not navigate to a newer rollup")
      assert(stale.first().getDouble(0) == 30.0) // the view's own rows
      Folio.rollupDataView(spark, path, "ru_nav2")
      val fresh = spark.sql("SELECT sum(v) AS sv FROM ru_nav2")
      assert(fresh.queryExecution.executedPlan.toString.contains("/meta/"))
      assert(fresh.first().getDouble(0) == 130.0)
    } finally {
      spark.conf.unset("spark.graft.rollup.rewrite")
      graft.plans.RollupRewriteRule.clear()
    }
  }

  test("navigated GLOBAL count over an all-empty rollup answers 0, not NULL") {
    val path = java.nio.file.Files.createTempDirectory("graft_nav0").toString
    // a manifested batch with ZERO rows: the maintained rollup is empty,
    // and sum(n_rows) over it is NULL — the rewrite must coalesce to the
    // raw scan's answer (count(*) over no rows = 0)
    Seq(("a", 1.0)).toDF("k", "v").filter(col("k") === "never")
      .pipe(Folio.appendWithRollup(_, path, Seq("k"), Seq("v")))
    Folio.rollupDataView(spark, path, "ru_nav0")
    spark.conf.set("spark.graft.rollup.rewrite", "true")
    try {
      val q = spark.sql("SELECT count(*) AS n, count(v) AS cv FROM ru_nav0")
      assert(q.queryExecution.executedPlan.toString.contains("/meta/"),
        "empty rollup should still navigate")
      val r = q.first()
      assert(!r.isNullAt(0) && r.getLong(0) == 0L, s"count(*): $r")
      assert(!r.isNullAt(1) && r.getLong(1) == 0L, s"count(v): $r")
    } finally {
      spark.conf.unset("spark.graft.rollup.rewrite")
      graft.plans.RollupRewriteRule.clear()
    }
  }
}
