package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** Native AsOfJoinExec (custom LogicalPlan+Strategy+SparkPlan) must agree
  * with the union+window rewrite everywhere, and its plan must show the
  * custom operator with one exchange per side. */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native backward as-of matches fixture truth (incl. equal-ts)") {
    val left = Seq(("A", 5L, "q1"), ("A", 10L, "q2"), ("A", 20L, "q3"),
                   ("A", 30L, "q4"), ("B", 7L, "q5"))
      .toDF("k", "t", "qid")
    val right = Seq(("A", 10L, 1.0), ("A", 25L, 2.0), ("C", 1L, 9.9))
      .toDF("k", "rt", "px")
    val got = AsOf.joinNative(left, right.withColumnRenamed("k", "k"),
        Seq("k"), "t", "rt")
      .orderBy("k", "t")
      .select("qid", "px").as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(("q1", None), ("q2", Some(1.0)), ("q3", Some(1.0)),
                      ("q4", Some(2.0)), ("q5", None)))
  }

  test("float keys: 0.0 and -0.0 match (SQL equality), wild-apart ts never wraps") {
    // ±0.0 are DIFFERENT under Double.compare but equal under SQL join
    // equality — the exec normalizes keys so the merge groups them
    val left = Seq((0.0, 100L, "l1"), (-0.0, 200L, "l2"))
      .toDF("k", "t", "qid")
    val right = Seq((-0.0, 50L, 1.0), (0.0, 150L, 2.0))
      .toDF("k", "rt", "px")
    val got = AsOf.joinNative(left, right, Seq("k"), "t", "rt")
      .orderBy("t").select("qid", "px")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(("l1", Some(1.0)), ("l2", Some(2.0))),
      s"±0.0 keys must join as one group: $got")
    // overflow guard: a Long.MinValue sentinel epoch sits >2^63 below a
    // real ns epoch — the raw `lTs - heldTs <= tol` subtraction wraps
    // NEGATIVE and would accept it as in-tolerance; the saturating
    // bound must reject it
    val l2 = Seq(("A", 1500000000000000000L, "x")).toDF("k", "t", "qid")
    val r2 = Seq(("A", Long.MinValue, 9.9)).toDF("k", "rt", "px")
    val g2 = AsOf.joinNative(l2, r2, Seq("k"), "t", "rt",
        tolerance = Some(1000L))
      .select("px").as[Option[Double]].collect().toSeq
    assert(g2 == Seq(None),
      s"sentinel epoch joined as in-tolerance (Long wrap): $g2")
    // and the forward twin: sentinel MAX epoch vs `rHeadTs - lTs` wrap
    val l3 = Seq(("A", -1500000000000000000L, "x")).toDF("k", "t", "qid")
    val r3 = Seq(("A", Long.MaxValue, 9.9)).toDF("k", "rt", "px")
    val g3 = AsOf.joinNative(l3, r3, Seq("k"), "t", "rt",
        tolerance = Some(1000L), forward = true)
      .select("px").as[Option[Double]].collect().toSeq
    assert(g3 == Seq(None),
      s"forward sentinel joined as in-tolerance (Long wrap): $g3")
  }

  test("native matches union+window rewrite on the events table") {
    val ev = Tables.events(spark, sf).withColumn("ts_us", expr("ts_ns div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"),
              col("value").as("p_value"))

    val native = AsOf.joinNative(
        clicks, purchases.withColumnRenamed("p_user", "user_id"),
        Seq("user_id"), "ts_us", "p_ts")
      .select(col("event_id"), col("p_ts"), col("p_value"))
      .orderBy("event_id")
      .collect().toSeq

    val rewrite = AsOf.join(clicks,
        purchases.withColumnRenamed("p_user", "user_id"),
        Seq("user_id"), "ts_us", "p_ts", Seq("p_value"))
      .select(col("event_id"), col("p_ts_matched").as("p_ts"), col("p_value"))
      .orderBy("event_id")
      .collect().toSeq

    assert(native == rewrite)
  }

  test("strict variant matches rewrite too") {
    val ev = Tables.events(spark, sf).withColumn("ts_us", expr("ts_ns div 1000"))
    val a = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val b = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("u2"), col("ts_us").as("b_ts"), col("value").as("b_value"))
    val native = AsOf.joinNative(a, b.withColumnRenamed("u2", "user_id"),
        Seq("user_id"), "ts_us", "b_ts", strict = true)
      .select(col("event_id"), col("b_ts"), col("b_value")).orderBy("event_id").collect().toSeq
    val rewrite = AsOf.join(a, b.withColumnRenamed("u2", "user_id"),
        Seq("user_id"), "ts_us", "b_ts", Seq("b_value"), strict = true)
      .select(col("event_id"), col("b_ts_matched").as("b_ts"), col("b_value"))
      .orderBy("event_id").collect().toSeq
    assert(native == rewrite)
  }

  test("native forward as-of matches fixture truth (incl. equal-ts + tolerance)") {
    val left = Seq(("A", 5L, "q1"), ("A", 10L, "q2"), ("A", 20L, "q3"),
                   ("A", 30L, "q4"), ("B", 7L, "q5"))
      .toDF("k", "t", "qid")
    val right = Seq(("A", 10L, 1.0), ("A", 25L, 2.0), ("C", 1L, 9.9))
      .toDF("k", "rt", "px")
    val fwd = AsOf.joinNative(left, right, Seq("k"), "t", "rt", forward = true)
      .orderBy("k", "t")
      .select("qid", "px").as[(String, Option[Double])].collect().toSeq
    assert(fwd == Seq(("q1", Some(1.0)), ("q2", Some(1.0)), ("q3", Some(2.0)),
                      ("q4", None), ("q5", None)))
    val tol = AsOf.joinNative(left, right, Seq("k"), "t", "rt",
        forward = true, tolerance = Some(4L))
      .orderBy("k", "t")
      .select("qid", "px").as[(String, Option[Double])].collect().toSeq
    assert(tol == Seq(("q1", None), ("q2", Some(1.0)), ("q3", None),
                      ("q4", None), ("q5", None)))
  }

  test("native tolerance + forward match the union+window rewrite on events") {
    val ev = Tables.events(spark, sf).withColumn("ts_us", expr("ts_ns div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_us").as("p_ts"),
              col("value").as("p_value"))
    for (fwd <- Seq(false, true); tolr <- Seq(None, Some(3600L * 1000000L))) {
      val native = AsOf.joinNative(
          clicks, purchases.withColumnRenamed("p_user", "user_id"),
          Seq("user_id"), "ts_us", "p_ts", tolerance = tolr, forward = fwd)
        .select(col("event_id"), col("p_ts"), col("p_value"))
        .orderBy("event_id").collect().toSeq
      val rewrite = AsOf.join(clicks,
          purchases.withColumnRenamed("p_user", "user_id"),
          Seq("user_id"), "ts_us", "p_ts", Seq("p_value"),
          tolerance = tolr, forward = fwd)
        .select(col("event_id"), col("p_ts_matched").as("p_ts"), col("p_value"))
        .orderBy("event_id").collect().toSeq
      assert(native == rewrite, s"forward=$fwd tolerance=$tolr")
    }
  }

  test("timestamp-typed ts columns work directly (µs-longs under the hood)") {
    import java.sql.Timestamp
    val left = Seq(("A", Timestamp.valueOf("2024-01-01 00:00:05"), "q1"),
                   ("A", Timestamp.valueOf("2024-01-01 00:00:20"), "q2"))
      .toDF("k", "t", "qid")
    val right = Seq(("A", Timestamp.valueOf("2024-01-01 00:00:10"), 1.0))
      .toDF("k", "rt", "px")
    val got = AsOf.joinNative(left, right, Seq("k"), "t", "rt")
      .orderBy("t").select("qid", "px").as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(("q1", None), ("q2", Some(1.0))))
    // mixed long/timestamp axes are rejected (different scales)
    intercept[IllegalArgumentException] {
      AsOf.joinNative(left, Seq(("A", 10L, 1.0)).toDF("k", "rt", "px"),
        Seq("k"), "t", "rt")
    }
  }

  test("null timestamps fail fast instead of matching as epoch 0") {
    val left = Seq(("A", Some(5L), "q1"), ("A", None, "q2")).toDF("k", "t", "qid")
    val right = Seq(("A", 1L, 1.0)).toDF("k", "rt", "px")
    val ex = intercept[Exception] {
      AsOf.joinNative(left, right, Seq("k"), "t", "rt").collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        .filter(_ != null)).mkString(" | ")
    assert(rootMsg(ex).contains("null left-side timestamp"))
  }

  test("sorted-folio (bucketed) inputs: as-of runs with NO exchange and NO sort") {
    // the SURVEY §4 order-reporting pin: a parted+sorted folio written via
    // Folio.writeSortedTable feeds the native as-of with zero re-shuffle
    // and zero re-sort — the scan itself reports ordering+partitioning
    Seq("clicks_b", "purch_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(d)
      }
    }
    val ev = Tables.events(spark, sf).withColumn("ts_us", expr("ts_ns div 1000"))
    graft.io.Folio.writeSortedTable(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts_us")),
      "clicks_b", Seq("user_id"), Seq("ts_us"))
    graft.io.Folio.writeSortedTable(
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_ts"), col("value").as("p_value")),
      "purch_b", Seq("user_id"), Seq("p_ts"))

    val df = AsOf.joinNative(spark.table("clicks_b"), spark.table("purch_b"),
      Seq("user_id"), "ts_us", "p_ts")
    val got = df.select("event_id", "p_ts", "p_value").orderBy("event_id").collect().toSeq
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed as-of should not shuffle:\n$plan")
    assert(!plan.contains("Sort "), s"sorted-folio as-of should not re-sort:\n$plan")

    // and the answer matches the unbucketed path
    val want = AsOf.joinNative(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts_us")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us").as("p_ts"), col("value").as("p_value")),
        Seq("user_id"), "ts_us", "p_ts")
      .select("event_id", "p_ts", "p_value").orderBy("event_id").collect().toSeq
    assert(got == want)
  }

  test("plan shows the custom exec with one exchange per side") {
    val ev = Tables.events(spark, sf).withColumn("ts_us", expr("ts_ns div 1000"))
    val a = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts_us"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("user_id"), col("ts_us").as("p_ts"), col("value").as("p_value"))
        .withColumnRenamed("user_id", "uid")
    val df = AsOf.joinNative(a, b.withColumnRenamed("uid", "user_id"),
      Seq("user_id"), "ts_us", "p_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"),
      s"custom exec missing from plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges")
  }
}
