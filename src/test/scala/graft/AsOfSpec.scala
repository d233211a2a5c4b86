package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // quotes (left) at t=5,10,20,30 for key A; trades (right) at t=10,25
  private def fixture = {
    val left = Seq(("A", 5L, "q1"), ("A", 10L, "q2"), ("A", 20L, "q3"),
                   ("A", 30L, "q4"), ("B", 7L, "q5"))
      .toDF("k", "t", "qid")
    val right = Seq(("A", 10L, 1.0), ("A", 25L, 2.0), ("C", 1L, 9.9))
      .toDF("k", "rt", "px")
    (left, right)
  }

  test("backward as-of <= picks latest at-or-before per key") {
    val (l, r) = fixture
    val got = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("px"))
      .orderBy("k", "t")
      .select("qid", "px").as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(("q1", None), ("q2", Some(1.0)), ("q3", Some(1.0)),
                      ("q4", Some(2.0)), ("q5", None)))
  }

  test("strict < excludes the equal-timestamp right row") {
    val (l, r) = fixture
    val got = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("px"), strict = true)
      .orderBy("k", "t")
      .select("qid", "px").as[(String, Option[Double])].collect().toSeq
    assert(got.find(_._1 == "q2").get._2.isEmpty) // t=10 trade invisible at t=10
    assert(got.find(_._1 == "q3").get._2.contains(1.0))
  }

  test("tolerance voids stale matches") {
    val (l, r) = fixture
    val got = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("px"), tolerance = Some(6L))
      .orderBy("k", "t")
      .select("qid", "px").as[(String, Option[Double])].collect().toSeq
    // q4 at t=30: latest trade t=25, distance 5 <= 6 → kept
    assert(got.find(_._1 == "q4").get._2.contains(2.0))
    // q3 at t=20: latest trade t=10, distance 10 > 6 → voided
    assert(got.find(_._1 == "q3").get._2.isEmpty)
  }

  test("multi-key as-of: (exchange, symbol) composite keys, both impls") {
    val l = Seq(("X", "A", 10L, 1), ("X", "B", 10L, 2), ("Y", "A", 10L, 3))
      .toDF("ex", "sym", "t", "lid")
    val r = Seq(("X", "A", 5L, 1.1), ("X", "B", 7L, 2.2), ("Y", "A", 20L, 3.3))
      .toDF("ex", "sym", "rt", "px")
    val wantPairs = Map(1 -> Some(1.1), 2 -> Some(2.2), 3 -> None)
    val viaRewrite = AsOf.join(l, r, Seq("ex", "sym"), "t", "rt", Seq("px"))
      .collect().map(row => row.getAs[Int]("lid") ->
        Option(row.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap
    val viaNative = AsOf.joinNative(l, r, Seq("ex", "sym"), "t", "rt")
      .collect().map(row => row.getAs[Int]("lid") ->
        Option(row.getAs[java.lang.Double]("px")).map(_.toDouble)).toMap
    assert(viaRewrite == wantPairs && viaNative == wantPairs)
  }

  test("matched right timestamp is carried") {
    val (l, r) = fixture
    val got = AsOf.join(l, r, Seq("k"), "t", "rt", Seq("px"))
      .filter(col("qid") === "q4").select("rt_matched").as[Option[Long]].collect()
    assert(got.head.contains(25L))
  }
}
