package graft

import org.apache.spark.sql.functions._

/** The co-located join story (SURVEY §4 "reuse a partitioning across
  * stages"): bucketed tables joined on the bucket key need NO exchange —
  * Kerf's parted-table locality (presented.h:409–430) as Spark bucketing.
  * At 100 TB this is the difference between re-shuffling the fact table
  * per query and never shuffling it at all. */
class BucketingSpec extends SparkSpec {

  test("bucketed sort-merge join elides both exchanges") {
    // warehouse.dir is a static conf — use the default ./spark-warehouse
    // (gitignored) with throwaway table names. Disable broadcast so the
    // fixture-sized join takes the sort-merge path it would at scale.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // the default-warehouse dirs outlive the in-memory catalog across
    // JVM runs: DROP TABLE no-ops but the stale location blocks CREATE
    Seq("li_b", "ord_b").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(d)
      }
    }
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {

    graft.io.Folio.writeSortedTable(Tables.lineitem(spark, sf), "li_b",
      Seq("l_orderkey"), Nil)
    graft.io.Folio.writeSortedTable(Tables.orders(spark, sf), "ord_b",
      Seq("o_orderkey"), Nil)

    val joined = spark.table("li_b").join(spark.table("ord_b"),
      col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))

    // correctness identical to the unbucketed plan
    val want = Tables.lineitem(spark, sf).join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(joined.orderBy("o_orderstatus").collect().toSeq == want)

    // the join itself shuffles NEITHER side: a sort-merge join appears
    // with only the aggregation's exchange in the whole plan
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(plan.contains("Bucketed: true"), "scan not bucketed")
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(exchanges == 1, // the groupBy's — the JOIN added none
      s"bucketed join should read bucket files directly:\n$plan")
    // one file per bucket + ordering report ⇒ the SMJ needs no SortExec
    val sorts = "\\bSort \\[".r.findAllIn(finalPlan).length
    assert(sorts == 0,
      s"sorted-folio SMJ should not re-sort (got $sorts sorts):\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
