package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStream

class StreamingSpec extends SparkSpec {

  test("streaming hourly agg replays to the exact batch answer") {
    val stream = EventStream.hourlyByType(EventStream.readEvents(spark, sf))
    val got = EventStream.runToCompletion(spark, stream, "t_stream_hourly")
      .orderBy("bucket", "event_type").collect().toSeq
    val want = Queries.q14_hourly_buckets(spark, sf)
      .orderBy("bucket", "event_type").collect().toSeq
    assert(got == want)
  }

  test("foreachBatch lands micro-batches in the folio layout batch reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val stream = EventStream.readEvents(spark, sf)
    val q = stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.io.Folio.appendPartition(batch.drop("ts"), s"$dir/events",
          Seq("event_type"), Seq("ts_ns"))
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // the batch engine reads what the stream wrote — one unified layout
    val back = graft.io.Folio.read(spark, s"$dir/events")
    assert(back.count() == Tables.events(spark, sf).count())
    assert(back.select("event_type").distinct().count() == 5)
  }

  test("last-tick state keeps the latest value per user") {
    val out = EventStream.lastTicks(Tables.events(spark, sf))
    val got = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val want = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("ts_ns").desc)))
      .filter(col("rn") === 1)
      .collect().map(r => (r.getAs[Long]("user_id") -> r.getAs[Long]("ts_ns"))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (u, (ts, _)) => assert(ts == want(u)) }
  }
}
