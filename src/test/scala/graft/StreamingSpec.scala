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
