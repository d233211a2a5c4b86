package graft

/** Fixture-drift canary as a test: a regenerated /root/testdata with a
  * changed physical type fails HERE with a named diff, not as 27
  * mysterious per-query analysis errors (the round-9 failure mode). */
class FixtureSchemaSpec extends SparkSpec {

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"$sf fixtures match loader expectations") {
      val d = FixtureCanary.drift(spark, s"/root/testdata/$sf")
      assert(d.isEmpty, "fixture drift:\n  " + d.mkString("\n  "))
    }
  }

  test("events normalizes to (ts: TimestampType, ts_ns: LongType) whatever the disk type") {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    assert(ev.schema("ts_ns").dataType == LongType)
    // the two columns agree at µs resolution
    val bad = ev.filter(org.apache.spark.sql.functions.expr(
      "unix_micros(ts) != ts_ns div 1000")).count()
    assert(bad == 0L)
  }
}
