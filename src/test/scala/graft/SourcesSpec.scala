package graft

import org.apache.spark.sql.functions._

/** DataSource V2 connector coverage + the free-from-Spark ingest formats
  * the reference's bus only sketches (/root/reference/bus.h:166–167). */
class SourcesSpec extends SparkSpec {

  test("AffineRangeSource: DSv2 affine range, correct values, N slices") {
    val df = spark.read.format("graft.sources.AffineRangeSource")
      .option("length", 1000).option("base", 3).option("imult", 2)
      .option("slices", 8).load()
    assert(df.rdd.getNumPartitions == 8)
    val agg = df.agg(count(lit(1)), min("value"), max("value"),
      sum(col("value"))).collect()(0)
    assert(agg.getLong(0) == 1000)
    assert(agg.getLong(1) == 3)            // base
    assert(agg.getLong(2) == 3 + 999 * 2)  // base + (n-1)*imult
    // Σ (3 + 2i) for i in [0,1000) = 3*1000 + 2*(999*1000/2)
    assert(agg.getLong(3) == 3000L + 999L * 1000L)
    // matches the library-level affine range
    val lib = ops.MapSetEnum.affineRange(spark, 1000, 3, 2)
      .agg(sum("value")).collect()(0).getLong(0)
    assert(agg.getLong(3) == lib)
  }

  test("csv and json round-trip through the free readers (bus.h formats)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    val src = Tables.nation(spark, sf)
    src.write.option("header", "true").csv(s"$dir/nation_csv")
    src.write.json(s"$dir/nation_json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/nation_csv")
    val json = spark.read.json(s"$dir/nation_json")
    assert(csv.count() == src.count() && json.count() == src.count())
    assert(csv.select("n_name").distinct().count() ==
           src.select("n_name").distinct().count())
  }
}
