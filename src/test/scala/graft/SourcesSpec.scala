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

  test("AffineRangeSource: DSv2 options are case-insensitive (no silent empty table)") {
    // DSv2 getTable receives the case-PRESERVED map; .option("Length",…)
    // must not be silently ignored into a length-0 table
    val props = new java.util.HashMap[String, String]()
    props.put("Length", "7"); props.put("Base", "10"); props.put("IMult", "2")
    val rows = spark.read.format("graft.sources.AffineRangeSource")
      .options(new java.util.HashMap[String, String](props))
      .load()
    // go through the provider directly too (reader paths may normalize)
    val table = new graft.sources.AffineRangeSource()
      .getTable(graft.sources.AffineRangeSource.schema, Array.empty, props)
    import org.apache.spark.sql.functions.col
    val got = rows.orderBy(col("value")).collect().map(_.getLong(0)).toSeq
    assert(got == (0 until 7).map(i => 10L + 2L * i),
      s"case-insensitive options must reach the table: $got")
    assert(table.name().contains("7") || got.length == 7)
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

  // ----- folio of remote tables (presented.h:427–430; SURVEY §1.7) -----

  test("federatedRead: two sites behave as one table, widths promote") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fed").toString
    Seq((1L, 10, "a"), (2L, 20, "a")).toDF("k", "v", "tag")
      .write.parquet(s"$dir/s1")                       // v: int
    Seq((3L, 1000000000000L, "b")).toDF("k", "v", "tag")
      .write.parquet(s"$dir/s2")                       // v: long (wider)
    val fed = io.Folio.federatedRead(spark, Seq(s"$dir/s1", s"$dir/s2"))
    assert(fed.schema("v").dataType ==
      org.apache.spark.sql.types.LongType, "widths must promote to the lub")
    assert(fed.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 1000000000000L)))
    // provenance column names the site
    val tagged = io.Folio.federatedRead(spark, Seq(s"$dir/s1", s"$dir/s2"),
      siteColumn = Some("_folio_site"))
    assert(tagged.select("_folio_site").distinct().count() == 2)
    // schema drift (missing column) is an error, not a null fill
    Seq((9L, 1)).toDF("k", "v").write.parquet(s"$dir/s3")
    intercept[IllegalArgumentException] {
      io.Folio.federatedRead(spark, Seq(s"$dir/s1", s"$dir/s3"))
    }
    // provenance column colliding with a data column is an error, not a
    // silent overwrite (withColumn replaces on name collision)
    intercept[IllegalArgumentException] {
      io.Folio.federatedRead(spark, Seq(s"$dir/s1", s"$dir/s2"),
        siteColumn = Some("tag"))
    }
  }

  test("federatedRead: filters and pruning push into EVERY site's scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fedp").toString
    val li = Tables.lineitem(spark, sf)
    li.filter(col("l_orderkey") % 2 === 0).write.parquet(s"$dir/a")
    li.filter(col("l_orderkey") % 2 =!= 0).write.parquet(s"$dir/b")
    val fed = io.Folio.federatedRead(spark, Seq(s"$dir/a", s"$dir/b"))
      .filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_quantity")
    val p = fed.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*GreaterThan\\(l_quantity".r
      .findAllIn(p).length
    assert(pushed == 2, s"filter must reach BOTH site scans (got $pushed):\n$p")
    val pruned = "ReadSchema: [^\\n]*".r.findAllIn(p).toList
    assert(pruned.nonEmpty && pruned.forall(rs =>
      rs.contains("l_orderkey") && rs.contains("l_quantity") && !rs.contains("l_comment") &&
        !rs.contains("l_returnflag")),
      s"column pruning must reach both site scans:\n${pruned.mkString("\n")}")
    // and the federated answer is the undivided answer
    val whole = li.filter(col("l_quantity") > 45.0).count()
    assert(fed.count() == whole)
  }

  test("federatedRead resolves a promoted folio's _CURRENT per site") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fedv").toString
    // site 1: versioned (promote-on-append) — only the live version counts
    io.Folio.appendWithPromotion(Seq((1L, 1)).toDF("k", "v"), s"$dir/s1")
    io.Folio.appendWithPromotion(Seq((2L, 2L)).toDF("k", "v"), s"$dir/s1") // promotes v to long
    // site 2: plain parquet
    Seq((3L, 3)).toDF("k", "v").write.parquet(s"$dir/s2")
    val fed = io.Folio.federatedRead(spark, Seq(s"$dir/s1", s"$dir/s2"))
    assert(fed.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }
}
