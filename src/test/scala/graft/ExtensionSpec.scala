package graft

import org.apache.spark.sql.functions._
import graft.functions.{EpsilonEquals, OhlcAggregator}
import graft.functions.EpsilonEquals.eps_eq

/** Custom-extension surface: native codegen Expression + typed
  * Aggregator (SURVEY §2.10 / §7.4). */
class ExtensionSpec extends SparkSpec {
  import spark.implicits._

  test("eps_eq: epsilon equality + Kerf null/NaN regime (grade.cc:41)") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 1.0 + 1e-21),          // within epsilon → true
      (1.0, 1.2),                  // differs → false
      (Double.NaN, null),          // NaN == null in Kerf → true
      (Double.NaN, Double.NaN),    // NaN == NaN → true
      (1.0, Double.NaN),           // value vs missing → false
      (0.0, 0.0)                   // exact equal incl. zero → true
    ).toDF("a", "b")
    val got = df.select(eps_eq(col("a"), col("b"))).as[Boolean].collect().toSeq
    assert(got == Seq(true, false, true, true, false, true))
  }

  test("fp16 tier: round-trip error bound, specials, bit-stable re-pack") {
    import graft.functions.{HalfPack, HalfUnpack}
    // scalar conversions: IEEE binary16 golden values
    def rt(f: Float): Float = HalfUnpack.halfToFloat(HalfPack.floatToHalf(f))
    assert(HalfPack.floatToHalf(1.0f) == 0x3c00.toShort)
    assert(HalfPack.floatToHalf(-2.0f) == 0xc000.toShort)
    assert(HalfPack.floatToHalf(65504f) == 0x7bff.toShort)      // max finite
    assert(HalfPack.floatToHalf(65536f) == 0x7c00.toShort)      // overflow → inf
    assert(HalfPack.floatToHalf(Float.NaN) == 0x7e00.toShort)   // canonical qNaN
    // a computed -NaN (sign bit set) must pack to the SAME canonical
    // pattern — two NaN bit patterns on disk would break content-hash
    // dedup of otherwise-identical vectors
    assert(HalfPack.floatToHalf(
      java.lang.Float.intBitsToFloat(0xffc00000)) == 0x7e00.toShort)
    assert(HalfUnpack.halfToFloat(0x0001.toShort) == math.pow(2, -24).toFloat) // min subnormal
    assert(rt(0.0f) == 0.0f && rt(-0.0f) == -0.0f &&
           rt(Float.PositiveInfinity) == Float.PositiveInfinity)
    // relative error ≤ 2^-11 across magnitudes (normal range), and the
    // round-trip is IDEMPOTENT on the bit pattern (re-pack is identity)
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val x = (rnd.nextFloat() * 2 - 1) * math.pow(10, rnd.nextInt(9) - 4).toFloat
      if (math.abs(x) >= 6.2e-5f && math.abs(x) <= 65000f) {
        val y = rt(x)
        assert(math.abs(y - x) <= math.abs(x) * math.pow(2, -11),
          s"fp16 error bound broke at $x -> $y")
        assert(HalfPack.floatToHalf(y) == HalfPack.floatToHalf(x),
          s"re-pack not idempotent at $x")
      }
    }
    // column path: identical input vectors decode identically (the q143
    // closed-form premise), nulls pass through, and the expressions run
    // over a real scan inside codegen
    val df = Seq(
      (1L, Seq(0.25f, -1.5f, 3.1f)),
      (2L, Seq(0.25f, -1.5f, 3.1f)),
      (3L, null.asInstanceOf[Seq[Float]])).toDF("id", "v")
    val dec = df.select(col("id"),
        graft.functions.Half.unpack(graft.functions.Half.pack(col("v"))).as("d"))
      .collect().map(r => (r.getLong(0), Option(r.getSeq[Float](1)))).toMap
    assert(dec(1L).get == dec(2L).get && dec(3L).isEmpty)
    // double input narrows through float then half
    val d2 = Seq(Seq(1.0, 0.5)).toDF("v")
      .select(graft.functions.Half.unpack(graft.functions.Half.pack(col("v"))))
      .first().getSeq[Float](0)
    assert(d2 == Seq(1.0f, 0.5f))
  }

  test("eps_eq inlines into whole-stage codegen over a real scan") {
    val li = Tables.lineitem(spark, sf)
    val n = li.filter(eps_eq(col("l_discount"), lit(0.05))).count()
    val exact = li.filter(col("l_discount") === 0.05).count()
    assert(n == exact && n > 0)
  }

  test("eps_eq registers as a SQL function") {
    EpsilonEquals.register(spark)
    val got = spark.sql("SELECT eps_eq(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE) + 1e-21)")
      .collect()(0).getBoolean(0)
    assert(got)
  }

  test("eps_eq SQL: 3-arg overload gives SQL callers an explicit tolerance") {
    // the r17 default change (1e-14 → reference E=1e-20) made 2-arg
    // eps_eq effectively exact; the 3-arg form is the SQL migration path
    // (ADVICE r17). 1.0 vs 1.0+1e-15: within 1e-14, outside E.
    EpsilonEquals.register(spark)
    val r = spark.sql(
      """SELECT eps_eq(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE) + 1e-15, 1e-14),
                eps_eq(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE) + 1e-15),
                eps_eq(1, 1)""").collect()(0)
    assert(r.getBoolean(0), "explicit 1e-14 tolerance must accept 1e-15 delta")
    assert(!r.getBoolean(1), "default E must reject 1e-15 delta (effectively exact)")
    assert(r.getBoolean(2), "non-double inputs cast to double like the Column API")
    // a non-constant epsilon can't compile into the plan — loud error
    val e = intercept[Exception] {
      spark.sql("SELECT eps_eq(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE), rand())").collect()
    }
    assert(e.getMessage.contains("constant"), e.getMessage)
  }

  test("DotProduct: bit-identical to the aggregate(zip_with) fold, all null regimes") {
    import graft.functions.DotProduct.dot
    val fold = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val rnd = new scala.util.Random(5)
    val vecs = (1 to 50).map(_ => (
      Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.toDF("a", "b")
    // bitwise equality: compare raw double bits, not epsilon
    val bad = df.select(dot(col("a"), col("b")).as("n"), fold(col("a"), col("b")).as("o"))
      .filter(expr("cast(n as string) <> cast(o as string)")).count()
    assert(bad == 0)
    // empty → 0.0; length mismatch → null; null element → null (zip_with pad semantics)
    val edges = Seq(
      (Seq.empty[Double], Seq.empty[Double]),
      (Seq(1.0, 2.0), Seq(3.0)),
      (Seq(1.0), Seq(1.0))
    ).toDF("a", "b")
    val got = edges.select(dot(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(Some(0.0), None, Some(1.0)))
    val withNull = spark.sql("SELECT graft_dot(array(1.0d, NULL), array(1.0d, 2.0d)) AS d")
      .collect()(0)
    assert(withNull.isNullAt(0))
  }

  test("graft_ema SQL surface: literal alpha, scan semantics, loud non-literal") {
    val r = spark.sql(
      "SELECT graft_ema(array(1.0d, 5.0d, 9.0d), 0.25) AS e").first().getSeq[Double](0)
    assert(r == Seq(1.0, 2.0, 3.75)) // 1; 1+.25·4=2; 2+.25·7=3.75
    val e = intercept[Exception] {
      spark.sql("SELECT graft_ema(array(1.0d), rand()) AS e").collect()
    }
    assert(e.getMessage.contains("literal"), s"wrong error: ${e.getMessage}")
  }

  test("DotProduct runs inside whole-stage codegen at the top level") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val out = emb.select(graft.functions.DotProduct.dot(col("embedding"), col("embedding")).as("d"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(")) // whole-stage codegen span covers the projection
  }

  test("ShingleHashes: bit-identical to the string-shingle chain, incl. edges") {
    import graft.llm.Dedup
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a",                       // heavy duplicate shingles
      "ONE  two\tthree FOUR five",          // normText collapses/cases
      "two tok", "one", "", "   ",          // < n tokens, empty, blank
      "naïve café déjà vu über straße"      // multi-byte UTF-8
    )
    val df = texts.map(Tuple1(_)).toDF("t")
    val rows = df.select(
        graft.functions.ShingleHashes.shingleHashes(Dedup.normText(col("t")), 3).as("native"),
        col("t")).withColumn("__toks", Dedup.tokens(col("t")))
      .withColumn("__sh", Dedup.shinglesFromTokens(col("__toks"), 3))
      .withColumn("chain", array_distinct(Dedup.shingleHashes(col("__sh"))))
      .select("native", "chain").collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"native ${r.getSeq[Long](0)} != chain ${r.getSeq[Long](1)}")
    }
  }

  test("native MinHashSignature == column-algebra form, bit for bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val docs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong()))
    } :+ (999L, Seq(0L)) // single-element set
    val df = docs.toDF("id", "shh")
    val rows = df.select(
        graft.llm.Dedup.minhashSignature(col("shh"), 32).as("native"),
        graft.llm.Dedup.minhashSignatureColumnAlgebra(col("shh"), 32).as("chain"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"native ${r.getSeq[Long](0).take(4)}… != chain ${r.getSeq[Long](1).take(4)}…")
    }
    // and through the REAL map stage: text → ShingleHashes → signature
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "one two", "", "a b c d e f g").map(Tuple1(_)).toDF("t")
    val staged = texts.select(graft.functions.ShingleHashes.shingleHashes(
      graft.llm.Dedup.normText(col("t")), 3).as("shh"))
    val both = staged.select(
        graft.llm.Dedup.minhashSignature(col("shh"), 16).as("native"),
        graft.llm.Dedup.minhashSignatureColumnAlgebra(col("shh"), 16).as("chain"))
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    // NULL elements: Spark's xxhash64 fold SKIPS null children, so a null
    // slot's per-seed candidate is the bare seed prefix — the native loop
    // must agree bit-for-bit (never produced by ShingleHashes, but any
    // array<bigint> is a legal input)
    val withNulls = Seq(Tuple1(Seq[java.lang.Long](5L, null, 7L))).toDF("shh")
    val nrows = withNulls.select(
        graft.llm.Dedup.minhashSignature(col("shh"), 8).as("native"),
        graft.llm.Dedup.minhashSignatureColumnAlgebra(col("shh"), 8).as("chain"))
      .collect()
    nrows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
      s"null-slot divergence: ${r.getSeq[Long](0)} vs ${r.getSeq[Long](1)}"))
  }

  test("native SimHash64 == column-algebra form, bit for bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val docs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(60))(rnd.nextLong()))
    } :+ (998L, Seq(0L)) :+ (999L, Seq(-1L)) // all-clear / all-set single tokens
    val rows = docs.toDF("id", "th").select(
        graft.llm.Dedup.simhashFromTokenHashes(col("th")).as("native"),
        graft.llm.Dedup.simhashFromTokenHashesColumnAlgebra(col("th")).as("chain"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"native ${r.getLong(0).toHexString} != chain ${r.getLong(1).toHexString}"))
    // empty array → signature 0 (every bit-sum is 0, not > 0)
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("th").select(
      graft.llm.Dedup.simhashFromTokenHashes(col("th"))).collect()
    assert(empty.head.getLong(0) == 0L)
    // NULL elements count −1 on every bit (the column form's
    // when(null === 1).otherwise(−1) path)
    val withNulls = Seq(Tuple1(Seq[java.lang.Long](-1L, null, null))).toDF("th")
    val nrows = withNulls.select(
        graft.llm.Dedup.simhashFromTokenHashes(col("th")).as("native"),
        graft.llm.Dedup.simhashFromTokenHashesColumnAlgebra(col("th")).as("chain"))
      .collect()
    nrows.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"null-slot divergence: ${r.getLong(0)} vs ${r.getLong(1)}"))
  }

  test("native MatVecDots == transform-over-literal projections, bit for bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    // float vectors (the embeddings fixture's element type) and doubles
    val fvecs = (0 until 30).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat())))
      .toDF("id", "embedding")
    val nPlanes = 24
    val rows = fvecs.select(
        graft.llm.Similarity.projectionsProbe(col("embedding"), nPlanes, 16).as("native"),
        graft.llm.Similarity.projectionsColumnAlgebra(col("embedding"), nPlanes, 16).as("chain"))
      .collect()
    rows.foreach { r =>
      val (n, c) = (r.getSeq[Double](0), r.getSeq[Double](1))
      assert(n == c, s"projection divergence:\n  native ${n.take(3)}…\n  chain ${c.take(3)}…")
    }
    // length mismatch / null element → every per-plane dot null (the
    // column form's per-plane dot() result)
    val bad = Seq((0L, Seq[java.lang.Float](1f, null, 3f)),
                  (1L, Seq[java.lang.Float](1f, 2f))).toDF("id", "embedding")
    val brows = bad.select(
        graft.llm.Similarity.projectionsProbe(col("embedding"), 4, 3).as("native"),
        graft.llm.Similarity.projectionsColumnAlgebra(col("embedding"), 4, 3).as("chain"))
      .collect()
    brows.foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1),
        s"edge divergence: ${r.getSeq[Any](0)} vs ${r.getSeq[Any](1)}")
    }
  }

  test("fused HyperplaneSketches == chained hyperplaneSketch per table, bit for bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vecs = (0 until 40).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat())))
      .toDF("id", "embedding")
    val (nBits, tables) = (10, 8)
    val fused = vecs.select(col("id"),
        graft.llm.Similarity.allSketchesProbe(col("embedding"), nBits, tables, 16).as("sks"))
    val chained = vecs.select(col("id") +: (0 until tables).map(t =>
        graft.llm.Similarity.hyperplaneSketch(col("embedding"), nBits, 16,
          seedBase = t * nBits).as(s"t$t")): _*)
    val f = fused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    chained.collect().foreach { r =>
      val id = r.getLong(0)
      (0 until tables).foreach { t =>
        assert(f(id)(t) == r.getLong(1 + t),
          s"id $id table $t: fused ${f(id)(t).toHexString} != chained ${r.getLong(1 + t).toHexString}")
      }
    }
    // degenerate vectors → zero sketches for every table (the chain's
    // when(null > 0).otherwise(0) path)
    val bad = Seq((0L, Seq[java.lang.Float](1f, null, 3f)),
                  (1L, Seq[java.lang.Float](1f))).toDF("id", "embedding")
    bad.select(graft.llm.Similarity.allSketchesProbe(col("embedding"), 4, 2, 3))
      .collect().foreach(r => assert(r.getSeq[Long](0) == Seq(0L, 0L)))
  }

  test("MinHashAgg sketch == column-algebra minhash signature (same hash family)") {
    import graft.functions.MinHashAgg
    import spark.implicits._
    val items = Seq(
      ("g1", "alpha"), ("g1", "beta"), ("g1", "gamma"),
      ("g2", "beta"), ("g2", "delta"),
      ("g3", "alpha"), ("g3", "beta"), ("g3", "gamma")) // == g1's set
      .toDF("grp", "item")
    val viaAgg = items.groupBy("grp")
      .agg(MinHashAgg.minhash(col("item"), 16).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaCols = items.groupBy("grp")
      .agg(collect_list(col("item")).as("its"))
      .select(col("grp"), graft.llm.Dedup.minhashSignature(
        transform(col("its"), i => xxhash64(i)), 16).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg == viaCols)
    assert(viaAgg("g1") == viaAgg("g3")) // identical sets → identical sketch
    assert(viaAgg("g1") != viaAgg("g2"))
  }

  test("minhash_agg registers as a SQL aggregate") {
    import graft.functions.MinHashAgg
    import spark.implicits._
    MinHashAgg.register(spark)
    Seq(("g1", "alpha"), ("g1", "beta"), ("g2", "alpha"))
      .toDF("grp", "item").createOrReplaceTempView("mh_items")
    val viaSql = spark.sql(
      "SELECT grp, minhash_agg(item, 8) AS sig FROM mh_items GROUP BY grp")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val viaApi = spark.table("mh_items").groupBy("grp")
      .agg(MinHashAgg.minhash(col("item"), 8).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaApi)
  }

  test("MinHashAgg is partition-invariant (partial merge + serde path)") {
    import graft.functions.MinHashAgg
    import spark.implicits._
    val items = (0 until 500).map(i => ("g" + (i % 3), "item" + (i % 50))).toDF("grp", "item")
    def sigs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("grp").agg(MinHashAgg.minhash(col("item"), 32).as("sig"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(items.repartition(13)) == sigs(items.coalesce(1)))
  }

  test("OHLC Aggregator matches min_by/max_by formulation (q38)") {
    import OhlcAggregator._
    val ev = Tables.events(spark, sf)
      .select(expr("ts_ns div 1000").as("ts"), col("value"), col("user_id"))
    val typed = ev.as[(Long, Double, Long)]
      .map { case (ts, v, u) => (u, Tick(ts, v)) }
      .groupByKey(_._1).mapValues(_._2)
      .agg(ohlc.toColumn)
      .collect().toMap
    val want = ev.groupBy(col("user_id")).agg(
        min_by(col("value"), col("ts")).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), col("ts")).as("close"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) ->
        Ohlc(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap
    assert(typed == want)
  }

  test("OHLC ties on timestamp are deterministic under any partitioning") {
    import OhlcAggregator._
    // two ticks at the SAME open ts and same close ts: open must be the
    // min value at the earliest ts, close the max value at the latest —
    // a first-arrival rule would flip across replays/merge orders
    val ticks = Seq((1L, Tick(100L, 7.0)), (1L, Tick(100L, 3.0)),
                    (1L, Tick(200L, 9.0)), (1L, Tick(200L, 4.0)))
    def runWith(parts: Int): Ohlc =
      spark.createDataset(ticks).repartition(parts)
        .groupByKey(_._1).mapValues(_._2).agg(ohlc.toColumn)
        .collect().head._2
    val want = Ohlc(3.0, 9.0, 3.0, 9.0, 4L)
    Seq(1, 2, 4, 7).foreach { p =>
      assert(runWith(p) == want, s"parts=$p drifted: ${runWith(p)}")
    }
  }

  test("native Int8Codec == column-algebra quantize/dequantize, bit for bit") {
    // the r17 fallback-removal (q104): native codec must reproduce the
    // column form across every regime — organic floats, negatives,
    // denormals, zero vectors, null vectors, null ELEMENTS, empty
    // vectors — including the exact clamp/floor rounding and the
    // null-propagation contract (null scale → all-null codes; zero
    // scale → non-null elements code 0, null elements STAY null — the
    // r17 ADVICE fix: zero-scale was the lone null-coercing branch)
    val rnd = new scala.util.Random(53)
    val organic = (0 until 40).map { i =>
      (i.toLong, Seq.fill(12)(java.lang.Float.valueOf(
        ((rnd.nextFloat() - 0.5f) * (i + 1)).toFloat)))
    }
    val edges: Seq[(Long, Seq[java.lang.Float])] = Seq(
      (100L, Seq.fill(4)(java.lang.Float.valueOf(0.0f))),          // zero vector
      (101L, null),                                                 // null vector
      (102L, Seq[java.lang.Float](1.0f, null, -3.0f)),              // null element
      (103L, Seq.empty[java.lang.Float]),                           // empty vector
      (104L, Seq[java.lang.Float](null, null)),                     // all-null elements
      (105L, Seq[java.lang.Float](java.lang.Float.MIN_VALUE, 127f)), // denormal
      (106L, Seq[java.lang.Float](0.0f, null, 0.0f))  // ZERO scale + null element
    )
    val df = (organic ++ edges).toDF("vec_id", "embedding")
    import graft.llm.Similarity
    def full(q: org.apache.spark.sql.DataFrame,
             dq: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      q.withColumn("dq", dq(col("q"), col("scale"))).orderBy("vec_id")
        .collect().map(r => (r.getLong(0),
          Option(r.get(1)), Option(r.get(2)).map(_.toString),
          Option(r.get(3)).map(_.toString)))
    val native = full(Similarity.quantizeInt8(df), Similarity.dequantize)
    val chain = full(Similarity.quantizeInt8ColumnAlgebra(df),
      Similarity.dequantizeColumnAlgebra)
    native.zip(chain).foreach { case (n, c) =>
      assert(n == c, s"int8 codec divergence:\n  native $n\n  chain  $c")
    }
    // ABSOLUTE pin on the zero-scale null contract (twin parity alone
    // would pass if both faces coerced together): non-null → 0, null
    // STAYS null, through dequantize too
    val zs = native.find(_._1 == 106L).get
    assert(zs._3.exists(_.contains("0, null, 0")), s"zero-scale codes: $zs")
    assert(zs._4.exists(_.contains("0.0, null, 0.0")), s"zero-scale dequantize: $zs")
    // non-finite fail-fast parity: NaN and ±Inf each throw LOUDLY with
    // the id in the message, on both faces
    for (poison <- Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity)) {
      val bad = Seq((7L, Seq(1.0f, poison))).toDF("vec_id", "embedding")
      val eN = intercept[Exception] { Similarity.quantizeInt8(bad).collect() }
      assert(eN.getMessage.contains("non-finite"), s"native $poison: ${eN.getMessage}")
      val eC = intercept[Exception] {
        Similarity.quantizeInt8ColumnAlgebra(bad).collect() }
      assert(eC.getMessage.contains("non-finite"), s"chain $poison: ${eC.getMessage}")
    }
  }

  // ---------------------------------------------------------------
  // r18 structural-net kernels: each native == its column-algebra twin
  // bit for bit, across organic data and every null/edge regime
  // ---------------------------------------------------------------

  test("CountInSet == size(filter(isInCollection)) across null regimes") {
    import graft.functions.ArrayKernels
    val items = Seq("the", "and", "of")
    val rows = Seq(
      Seq[String]("the", "cat", "and", "the", "dog"),
      Seq[String]("none", "here"),
      Seq[String](),
      Seq[String]("the", null, "of"),  // null elements don't count
      null                              // null array → null count
    )
    val df = rows.toDF("arr")
    val got = df.select(
      ArrayKernels.countInSet(col("arr"), items).as("native"),
      size(filter(col("arr"), x => x.isInCollection(items))).as("twin"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getInt(0) == r.getInt(1)),
        s"CountInSet divergence: $r")
    }
  }

  test("TopKIndices == the sort-struct probe chain, ties/NaN/negzero/null-elem") {
    import graft.functions.ArrayKernels
    val rnd = new scala.util.Random(71)
    val organic = (0 until 30).map(_ => Seq.fill(16)(
      java.lang.Double.valueOf(rnd.nextDouble() * 2 - 1)))
    val edges = Seq(
      Seq[java.lang.Double](1.0, 1.0, 0.5, 1.0),         // ties → first index
      Seq[java.lang.Double](Double.NaN, 0.9, -0.5),      // NaN sorts greatest
      Seq[java.lang.Double](0.0, -0.0, 0.1),             // -0.0 == 0.0
      Seq[java.lang.Double](0.2, null, 0.9),             // null negsim sorts FIRST
      Seq[java.lang.Double](0.3),                        // shorter than k
      null                                               // null array → null
    )
    val df = (organic ++ edges).toDF("sims")
    for (k <- Seq(1, 3, 7)) {
      val nl = 16 // organic width; edge rows are shorter — use their size
      val got = df.select(
        ArrayKernels.topKIndices(col("sims"), k).as("native"),
        slice(transform(
          array_sort(zip_with(col("sims"),
            sequence(lit(0), coalesce(size(col("sims")), lit(1)) - 1),
            (s, i) => struct((-s).as("negsim"), i.as("cid")))),
          p => p.getField("cid")), 1, k).as("twin"))
        .collect()
      got.foreach { r =>
        assert(Option(r.get(0)).map(_.toString) == Option(r.get(1)).map(_.toString),
          s"TopKIndices k=$k divergence: native ${r.get(0)} twin ${r.get(1)}")
      }
    }
  }

  test("SegmentsOf == transform/array_join chain, ragged tails and null tokens") {
    import graft.functions.ArrayKernels
    val rows = Seq(
      Seq[String]("a", "b", "c", "d", "e", "f", "g"),  // ragged tail
      Seq[String]("one"),
      Seq[String]("x", null, "y", "z"),                // join skips nulls
      null                                             // null array → null
    )
    val df = rows.toDF("toks")
    for (k <- Seq(1, 3)) {
      val got = df.select(
        ArrayKernels.segmentsOf(col("toks"), k).as("native"),
        transform(
          sequence(lit(0), (size(col("toks")) + lit(k - 1)).divide(lit(k)).cast("int") - 1),
          i => array_join(slice(col("toks"), i * k + 1, lit(k)), " ")).as("twin"))
        .collect()
      got.foreach { r =>
        assert(Option(r.get(0)).map(_.toString) == Option(r.get(1)).map(_.toString),
          s"SegmentsOf k=$k divergence: native ${r.get(0)} twin ${r.get(1)}")
      }
    }
  }

  test("MaxAbsDiff == the greatest-fold, null/NaN/length-pad regimes") {
    import graft.functions.ArrayKernels
    val rows = Seq(
      (Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.5, 1.0, 3.0)),
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](0.0, 9.0, 3.5)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),   // pad skipped
      (Seq[java.lang.Double](Double.NaN, 1.0), Seq[java.lang.Double](0.0, 1.0)),
      (Seq[java.lang.Double](), Seq[java.lang.Double]()),              // empty → 0.0
      (null, Seq[java.lang.Double](1.0)),                              // null → null
      (Seq[java.lang.Double](1.0), null)
    )
    val df = rows.toDF("a", "b")
    val got = df.select(
      ArrayKernels.maxAbsDiff(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => abs(x - y)),
        lit(0.0), (acc, v) => greatest(acc, v)).as("twin"))
      .collect()
    got.foreach { r =>
      assert(Option(r.get(0)).map(_.toString) == Option(r.get(1)).map(_.toString),
        s"MaxAbsDiff divergence: native ${r.get(0)} twin ${r.get(1)}")
    }
  }

  test("WinnowFingerprint == the staged column chain on real documents + edges") {
    import graft.llm.TextOps
    val docs = Tables.documents(spark, sf).limit(120)
      .select(col("doc_id"), col("text"))
      .union(Seq(
        (90001L, ""),                       // empty → empty sketch
        (90002L, "tiny"),                   // < k → whole-text gram
        (90003L, null.asInstanceOf[String]) // null → empty sketch
      ).toDF("doc_id", "text"))
    val native = TextOps.fingerprint(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.get(1).toString))
    val twin = TextOps.fingerprintColumnAlgebra(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.get(1).toString))
    native.zip(twin).foreach { case (n, t) =>
      assert(n == t, s"fingerprint divergence:\n  native $n\n  twin   $t")
    }
  }

  test("PqEncode/SubFromConst/AdcScore == the PQ column chains, all regimes") {
    import graft.llm.Similarity
    import graft.functions.PqKernels
    val rnd = new scala.util.Random(97)
    // 2 subspaces × 4 codewords × dim 3 (total dim 6)
    val books: Array[Array[Array[Double]]] =
      Array.fill(2)(Array.fill(4)(Array.fill(3)(rnd.nextDouble() * 2 - 1)))
    val organic = (0 until 40).map(i =>
      (i.toLong, Seq.fill(6)(java.lang.Double.valueOf(rnd.nextDouble() * 2 - 1))))
    val edges: Seq[(Long, Seq[java.lang.Double])] = Seq(
      (100L, null),                                        // null vec → codes of nulls
      (101L, Seq[java.lang.Double](1.0, null, 0.0, 1.0, 2.0, 3.0)), // null elem: subspace 0 null
      (102L, Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)),   // short: subspace 1 null
      (103L, Seq[java.lang.Double]())                      // empty: all null codes
    )
    val df = (organic ++ edges).toDF("vec_id", "embedding")
    val enc = df.select(col("vec_id"),
      Similarity.pqCodes(col("embedding"), books).as("native"),
      Similarity.pqCodesColumnAlgebra(col("embedding"), books).as("twin"))
      .orderBy("vec_id").collect()
    enc.foreach { r =>
      assert(Option(r.get(1)).map(_.toString) == Option(r.get(2)).map(_.toString),
        s"PqEncode divergence at ${r.getLong(0)}: ${r.get(1)} vs ${r.get(2)}")
    }
    // LUT: SubFromConst vs zip_with twin (includes the all-null dots row
    // a null/short q_vec produces through MatVecDots)
    val dsub = 3
    val lutDf = df.filter(col("embedding").isNotNull)
    books.indices.foreach { s =>
      val cb = books(s)
      val half = cb.map(c => c.map(x => x * x).sum / 2.0)
      val dots = graft.functions.MatVecDots.matVecDots(
        slice(col("embedding"), s * dsub + 1, dsub), cb)
      val got = lutDf.select(
        PqKernels.subFromConst(dots, half).as("native"),
        zip_with(dots, typedLit(half.toSeq), (d, h) => h - d).as("twin"))
        .collect()
      got.foreach { r =>
        assert(Option(r.get(0)).map(_.toString) == Option(r.get(1)).map(_.toString),
          s"SubFromConst s=$s divergence: ${r.get(0)} vs ${r.get(1)}")
      }
    }
    // ADC: native vs the aggregate fold, over codes (incl. null codes
    // from the null-vector row) × a real LUT from the first organic row
    val q = df.filter(col("vec_id") === 0L)
      .select(Similarity.pqCodes(col("embedding"), books).as("ignore"),
        array(books.indices.map { s =>
          val cb = books(s)
          val half = cb.map(c => c.map(x => x * x).sum / 2.0)
          PqKernels.subFromConst(graft.functions.MatVecDots.matVecDots(
            slice(col("embedding"), s * dsub + 1, dsub), cb), half)
        }: _*).as("__lut"))
      .select(col("__lut"))
    val adc = df.crossJoin(q)
      .select(col("vec_id"),
        Similarity.pqCodes(col("embedding"), books).as("__codes"), col("__lut"))
      .select(col("vec_id"),
        PqKernels.adcScore(col("__codes"), col("__lut")).as("native"),
        aggregate(
          zip_with(col("__codes"), col("__lut"), (c, row) => element_at(row, c + 1)),
          lit(0.0), (acc, x) => acc + x).as("twin"))
      .orderBy("vec_id").collect()
    adc.foreach { r =>
      assert(Option(r.get(1)).map(_.toString) == Option(r.get(2)).map(_.toString),
        s"AdcScore divergence at ${r.getLong(0)}: ${r.get(1)} vs ${r.get(2)}")
    }
  }
}
