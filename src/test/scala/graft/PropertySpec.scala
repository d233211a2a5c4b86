package graft

import org.apache.spark.sql.functions._
import graft.ops.{Adverbs, AsOf}

/** Property tests for the algebraic laws the reference hand-checks
  * (SURVEY §5): adverb identities and as-of equivalence to the
  * brute-force definition, over seeded random instances (deterministic;
  * plain loops to keep Spark-job counts sane). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("scan's last element equals fold, many random vectors (adverbs.h:76 vs 34)") {
    val rnd = new scala.util.Random(42)
    val vectors = (1 to 20).map(_ => (1 to (1 + rnd.nextInt(10))).map(_ => rnd.nextInt(200) - 100))
    val df = vectors.map(Tuple1(_)).toDF("a")
    val bad = df.select(
        Adverbs.fold(col("a"), lit(0))(_ + _).as("f"),
        element_at(Adverbs.scan(col("a"), lit(0))(_ + _), -1).as("s"))
      .filter(col("f") =!= col("s")).count()
    assert(bad == 0)
  }

  test("ema native scan: bit-identical to the Catalyst fold it replaced, O(n)") {
    // the retired formulation (kept HERE as the semantic reference): the
    // aggregate fold whose concat-per-element was O(n²) — EmaScan must
    // reproduce it bit for bit, including the null-poisoned tail
    def emaFold(arr: org.apache.spark.sql.Column,
                alpha: Double): org.apache.spark.sql.Column =
      when(size(arr) === 0, array().cast("array<double>"))
        .otherwise(aggregate(
          slice(arr, lit(2), greatest(size(arr) - 1, lit(0))),
          array(element_at(arr, 1).cast("double")),
          (acc, x) => concat(acc, array(
            element_at(acc, -1) +
              lit(alpha) * (x.cast("double") - element_at(acc, -1))))))
    val rnd = new scala.util.Random(99)
    val series: Seq[Seq[Option[Double]]] = Seq(
      (1 to 512).map(_ => Some(rnd.nextDouble() * 100 - 50)),  // dense
      Seq(Some(1.0), None, Some(3.0), Some(4.0)),              // poisoned tail
      Seq[Option[Double]](None, Some(2.0)),                    // null head
      Seq(Some(7.0)),                                          // singleton
      Seq.empty                                                // empty
    )
    for (alpha <- Seq(0.25, 0.37); xs <- series) {
      val df = Seq(Tuple1(xs)).toDF("a")
      val got = df.select(graft.ops.Adverbs.ema(col("a"), alpha).as("e"))
        .first().getSeq[java.lang.Double](0)
      val want = df.select(emaFold(col("a"), alpha).as("e"))
        .first().getSeq[java.lang.Double](0)
      assert(got == want, s"alpha=$alpha xs=${xs.take(8)}: $got != $want")
    }
    // scan-form Scala reference too (the q138 oracle's recurrence)
    val xs = (1 to 256).map(_ => rnd.nextDouble() * 10)
    val want = xs.tail.scanLeft(xs.head)((prev, x) => prev + 0.25 * (x - prev))
    val got = Seq(Tuple1(xs)).toDF("a")
      .select(graft.ops.Adverbs.ema(col("a"), 0.25).as("e"))
      .first().getSeq[Double](0)
    assert(got.zip(want).forall { case (g, w) => g == w })
    // the O(n) point: a series far beyond the old 16384 guard completes
    val big = spark.range(1).select(graft.ops.Adverbs.ema(
        sequence(lit(1), lit(200000)).cast("array<double>"), 0.5).as("e"))
    assert(big.select(size(col("e"))).first().getInt(0) == 200000)
  }

  test("moment aggregates match independent two-pass math on random frames") {
    // the q158 family is computed from exact decimal sums in the
    // one-pass E[x²]−E[x]² form; an INDEPENDENT two-pass Scala
    // reference (subtract-the-mean) catches any systematic formula
    // error (population-vs-sample, swapped args) the dialect==API
    // fuzz cannot see
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { _ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(10000) / 100.0, rnd.nextInt(10000) / 100.0)
    }
    val df = rows.toDF("k", "x", "y")
    df.createOrReplaceTempView("mom_v")
    val got = graft.sql.KerfSql.run(spark,
      "select k, wavg(x, y) as wa, var(x) as vr, dev(x) as sd, " +
      "cov(x, y) as cv, cor(x, y) as cr from mom_v group k order k")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    def close(a: Double, b: Double): Boolean =
      math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
    rows.groupBy(_._1).foreach { case (k, g) =>
      val xs = g.map(_._2); val ys = g.map(_._3); val n = g.size.toDouble
      val mx = xs.sum / n; val my = ys.sum / n
      val vr = xs.map(x => (x - mx) * (x - mx)).sum / n
      val cv = g.map(t => (t._2 - mx) * (t._3 - my)).sum / n
      val vy = ys.map(y => (y - my) * (y - my)).sum / n
      val wa = g.map(t => t._2 * t._3).sum / xs.sum
      val (gwa, gvr, gsd, gcv, gcr) = got(k)
      assert(close(gwa, wa), s"$k wavg: $gwa vs $wa")
      assert(close(gvr, vr), s"$k var: $gvr vs $vr")
      assert(close(gsd, math.sqrt(vr)), s"$k dev: $gsd vs ${math.sqrt(vr)}")
      assert(close(gcv, cv), s"$k cov: $gcv vs $cv")
      assert(close(gcr, cv / (math.sqrt(vr) * math.sqrt(vy))), s"$k cor")
    }
  }

  test("fp16 pack is order-preserving: a <= b implies rt(a) <= rt(b)") {
    // monotonicity is what makes the fp16 tier safe under range
    // predicates and ordered scans: quantization can merge neighbors
    // but can never SWAP them (IEEE sign-magnitude bit patterns are
    // monotone in the value; round-half-up preserves weak order)
    import graft.functions.{HalfPack, HalfUnpack}
    def rt(f: Float): Float = HalfUnpack.halfToFloat(HalfPack.floatToHalf(f))
    val rnd = new scala.util.Random(21)
    (1 to 3000).foreach { _ =>
      val a = (rnd.nextFloat() * 2 - 1) * math.pow(10, rnd.nextInt(10) - 5).toFloat
      val b = (rnd.nextFloat() * 2 - 1) * math.pow(10, rnd.nextInt(10) - 5).toFloat
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      assert(rt(lo) <= rt(hi), s"fp16 order swap: $lo -> ${rt(lo)}, $hi -> ${rt(hi)}")
    }
  }

  test("eachPrior-with-subtraction telescopes: fold(+)(deltas) == last - seed") {
    val rnd = new scala.util.Random(7)
    val vectors = (1 to 20).map(_ => (1 to (1 + rnd.nextInt(10))).map(_ => rnd.nextInt(200) - 100))
    val df = vectors.map(v => (v, v.last)).toDF("a", "want")
    val bad = df.select(col("want"),
        Adverbs.fold(Adverbs.eachPrior(col("a"), lit(0))(_ - _), lit(0))(_ + _).as("got"))
      .filter(col("want") =!= col("got")).count()
    assert(bad == 0)
  }

  test("as-of (rewrite AND native) equals brute-force definition on random data") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val keys = Seq("a", "b", "c")
      val lefts = (0 until 40).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(50).toLong, i.toLong))
      // unique (k, rt) pairs so equal-ts tie-breaking can't differ
      val rights = rnd.shuffle(
        (for (k <- keys :+ "d"; t <- 0 until 50) yield (k, t.toLong)).toList)
        .take(25).map { case (k, t) => (k, t, rnd.nextDouble().round.toDouble + t) }

      val l = lefts.toDF("k", "t", "lid")
      val r = rights.toDF("k", "rt", "px")

      val want = lefts.map { case (k, t, lid) =>
        val cands = rights.filter(row => row._1 == k && row._2 <= t)
        lid -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
      }.toMap

      def collectMap(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "px").collect()
          .map(row => row.getLong(0) ->
            (if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toMap

      assert(collectMap(AsOf.join(l, r, Seq("k"), "t", "rt", Seq("px"))) == want,
        s"rewrite diverged on trial $trial")
      assert(collectMap(AsOf.joinNative(l, r, Seq("k"), "t", "rt")) == want,
        s"native diverged on trial $trial")
    }
  }

  test("as-of forward + tolerance equal brute force on random data (both impls)") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 3) {
      val keys = Seq("a", "b", "c")
      val lefts = (0 until 40).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(50).toLong, i.toLong))
      val rights = rnd.shuffle(
        (for (k <- keys :+ "d"; t <- 0 until 50) yield (k, t.toLong)).toList)
        .take(25).map { case (k, t) => (k, t, rnd.nextDouble().round.toDouble + t) }
      val l = lefts.toDF("k", "t", "lid")
      val r = rights.toDF("k", "rt", "px")
      val tol = 7L

      val want = lefts.map { case (k, t, lid) =>
        val cands = rights.filter(row =>
          row._1 == k && row._2 >= t && row._2 - t <= tol)
        lid -> (if (cands.isEmpty) None else Some(cands.minBy(_._2)._3))
      }.toMap

      def collectMap(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "px").collect()
          .map(row => row.getLong(0) ->
            (if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toMap

      assert(collectMap(AsOf.join(l, r, Seq("k"), "t", "rt", Seq("px"),
          forward = true, tolerance = Some(tol))) == want,
        s"forward rewrite diverged on trial $trial")
      assert(collectMap(AsOf.joinNative(l, r, Seq("k"), "t", "rt",
          forward = true, tolerance = Some(tol))) == want,
        s"forward native diverged on trial $trial")
    }
  }

  test("star-contraction clusters equal union-find truth on random graphs") {
    val rnd = new scala.util.Random(2026)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = (0 until 50).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find ground truth (path-compressed)
      val parent = Array.tabulate(n)(identity)
      def findRoot(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (findRoot(a.toInt), findRoot(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.map(v => v ->
        nodes.filter(u => findRoot(u.toInt) == findRoot(v.toInt)).min).toMap

      val got = graft.llm.Dedup.clusters(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"cluster labels diverged from union-find on trial $trial")
    }
  }

  test("upsert idempotence: upserting the same batch twice == once") {
    val base = Seq((1, 10.0), (2, 20.0)).toDF("k", "v")
    val batch = Seq((2, 22.0), (3, 30.0)).toDF("k", "v")
    import graft.ops.TableOps
    val once = TableOps.upsert(base, batch, Seq("k")).orderBy("k").collect().toSeq
    val twice = TableOps.upsert(TableOps.upsert(base, batch, Seq("k")), batch, Seq("k"))
      .orderBy("k").collect().toSeq
    assert(once == twice)
  }

  test("chunk equals the sequential reference on random docs (coverage + overlap laws)") {
    val rnd = new scala.util.Random(97)
    // reference implementation: the spec in plain Scala
    def ref(tokens: Seq[String], size: Int, overlap: Int): Seq[(Long, Long, String)] = {
      val stride = size - overlap
      val n = tokens.length
      val k = math.max(1, (n - overlap + stride - 1) / stride)
      (0 until k).map { c =>
        val s = tokens.slice(c * stride, c * stride + size)
        (c.toLong, s.length.toLong, s.mkString(" "))
      }
    }
    val docs = (0 until 30).map { i =>
      val n = rnd.nextInt(25) // includes 0-token docs
      (i.toLong, (0 until n).map(j => s"w${rnd.nextInt(9)}").mkString(" "))
    }
    for ((size, overlap) <- Seq((3, 0), (4, 1), (5, 4), (1, 0))) {
      val got = llm.TextOps.chunk(docs.toDF("doc_id", "text"),
          "doc_id", "text", size, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._2, t._3, t._4)).toSeq)
        .toMap
      docs.foreach { case (id, text) =>
        // the engine tokenizes the normalized text; EMPTY docs have ZERO
        // tokens (the r15 phantom-""-token fix) and still produce one
        // empty chunk (k = max(1, ...) in the reference too)
        val norm = text.toLowerCase.replaceAll("\\s+", " ").trim
        val toks = if (norm.isEmpty) Seq.empty[String]
                   else norm.split(" ", -1).toSeq
        assert(got(id) == ref(toks, size, overlap),
          s"doc $id size=$size overlap=$overlap: ${got(id)} vs ${ref(toks, size, overlap)}")
      }
    }
  }

  test("collect → ungroup round-trips the original multiset on random tables") {
    val rnd = new scala.util.Random(4242)
    val rows = (0 until 300).map(_ =>
      (rnd.nextInt(8).toLong, rnd.nextInt(50).toLong, rnd.nextInt(5).toDouble))
    rows.toDF("k", "ts", "v").createOrReplaceTempView("pp_cg")
    val back = sql.KerfSql.run(spark,
      "g: select k, collect(ts) as ts, collect(v, ts) as v from pp_cg group k; " +
      "ungroup g")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // multiset equality: the zip pairs i-th smallest ts with the value
    // ordered by (ts, v) — for tied ts the values redistribute within
    // the tie, preserving the per-key multiset of (ts, v) pairs
    def ms(s: Seq[(Long, Long, Double)]) = s.groupBy(identity).view.mapValues(_.size).toMap
    assert(ms(back) == ms(rows), "round trip drifted")
  }

  test("differs equals the brute-force run-boundary scan on random series") {
    val rnd = new scala.util.Random(777)
    // unique ts per key so the order axis is total (differs on tied
    // axes is order-dependent by design)
    val rows = (0 until 12).flatMap { k =>
      rnd.shuffle((0 until 40).toList).take(25).map { t =>
        (k.toLong, t.toLong,
         if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(3).toDouble))
      }
    }
    rows.toDF("k", "ts", "v").createOrReplaceTempView("pp_dif")
    val got = sql.KerfSql.run(spark,
      "select k, ts, differs(v) as chg from pp_dif group k order ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      val s = g.sortBy(_._2)
      s.zipWithIndex.map { case ((_, t, v), i) =>
        (k, t, i == 0 || v != s(i - 1)._3) }
    }.sortBy(t => (t._1, t._2))
    assert(got.sortBy(t => (t._1, t._2)) == want)
  }

  test("rollup: any batch split merges to the one-shot recompute (random splits)") {
    val rnd = new scala.util.Random(2024)
    val rows = (0 until 200).map(_ => (s"k${rnd.nextInt(6)}",
      if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(1000) / 100.0),
      rnd.nextInt(100).toLong))
    def snap(path: String): Seq[String] =
      graft.io.Folio.rollupRead(spark, path)
        .collect().map(_.mkString("|")).sorted.toSeq
    // the truth: ONE append of everything
    val one = java.nio.file.Files.createTempDirectory("graft_rup_one").toString
    graft.io.Folio.appendWithRollup(rows.toDF("k", "v", "w"), one,
      Seq("k"), Seq("v", "w"))
    val want = snap(one)
    for (seed <- 1 to 3) {
      val r2 = new scala.util.Random(seed)
      val cuts = (0 until 1 + r2.nextInt(3)).map(_ => r2.nextInt(rows.length))
      val bounds = (Seq(0) ++ cuts :+ rows.length).distinct.sorted
      val path = java.nio.file.Files.createTempDirectory(s"graft_rup$seed").toString
      bounds.sliding(2).map { case Seq(a, b) => rows.slice(a, b) }
        .filter(_.nonEmpty)
        .foreach(b => graft.io.Folio.appendWithRollup(b.toDF("k", "v", "w"),
          path, Seq("k"), Seq("v", "w")))
      // incremental merge across ANY split == the one-shot aggregate,
      // including the exact decimal sums (order-free by construction)
      assert(snap(path) == want, s"seed $seed split drifted")
      assert(graft.io.Folio.rollupDataRead(spark, path).count() == rows.length)
    }
  }

  test("bpe: the trained first merge equals the pair-census argmax; counts shrink per fired merge") {
    val rnd = new scala.util.Random(31337)
    val words = Seq("spark", "sparse", "parse", "park", "shark", "scala")
    val docs = (0 until 40).map(i =>
      (i.toLong, (0 until 1 + rnd.nextInt(6)).map(_ => words(rnd.nextInt(words.length))).mkString(" ")))
      .toDF("doc_id", "text")
    val census = llm.TextOps.bpePairCensus(llm.TextOps.bpeWordCensus(docs, "text"))
      .limit(1).collect()(0)
    val m1 = llm.TextOps.bpeTrain(docs, "text", 1).collect()(0)
    assert((m1.getString(1), m1.getString(2)) == ((census.getString(0), census.getString(1))))
    // token-count conservation: n_tokens(after k merges) =
    // n_tokens(chars+mark) − (occurrences each merge fired), and is
    // monotonically non-increasing in k
    // a merge that can never fire (no 2-char symbols exist in round 1)
    // gives the raw chars+mark token counts as the baseline
    val base = llm.TextOps.bpeApply(docs, "doc_id", "text", Seq(("zz", "qq")))
      .agg(sum(col("n_tokens"))).first().getLong(0)
    var prev = base
    for (k <- 1 to 4) {
      val merges = llm.TextOps.bpeTrain(docs, "text", k)
        .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val n = llm.TextOps.bpeApply(docs, "doc_id", "text", merges)
        .agg(sum(col("n_tokens"))).first().getLong(0)
      assert(n <= prev, s"k=$k token count grew: $n > $prev")
      prev = n
    }
  }
}
