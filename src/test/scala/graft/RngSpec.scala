package graft

import org.apache.spark.sql.functions._
import graft.functions.Rng
import graft.sql.KerfSql

/** The seeded counter RNG (rng.h:18–29 heritage) and the bitops.h verb
  * family: golden vectors against the published SplitMix64 test values,
  * then the dialect faces and their composition laws. */
class RngSpec extends SparkSpec {

  // ── generator goldens ──────────────────────────────────────────────

  test("splitmix64 golden: seed 0 matches the published test vector") {
    // first outputs of SplitMix64 seeded with 0 (Steele/Lea/Flood
    // reference implementation): 0xE220A8397B1DCDAF, 0x6E789E6AA1B965F4…
    assert(Rng.randU64(0L, 0L) == 0xE220A8397B1DCDAFL)
    assert(Rng.randU64(0L, 1L) == 0x6E789E6AA1B965F4L)
    assert(Rng.randU64(0L, 2L) == 0x06C45D188009454FL)
    assert(Rng.randU64(0L, 3L) == 0xF88BB8A8724C81ECL)
  }

  test("u01 is the 53-bit conversion, in [0,1), dense") {
    val xs = (0L until 1000L).map(Rng.randU01(42L, _))
    assert(xs.forall(x => x >= 0.0 && x < 1.0))
    assert(math.abs(xs.sum / xs.length - 0.5) < 0.03) // uniform mean
    assert(Rng.randU01(42L, 0L) == 0.7415648787718233) // pinned draw
  }

  test("expression face == Scala face, inside codegen") {
    val df = spark.range(0, 100).select(
      Rng.randu64(lit(42L), col("id")).as("u"),
      Rng.randu01(lit(42L), col("id")).as("f"))
    val rows = df.collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == Rng.randU64(42L, i.toLong))
      assert(r.getDouble(1) == Rng.randU01(42L, i.toLong))
    }
  }

  // ── dialect faces ──────────────────────────────────────────────────

  private def one(program: String): Any =
    KerfSql.run(spark, program).collect()(0).get(0)

  test("rand(seed, n): n pinned u01 draws; bound form floors to [0,k)") {
    val xs = one("rand(42, 5)").asInstanceOf[scala.collection.Seq[Double]].toSeq
    assert(xs == (0L until 5L).map(Rng.randU01(42L, _)))
    val ks = one("rand(42, 1000, 10)").asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(ks.forall(k => k >= 0 && k < 10))
    assert(ks.distinct.sorted == (0L until 10L)) // all buckets hit
  }

  test("deal(seed, n, k): n DISTINCT draws from [0,k), order by draw") {
    val xs = one("deal(7, 20, 52)").asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(xs.length == 20 && xs.distinct.length == 20)
    assert(xs.forall(x => x >= 0 && x < 52))
    // deterministic: the same call re-draws identically
    assert(one("deal(7, 20, 52)").asInstanceOf[scala.collection.Seq[Long]].toSeq == xs)
    // and equals the definition: domain ordered by its u64 draw
    assert(xs == (0L until 52L).sortBy(Rng.randU64(7L, _)).take(20))
    val full = one("deal(7, 52, 52)").asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(full.sorted == (0L until 52L)) // full deal = a permutation
  }

  test("shuffle(seed, x): a permutation, deterministic, seed-sensitive") {
    val base = (1L to 30L)
    val a = one("shuffle(1, til 30)").asInstanceOf[scala.collection.Seq[Long]].toSeq
    val b = one("shuffle(1, til 30)").asInstanceOf[scala.collection.Seq[Long]].toSeq
    val c = one("shuffle(2, til 30)").asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(a.sorted == (0L until 30L) && a == b && a != c)
    // empty and singleton pass through
    assert(one("shuffle(1, til 0)") == Seq())
    assert(one("shuffle(1, enlist(9))") == Seq(9L))
  }

  test("splitid over a table: ~80/10/10 and row-stable") {
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_rng")
    val rows = KerfSql.run(spark,
      "select count(*) as n from docs_rng " +
      "group splitid(11, doc_id, 8, 1, 1) as fold order fold").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    val ns = rows.map(_.getLong(1))
    val total = ns.sum.toDouble
    assert(math.abs(ns(0) / total - 0.8) < 0.05)
    // the SAME key draws the SAME fold in a different query shape
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        Rng.randu01(lit(11L), col("doc_id")).as("u")).collect()
    direct.foreach { r =>
      val u = r.getDouble(1)
      val fold = if (u < 0.8) 0L else if (u < 0.9) 1L else 2L
      val viaSql = one(s"splitid(11, ${r.getLong(0)}, 8, 1, 1)")
        .asInstanceOf[Long]
      assert(viaSql == fold)
    }
  }

  test("negative literal seeds work (half the seed space); null keys draw NO fold") {
    // -7 parses as UnaryMinus(Literal) — still a literal seed
    val xs = one("rand(0 - 7, 3)").asInstanceOf[scala.collection.Seq[Double]].toSeq
    assert(xs == (0L until 3L).map(Rng.randU01(-7L, _)))
    assert(one("randu64(0 - 7, 5)") == Rng.randU64(-7L, 5L))
    // a NULL key must return NULL, not fall through to the LAST fold
    // (which would silently funnel every null-keyed row into the test
    // split); the scalar faces null-propagate the same way
    assert(one("splitid(11, long('nope'), 8, 1, 1)") == null)
    assert(one("randu64(42, long('nope'))") == null)
    assert(one("randu01(42, long('nope'))") == null)
  }

  test("randu64/randu01 pervade through NESTED lists like any unary verb") {
    val v = one("randu64(42, enlist(til 2))")
      .asInstanceOf[scala.collection.Seq[scala.collection.Seq[Long]]]
    assert(v.map(_.toSeq) == Seq((0L until 2L).map(Rng.randU64(42L, _))))
  }

  test("RNG guards are loud: non-literal seed, oversized count/domain") {
    val e1 = intercept[Exception](one("rand(1, 2000000)"))
    assert(e1.getMessage.contains("REPL bound"))
    val e2 = intercept[Exception](one("deal(1, 5, 2000000)"))
    assert(e2.getMessage.contains("REPL bound") || e2.getMessage.contains("domain"))
    val e3 = intercept[Exception](one("deal(1, 10, 5)"))
    assert(e3.getMessage.contains("distinct"))
  }

  // ── bitops.h family ────────────────────────────────────────────────

  test("bitops goldens: and/or/xor/not/shifts/popcount") {
    assert(one("band(12, 10)") == 8L)
    assert(one("bor(12, 10)") == 14L)
    assert(one("bxor(12, 10)") == 6L)
    assert(one("bnot(0)") == -1L)
    assert(one("shl(1, 10)") == 1024L)
    assert(one("shl(1, 63)") == Long.MinValue) // wraps, Java semantics
    assert(one("shr(-8, 1)") == -4L)           // ARITHMETIC shift
    assert(one("popcount(255)") == 8L)
    assert(one("popcount(-1)") == 64L)
  }

  test("log2floor is exact where fp log2 misrounds; ispow2 (bitops.h:94)") {
    // floor_log_2 (bitops.h:17) — exact via binary length, including the
    // 2^k−1 neighborhoods where floor(log2(x)) in doubles rounds up
    assert(one("log2floor(1)") == 0L)
    assert(one("log2floor(2)") == 1L)
    assert(one("log2floor(1023)") == 9L)
    assert(one("log2floor(1024)") == 10L)
    val big = (1L << 53) - 1 // fp log2 would claim 53
    assert(one(s"log2floor($big)") == 52L)
    assert(one("log2floor(0)") == null) // no log of nonpositives
    assert(one("log2floor(-5)") == null)
    assert(one("ispow2(1)") == true)
    assert(one("ispow2(1024)") == true)
    assert(one("ispow2(1023)") == false)
    assert(one("ispow2(0)") == false)
    assert(one("ispow2(-4)") == false)
  }

  test("randu64/randu01 pervade through lists") {
    val xs = one("randu64(42, til 3)").asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(xs == (0L until 3L).map(Rng.randU64(42L, _)))
    val us = one("randu01(42, til 3)").asInstanceOf[scala.collection.Seq[Double]].toSeq
    assert(us == (0L until 3L).map(Rng.randU01(42L, _)))
  }

  // ── composition: the sampling idioms the scalars exist for ─────────

  test("exact-n sample: ORDER BY draw LIMIT n is stable and key-agnostic") {
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_rng")
    val a = KerfSql.run(spark,
      "select doc_id from docs_rng order randu64(3, doc_id), doc_id limit 20")
      .collect().map(_.getLong(0)).toSeq
    val b = KerfSql.run(spark,
      "select doc_id from docs_rng order randu64(3, doc_id), doc_id limit 20")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b && a.distinct.length == 20)
    // the plan is a top-n heap, not a global sort (scale contract)
    val plan = KerfSql.run(spark,
      "explain select doc_id from docs_rng order randu64(3, doc_id), doc_id limit 20")
      .collect()(0).getString(0)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("bernoulli sample: WHERE randu01 < p is a pushable predicate") {
    spark.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs_rng")
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    val kept = KerfSql.run(spark,
      "select count(*) as n from docs_rng where randu01(5, doc_id) < 0.25")
      .collect()(0).getLong(0)
    assert(math.abs(kept.toDouble / n - 0.25) < 0.05)
  }
}
