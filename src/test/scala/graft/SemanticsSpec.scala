package graft

import org.apache.spark.sql.functions._
import graft.ops.{Adverbs, Verbs, MapSetEnum}

/** Golden tests mirroring the reference's BasicKerfUnitTests
  * (/root/reference/test.cc) on the Spark substrate. */
class SemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).collect()(0).get(0)

  // adverbs — test.cc:330–346
  test("fold: +/[1,2,3] = 6 (adverbs.h:34)") {
    assert(one(Adverbs.fold(array(lit(1), lit(2), lit(3)), lit(0))(_ + _)) == 6)
  }
  test("fold1 seeds with head (adverbs.h:34–55)") {
    assert(one(Adverbs.fold1(array(lit(5), lit(2), lit(3)))(_ + _)) == 10)
    assert(one(Adverbs.fold1(array(lit(7)))(_ + _)) == 7)
  }
  test("scan/unfold: +\\[1,2,3] = [1,3,6] (adverbs.h:76, test.cc:339)") {
    assert(one(Adverbs.scan(array(lit(1), lit(2), lit(3)), lit(0))(_ + _)) == Seq(1, 3, 6))
  }
  test("eachprior/mapback: range(4) mapback - with seed 4 = [-4,1,1,1] (test.cc:344)") {
    assert(one(Adverbs.eachPrior(array(lit(0), lit(1), lit(2), lit(3)), lit(4))(_ - _))
      == Seq(-4, 1, 1, 1))
  }
  test("ema: seeds with head, prev + a*(x-prev) updates; empty safe; loud alpha") {
    assert(one(Adverbs.ema(array(lit(1.0), lit(2.0), lit(3.0), lit(4.0)), 0.5))
      == Seq(1.0, 1.5, 2.25, 3.125))
    assert(one(Adverbs.ema(array(lit(7.0)), 0.25)) == Seq(7.0))
    val empty = slice(array(lit(1.0)), lit(1), lit(0))
    assert(one(Adverbs.ema(empty, 0.5)) == Seq())
    intercept[IllegalArgumentException] { Adverbs.ema(array(lit(1.0)), 0.0) }
  }

  test("scan/eachprior on empty arrays yield empty (sequence/zip_with edge)") {
    val empty = slice(array(lit(1)), lit(1), lit(0)) // array<int> of size 0
    assert(one(Adverbs.scan(empty, lit(0))(_ + _)) == Seq())
    assert(one(Adverbs.eachPrior(empty, lit(4))(_ - _)) == Seq())
  }
  test("each/mapdown doubles elements (adverbs.h:125)") {
    assert(one(Adverbs.each(array(lit(1), lit(2)))(_ * 2)) == Seq(2, 4))
  }
  test("mapright: 10 +/ [1,2,3] = [11,12,13] (adverbs.h:139)") {
    assert(one(Adverbs.mapRight(lit(10), array(lit(1), lit(2), lit(3)))(_ + _)) == Seq(11, 12, 13))
  }

  // pervasive arithmetic — test.cc:236–328, verbs.cc:32–83
  test("pervade unit×list and list×list (verbs.cc:45)") {
    val df = Seq((1, Seq(10, 20), Seq(1, 2))).toDF("u", "a", "b")
    val ta = df.schema("a").dataType; val tb = df.schema("b").dataType
    val tu = df.schema("u").dataType
    val row = df.select(
      Verbs.add(tu, ta)(col("u"), col("a")).as("ul"),
      Verbs.add(ta, tb)(col("a"), col("b")).as("ll"),
      Verbs.neg(ta)(col("a")).as("n")).collect()(0)
    assert(row.getSeq[Int](0) == Seq(11, 21))
    assert(row.getSeq[Int](1) == Seq(11, 22))
    assert(row.getSeq[Int](2) == Seq(-10, -20))
  }
  test("pervade nested list [[13,23],[113,123]] shape (test.cc:300ish)") {
    val df = Seq((Seq(Seq(13, 23), Seq(113, 123)), 1)).toDF("nested", "u")
    val t = df.schema("nested").dataType; val tu = df.schema("u").dataType
    val got = df.select(Verbs.add(t, tu)(col("nested"), col("u"))).collect()(0).getSeq[Seq[Int]](0)
    assert(got == Seq(Seq(14, 24), Seq(114, 124)))
  }
  test("range/til is affine (verbs.cc:86, test.cc:438)") {
    assert(one(Verbs.rangeArr(lit(4))) == Seq(0L, 1L, 2L, 3L))
  }

  // map/set/enum/affine — test.cc:383–485
  test("map amend/delete/lookup (presented.cc:534)") {
    val m = map(lit(11), lit(301), lit(22), lit(302))
    assert(one(MapSetEnum.mapLookup(MapSetEnum.mapAmend(m, lit(33), lit(303)), lit(33))) == 303)
    assert(one(MapSetEnum.mapLookup(MapSetEnum.mapAmend(m, lit(11), lit(999)), lit(11))) == 999)
    assert(one(size(map_keys(MapSetEnum.mapDelete(m, lit(11))))) == 1)
  }
  test("set dedups on append (presented.cc:475, test.cc:458)") {
    val s0 = array(lit(10), lit(20))
    assert(one(size(MapSetEnum.setAppend(s0, lit(10)))) == 2)
    assert(one(size(MapSetEnum.setAppend(s0, lit(30)))) == 3)
  }
  test("AFFINE_RANGE(3,3,2) = [3,5,7] (test.cc:438–456)") {
    val got = MapSetEnum.affineRange(spark, 3, 3, 2).as[Long].collect().toSeq
    assert(got == Seq(3L, 5L, 7L))
  }
  test("enum intern assigns dense stable codes (presented.h:545)") {
    val df = Seq("b", "a", "b", "c").toDF("v")
    val dict = MapSetEnum.internTable(df, "v")
    val codes = dict.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(codes == Map("a" -> 0, "b" -> 1, "c" -> 2))
    val applied = MapSetEnum.applyIntern(df, dict, "v")
    assert(applied.agg(sum("v_code")).collect()(0).getLong(0) == 1 + 0 + 1 + 2)
  }

  // Kerf ordering semantics — grade.cc, kerf.h:39 (NaN-smallest opt-in)
  test("NaN sorts smallest with asc_nulls_first + nanvl shim (grade.cc:15)") {
    val df = Seq(Double.NaN, 1.0, -1.0 / 0.0).toDF("x")
    // Kerf-mode sort key: NaN → null → nulls first
    val sorted = df.orderBy(when(isnan(col("x")), lit(null)).otherwise(col("x")).asc_nulls_first)
      .collect().map(_.getDouble(0)).toSeq
    assert(sorted.head.isNaN && sorted(1) == Double.NegativeInfinity && sorted(2) == 1.0)
  }
  test("representational hash: width/type-insensitive (hash.h:23–27)") {
    import graft.functions.KerfHash
    import org.apache.spark.sql.types._
    val df = Seq((1.toByte, 1, 1L, 1.0f, 1.0, 1.5)).toDF("b", "i", "l", "f", "d", "frac")
    val r = df.select(
      KerfHash.representational(col("b"), ByteType).as("hb"),
      KerfHash.representational(col("i"), IntegerType).as("hi"),
      KerfHash.representational(col("l"), LongType).as("hl"),
      KerfHash.representational(col("f"), FloatType).as("hf"),
      KerfHash.representational(col("d"), DoubleType).as("hd"),
      KerfHash.representational(col("frac"), DoubleType).as("hfrac")).collect()(0)
    // int8 == int32 == int64 == float(1.0) == double(1.0) representationally
    assert(Set(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)).size == 1)
    assert(r.getLong(5) != r.getLong(0)) // 1.5 differs
    // array form: [1,2,3] as int equals as long (test.cc width invariance)
    val arr = Seq((Seq(1, 2, 3), Seq(1L, 2L, 3L))).toDF("ai", "al")
    val h = arr.select(
      xxhash64(KerfHash.canonical(col("ai"), ArrayType(IntegerType))).as("x"),
      xxhash64(KerfHash.canonical(col("al"), ArrayType(LongType))).as("y")).collect()(0)
    assert(h.getLong(0) == h.getLong(1))
    // classes are DISJOINT: a raw string that happens to spell "n:1"
    // must not hash equal to the number 1 (user text contains such
    // shapes; conflation silently merges distinct values in dedup)
    val mixed = Seq(("n:1", 1)).toDF("s", "n")
    val m = mixed.select(
      KerfHash.representational(col("s"), StringType).as("hs"),
      KerfHash.representational(col("n"), IntegerType).as("hn"),
      KerfHash.reprEq(col("s"), StringType, col("n"), IntegerType).as("eq"))
      .collect()(0)
    assert(m.getLong(0) != m.getLong(1), "string 'n:1' collided with number 1")
    assert(!m.getBoolean(2))
  }

  test("seeded rng is deterministic per row across runs (rng.h pcg64 analog)") {
    def draw(seed: Int) = spark.range(100).select(col("id"), rand(seed).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1).toSeq
    assert(draw(42) == draw(42))
    assert(draw(42) != draw(43))
  }

  test("epsilon float equality (grade.cc:9,41)") {
    def epsEq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      abs(a - b) <= lit(1e-14) * greatest(abs(a), abs(b))
    assert(one(epsEq(lit(1.0), lit(1.0 + 1e-21))) == true)
    assert(one(epsEq(lit(1.0), lit(1.2))) == false)
  }
}
