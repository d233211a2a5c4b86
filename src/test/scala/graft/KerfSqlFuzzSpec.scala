package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.sql.KerfSql

/** DIFFERENTIAL fuzz over the dialect's select surface: a seeded
  * generator draws random (where, group, aggregate, order, limit)
  * shapes over lineitem, renders each shape BOTH as dialect text and
  * as the directly-constructed DataFrame plan, and requires row-exact
  * equality. The two sides lower to the same Catalyst operations, so
  * any divergence is a parser/lowering bug, not fp noise — this is the
  * regression net under every hand-written KerfSqlSpec golden (the
  * reference parses this surface but never evaluates it;
  * /root/reference/parser.h:541–567). */
class KerfSqlFuzzSpec extends SparkSpec {

  private case class Shape(
      pred: Option[(String, Column)],               // (dialect, api)
      groups: Seq[String],                          // group columns
      aggs: Seq[(String, String, Option[String], String)], // (fn, col, col2, alias)
      orderDesc: Boolean,
      limit: Option[Int])

  private val numCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val keyCols = Seq("l_returnflag", "l_linestatus", "l_linenumber")
  private val aggFns = Seq("sum", "avg", "min", "max", "count")
  // the r12 statistical family: 1-arg moments + 2-arg weighted/joint
  private val statFns1 = Seq("var", "dev")
  private val statFns2 = Seq("wavg", "cov", "cor")

  // literal in the column's actual value range, so predicates select
  // real subsets instead of vacuously empty/full ones
  private def litFor(c: String, rnd: scala.util.Random): Double = {
    val (lo, hi) = c match {
      case "l_quantity" => (1.0, 50.0)
      case "l_extendedprice" => (1000.0, 90000.0)
      case _ => (0.0, 0.08) // discount/tax
    }
    math.round((lo + rnd.nextDouble() * (hi - lo)) * 100) / 100.0
  }

  private def draw(rnd: scala.util.Random): Shape = {
    val pred = if (rnd.nextBoolean()) {
      val c = numCols(rnd.nextInt(numCols.length))
      val lo = litFor(c, rnd)
      rnd.nextInt(3) match {
        case 0 => Some((s"$c >= $lo", col(c) >= lo))
        case 1 => Some((s"$c < $lo", col(c) < lo))
        case _ =>
          val c2 = numCols(rnd.nextInt(numCols.length))
          val hi = litFor(c2, rnd)
          Some((s"$c >= $lo and $c2 < $hi", col(c) >= lo && col(c2) < hi))
      }
    } else None
    val groups = rnd.shuffle(keyCols).take(rnd.nextInt(3))
    val nAggs = 1 + rnd.nextInt(3)
    val aggs = (0 until nAggs).map { i =>
      val c = numCols(rnd.nextInt(numCols.length))
      rnd.nextInt(3) match {
        case 0 =>
          (statFns1(rnd.nextInt(statFns1.length)), c, None, s"a$i")
        case 1 =>
          val c2 = numCols(rnd.nextInt(numCols.length))
          (statFns2(rnd.nextInt(statFns2.length)), c, Some(c2), s"a$i")
        case _ =>
          (aggFns(rnd.nextInt(aggFns.length)), c, None, s"a$i")
      }
    }
    Shape(pred, groups, aggs, rnd.nextBoolean(),
      if (rnd.nextBoolean()) Some(1 + rnd.nextInt(50)) else None)
  }

  private def dialectOf(s: Shape): String = {
    val aggTxt = s.aggs.map {
      case ("count", _, _, a) => s"count(*) as $a"
      case (fn, c, Some(c2), a) => s"$fn($c, $c2) as $a"
      case (fn, c, None, a) => s"$fn($c) as $a"
    }
    val items = (s.groups ++ aggTxt).mkString(", ")
    val sb = new StringBuilder(s"select $items from lineitem_fuzz")
    s.pred.foreach { case (txt, _) => sb.append(s" where $txt") }
    if (s.groups.nonEmpty) sb.append(s" group ${s.groups.mkString(", ")}")
    val ord = (s.groups.headOption.orElse(Some(s.aggs.head._4)).get)
    sb.append(s" order ${if (s.orderDesc) "-" else ""}$ord")
    // tie-break on the remaining output columns so row order is total
    (s.groups.drop(1) ++ s.aggs.map(_._4).filterNot(_ == ord))
      .foreach(c => sb.append(s", $c"))
    s.limit.foreach(n => sb.append(s" limit $n"))
    sb.toString
  }

  private def apiOf(df: DataFrame, s: Shape): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    // the dialect's aggregate typing: sum over double stays double,
    // count(*) is a long; the statistical family replays the exact
    // decimal-sum tree (the q158 discipline), clamp included
    def dq(c: Column) = c.cast(DecimalType(18, 6))
    def dsum(c: Column) = sum(c).cast(DoubleType)
    def safeDiv(num: Column, den: Column): Column =
      when(den === 0.0, lit(null).cast(DoubleType)).otherwise(num / den)
    def varOf(x: Column, n: Column) = {
      val sx = dsum(dq(x)); val sxx = dsum(dq(x) * dq(x))
      when(n === 0.0, lit(null).cast(DoubleType))
        .otherwise(greatest((sxx / n) - (sx / n) * (sx / n), lit(0.0)))
    }
    def covOf(x: Column, y: Column, n: Column) =
      when(n === 0.0, lit(null).cast(DoubleType))
        .otherwise((dsum(dq(x) * dq(y)) / n) -
          (dsum(dq(x)) / n) * (dsum(dq(y)) / n))
    def aggCol(fn: String, c: String, c2: Option[String], a: String): Column = {
      lazy val n = count(col(c)).cast(DoubleType)
      (fn match {
        case "count" => count(lit(1))
        case "sum" => sum(col(c))
        case "avg" => avg(col(c))
        case "min" => min(col(c))
        case "max" => max(col(c))
        case "var" => varOf(col(c), n)
        case "dev" => sqrt(varOf(col(c), n))
        case "wavg" => safeDiv(dsum(dq(col(c)) * dq(col(c2.get))), dsum(dq(col(c))))
        case "cov" => covOf(col(c), col(c2.get), n)
        case "cor" =>
          safeDiv(covOf(col(c), col(c2.get), n),
            sqrt(varOf(col(c), n)) * sqrt(varOf(col(c2.get), n)))
      }).as(a)
    }
    val filtered = s.pred.map { case (_, p) => df.filter(p) }.getOrElse(df)
    val cols = s.aggs.map { case (f, c, c2, a) => aggCol(f, c, c2, a) }
    val agged =
      if (s.groups.nonEmpty)
        filtered.groupBy(s.groups.map(col): _*).agg(cols.head, cols.tail: _*)
      else filtered.agg(cols.head, cols.tail: _*)
    val ord = s.groups.headOption.getOrElse(s.aggs.head._4)
    val rest = (s.groups.drop(1) ++ s.aggs.map(_._4).filterNot(_ == ord)).map(col)
    val sorted = agged.orderBy(
      (if (s.orderDesc) col(ord).desc else col(ord).asc) +: rest: _*)
    s.limit.map(sorted.limit).getOrElse(sorted)
  }

  test("dialect select fuzz: 60 seeded shapes equal their direct API plans row-exactly") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem_fuzz")
    val df = spark.table("lineitem_fuzz")
    var nonEmpty = 0
    for (seed <- 1 to 60) {
      val rnd = new scala.util.Random(seed)
      val shape = draw(rnd)
      val txt = dialectOf(shape)
      val got = try KerfSql.run(spark, txt).collect().toSeq
        catch { case e: Throwable => fail(s"seed $seed: '$txt' threw: $e") }
      val want = apiOf(df, shape).collect().toSeq
      assert(got == want,
        s"seed $seed diverged\n  dialect: $txt\n  got:  ${got.take(3)}\n  want: ${want.take(3)}")
      if (want.nonEmpty) nonEmpty += 1
    }
    // the generator must actually exercise data, not vacuously pass
    assert(nonEmpty > 40, s"only $nonEmpty/60 shapes returned rows")
  }

  test("join fuzz: 30 seeded inner/left/semi/anti shapes equal their API joins") {
    Tables.orders(spark, sf).createOrReplaceTempView("orders_jf")
    Tables.customer(spark, sf).createOrReplaceTempView("customer_jf")
    val orders = spark.table("orders_jf")
    val customer = spark.table("customer_jf")
    for (seed <- 1 to 30) {
      val rnd = new scala.util.Random(2000 + seed)
      val how = Seq("join", "left join", "semi join", "anti join")(rnd.nextInt(4))
      val pred = if (rnd.nextBoolean()) s" where o_totalprice < ${50000 + rnd.nextInt(100000)}" else ""
      val items = how match {
        case "semi join" | "anti join" =>
          // existence filters keep only left columns
          "o_orderstatus, count(*) as n, sum(o_totalprice) as s"
        case _ => "o_orderstatus, count(*) as n, sum(o_totalprice) as s"
      }
      val txt = s"select $items from orders_jf $how customer_jf " +
        s"on o_custkey = c_custkey$pred group o_orderstatus order o_orderstatus"
      val got = KerfSql.run(spark, txt).collect().toSeq
      val apiHow = Map("join" -> "inner", "left join" -> "left",
        "semi join" -> "left_semi", "anti join" -> "left_anti")(how)
      var j = orders.join(customer, orders("o_custkey") === customer("c_custkey"), apiHow)
      if (pred.nonEmpty)
        j = j.filter(col("o_totalprice") < pred.split("< ")(1).toInt)
      val want = j.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("s"))
        .orderBy("o_orderstatus").collect().toSeq
      assert(got == want, s"seed $seed ($how) diverged\n  $txt")
    }
  }

  test("windowed-verb fuzz: 40 seeded shapes equal their Window-API plans row-exactly") {
    import org.apache.spark.sql.expressions.Window
    // small slice: window fuzz cost is per-shape shuffle, keep it tight
    // l_quantity gets planted NULL gaps so the carry/lag/ratio verbs
    // exercise their null paths, not just the dense case
    Tables.lineitem(spark, sf).limit(800)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_linenumber") % 3 === 0, lit(null).cast("double"))
          .otherwise(col("l_quantity")).as("l_quantity"),
        col("l_discount"), col("l_returnflag"))
      .createOrReplaceTempView("lineitem_wfuzz")
    val df = spark.table("lineitem_wfuzz")
    val runningVerbs = Seq("sums", "avgs", "mins", "maxs", "counts", "fills",
      "bfills", "nexts", "ratios", "differs")
    val movingVerbs = Seq("msums", "mavgs", "mmins", "mmaxs", "mcounts")
    for (seed <- 1 to 40) {
      val rnd = new scala.util.Random(1000 + seed)
      val group = if (rnd.nextBoolean()) Seq("l_returnflag") else Seq("l_orderkey")
      val vcol = if (rnd.nextBoolean()) "l_quantity" else "l_discount"
      val nVerbs = 1 + rnd.nextInt(3)
      val verbs = (0 until nVerbs).map { i =>
        if (rnd.nextBoolean()) {
          val v = runningVerbs(rnd.nextInt(runningVerbs.length))
          (v, 0, s"w$i")
        } else {
          val v = movingVerbs(rnd.nextInt(movingVerbs.length))
          (v, 2 + rnd.nextInt(4), s"w$i")
        }
      }
      val verbTxt = verbs.map { case (v, n, a) =>
        if (n == 0) s"$v($vcol) as $a" else s"$v($n, $vcol) as $a"
      }.mkString(", ")
      val txt = s"select ${group.mkString(", ")}, l_linenumber, $verbTxt " +
        s"from lineitem_wfuzz group ${group.mkString(", ")} " +
        s"order l_orderkey, l_linenumber" // total order: tie-free running frames
      val got = try KerfSql.run(spark, txt).collect().toSeq
        catch { case e: Throwable => fail(s"seed $seed: '$txt' threw: $e") }
      // API side: the same verbs over the same (group, order) window
      val wb = Window.partitionBy(group.map(col): _*)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
      val running = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def apiVerb(v: String, n: Int): Column = {
        val mf = if (n > 0) wb.rowsBetween(-(n - 1), Window.currentRow) else running
        v match {
          case "sums" => sum(col(vcol)).over(running)
          case "avgs" => avg(col(vcol)).over(running)
          case "bfills" => first(col(vcol), ignoreNulls = true)
            .over(wb.rowsBetween(Window.currentRow, Window.unboundedFollowing))
          case "nexts" => lead(col(vcol), 1).over(wb)
          case "ratios" =>
            val prior = lag(col(vcol), 1).over(wb)
            when(prior === 0 || prior.isNull, lit(null).cast("double"))
              .otherwise(col(vcol).cast("double") / prior.cast("double"))
          case "mcounts" => count(col(vcol)).over(mf)
          case "mins" => min(col(vcol)).over(running)
          case "maxs" => max(col(vcol)).over(running)
          case "counts" => count(col(vcol)).over(running)
          case "fills" => last(col(vcol), ignoreNulls = true).over(running)
          case "differs" => (row_number().over(wb) === 1) ||
            !(col(vcol) <=> lag(col(vcol), 1).over(wb))
          case "msums" => sum(col(vcol)).over(mf)
          case "mavgs" => avg(col(vcol)).over(mf)
          case "mmins" => min(col(vcol)).over(mf)
          case "mmaxs" => max(col(vcol)).over(mf)
        }
      }
      val want = df.select(
          group.map(col) ++ Seq(col("l_linenumber")) ++
            verbs.map { case (v, n, a) => apiVerb(v, n).as(a) }: _*)
        .orderBy(group.map(col) ++ Seq(col("l_orderkey"), col("l_linenumber")): _*)
        .collect().toSeq
      assert(got == want,
        s"seed $seed diverged\n  dialect: $txt\n  got:  ${got.take(3)}\n  want: ${want.take(3)}")
    }
  }

  test("asof-text fuzz: 20 seeded tolerance/forward/strict shapes equal the API join") {
    import spark.implicits._
    // random tick fixtures: duplicate-free (sym, ts) on the right so
    // the carried row is unambiguous on both paths
    val rnd0 = new scala.util.Random(555)
    val trades = (0 until 120).map(_ =>
      (rnd0.nextInt(5).toLong, rnd0.nextInt(1000).toLong, rnd0.nextInt(100).toDouble))
      .toDF("sym", "t_ts", "px")
    val quotes = rnd0.shuffle((0 until 5).flatMap(s =>
        rnd0.shuffle((0 until 1000).toList).take(60).map(t =>
          (s.toLong, t.toLong, rnd0.nextInt(50).toDouble))))
      .toDF("sym", "q_ts", "bid")
    trades.createOrReplaceTempView("af_trades")
    quotes.createOrReplaceTempView("af_quotes")
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(9000 + seed)
      val tol = if (rnd.nextBoolean()) Some(1L + rnd.nextInt(300)) else None
      val fwd = rnd.nextBoolean()
      val strict = rnd.nextBoolean()
      val txt = s"select sym, t_ts, px, bid from af_trades " +
        "asof join af_quotes on sym at t_ts, q_ts" +
        tol.map(t => s" within $t").getOrElse("") +
        (if (fwd) " forward" else "") +
        (if (strict) " strict" else "") +
        " order sym, t_ts, px, bid"
      val got = KerfSql.run(spark, txt).collect().map(_.mkString("|")).toSeq
      val want = graft.ops.AsOf.joinNative(trades, quotes, Seq("sym"),
          "t_ts", "q_ts", strict = strict, tolerance = tol, forward = fwd)
        .select(col("sym"), col("t_ts"), col("px"), col("bid"))
        .orderBy(col("sym"), col("t_ts"), col("px"), col("bid"))
        .collect().map(_.mkString("|")).toSeq
      assert(got == want, s"seed $seed diverged (tol=$tol fwd=$fwd strict=$strict)\n" +
        s"  got:  ${got.take(3)}\n  want: ${want.take(3)}")
    }
  }

  test("wj fuzz: 12 seeded band/back/forward/prevailing shapes equal brute force") {
    import spark.implicits._
    val rnd0 = new scala.util.Random(777)
    val tr = (0 until 40).map(i =>
      (rnd0.nextInt(3).toLong, (10 + rnd0.nextInt(200)).toLong, i.toDouble))
    val qu = rnd0.shuffle((0 until 3).flatMap(s =>
      rnd0.shuffle((0 until 220).toList).take(30).map(t =>
        (s.toLong, t.toLong, rnd0.nextInt(30).toDouble))))
    tr.toDF("sym", "t_ts", "px").createOrReplaceTempView("wjf_t")
    qu.toDF("sym", "q_ts", "bid").createOrReplaceTempView("wjf_q")
    val bySym = qu.groupBy(_._1)
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(3000 + seed)
      val tol = 1L + rnd.nextInt(60)
      val mode = rnd.nextInt(3) // 0 sym, 1 back, 2 forward
      val prevailing = rnd.nextBoolean()
      val kw = (mode match {
        case 1 => " back"; case 2 => " forward"; case _ => ""
      }) + (if (prevailing) " prevailing" else "")
      val got = KerfSql.run(spark,
        "select sym, t_ts, px, max(bid) as top, count(bid) as n " +
        s"from wjf_t window join wjf_q on sym at t_ts, q_ts within $tol$kw " +
        "group sym, t_ts, px order sym, t_ts, px")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4))).toSeq
      val want = tr.map { case (s, t, px) =>
        val lo = if (mode == 2) t else t - tol
        val hi = if (mode == 1) t else t + tol
        val qs = bySym.getOrElse(s, Nil)
        val inBand = qs.filter(q => q._2 >= lo && q._2 <= hi)
        val prev = if (prevailing)
          qs.filter(_._2 < lo).sortBy(_._2).lastOption.toSeq else Nil
        val all = inBand ++ prev
        (s, t, px,
         if (all.isEmpty) None else Some(all.map(_._3).max), all.size.toLong)
      }.sortBy(x => (x._1, x._2, x._3))
      assert(got == want, s"seed $seed diverged (tol=$tol kw='$kw')\n" +
        s"  got:  ${got.take(4)}\n  want: ${want.take(4)}")
    }
  }

  test("program fuzz: 25 seeded multi-statement pipelines are run-to-run deterministic") {
    // the determinism net: every registered query's oracle comparison
    // depends on a second evaluation producing the SAME rows — this
    // fuzz drives random multi-statement programs (assignment-staged
    // filters with in-lists and fby, grouped aggregates incl. collect,
    // window-verb stages, the top verb) twice through a fresh parse
    // and requires identical collected multisets. Catches any plan
    // whose output depends on partitioning or visit order (the trap
    // array_sort-ed collect and md5-ranked cuts exist to avoid).
    Tables.lineitem(spark, sf).limit(600)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_returnflag"), col("l_linestatus"))
      .createOrReplaceTempView("lineitem_pfuzz")
    for (seed <- 1 to 25) {
      val rnd = new scala.util.Random(7000 + seed)
      val flag = Seq("'A'", "'N'", "'R'")(rnd.nextInt(3))
      val stages = scala.collection.mutable.ArrayBuffer[String]()
      // stage 1: a filtered projection (in-list or comparison or fby)
      val pred = rnd.nextInt(3) match {
        case 0 => s"l_returnflag in ($flag, 'X')"
        case 1 => s"l_quantity > ${1 + rnd.nextInt(40)}"
        case 2 => "l_quantity = max(l_quantity) by l_returnflag"
      }
      stages += s"s1_$seed: select l_orderkey, l_linenumber, l_quantity, " +
        s"l_discount, l_returnflag from lineitem_pfuzz where $pred"
      // stage 2: either a grouped aggregate (maybe with collect) or a
      // windowed-verb stage or a top cut
      val fin = rnd.nextInt(3) match {
        case 0 =>
          val extra = if (rnd.nextBoolean()) ", collect(l_quantity) as qs" else ""
          s"select l_returnflag, count(*) as n, sum(l_quantity) as sq, " +
            s"countd(l_orderkey) as no$extra from s1_$seed " +
            "group l_returnflag order l_returnflag"
        case 1 =>
          s"select l_returnflag, l_orderkey, l_linenumber, " +
            "sums(l_quantity) as cum, differs(l_quantity) as chg " +
            s"from s1_$seed group l_returnflag order l_orderkey, l_linenumber"
        case 2 =>
          s"t_$seed: top s1_$seed by l_returnflag at ${1 + rnd.nextInt(5)} " +
            "order -l_quantity, l_orderkey, l_linenumber; " +
            s"select * from t_$seed order l_returnflag, l_orderkey, l_linenumber"
      }
      val program = (stages :+ fin).mkString("; ")
      def run(): Seq[String] =
        KerfSql.run(spark, program).collect().map(_.mkString("|")).sorted.toSeq
      val a = run(); val b = run()
      assert(a == b, s"seed $seed nondeterministic\n  program: $program\n" +
        s"  first:  ${a.take(3)}\n  second: ${b.take(3)}")
      assert(a.nonEmpty || pred.contains("in"), s"seed $seed empty result: $program")
    }
  }

  test("ordering-mode fuzz: `set order kerf` bare key == explicit kerf(x) == API, 30 seeds") {
    import spark.implicits._
    for (seed <- 1 to 30) {
      val rnd = new scala.util.Random(4000 + seed)
      // random doubles with NaN and null injections — the three float
      // classes whose placement the mode redefines
      val rows = (1L to 40L).map { id =>
        rnd.nextInt(5) match {
          case 0 => (id, Some(Double.NaN))
          case 1 => (id, None: Option[Double])
          case _ => (id, Some(math.round(rnd.nextDouble() * 1000) / 10.0))
        }
      }
      rows.toDF("id", "x").createOrReplaceTempView(s"ordfuzz_$seed")
      val desc = rnd.nextBoolean()
      val sign = if (desc) "-" else ""
      def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.collect().map(_.getLong(0)).toSeq
      val session = ids(KerfSql.run(spark,
        s"set order kerf; select id from ordfuzz_$seed order ${sign}x, id"))
      val explicit = ids(KerfSql.run(spark,
        s"select id from ordfuzz_$seed order ${sign}kerf(x), id"))
      val api = ids(spark.table(s"ordfuzz_$seed").orderBy(
        (if (desc) graft.functions.KerfOrdering.nanSmallestDesc(col("x"))
         else graft.functions.KerfOrdering.nanSmallestAsc(col("x"))),
        col("id")).select("id"))
      assert(session == explicit,
        s"seed $seed desc=$desc: session mode diverged from explicit kerf(x)\n" +
        s"  session:  ${session.take(8)}\n  explicit: ${explicit.take(8)}")
      assert(session == api,
        s"seed $seed desc=$desc: session mode diverged from KerfOrdering API\n" +
        s"  session: ${session.take(8)}\n  api:     ${api.take(8)}")
    }
  }

  test("equality-mode fuzz: `set eq kerf` =/!= == native eps_eq API, 30 seeds") {
    import spark.implicits._
    import graft.functions.EpsilonEquals.eps_eq
    for (seed <- 1 to 30) {
      val rnd = new scala.util.Random(5000 + seed)
      // pairs spanning the decision surface: exact, within-eps, just
      // outside, far, NaN/null mixes — per-row class drawn at random
      val rows = (1L to 60L).map { id =>
        val base = (rnd.nextDouble() - 0.5) * 2e5
        rnd.nextInt(8) match {
          case 0 => (id, Some(base), Some(base))                          // exact
          case 1 => (id, Some(base), Some(base * (1 + math.pow(2, -51)))) // sub-ulp-ish: UNEQUAL under the reference E=1e-20 (was equal at 1e-14)
          case 2 => (id, Some(base), Some(base * (1 + 1e-13)))            // outside any regime
          case 3 => (id, Some(base), Some(base + 1.0))                    // far
          case 4 => (id, Some(Double.NaN), Some(Double.NaN))
          case 5 => (id, None: Option[Double], None: Option[Double])
          case 6 => (id, None: Option[Double], Some(base))
          case _ => (id, Some(Double.NaN), Some(base))
        }
      }
      rows.toDF("id", "a", "b").createOrReplaceTempView(s"eqfuzz_$seed")
      def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
        df.orderBy("id").collect().map(_.getLong(0)).toSeq
      val frame = spark.table(s"eqfuzz_$seed")
      val eqMode = ids(KerfSql.run(spark,
        s"set eq kerf; select id from eqfuzz_$seed where a = b order id"))
      val eqApi = ids(frame.filter(eps_eq(col("a"), col("b"))).select("id"))
      assert(eqMode == eqApi, s"seed $seed: mode = diverged from eps_eq API\n" +
        s"  mode: ${eqMode.take(10)}\n  api:  ${eqApi.take(10)}")
      val neMode = ids(KerfSql.run(spark,
        s"set eq kerf; select id from eqfuzz_$seed where a != b order id"))
      val neApi = ids(frame.filter(!eps_eq(col("a"), col("b"))).select("id"))
      assert(neMode == neApi, s"seed $seed: mode != diverged from !eps_eq API")
      // the two filters PARTITION the frame — never-null semantics means
      // no row is swallowed by three-valued logic
      assert((eqMode ++ neMode).sorted == (1L to 60L),
        s"seed $seed: =/!= did not partition the frame (null leak)")
    }
  }
}
