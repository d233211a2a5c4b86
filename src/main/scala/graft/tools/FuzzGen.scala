package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** DIFFERENTIAL PROGRAM FUZZ vs the DuckDB oracle (round-17 ask #5).
  *
  * The 30-seed ordering/equality fuzz nets check SELF-consistency
  * (session mode == explicit form == Column API) — none of them diffs a
  * GENERATED program against an independent engine. This generator
  * closes that: a seeded grammar over the dialect's safe subset
  * (select / where / group / order / limit, integer + exact-double
  * arithmetic, a temporal literal, two-statement programs through a
  * table variable) is lowered twice from ONE AST —
  *
  *   - Kerf dialect text → [[graft.sql.KerfSql.run]] → parquet dump
  *   - portable ANSI SQL → `oracle_sql.json`
  *
  * — in exactly the layout [[graft.Verify]] writes, so the existing
  * `scripts/oracle_check.py` adjudicates each seed in DuckDB with the
  * same full-precision compare as the driver's t2 gate. Any divergence
  * is a real semantic delta (null ordering, decimal rounding, span
  * edges, clause lowering) of the class hand-written query pairs can't
  * exhaust.
  *
  * The grammar is deliberately restricted to ENGINE-PORTABLE semantics
  * so a FAIL means a bug, never fixture noise: integer-valued doubles
  * (l_quantity, 2-decimal prices via min/max only), integer modulo
  * arithmetic, timestamp literals, and total ORDER BY before any LIMIT.
  *
  * Usage: runMain graft.tools.FuzzGen <sfDir> <outDir> [nSeeds] [firstSeed]
  * then:  python3 scripts/oracle_check.py <sfDir> <outDir>
  */
object FuzzGen {

  /** One atom rendered for both surfaces. `kerf` and `sql` must be the
    * SAME predicate/expression under each engine's semantics. */
  private case class Two(kerf: String, sql: String)

  /** `withAsof = true` (the DuckDB main) adds the as-of shape — its SQL
    * twin uses DuckDB's first-class `ASOF LEFT JOIN`, which Spark's own
    * parser cannot run, so the in-suite FuzzDifferentialSpec leg
    * generates without it. */
  private final class Gen(seed: Int, withAsof: Boolean = false) {
    val rnd = new scala.util.Random(seed.toLong * 0x9E3779B97F4A7C15L + seed)

    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

    // ---- predicate atoms (lineitem) ----
    def cmpOp(): Two = pick(Seq(
      Two("<", "<"), Two("<=", "<="), Two(">", ">"), Two(">=", ">="),
      Two("==", "="), Two("!=", "<>")))

    def atom(): Two = rnd.nextInt(5) match {
      case 0 =>
        val k = pick(Seq(3, 7, 11, 13, 97))
        val op = cmpOp()
        val c = rnd.nextInt(k)
        Two(s"l_orderkey % $k ${op.kerf} $c", s"l_orderkey % $k ${op.sql} $c")
      case 1 =>
        val v = pick(Seq("A", "N", "R"))
        val eq = rnd.nextBoolean()
        Two(s"l_returnflag ${if (eq) "==" else "!="} '$v'",
            s"l_returnflag ${if (eq) "=" else "<>"} '$v'")
      case 2 =>
        val op = cmpOp()
        val c = 1 + rnd.nextInt(7)
        Two(s"l_linenumber ${op.kerf} $c", s"l_linenumber ${op.sql} $c")
      case 3 =>
        // l_quantity is an integer-valued double (1..50): comparisons
        // against integer literals are exact on both engines
        val op = cmpOp()
        val c = 1 + rnd.nextInt(50)
        Two(s"l_quantity ${op.kerf} $c", s"l_quantity ${op.sql} $c")
      case _ =>
        // the temporal-literal lane: dialect 1995.06.01 vs SQL TIMESTAMP
        val y = 1992 + rnd.nextInt(7)
        val m = 1 + rnd.nextInt(12)
        val op = pick(Seq(Two("<", "<"), Two(">=", ">=")))
        Two(f"l_shipdate ${op.kerf} $y%04d.$m%02d.01",
            f"l_shipdate ${op.sql} TIMESTAMP '$y%04d-$m%02d-01'")
    }

    /** 1–3 atoms joined with and/or; `or` pairs are parenthesized so the
      * two renderings share one parse shape. */
    def predicate(): Two = {
      val n = 1 + rnd.nextInt(3)
      val atoms = Seq.fill(n)(atom())
      atoms.reduceLeft { (acc, a) =>
        if (rnd.nextInt(3) == 0)
          Two(s"(${acc.kerf} or ${a.kerf})", s"(${acc.sql} OR ${a.sql})")
        else Two(s"${acc.kerf} and ${a.kerf}", s"${acc.sql} AND ${a.sql}")
      }
    }

    // ---- group keys ----
    /** (kerf group item, sql group expr, output name, sql select item) */
    def groupKey(): (String, String, String, String) = rnd.nextInt(4) match {
      case 0 => ("l_returnflag", "l_returnflag", "l_returnflag", "l_returnflag")
      case 1 => ("l_linestatus", "l_linestatus", "l_linestatus", "l_linestatus")
      case 2 => ("l_linenumber", "l_linenumber", "l_linenumber", "l_linenumber")
      case _ =>
        val k = pick(Seq(3, 7, 11))
        (s"l_orderkey % $k as bucket", s"l_orderkey % $k", "bucket",
         s"l_orderkey % $k AS bucket")
    }

    // ---- aggregates (engine-exact on this fixture) ----
    def aggregate(): Two = rnd.nextInt(7) match {
      case 0 => Two("count(*) as cnt", "count(*) AS cnt")
      case 1 => Two("sum(l_quantity) as s_qty", "sum(l_quantity) AS s_qty")
      case 2 => Two("avg(l_quantity) as a_qty", "avg(l_quantity) AS a_qty")
      case 3 => Two("min(l_orderkey) as mn_ok", "min(l_orderkey) AS mn_ok")
      case 4 => Two("max(l_orderkey) as mx_ok", "max(l_orderkey) AS mx_ok")
      case 5 => Two("min(l_extendedprice) as mn_px", "min(l_extendedprice) AS mn_px")
      case _ => Two("countd(l_suppkey) as d_supp", "count(DISTINCT l_suppkey) AS d_supp")
    }

    /** Raw projection item for the no-aggregate shape: (item, out name). */
    def projItem(): (Two, String) = rnd.nextInt(5) match {
      case 0 => (Two("l_quantity", "l_quantity"), "l_quantity")
      case 1 => (Two("l_returnflag", "l_returnflag"), "l_returnflag")
      case 2 => (Two("l_orderkey % 13 as m13", "l_orderkey % 13 AS m13"), "m13")
      case 3 => (Two("l_orderkey + l_suppkey as ksum",
                     "l_orderkey + l_suppkey AS ksum"), "ksum")
      case _ => (Two("l_extendedprice", "l_extendedprice"), "l_extendedprice")
    }

    // ---- orders-side atoms (join shape) ----
    def ordersAtom(): Two = rnd.nextInt(3) match {
      case 0 =>
        val v = pick(Seq("F", "O", "P"))
        Two(s"o_orderstatus == '$v'", s"o_orderstatus = '$v'")
      case 1 =>
        val v = pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"))
        val eq = rnd.nextBoolean()
        Two(s"o_orderpriority ${if (eq) "==" else "!="} '$v'",
            s"o_orderpriority ${if (eq) "=" else "<>"} '$v'")
      case _ =>
        val op = cmpOp()
        val c = 1000 * (1 + rnd.nextInt(300))
        Two(s"o_totalprice ${op.kerf} $c", s"o_totalprice ${op.sql} $c")
    }

    def joinKey(): (String, String, String, String) = rnd.nextInt(3) match {
      case 0 => ("l_returnflag", "l_returnflag", "l_returnflag", "l_returnflag")
      case 1 => ("o_orderstatus", "o_orderstatus", "o_orderstatus", "o_orderstatus")
      case _ => ("o_orderpriority", "o_orderpriority", "o_orderpriority", "o_orderpriority")
    }

    def joinAgg(): Two = rnd.nextInt(5) match {
      case 0 => Two("count(*) as cnt", "count(*) AS cnt")
      case 1 => Two("sum(l_quantity) as s_qty", "sum(l_quantity) AS s_qty")
      case 2 => Two("min(o_totalprice) as mn_tp", "min(o_totalprice) AS mn_tp")
      case 3 => Two("max(o_totalprice) as mx_tp", "max(o_totalprice) AS mx_tp")
      case _ => Two("countd(o_custkey) as d_cust", "count(DISTINCT o_custkey) AS d_cust")
    }

    /** AS-OF JOIN over the events fixture — the flagship operator
      * differenced against DuckDB's INDEPENDENT first-class ASOF
      * implementation (a completely different algorithm from the native
      * sort-merge exec). Random: event-type pair, direction, strictness,
      * tolerance (dialect `within` masks the payload beyond tolerance
      * but keeps the left row — the oracle replays the mask as CASE).
      * (user_id, event_type, ts) is unique in the fixture (verified both
      * SFs), so results are tie-free on both engines. */
    def asofProgram(name: String): (String, String) = {
      val types = Seq("click", "view", "signup", "error", "purchase")
      val lt = pick(types)
      val rt = pick(types.filterNot(_ == lt))
      val fwd = rnd.nextBoolean()
      val strict = rnd.nextInt(3) == 0
      val tol: Option[Long] =
        pick(Seq(None, None, Some(3600000000L), Some(600000000L), Some(60000000L)))
      val kerfSuffix =
        tol.map(t => s" within $t").getOrElse("") +
          (if (fwd) " forward" else "") + (if (strict) " strict" else "")
      val kerf =
        s"lvz: select user_id, event_id, ts_us, value as l_val from ev_fz " +
          s"where event_type == '$lt'; " +
        s"rvz: select user_id, ts_us as rts, value as r_val from ev_fz " +
          s"where event_type == '$rt'; " +
        s"select user_id, event_id, ts_us, l_val, r_val, rts as r_ts " +
          s"from lvz asof join rvz on user_id at ts_us, rts$kerfSuffix " +
          s"order user_id, ts_us, event_id"
      val cmp = (fwd, strict) match {
        case (false, false) => "<="
        case (false, true)  => "<"
        case (true, false)  => ">="
        case (true, true)   => ">"
      }
      def mask(c: String): String = tol match {
        case None => c
        case Some(t) =>
          val delta = if (fwd) "r.rts - l.ts_us" else "l.ts_us - r.rts"
          s"CASE WHEN $delta <= $t THEN $c END"
      }
      val sql =
        s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, event_type FROM events),
           |     lvz AS (SELECT user_id, event_id, ts_us, value AS l_val FROM ev WHERE event_type = '$lt'),
           |     rvz AS (SELECT user_id, ts_us AS rts, value AS r_val FROM ev WHERE event_type = '$rt')
           |SELECT l.user_id, l.event_id, l.ts_us, l.l_val,
           |       ${mask("r.r_val")} AS r_val, ${mask("r.rts")} AS r_ts
           |FROM lvz l ASOF LEFT JOIN rvz r
           |  ON l.user_id = r.user_id AND r.rts $cmp l.ts_us
           |ORDER BY l.user_id, l.ts_us, l.event_id""".stripMargin.replace("\n", " ")
      (kerf, sql)
    }

    /** WINDOW-VERB shape (sums/prev/deltas/… — the ordered-analytics
      * family) over the events fixture, diffed against standard SQL
      * window functions in DuckDB. Values ride the q77 cents discipline
      * (CAST(round(value*100) AS BIGINT)) so every running sum is
      * integer-exact on both engines; (user_id, ts_us, event_id) is a
      * unique frame order, so cumulative results are deterministic. */
    def windowProgram(name: String): (String, String) = {
      case class V(kerf: String, sql: String)
      def verb(): V = rnd.nextInt(9) match {
        case 0 => V("sums(vc) as cum_vc", "CAST(sum(vc) OVER w AS BIGINT) AS cum_vc")
        case 1 => V("counts(vc) as n_seen", "count(vc) OVER w AS n_seen")
        case 2 => V("maxs(vc) as max_vc", "max(vc) OVER w AS max_vc")
        case 3 => V("mins(vc) as min_vc", "min(vc) OVER w AS min_vc")
        case 4 => V("avgs(vc) as avg_vc", "avg(vc) OVER w AS avg_vc")
        case 5 => V("prev(vc) as prev_vc", "lag(vc) OVER w2 AS prev_vc")
        case 6 => V("nexts(vc) as next_vc", "lead(vc) OVER w2 AS next_vc")
        case 7 => V("deltas(vc) as d_vc", "vc - lag(vc) OVER w2 AS d_vc")
        case _ =>
          val k = 2 + rnd.nextInt(6)
          V(s"msums($k, vc) as ms_vc",
            s"CAST(sum(vc) OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
              s"ROWS BETWEEN ${k - 1} PRECEDING AND CURRENT ROW) AS BIGINT) AS ms_vc")
      }
      val verbs = {
        val vs = Seq.fill(1 + rnd.nextInt(3))(verb())
        // dedup by OUTPUT ALIAS, not by full text: two msums with
        // different widths share the alias ms_vc and would collide
        // (seed 508 found exactly that)
        def alias(v: V) = v.kerf.split(" as ").last
        vs.groupBy(alias).values.map(_.head).toSeq.sortBy(vs.indexOf)
      }
      // optional filter BEFORE the window (the frame must see the same
      // row set on both engines — one draw renders both surfaces)
      val wf: Option[V] = rnd.nextInt(3) match {
        case 0 =>
          val t = pick(Seq("click", "view", "purchase", "signup", "error"))
          Some(V(s"event_type == '$t'", s"event_type = '$t'"))
        case 1 =>
          val k = pick(Seq(3, 5, 7)); val c = rnd.nextInt(k)
          Some(V(s"user_id % $k == $c", s"user_id % $k = $c"))
        case _ => None
      }
      val kerf =
        s"select user_id, event_id, ts_us, ${verbs.map(_.kerf).mkString(", ")} " +
          s"from events_w_fz${wf.map(v => s" where ${v.kerf}").getOrElse("")} " +
          s"group user_id order ts_us, event_id"
      val sql =
        s"""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           |                   CAST(round(value * 100) AS BIGINT) AS vc, event_type
           |            FROM events)
           |SELECT user_id, event_id, ts_us, ${verbs.map(_.sql).mkString(", ")}
           |FROM ev${wf.map(v => s" WHERE ${v.sql}").getOrElse("")}
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
           |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |       w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
           |ORDER BY user_id, ts_us, event_id""".stripMargin.replace("\n", " ")
      (kerf, sql)
    }

    // ---- adverb expression programs (round-18 ask #3) ----
    /** The adverb/lambda expression tier (reference test.cc:330–346):
      * a seeded integer vector through fold/unfold/mapback/mapdown
      * compositions, run as a BARE dialect expression (result column
      * `value`). The twin is the GENERATOR's own direct evaluation of
      * the same semantics (sum/scan/eachprior over the known literal) —
      * a t2-style closed form both Spark SQL and DuckDB replay as a
      * constant. A divergence means the engine's adverb lowering broke,
      * not fixture noise. */
    def adverbProgram(name: String): (String, String) = {
      val n = 4 + rnd.nextInt(6)
      val v = Seq.fill(n)((1 + rnd.nextInt(9)).toLong)
      def vl(xs: Seq[Long]) = xs.mkString("[", ",", "]")
      val (kerf, expected): (String, Long) = rnd.nextInt(8) match {
        case 0 => (s"fold(+, ${vl(v)})", v.sum)
        case 1 =>
          val s = rnd.nextInt(20).toLong
          (s"fold(+, $s, ${vl(v)})", s + v.sum)
        case 2 => // scan: sum of prefix sums
          (s"fold(+, unfold(+, ${vl(v)}))", v.scanLeft(0L)(_ + _).tail.sum)
        case 3 => // seeded eachprior: telescopes to last − seed
          val s = rnd.nextInt(10).toLong
          (s"fold(+, mapback(-, ${vl(v)}, $s))", v.last - s)
        case 4 => // unseeded eachprior DROPS the first element (n−1 diffs)
          (s"fold(+, mapback(-, ${vl(v)}))", v.last - v.head)
        case 5 =>
          val a = (1 + rnd.nextInt(4)).toLong
          val c = rnd.nextInt(10).toLong
          (s"fold(+, {[x] $a*x + $c} mapdown ${vl(v)})", v.map(x => a * x + c).sum)
        case 6 =>
          (s"{[x,y] x+y} fold {[x] x*x} mapdown ${vl(v)}", v.map(x => x * x).sum)
        case _ =>
          val vs = v.take(4 + rnd.nextInt(3)).map(x => (x % 5) + 1)
          (s"fold(*, ${vl(vs)})", vs.product)
      }
      (kerf, s"SELECT CAST($expected AS BIGINT) AS value")
    }

    // ---- mutation programs (round-18 ask #3) ----
    /** Predicate atoms over the renamed base (k=l_orderkey,
      * ln=l_linenumber, q=l_quantity, f=l_returnflag). */
    def mutAtom(): Two = rnd.nextInt(4) match {
      case 0 =>
        val kk = pick(Seq(3, 7, 11)); val op = cmpOp(); val c = rnd.nextInt(kk)
        Two(s"k % $kk ${op.kerf} $c", s"k % $kk ${op.sql} $c")
      case 1 =>
        val op = cmpOp(); val c = 1 + rnd.nextInt(7)
        Two(s"ln ${op.kerf} $c", s"ln ${op.sql} $c")
      case 2 =>
        val op = cmpOp(); val c = 1 + rnd.nextInt(50)
        Two(s"q ${op.kerf} $c", s"q ${op.sql} $c")
      case _ =>
        val vv = pick(Seq("A", "N", "R")); val eq = rnd.nextBoolean()
        Two(s"f ${if (eq) "==" else "!="} '$vv'",
            s"f ${if (eq) "=" else "<>"} '$vv'")
    }

    /** Mutate-then-select (reference parser surface lexer.h:103): a base
      * select into a table variable, one mutation statement
      * (update/delete/insert/upsert — the update/insert/upsert
      * ASSIGNABLE forms are r18 surface added for exactly this), then an
      * ordered aggregate over the mutated table. The SQL twin replays
      * the mutation declaratively: update → CASE projection, delete →
      * NOT-COALESCE filter, insert → UNION ALL of the literal row,
      * upsert → key anti-filter + UNION ALL. */
    def mutationProgram(name: String): (String, String) = {
      val a = atom()          // base filter over lineitem columns
      val b = mutAtom()       // mutation predicate over the renamed base
      val baseKerf =
        s"b_$name: select l_orderkey as k, l_linenumber as ln, " +
          s"l_quantity as q, l_returnflag as f from lineitem where ${a.kerf}; "
      val baseSql =
        s"WITH b AS (SELECT l_orderkey AS k, l_linenumber AS ln, " +
          s"l_quantity AS q, l_returnflag AS f FROM lineitem WHERE ${a.sql})"
      val finalKerf = (from: String) =>
        s"select f, count(*) as cnt, sum(q) as s_q, min(k) as mn_k " +
          s"from $from group f order f"
      val finalSql = (from: String) =>
        s" SELECT f, count(*) AS cnt, sum(q) AS s_q, min(k) AS mn_k " +
          s"FROM $from GROUP BY f ORDER BY f"
      rnd.nextInt(4) match {
        case 0 => // update … set … where
          val d = 1 + rnd.nextInt(9)
          val setF = rnd.nextInt(3) == 0
          val setsKerf = s"q = q + $d" + (if (setF) ", f = 'Z'" else "")
          val qCase = s"CASE WHEN ${b.sql} THEN q + $d ELSE q END AS q"
          val fCase =
            if (setF) s"CASE WHEN ${b.sql} THEN 'Z' ELSE f END AS f" else "f"
          (s"${baseKerf}u_$name: update b_$name set $setsKerf where ${b.kerf}; " +
             finalKerf(s"u_$name"),
           s"$baseSql, u AS (SELECT k, ln, $qCase, $fCase FROM b)" + finalSql("u"))
        case 1 => // delete from … where
          (s"${baseKerf}d_$name: delete from b_$name where ${b.kerf}; " +
             finalKerf(s"d_$name"),
           s"$baseSql, d AS (SELECT * FROM b WHERE NOT COALESCE(${b.sql}, FALSE))" +
             finalSql("d"))
        case 2 => // insert values — a fresh row lands in a fresh group 'Z'
          val kv = 900000000L + rnd.nextInt(1000)
          val lnv = 1 + rnd.nextInt(7)
          val qv = 1 + rnd.nextInt(50)
          (s"${baseKerf}m_$name: insert into b_$name values ($kv, $lnv, $qv, 'Z'); " +
             finalKerf(s"m_$name"),
           s"$baseSql, m AS (SELECT * FROM b UNION ALL SELECT " +
             s"CAST($kv AS BIGINT), CAST($lnv AS INT), CAST($qv AS DOUBLE), 'Z')" +
             finalSql("m"))
        case _ => // upsert on a keyed aggregate base
          val kk = pick(Seq(5, 9, 13))
          val hit = rnd.nextBoolean() // replace an existing key vs append
          val v = if (hit) rnd.nextInt(kk) else kk + 1 + rnd.nextInt(5)
          val nv = rnd.nextInt(1000)
          (s"c_$name: select l_orderkey % $kk as k2, count(*) as n " +
             s"from lineitem where ${a.kerf} group l_orderkey % $kk as k2; " +
             s"m_$name: upsert into c_$name key k2 values ($v, $nv); " +
             s"select k2, n from m_$name order k2",
           s"WITH c AS (SELECT l_orderkey % $kk AS k2, count(*) AS n " +
             s"FROM lineitem WHERE ${a.sql} GROUP BY l_orderkey % $kk), " +
             s"m AS (SELECT * FROM c WHERE k2 <> $v UNION ALL " +
             s"SELECT CAST($v AS BIGINT), CAST($nv AS BIGINT))" +
             s" SELECT k2, n FROM m ORDER BY k2")
      }
    }

    /** Mutation/adverb-only draw (the dedicated r18 wave): alternates
      * the two new families so a +N-seed run is ~N/2 of each. */
    def mutAdverbProgram(i: Int): (String, String, String) = {
      val name = f"fz_s$i%04d"
      val (k, s) = if (rnd.nextBoolean()) mutationProgram(name)
                   else adverbProgram(name)
      (name, k, s)
    }

    /** One full program: (name, kerf program, portable SQL). */
    def program(i: Int): (String, String, String) = {
      val name = f"fz_s$i%04d"
      if (withAsof && rnd.nextInt(4) == 0) {
        val (k, s) = asofProgram(name)
        return (name, k, s)
      }
      if (withAsof && rnd.nextInt(4) == 0) {
        val (k, s) = windowProgram(name)
        return (name, k, s)
      }
      // the mutation + adverb tiers are PORTABLE (their SQL twins parse
      // in both Spark SQL and DuckDB), so both legs draw them
      if (rnd.nextInt(5) == 0) {
        val (k, s) = mutationProgram(name)
        return (name, k, s)
      }
      if (rnd.nextInt(5) == 0) {
        val (k, s) = adverbProgram(name)
        return (name, k, s)
      }
      val where = predicate()
      // ~1/3 of programs run as TWO statements through a table variable
      // (the program tier: `base: select * from lineitem where A; …`),
      // splitting the predicate across the statements; the SQL twin
      // carries the first half as a CTE
      val split = rnd.nextInt(3) == 0
      val (pre, kerfFrom, sqlPrefix, sqlFrom) =
        if (split) {
          val first = atom()
          (s"base: select * from lineitem where ${first.kerf}; ",
           "base",
           s"WITH base AS (SELECT * FROM lineitem WHERE ${first.sql}) ",
           "base")
        } else ("", "lineitem", "", "lineitem")
      // ~1/5 of programs pass the limit through a program variable
      rnd.nextInt(5) match {
        case 3 =>
          // equi-join (lineitem ⋈ orders on the order key) + grouped
          // aggregate — the dialect's named-sides join surface against
          // both engines' own join executors; keys are total-ordered
          val keys = distinctBy4(Seq.fill(1 + rnd.nextInt(2))(joinKey()))
          val aggs = distinctBy(Seq.fill(1 + rnd.nextInt(2))(joinAgg()))
          val jw = {
            val a = atom(); val o = ordersAtom()
            if (rnd.nextBoolean()) Two(s"${a.kerf} and ${o.kerf}", s"${a.sql} AND ${o.sql}")
            else o
          }
          val ord = keys.map(_._3)
          (name,
           s"select ${keys.map(_._1).mkString(", ")}, " +
             s"${aggs.map(_.kerf).mkString(", ")} " +
             s"from lineitem join orders on l_orderkey = o_orderkey " +
             s"where ${jw.kerf} group ${keys.map(_._1).mkString(", ")} " +
             s"order ${ord.mkString(", ")}",
           s"SELECT ${keys.map(_._4).mkString(", ")}, " +
             s"${aggs.map(_.sql).mkString(", ")} " +
             s"FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
             s"WHERE ${jw.sql} GROUP BY ${keys.map(_._2).mkString(", ")} " +
             s"ORDER BY ${ord.mkString(", ")}")
        case 4 =>
          // hierarchical grouping: `group rollup (a, b)` vs GROUP BY
          // ROLLUP — subtotal rows carry NULL keys on both engines; no
          // LIMIT, so the multiset compare needs no total order. Keys
          // stay bare columns (no computed-alias rollup items)
          val bare = Seq(
            ("l_returnflag", "l_returnflag", "l_returnflag", "l_returnflag"),
            ("l_linestatus", "l_linestatus", "l_linestatus", "l_linestatus"),
            ("l_linenumber", "l_linenumber", "l_linenumber", "l_linenumber"))
          val keys = rnd.shuffle(bare).take(2)
          val aggs = distinctBy(Seq.fill(1 + rnd.nextInt(2))(aggregate()))
          (name,
           s"${pre}select ${keys.map(_._1).mkString(", ")}, " +
             s"${aggs.map(_.kerf).mkString(", ")} from $kerfFrom " +
             s"where ${where.kerf} " +
             s"group rollup (${keys.map(_._3).mkString(", ")})",
           s"${sqlPrefix}SELECT ${keys.map(_._4).mkString(", ")}, " +
             s"${aggs.map(_.sql).mkString(", ")} FROM $sqlFrom " +
             s"WHERE ${where.sql} " +
             s"GROUP BY ROLLUP (${keys.map(_._2).mkString(", ")})")
        case 0 =>
          // global aggregate: one row, no order needed
          val aggs = distinctBy(Seq.fill(1 + rnd.nextInt(3))(aggregate()))
          (name,
           s"${pre}select ${aggs.map(_.kerf).mkString(", ")} " +
             s"from $kerfFrom where ${where.kerf}",
           s"${sqlPrefix}SELECT ${aggs.map(_.sql).mkString(", ")} " +
             s"FROM $sqlFrom WHERE ${where.sql}")
        case 1 =>
          // grouped aggregate, total order over the keys
          val keys = distinctBy4(Seq.fill(1 + rnd.nextInt(2))(groupKey()))
          val aggs = distinctBy(Seq.fill(1 + rnd.nextInt(2))(aggregate()))
          val desc = rnd.nextInt(4) == 0
          val ord = keys.map(_._3)
          val kerfOrd = (if (desc) "-" + ord.head else ord.head) +:
            ord.tail
          val sqlOrd = (ord.head + (if (desc) " DESC" else "")) +: ord.tail
          (name,
           s"${pre}select ${keys.map(_._1).mkString(", ")}, " +
             s"${aggs.map(_.kerf).mkString(", ")} from $kerfFrom " +
             s"where ${where.kerf} group ${keys.map(_._1).mkString(", ")} " +
             s"order ${kerfOrd.mkString(", ")}",
           s"${sqlPrefix}SELECT ${keys.map(_._4).mkString(", ")}, " +
             s"${aggs.map(_.sql).mkString(", ")} FROM $sqlFrom " +
             s"WHERE ${where.sql} GROUP BY ${keys.map(_._2).mkString(", ")} " +
             s"ORDER BY ${sqlOrd.mkString(", ")}")
        case _ =>
          // raw projection + limit (sometimes through a program
          // variable). The fixture's (l_orderkey, l_linenumber) is NOT
          // unique (the synthetic generator plants dup keys — 11,785
          // pairs at sf0.01), so the order lists EVERY output column:
          // any remaining tie is then an IDENTICAL output tuple, and the
          // top-N multiset is engine-independent no matter how each
          // engine breaks it (the first fuzz sweep caught exactly this —
          // 2/400 seeds split a tie group differently at the limit)
          val items = distinctByName(Seq.fill(1 + rnd.nextInt(3))(projItem()))
          val n = 10 + rnd.nextInt(190)
          val desc = rnd.nextInt(4) == 0
          val varLimit = rnd.nextInt(5) == 0
          val kerfLimit = if (varLimit) "nrows" else s"$n"
          val preVar = if (varLimit) s"nrows: $n; " else ""
          val tailOrd = "l_linenumber" +: items.map(_._2)
          (name,
           s"$preVar${pre}select l_orderkey, l_linenumber, " +
             s"${items.map(_._1.kerf).mkString(", ")} from $kerfFrom " +
             s"where ${where.kerf} " +
             s"order ${if (desc) "-l_orderkey" else "l_orderkey"}, ${tailOrd.mkString(", ")} " +
             s"limit $kerfLimit",
           s"${sqlPrefix}SELECT l_orderkey, l_linenumber, " +
             s"${items.map(_._1.sql).mkString(", ")} FROM $sqlFrom " +
             s"WHERE ${where.sql} " +
             s"ORDER BY l_orderkey${if (desc) " DESC" else ""}, ${tailOrd.mkString(", ")} " +
             s"LIMIT $n")
      }
    }

    /** Dedup select items by their output alias (a duplicate alias is a
      * frame error, not interesting fuzz). */
    private def distinctBy(xs: Seq[Two]): Seq[Two] =
      xs.groupBy(_.kerf).values.map(_.head).toSeq.sortBy(xs.indexOf)
    private def distinctBy4(xs: Seq[(String, String, String, String)]) =
      xs.groupBy(_._3).values.map(_.head).toSeq.sortBy(xs.indexOf)
    private def distinctByName(xs: Seq[(Two, String)]): Seq[(Two, String)] =
      xs.groupBy(_._2).values.map(_.head).toSeq.sortBy(xs.indexOf)
  }

  /** One generated program: (name, kerf dialect text, portable SQL that
    * parses identically in Spark SQL and DuckDB). FuzzSpec's in-suite
    * leg diffs the two surfaces inside Spark every `sbt test`; the
    * DuckDB leg is this object's main + scripts/oracle_check.py. */
  private[graft] def programFor(i: Int): (String, String, String) =
    new Gen(i, withAsof = false).program(i)

  /** Usage: … <sfDir> <outDir> [nSeeds] [firstSeed] [family]
    * family `all` (default) draws the whole grammar; `mut` draws only
    * the r18 mutation/adverb tier (the dedicated +200 wave). */
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 1) args(1) else "/tmp/fuzz_out"
    val nSeeds = if (args.length > 2) args(2).toInt else 200
    val first = if (args.length > 3) args(3).toInt else 1
    val family = if (args.length > 4) args(4) else "all"
    val spark = graft.Engine.session()
    graft.Tables.lineitem(spark, sfDir).createOrReplaceTempView("lineitem")
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("orders")
    graft.Tables.events(spark, sfDir)
      .withColumn("ts_us", org.apache.spark.sql.functions.expr("ts_ns div 1000"))
      .createOrReplaceTempView("ev_fz")
    spark.table("ev_fz").select(
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("ts_us"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("value") * 100).cast("long").as("vc"),
        org.apache.spark.sql.functions.col("event_type"))
      .createOrReplaceTempView("events_w_fz")
    new java.io.File(outDir).mkdirs()
    val oracle = scala.collection.mutable.LinkedHashMap[String, String]()
    val programs = scala.collection.mutable.LinkedHashMap[String, String]()
    var failed = 0
    (first until first + nSeeds).foreach { i =>
      val g = new Gen(i, withAsof = true)
      val (name, kerf, sql) =
        if (family == "mut") g.mutAdverbProgram(i) else g.program(i)
      programs(name) = kerf
      Fs.deleteRecursively(new java.io.File(outDir, name))
      try {
        graft.sql.KerfSql.run(spark, kerf)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        oracle(name) = sql
      } catch {
        case e: Throwable =>
          failed += 1
          System.err.println(s"[fuzz] $name FAILED to run: ${e.getMessage}\n  program: $kerf")
      }
    }
    def j(s: String): String = JsonText.str(s)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      oracle.map { case (k, v) => s"${j(k)}: ${j(v)}" }.mkString("{", ",", "}"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/programs.json"),
      programs.map { case (k, v) => s"${j(k)}: ${j(v)}" }.mkString("{", ",", "}"))
    println(s"[fuzz] ${nSeeds - failed}/$nSeeds programs ran; " +
      s"now: python3 scripts/oracle_check.py $sfDir $outDir")
    require(failed == 0, s"$failed fuzz programs failed to execute")
    spark.stop()
  }
}
