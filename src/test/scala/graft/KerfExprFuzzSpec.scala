package graft

import graft.sql.KerfSql

/** DIFFERENTIAL fuzz over the dialect's EXPRESSION surface — the
  * companion of KerfSqlFuzzSpec's select-shape fuzz. A seeded generator
  * draws random typed expression trees (scalar/vector × long/double)
  * over literals, `til`, pervasive arithmetic, math verbs, list verbs,
  * adverbs, bitops, and the counter RNG; each tree is rendered as
  * dialect text (fully parenthesized — precedence has its own goldens)
  * and INDEPENDENTLY evaluated by a ~60-line Scala interpreter that
  * encodes the documented semantics (DIALECT.md Verbs/Adverbs). Any
  * divergence is a parser/typing/pervade bug, not fp noise: both sides
  * run the same IEEE ops in the same order, and double leaves sit on a
  * half-integer grid so every intermediate is exactly representable.
  *
  * The reference parses this surface but never evaluates it
  * (/root/reference/parser.h:541–567, interpreter.h:8–23); its intended
  * semantics (test.cc:330–420 goldens) are what the interpreter here
  * mirrors.
  */
class KerfExprFuzzSpec extends SparkSpec {

  // value model: Long | Double | Vector[Any]; elem: 'L' or 'D'
  private case class N(text: String, value: Any, elem: Char, mag: Double)

  private val MagCap = 1e8

  private def lit(elem: Char, rnd: scala.util.Random): N = elem match {
    case 'L' => val k = rnd.nextInt(51).toLong; N(k.toString, k, 'L', 50)
    case _ =>
      val k = rnd.nextInt(101) / 2.0 // half-integer grid, exact in binary
      val t = if (k == k.floor) s"${k.toLong}.0" else k.toString
      N(t, k, 'D', 50)
  }

  private def widen(a: Char, b: Char): Char = if (a == 'D' || b == 'D') 'D' else 'L'

  // pervasive scalar⊕scalar on the mirrored side
  private def sop(op: Char, a: Any, b: Any): Any = (a, b) match {
    case (x: Long, y: Long) => op match {
      case '+' => x + y; case '-' => x - y; case '*' => x * y }
    case _ =>
      val (x, y) = (toD(a), toD(b))
      op match { case '+' => x + y; case '-' => x - y; case '*' => x * y }
  }
  private def toD(a: Any): Double = a match {
    case x: Long => x.toDouble; case x: Double => x }
  // floor/ceil of a LONG are identity (no double round-trip — a 63-bit
  // long would lose its low bits in a double mantissa)
  private def floorV(a: Any): Long = a match {
    case x: Long => x; case x: Double => math.floor(x).toLong }
  private def ceilV(a: Any): Long = a match {
    case x: Long => x; case x: Double => math.ceil(x).toLong }

  private def pervade(op: Char, a: Any, b: Any): Any = (a, b) match {
    case (va: Vector[_], vb: Vector[_]) =>
      va.zip(vb).map { case (x, y) => sop(op, x, y) }.toVector
    case (va: Vector[_], s) => va.map(x => sop(op, x, s)).toVector
    case (s, vb: Vector[_]) => vb.map(y => sop(op, s, y)).toVector
    case (x, y) => sop(op, x, y)
  }

  /** shape: -1 = scalar, n >= 1 = vector of length n */
  private def gen(shape: Int, depth: Int, rnd: scala.util.Random): N = {
    def scalar(d: Int) = gen(-1, d, rnd)
    if (shape == -1) {
      val pick = if (depth <= 0) 0 else rnd.nextInt(10)
      pick match {
        case 0 | 1 => lit(if (rnd.nextBoolean()) 'L' else 'D', rnd)
        case 2 => // binary pervade, scalar×scalar
          val op = "+-*" (rnd.nextInt(3))
          val a = scalar(depth - 1); val b = scalar(depth - 1)
          if (op == '*' && a.mag * b.mag > MagCap) a
          else N(s"(${a.text} $op ${b.text})", sop(op, a.value, b.value),
            widen(a.elem, b.elem),
            if (op == '*') a.mag * b.mag else a.mag + b.mag)
        case 3 => // aggregate of a vector
          val n = 1 + rnd.nextInt(6)
          val v = gen(n, depth - 1, rnd)
          val xs = v.value.asInstanceOf[Vector[Any]]
          rnd.nextInt(7) match {
            case 0 => N(s"sum(${v.text})",
              xs.reduceLeft(sop('+', _, _)), v.elem, v.mag * n)
            case 1 => N(s"count(${v.text})", xs.length.toLong, 'L', 8)
            case 2 => N(s"first(${v.text})", xs.head, v.elem, v.mag)
            case 3 => N(s"last(${v.text})", xs.last, v.elem, v.mag)
            case 4 => N(s"max(${v.text})",
              if (v.elem == 'L') xs.map(_.asInstanceOf[Long]).max
              else xs.map(toD).max, v.elem, v.mag)
            case 5 => N(s"min(${v.text})",
              if (v.elem == 'L') xs.map(_.asInstanceOf[Long]).min
              else xs.map(toD).min, v.elem, v.mag)
            case _ => // avg: exact sum then ONE IEEE division, both sides
              N(s"avg(${v.text})",
                toD(xs.reduceLeft(sop('+', _, _))) / xs.length,
                'D', v.mag)
          }
        case 4 => // index one
          val n = 1 + rnd.nextInt(5)
          val v = gen(n, depth - 1, rnd)
          val i = rnd.nextInt(n)
          N(s"(${v.text})[$i]", v.value.asInstanceOf[Vector[Any]](i), v.elem, v.mag)
        case 5 => // fold over + (adverb call form)
          val n = 1 + rnd.nextInt(5)
          val v = gen(n, depth - 1, rnd)
          N(s"fold(+, ${v.text})",
            v.value.asInstanceOf[Vector[Any]].reduceLeft(sop('+', _, _)),
            v.elem, v.mag * n)
        case 6 => // abs
          val a = scalar(depth - 1)
          N(s"abs(${a.text})", a.value match {
            case x: Long => math.abs(x); case x: Double => math.abs(x)
          }, a.elem, a.mag)
        case 7 => // sqrt of |x| — D result either way
          val a = scalar(depth - 1)
          N(s"sqrt(abs(${a.text}))", math.sqrt(math.abs(toD(a.value))), 'D', 50)
        case 8 => // floor/ceil → LONG (the dialect's integer face)
          val a = scalar(depth - 1)
          if (rnd.nextBoolean())
            N(s"floor(${a.text})", floorV(a.value), 'L', a.mag + 1)
          else N(s"ceil(${a.text})", ceilV(a.value), 'L', a.mag + 1)
        case _ => // bitops + counter RNG on long scalars
          def asLong(d: Int): N = {
            val a = scalar(d)
            if (a.elem == 'L') a
            else N(s"floor(${a.text})", floorV(a.value), 'L', a.mag + 1)
          }
          rnd.nextInt(6) match {
            case 0 =>
              val a = asLong(depth - 1); val b = asLong(depth - 1)
              val (fn, f) = Seq[(String, (Long, Long) => Long)](
                ("band", _ & _), ("bor", _ | _), ("bxor", _ ^ _))(rnd.nextInt(3))
              N(s"$fn(${a.text}, ${b.text})",
                f(a.value.asInstanceOf[Long], b.value.asInstanceOf[Long]), 'L',
                a.mag + b.mag)
            case 1 =>
              val a = asLong(depth - 1); val k = rnd.nextInt(9)
              N(s"shl(${a.text}, $k)", a.value.asInstanceOf[Long] << k, 'L',
                a.mag * (1L << k).toDouble)
            case 2 =>
              val a = asLong(depth - 1); val k = rnd.nextInt(9)
              N(s"shr(${a.text}, $k)", a.value.asInstanceOf[Long] >> k, 'L', a.mag)
            case 3 =>
              val a = asLong(depth - 1)
              N(s"popcount(${a.text})",
                java.lang.Long.bitCount(a.value.asInstanceOf[Long]).toLong, 'L', 64)
            case 4 =>
              val s = 1 + rnd.nextInt(99); val a = asLong(depth - 1)
              N(s"randu64($s, ${a.text})",
                graft.functions.Rng.randU64(s.toLong, a.value.asInstanceOf[Long]),
                'L', Long.MaxValue.toDouble)
            case _ =>
              val s = 1 + rnd.nextInt(99); val a = asLong(depth - 1)
              N(s"randu01($s, ${a.text})",
                graft.functions.Rng.randU01(s.toLong, a.value.asInstanceOf[Long]),
                'D', 1)
          }
      }
    } else {
      val n = shape
      val pick = if (depth <= 0) 0 else rnd.nextInt(8)
      pick match {
        case 0 | 1 => // leaf vector: til n or a bracket literal
          if (rnd.nextBoolean() && n <= 8)
            N(s"(til $n)", (0L until n.toLong).toVector, 'L', n.toDouble)
          else {
            val elem = if (rnd.nextBoolean()) 'L' else 'D'
            val xs = Vector.fill(n)(lit(elem, rnd))
            N(xs.map(_.text).mkString("[", ", ", "]"),
              xs.map(_.value), elem, 50)
          }
        case 2 => // binary pervade: vec⊕vec, scalar⊕vec, vec⊕scalar
          val op = "+-*" (rnd.nextInt(3))
          val (a, b) = rnd.nextInt(3) match {
            case 0 => (gen(n, depth - 1, rnd), gen(n, depth - 1, rnd))
            case 1 => (gen(-1, depth - 1, rnd), gen(n, depth - 1, rnd))
            case _ => (gen(n, depth - 1, rnd), gen(-1, depth - 1, rnd))
          }
          if (op == '*' && a.mag * b.mag > MagCap) (if (a.value.isInstanceOf[Vector[_]]) a else b)
          else N(s"(${a.text} $op ${b.text})", pervade(op, a.value, b.value),
            widen(a.elem, b.elem),
            if (op == '*') a.mag * b.mag else a.mag + b.mag)
        case 3 => // reverse
          val v = gen(n, depth - 1, rnd)
          N(s"reverse(${v.text})", v.value.asInstanceOf[Vector[Any]].reverse,
            v.elem, v.mag)
        case 4 => // asc / desc (sorted copies)
          val v = gen(n, depth - 1, rnd)
          val xs = v.value.asInstanceOf[Vector[Any]]
          val sorted =
            if (v.elem == 'L') xs.map(_.asInstanceOf[Long]).sorted.map(x => x: Any)
            else xs.map(toD).sorted.map(x => x: Any)
          if (rnd.nextBoolean()) N(s"asc(${v.text})", sorted, v.elem, v.mag)
          else N(s"desc(${v.text})", sorted.reverse, v.elem, v.mag)
        case 5 => // scan over + (running sums, inclusive)
          val v = gen(n, depth - 1, rnd)
          val xs = v.value.asInstanceOf[Vector[Any]]
          N(s"scan(+, ${v.text})",
            xs.tail.scanLeft(xs.head)(sop('+', _, _)).toVector, v.elem, v.mag * n)
        case 6 => // take with cycling / from-the-end
          val m = 1 + rnd.nextInt(6)
          val v = gen(m, depth - 1, rnd)
          val xs = v.value.asInstanceOf[Vector[Any]]
          if (rnd.nextBoolean() || n > m) // cycle on over-take
            N(s"take(${v.text}, $n)",
              (0 until n).map(i => xs(i % m)).toVector, v.elem, v.mag)
          else // negative take: last n
            N(s"take(${v.text}, (0 - $n))", xs.takeRight(n), v.elem, v.mag)
        case _ => // mapback(-): x_i - x_{i-1}, first element x0 - x0
          val v = gen(n, depth - 1, rnd)
          val xs = v.value.asInstanceOf[Vector[Any]]
          N(s"mapback(-, ${v.text})",
            xs.zip(xs.head +: xs.init).map { case (a, b) => sop('-', a, b) }.toVector,
            v.elem, v.mag * 2)
      }
    }
  }

  // normalize engine output (ArraySeq, boxed types) to the mirror model
  private def norm(v: Any): Any = v match {
    case s: scala.collection.Seq[_] => s.map(norm).toVector
    case x: java.lang.Long => x.longValue
    case x: java.lang.Double => x.doubleValue
    case x: java.lang.Integer => x.longValue
    case x => x
  }
  private def same(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Vector[_], y: Vector[_]) =>
      x.length == y.length && x.zip(y).forall { case (p, q) => same(p, q) }
    case (x: Double, y: Double) => // NaN-safe bit equality
      java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
    case (x, y) => x == y
  }

  test("expression fuzz: 400 seeded trees equal the independent interpreter exactly") {
    val rnd = new scala.util.Random(20260815L)
    var checked = 0
    (1 to 400).foreach { i =>
      val shape = if (rnd.nextBoolean()) -1 else 1 + rnd.nextInt(6)
      val n = gen(shape, 3, rnd)
      val got = norm(KerfSql.run(spark, n.text).collect()(0).get(0))
      assert(same(got, n.value),
        s"fuzz #$i diverged\n  expr: ${n.text}\n  engine: $got\n  mirror: ${n.value}")
      checked += 1
    }
    assert(checked == 400)
  }

  test("deep chain: a 40-op alternating pervade pipeline stays exact") {
    // one deliberately deep tree (depth beyond the fuzz cap) — catches
    // stack/precedence handling the shallow draws cannot
    var text = "(til 6)"
    var value: Vector[Any] = (0L until 6L).toVector
    val rnd = new scala.util.Random(7L)
    (1 to 40).foreach { _ =>
      val k = (1 + rnd.nextInt(5)).toLong
      val op = "+-" (rnd.nextInt(2))
      text = s"($text $op $k)"
      value = value.map(x => sop(op, x, k))
    }
    val got = norm(KerfSql.run(spark, text).collect()(0).get(0))
    assert(same(got, value), s"deep chain diverged: $got vs $value")
  }
}
