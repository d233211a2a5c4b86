package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Kerf's temporal algebra: nanosecond stamps at nine granularities and
  * relative spans with `y m d h i s t u n` suffixes
  * (/root/reference/enums.h:165–185, printing presented.h:150–185,
  * literal DFAs lexer.h:247–311, C++ literals horology.h:4–12).
  *
  * Model: a stamp is `TimestampType` (µs) or a ns-long where full
  * fidelity matters; a span is a (months, nanos) pair — calendar months
  * can't be fixed nanos (Kerf keeps the same split: YEAR/MONTH spans vs
  * DAY..NANOS spans, enums.h:177–185).
  */
object Temporal {

  /** Granularities in reference order (enums.h:165–174). */
  sealed abstract class Gran(val name: String, val truncUnit: String)
  case object Year    extends Gran("year", "year")
  case object Month   extends Gran("month", "month")
  case object Day     extends Gran("day", "day")
  case object Hour    extends Gran("hour", "hour")
  case object Minute  extends Gran("minute", "minute")
  case object Second  extends Gran("second", "second")
  case object Millis  extends Gran("millis", "millisecond")
  case object Micros  extends Gran("micros", "microsecond")
  case object Nanos   extends Gran("nanos", "microsecond") // µs floor in TimestampType; use ns-longs for full fidelity

  /** Span value: calendar months + fixed nanos (sign-carrying). */
  final case class Span(months: Long = 0, nanos: Long = 0) {
    def +(o: Span): Span = Span(months + o.months, nanos + o.nanos)
    def -(o: Span): Span = Span(months - o.months, nanos - o.nanos)
    def unary_- : Span = Span(-months, -nanos)
    def *(k: Long): Span = Span(months * k, nanos * k)
  }
  object Span {
    val NanosPerSec = 1000000000L
    def y(n: Long): Span = Span(months = 12 * n)
    def m(n: Long): Span = Span(months = n)
    def d(n: Long): Span = Span(nanos = n * 86400L * NanosPerSec)
    def h(n: Long): Span = Span(nanos = n * 3600L * NanosPerSec)
    def i(n: Long): Span = Span(nanos = n * 60L * NanosPerSec)
    def s(n: Long): Span = Span(nanos = n * NanosPerSec)
    def t(n: Long): Span = Span(nanos = n * 1000000L) // millis
    def u(n: Long): Span = Span(nanos = n * 1000L)    // micros
    def n(n: Long): Span = Span(nanos = n)

    private val token = "(\\d+)([ymdhistun])".r
    /** Parse Kerf relative-span literals: "1y2m", "3d4h5i", "330t1u10n"
      * (lexer.h:247–311 relative-datetime DFA). STRICT: the whole
      * literal must be <n><unit> tokens (one optional leading '-'
      * negating the whole span, so [[Temporal.formatSpan]]'s negative
      * renders round-trip) — findAllMatchIn silently SKIPPED anything
      * else, so a typo like `within 5x` parsed to Span(0,0) and an
      * as-of quietly unmatched nearly every row (r16 review). */
    def parse(lit: String): Span = {
      val (negate, body) =
        if (lit.startsWith("-")) (true, lit.tail) else (false, lit)
      var consumed = 0
      val sum = token.findAllMatchIn(body).map { mm =>
        consumed += mm.matched.length
        val v = mm.group(1).toLong
        mm.group(2) match {
          case "y" => y(v); case "m" => m(v); case "d" => d(v)
          case "h" => h(v); case "i" => i(v); case "s" => s(v)
          case "t" => t(v); case "u" => u(v); case "n" => n(v)
        }
      }.foldLeft(Span())(_ + _)
      require(body.nonEmpty && consumed == body.length,
        s"span literal '$lit' — expected <n><unit>… with units " +
        "y m d h i(min) s t(ms) u(µs) n(ns)")
      if (negate) -sum else sum
    }
  }

  /** Parse a Kerf stamp literal to a timestamp Column: `2016.02.03`,
    * `2016.02.03T12:34:56.1`, `2020.01m` (month stamp), `2020y`
    * (lexer.h:247–311). */
  def stampLit(s: String): Column = {
    val norm = s.trim match {
      case v if v.matches("\\d{4}y?")                 => s"${v.take(4)}-01-01 00:00:00"
      case v if v.matches("\\d{4}\\.\\d{2}m?")        => s"${v.take(4)}-${v.slice(5, 7)}-01 00:00:00"
      case v if v.matches("\\d{4}\\.\\d{2}\\.\\d{2}") => v.replace(".", "-") + " 00:00:00"
      case v if v.contains("T") =>
        val Array(dt, tm) = v.split("T"); dt.replace(".", "-") + " " + tm
      case v => v
    }
    to_timestamp(lit(norm))
  }

  /** Parse a stamp literal to an EXACT ns epoch long (the ns-lane twin
    * of [[stampLit]]; horology.h:4–12 keeps STAMP at ns where Spark's
    * TimestampType is µs): seconds via java.time on the UTC grid,
    * fraction as 1–9 integer digits right-padded to ns — the sub-µs
    * digits a TimestampType round-trip would silently drop. Accepts
    * the Kerf dotted forms (`2016.02.03T12:34:56.123456789`, month and
    * year stamps) and ISO dashes. Pre-1970 is exact: epochSecond is
    * floor-aligned, the fraction is always the non-negative ns after
    * that second. */
  def stampLitNs(s: String): Long = {
    val v = s.trim.replace(" ", "T")
    val (whole, fracNs) = v.indexOf('T') match {
      case -1 => (v, 0L)
      case ti =>
        val t = v.substring(ti + 1)
        val fi = t.indexOf('.')
        if (fi < 0) (v, 0L)
        else {
          val digits = t.substring(fi + 1)
          require(digits.nonEmpty && digits.length <= 9 &&
              digits.forall(_.isDigit),
            s"stamp literal fraction '.$digits' — 1 to 9 digits of ns")
          (v.substring(0, ti + 1 + fi), digits.padTo(9, '0').mkString.toLong)
        }
    }
    val datePart = whole.takeWhile(_ != 'T')
    val timePart = if (whole.contains('T')) whole.dropWhile(_ != 'T').tail else ""
    // the ns lane accepts BOTH the Kerf dotted forms (matching stampLit's
    // µs grammar) and the dashed ISO spelling (ns-precision ingest
    // strings are usually ISO) — but never a MIX: '2024.01-05' is a
    // typo, not a third grammar (r16 review)
    val isoDate = datePart match {
      case d if d.matches("\\d{4}y?")          => s"${d.take(4)}-01-01"
      case d if d.matches("\\d{4}[.-]\\d{2}m?") => s"${d.take(4)}-${d.slice(5, 7)}-01"
      case d if d.matches("\\d{4}\\.\\d{2}\\.\\d{2}|\\d{4}-\\d{2}-\\d{2}") =>
        s"${d.take(4)}-${d.slice(5, 7)}-${d.slice(8, 10)}"
      case other => throw new IllegalArgumentException(
        s"stamp literal '$s' — date part '$other' not yyyy[.MM[.dd]] " +
        "(dots) or yyyy-MM-dd (ISO dashes); mixed separators rejected")
    }
    val isoTime = timePart match {
      case ""                           => "00:00:00"
      case t if t.matches("\\d{2}:\\d{2}")          => t + ":00"
      case t if t.matches("\\d{2}:\\d{2}:\\d{2}")   => t
      case other => throw new IllegalArgumentException(
        s"stamp literal '$s' — time part '$other' not HH:mm[:ss][.f]")
    }
    val ldt = java.time.LocalDateTime.parse(s"${isoDate}T$isoTime")
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + fracNs
  }

  /** stamp + span (verbs.cc:121–204's STAMP×SPAN case matrix): calendar
    * part via add_months-semantics, fixed part via µs interval. The
    * TimestampType axis is µs, so a span's sub-µs remainder DROPS —
    * symmetrically, toward zero, in the DELTA's own sign: `+500n` and
    * `-500n` both move the stamp 0 µs, preserving `t + s - s == t`
    * (floor-division would move them 0 and −1 and break the involution
    * through [[subSpan]]). This is the µs FACE of the span algebra by
    * design; a sub-µs span that must land exactly belongs on the
    * ns-long lane ([[addSpanNs]], q199's axis), where it is exact. */
  def addSpan(stamp: Column, span: Span): Column = {
    val withMonths =
      if (span.months != 0) stamp + expr(s"INTERVAL '${span.months}' MONTH") else stamp
    if (span.nanos != 0)
      withMonths + expr(s"INTERVAL '${span.nanos / 1000}' MICROSECOND")
    else withMonths
  }
  def subSpan(stamp: Column, span: Span): Column = addSpan(stamp, -span)

  /** stamp + span on exact ns-longs (fixed-width spans only — calendar
    * months are undefined on a pure ns axis, as in Kerf where YEAR/MONTH
    * spans live in a different unit family). */
  def addSpanNs(tsNs: Column, span: Span): Column = {
    require(span.months == 0, "calendar span on ns axis: convert via timestamp")
    tsNs + lit(span.nanos)
  }

  /** Truncate a stamp to a granularity — Kerf's per-granularity stamp
    * types (enums.h:203–212) as an operation instead of a storage type. */
  def truncTo(stamp: Column, g: Gran): Column = date_trunc(g.truncUnit, stamp)

  /** stamp difference as fixed nanos (t-t = 0span, test.cc:299); exact at
    * µs resolution (TimestampType's own limit). */
  def diffNs(a: Column, b: Column): Column =
    (unix_micros(a) - unix_micros(b)) * 1000L

  /** Render a fixed span in Kerf suffix form: 93784000000123ns →
    * "1d2h3i4s0t0u123n" (presented.h:150–185 printing). */
  def formatSpan(span: Span): String = {
    // negative FIXED spans render with one leading sign ("-1d2h…"), the
    // form Span.parse round-trips; per-component signs ("-1d-2h") would
    // be rejected by the strict parser
    if (span.months == 0 && span.nanos < 0)
      return "-" + formatSpan(Span(0, -span.nanos))
    val sb = new StringBuilder
    if (span.months != 0) {
      sb.append(s"${span.months / 12}y"); sb.append(s"${span.months % 12}m")
    }
    var ns = span.nanos
    def part(unit: Long, sfx: String): Unit = {
      if (sb.nonEmpty || ns / unit != 0 || sfx == "n") sb.append(s"${ns / unit}$sfx")
      ns %= unit
    }
    part(86400L * Span.NanosPerSec, "d"); part(3600L * Span.NanosPerSec, "h")
    part(60L * Span.NanosPerSec, "i"); part(Span.NanosPerSec, "s")
    part(1000000L, "t"); part(1000L, "u"); part(1L, "n")
    sb.toString
  }
}
