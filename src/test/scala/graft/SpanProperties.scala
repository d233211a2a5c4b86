package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.Temporal.Span

/** Pure ScalaCheck laws for the span algebra (no Spark session):
  * /root/reference/test.cc:295–299 checks these by hand
  * (`12_y + 12_y = 24_y`, `t - t = 0`); here they hold ∀. */
object SpanProperties extends Properties("Temporal.Span") {

  private val genSpan: Gen[Span] = for {
    months <- Gen.choose(-500L, 500L)
    nanos <- Gen.choose(-100000000000L, 100000000000L)
  } yield Span(months, nanos)

  property("addition commutes") = Prop.forAll(genSpan, genSpan) { (a, b) =>
    a + b == b + a
  }

  property("addition associates") = Prop.forAll(genSpan, genSpan, genSpan) { (a, b, c) =>
    (a + b) + c == a + (b + c)
  }

  property("x - x = zero span (test.cc:299)") = Prop.forAll(genSpan) { a =>
    a - a == Span()
  }

  property("negation is additive inverse") = Prop.forAll(genSpan) { a =>
    a + (-a) == Span()
  }

  property("scalar mult distributes over addition") =
    Prop.forAll(genSpan, genSpan, Gen.choose(-20L, 20L)) { (a, b, k) =>
      (a + b) * k == a * k + b * k
    }

  property("parse of canonical format round-trips (nonneg spans)") =
    Prop.forAll(Gen.choose(0L, 200L), Gen.choose(0L, 86400000000000L)) { (m, ns) =>
      val s = Span(m, ns)
      Span.parse(graft.functions.Temporal.formatSpan(s)) == s
    }

  property("parse round-trips NEGATIVE fixed spans (leading sign form)") =
    Prop.forAll(Gen.choose(1L, 86400000000000L)) { ns =>
      val s = Span(0, -ns)
      Span.parse(graft.functions.Temporal.formatSpan(s)) == s
    }

  property("parse is STRICT: junk or per-component signs are loud") =
    Prop.forAll(Gen.oneOf("5x", "1d-2h", "", "-", "d5", "5 d", "30s ")) { bad =>
      Prop.throws(classOf[IllegalArgumentException])(Span.parse(bad))
    }
}
