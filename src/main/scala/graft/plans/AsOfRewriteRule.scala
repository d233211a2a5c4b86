package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, DataType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Rewrites the plain-SQL as-of idiom into the native [[AsOfJoinPlan]]
  * (SURVEY §4 row 4 — the (c)-tier `Rule[LogicalPlan]` extension).
  *
  * The idiom every SQL user writes for "latest quote at or before each
  * trade" when the engine has no as-of join:
  *
  * {{{
  * SELECT * FROM (
  *   SELECT t.*, q.*, row_number() OVER (
  *     PARTITION BY <all of t's columns>
  *     ORDER BY q.ts DESC) AS rn
  *   FROM trades t JOIN quotes q
  *     ON t.sym = q.sym AND q.ts <= t.ts)
  * WHERE rn = 1
  * }}}
  *
  * That plan materializes EVERY (trade, earlier-quote) pair — O(|T|·|Q|)
  * rows per key through the join and the window sort — before discarding
  * all but one per trade. At 100 TB the pair blowup is the difference
  * between a runnable query and an un-runnable one. The rewrite produces
  * `AsOfJoinPlan` + inner-flavor filter: one shuffle per side, one
  * ordered merge, O(1) state per partition (plan-pinned in
  * AsOfRewriteSpec).
  *
  * Soundness conditions (all REQUIRED; anything else leaves the plan
  * untouched):
  *  - the window function is exactly `row_number()` filtered to `= 1`
  *    (also matched: `<= 1` and `< 2`);
  *  - the window partition keys cover ALL left-side output columns, so a
  *    partition identifies one distinct left row. The window form emits
  *    one row per DISTINCT left row (duplicates collapse); the rewrite
  *    preserves that with a `Deduplicate` on the left child;
  *  - the join is INNER or LEFT OUTER (the "keep every trade, attach the
  *    quote if any" spelling) with a conjunction of left↔right equalities
  *    plus exactly ONE timestamp inequality `rTs <= lTs` / `<` (backward)
  *    or `rTs >= lTs` / `>` (forward). Both axes must be the same type out
  *    of `LongType`, `TimestampType`, `TimestampNTZType` — all three are
  *    physically a long (µs since epoch for the timestamps), which IS
  *    the native exec's merge axis, so no cast is needed or inserted.
  *    The window ORDER BY is that right-side timestamp, descending for
  *    backward / ascending for forward, with NO tie-breakers — any extra
  *    ORDER BY key disables the rewrite (a tie-broken window is
  *    deterministic on equal timestamps in a way the merge exec does not
  *    replicate; see the negative spec);
  *  - optionally ONE tolerance conjunct bounding how stale a match may
  *    be — the other half of the band every real trades/quotes query
  *    carries: `rTs >= lTs - K` (backward) / `rTs <= lTs + K` (forward),
  *    spelled as long arithmetic or as `ts - INTERVAL '…'` (day-time
  *    intervals are physically long µs — the same unit as the timestamp
  *    axes, so the exec's long-domain tolerance compare is exact; a
  *    year-month interval is calendar arithmetic, not a fixed band, and
  *    disables the rewrite). Strict bounds fold to `K-1` in the integral
  *    domain. Maps to the native exec's O(1) `tolerance` — the window
  *    form still materializes every in-band pair first;
  *  - the `rn = 1` filter's child is the Window node itself.
  *
  * The inner-join flavor (unmatched left rows absent) is restored by
  * filtering the as-of result on a non-null right timestamp; left rows
  * with a null timestamp never match in the original (ternary-logic
  * false), so the left child is filtered to non-null timestamps — which
  * also satisfies the native exec's fail-fast null contract. The same
  * holds for every EQUALITY key on BOTH sides: `t.k = q.k` is never
  * true when either side is null, but the native exec's RowOrdering
  * treats null == null as a match — so both children are filtered to
  * non-null keys, which preserves the original semantics exactly.
  *
  * The LEFT OUTER flavor keeps unmatched left rows null-padded — which
  * is the exec's own output shape, so no post-filter is needed; only
  * left rows with a NULL axis value (null ts or null key — padded in the
  * original, fail-fast in the exec) detour around the exec through a
  * union'd pad branch. The `rn` column is re-emitted as a literal 1
  * under its original exprId, so any upstream projection keeps
  * resolving.
  */
object AsOfRewriteRule extends Rule[LogicalPlan] {

  private def isRnEqOne(cond: Expression, rnId: ExprId): Boolean = cond match {
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) => a.exprId == rnId
    case EqualTo(IntegerLiteral(1), a: AttributeReference) => a.exprId == rnId
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(1)) => a.exprId == rnId
    case LessThan(a: AttributeReference, IntegerLiteral(2)) => a.exprId == rnId
    case _ => false
  }

  /** Split a conjunction into its atoms. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private case class TsPred(lTs: AttributeReference, rTs: AttributeReference,
                            strict: Boolean, forward: Boolean)

  private sealed trait Atom
  private case class EqPair(l: AttributeReference, r: AttributeReference) extends Atom
  private case class TsAtom(t: TsPred) extends Atom
  /** A tolerance band: `rTs >= lTs - bound` (backward) or
    * `rTs <= lTs + bound` (forward), strictness already folded into
    * `bound` (integral axes only, so strict `>` ⇔ `>=` with K-1). */
  private case class TolAtom(lTs: AttributeReference, rTs: AttributeReference,
                             bound: Long, forward: Boolean) extends Atom
  private case object Unsupported extends Atom

  /** Matches the `lAttr + offset` arithmetic shapes a tolerance conjunct
    * puts beside the left timestamp: `Subtract`/`Add` with a long literal
    * (long axes) and `TimestampAddInterval` with a day-time interval
    * literal (timestamp axes — `ts - INTERVAL '1' HOUR` optimizes to
    * `TimestampAddInterval(ts, INTERVAL '-01' HOUR)`, and day-time
    * interval literals are physically long µs, the merge-axis unit).
    * Returns the attribute and the signed offset. */
  private def attrPlusOffset(e: Expression, side: AttributeSet): Option[(AttributeReference, Long)] = e match {
    case Subtract(a: AttributeReference, Literal(k: Long, LongType), _) if side.contains(a) => Some((a, -k))
    case Add(a: AttributeReference, Literal(k: Long, LongType), _) if side.contains(a) => Some((a, k))
    case Add(Literal(k: Long, LongType), a: AttributeReference, _) if side.contains(a) => Some((a, k))
    case Subtract(a: AttributeReference, Literal(k: Int, IntegerType), _) if side.contains(a) => Some((a, -k.toLong))
    case Add(a: AttributeReference, Literal(k: Int, IntegerType), _) if side.contains(a) => Some((a, k.toLong))
    case TimestampAddInterval(a: AttributeReference, Literal(k: Long, _: DayTimeIntervalType), _)
        if side.contains(a) => Some((a, k))
    case _ => None
  }

  /** Classify a conjunct comparing rTs against lTs±K as a tolerance band
    * (backward needs a LOWER bound `rTs >= lTs - K`; forward an UPPER
    * bound `rTs <= lTs + K`). `tighten` is 1 for strict comparisons —
    * `rTs > lTs - K` ⇔ `lTs - rTs <= K-1` on integral axes. Anything
    * else — including a bound on the wrong side, which would NOT be a
    * tolerance — is Unsupported, so the rewrite never drops a predicate. */
  private def tolAtom(r: AttributeReference, arith: Expression, lower: Boolean,
                      tighten: Long, lOut: AttributeSet): Atom =
    attrPlusOffset(arith, lOut) match {
      case Some((l, off)) if lower && off < 0 && -off - tighten >= 0 =>
        TolAtom(l, r, -off - tighten, forward = false)
      case Some((l, off)) if !lower && off > 0 && off - tighten >= 0 =>
        TolAtom(l, r, off - tighten, forward = true)
      case _ => Unsupported
    }

  /** Classify one conjunct as an equality key pair, the ts inequality, or
    * unsupported, relative to the join children's output sets. */
  private def classify(e: Expression, lOut: AttributeSet, rOut: AttributeSet): Atom = e match {
    case EqualTo(a: AttributeReference, b: AttributeReference)
        if lOut.contains(a) && rOut.contains(b) => EqPair(a, b)
    case EqualTo(b: AttributeReference, a: AttributeReference)
        if lOut.contains(a) && rOut.contains(b) => EqPair(a, b)
    case LessThanOrEqual(r: AttributeReference, l: AttributeReference)
        if rOut.contains(r) && lOut.contains(l) => TsAtom(TsPred(l, r, strict = false, forward = false))
    case GreaterThanOrEqual(l: AttributeReference, r: AttributeReference)
        if rOut.contains(r) && lOut.contains(l) => TsAtom(TsPred(l, r, strict = false, forward = false))
    case LessThan(r: AttributeReference, l: AttributeReference)
        if rOut.contains(r) && lOut.contains(l) => TsAtom(TsPred(l, r, strict = true, forward = false))
    case GreaterThan(l: AttributeReference, r: AttributeReference)
        if rOut.contains(r) && lOut.contains(l) => TsAtom(TsPred(l, r, strict = true, forward = false))
    case GreaterThanOrEqual(r: AttributeReference, l: AttributeReference)
        if rOut.contains(r) && lOut.contains(l) => TsAtom(TsPred(l, r, strict = false, forward = true))
    case LessThanOrEqual(l: AttributeReference, r: AttributeReference)
        if rOut.contains(r) && lOut.contains(l) => TsAtom(TsPred(l, r, strict = false, forward = true))
    case GreaterThan(r: AttributeReference, l: AttributeReference)
        if rOut.contains(r) && lOut.contains(l) => TsAtom(TsPred(l, r, strict = true, forward = true))
    case LessThan(l: AttributeReference, r: AttributeReference)
        if rOut.contains(r) && lOut.contains(l) => TsAtom(TsPred(l, r, strict = true, forward = true))
    // tolerance bands (after the attr-attr primaries, which match first):
    // the right timestamp on one side, lTs±K arithmetic on the other
    case GreaterThanOrEqual(r: AttributeReference, arith) if rOut.contains(r) =>
      tolAtom(r, arith, lower = true, tighten = 0, lOut)
    case LessThanOrEqual(arith, r: AttributeReference) if rOut.contains(r) =>
      tolAtom(r, arith, lower = true, tighten = 0, lOut)
    case GreaterThan(r: AttributeReference, arith) if rOut.contains(r) =>
      tolAtom(r, arith, lower = true, tighten = 1, lOut)
    case LessThan(arith, r: AttributeReference) if rOut.contains(r) =>
      tolAtom(r, arith, lower = true, tighten = 1, lOut)
    case LessThanOrEqual(r: AttributeReference, arith) if rOut.contains(r) =>
      tolAtom(r, arith, lower = false, tighten = 0, lOut)
    case GreaterThanOrEqual(arith, r: AttributeReference) if rOut.contains(r) =>
      tolAtom(r, arith, lower = false, tighten = 0, lOut)
    case LessThan(r: AttributeReference, arith) if rOut.contains(r) =>
      tolAtom(r, arith, lower = false, tighten = 1, lOut)
    case GreaterThan(arith, r: AttributeReference) if rOut.contains(r) =>
      tolAtom(r, arith, lower = false, tighten = 1, lOut)
    case _ => Unsupported
  }

  /** Strip the NaN/-0.0 normalization the optimizer wraps around
    * float/double partition keys. */
  private def stripNormalize(e: Expression): Option[AttributeReference] = e match {
    case KnownFloatingPointNormalized(c) => stripNormalize(c)
    case a: AttributeReference => Some(a)
    case u: UnaryExpression if u.nodeName == "NormalizeNaNAndZero" =>
      stripNormalize(u.child)
    case _ => None
  }

  /** Peel the Window's child down to the Join, tolerating the
    * `WindowGroupLimit` node `InferWindowGroupLimit` inserts (pure
    * pruning of rows the rn filter discards anyway - droppable) and one
    * attribute-only pruning Project (remembered, to keep output stable). */
  private def peel(p: LogicalPlan): Option[(Seq[Attribute], Join)] = p match {
    case j @ Join(_, _, jt, Some(_), _) if jt == Inner || jt == LeftOuter =>
      Some((j.output, j))
    case WindowGroupLimit(_, _, RowNumber(), 1, child) => peel(child)
    case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
      peel(child).map { case (_, j) => (projList.map(_.asInstanceOf[AttributeReference]), j) }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(rnAlias @ Alias(WindowExpression(RowNumber(),
          // exactly ONE order key: with extra tie-breakers the window
          // form is deterministic on equal timestamps in a way the merge
          // exec does not replicate - leave those plans alone
          WindowSpecDefinition(partitionSpec, Seq(order), _)), _)),
        _, _, windowChild, _))
        // peel once; the case body re-checks the Option instead of a
        // second recursive walk in the guard
        if isRnEqOne(cond, rnAlias.exprId) =>

      peel(windowChild) match {
        case None => f
        case Some((kept, join)) =>
      val rnAttr = rnAlias.toAttribute
      val (left, right, joinCond) = (join.left, join.right, join.condition.get)
      val atoms = conjuncts(joinCond).map(classify(_, left.outputSet, right.outputSet))
      val eqs = atoms.collect { case EqPair(a, b) => (a, b) }
      val ts = atoms.collect { case TsAtom(t) => t }
      val tols = atoms.collect { case t: TolAtom => t }
      val unsupported = atoms.contains(Unsupported)

      // left columns surviving the (possible) pruning Project - the tuple
      // the window form deduplicates on
      val keptLeft = kept.filter(left.outputSet.contains)
      val partAttrs = partitionSpec.flatMap(stripNormalize(_))

      val ok = !unsupported && ts.length == 1 && eqs.nonEmpty &&
        partAttrs.length == partitionSpec.length && {
        val t = ts.head
        val orderMatches = order.child match {
          case a: AttributeReference =>
            a.exprId == t.rTs.exprId &&
            ((!t.forward && order.direction == Descending) ||
             (t.forward && order.direction == Ascending))
          case _ => false
        }
        // the partition keys must be EXACTLY the kept left columns: a
        // subset would collapse distinct left rows; an extra right-side
        // key would emit one row per (left row, right value) - both are
        // different queries
        val partExact = AttributeSet(partAttrs) == AttributeSet(keptLeft)
        // the as-of axes must survive the pruning
        val axesKept = (t.lTs +: eqs.map(_._1)).forall(a => keptLeft.exists(_.exprId == a.exprId))
        // Deduplicate groups on every kept left column: all types must be
        // usable as grouping keys (maps are not)
        import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
        def hasMap(dt: DataType): Boolean = dt match {
          case _: MapType => true
          case st: StructType => st.fields.exists(fl => hasMap(fl.dataType))
          case ArrayType(et, _) => hasMap(et)
          case _ => false
        }
        val groupable = keptLeft.forall(a => !hasMap(a.dataType))
        // all three axis types are physically a long (µs for timestamps),
        // so the exec's getLong merge and long-domain tolerance are exact
        val axisTypes: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)
        val axisOk = axisTypes.contains(t.lTs.dataType) && t.lTs.dataType == t.rTs.dataType
        // at most one tolerance band, on the SAME axes and the SAME
        // direction as the primary inequality (a backward as-of takes a
        // lower bound on rTs; anything else is a different query)
        val tolOk = tols.length <= 1 && tols.forall(tl =>
          tl.lTs.exprId == t.lTs.exprId && tl.rTs.exprId == t.rTs.exprId &&
            tl.forward == t.forward && tl.bound >= 0L)
        orderMatches && partExact && axesKept && groupable && axisOk && tolOk
      }

      if (!ok) f else {
        val t = ts.head
        // left rows with a null ts — or a null EQUALITY key — can never
        // satisfy the original join predicate (ternary-logic false), and
        // the exec's RowOrdering would wrongly match null keys to null
        // keys; they also violate its non-null merge-axis contract. For
        // the INNER flavor they are dropped (identical results); for the
        // LEFT OUTER flavor they survive as null-padded rows, so they
        // route around the exec through a pad branch instead. The left is
        // pruned to the kept columns BEFORE the dedup so dropped columns
        // cannot split groups the window form would merge; dedup is
        // expressed directly as the grouping Aggregate the
        // ReplaceDeduplicateWithAggregate rule would produce (that batch
        // has already run by the time injected rules fire)
        val leftNotNull = (t.lTs +: eqs.map(_._1)).map(IsNotNull(_): Expression).reduce(And)
        val rightNotNull = (t.rTs +: eqs.map(_._2)).map(IsNotNull(_): Expression).reduce(And)
        val cleanRight = Filter(rightNotNull, right)
        def asOfOver(l: LogicalPlan) = AsOfJoinPlan(l, cleanRight,
          leftKeys = eqs.map(_._1), rightKeys = eqs.map(_._2),
          leftTs = t.lTs, rightTs = t.rTs,
          strict = t.strict, tolerance = tols.headOption.map(_.bound),
          forward = t.forward)
        def rnOne = Alias(Literal(1), rnAttr.name)(rnAttr.exprId)

        if (join.joinType == Inner) {
          val dedupLeft = Aggregate(keptLeft, keptLeft,
            Project(keptLeft, Filter(leftNotNull, left)))
          val asOf = asOfOver(dedupLeft)
          // inner flavor: drop unmatched left rows (null right ts after
          // the left-outer as-of), and re-emit rn as the literal 1 it was
          // filtered to, under its original exprId
          val rightTsOut = asOf.output.find(_.exprId == t.rTs.exprId).get
          Project(
            kept.map(a => asOf.output.find(_.exprId == a.exprId).get) :+ rnOne,
            Filter(IsNotNull(rightTsOut), asOf))
        } else {
          // LEFT OUTER flavor: the exec is ALREADY left-outer (an
          // unmatched or out-of-tolerance left row comes back null-padded,
          // exactly the row the outer window idiom keeps with rn = 1 —
          // matched partitions never contain the padding row, so the
          // order direction's null placement is irrelevant). Only rows
          // with a null axis need a detour: the original keeps them
          // padded, the exec would fail fast — a two-way split over the
          // deduped left (one extra pass over the already-pruned left,
          // noise next to the pair blowup being removed).
          val dedupLeft = Aggregate(keptLeft, keptLeft, Project(keptLeft, left))
          val asOf = asOfOver(Filter(leftNotNull, dedupLeft))
          val mainOut = Project(
            kept.map(a => asOf.output.find(_.exprId == a.exprId).get) :+ rnOne,
            asOf)
          // pad branch: null-axis left rows with null right columns (fresh
          // exprIds — Union resolves parents against the FIRST child)
          val padOut = Project(
            kept.map(a =>
              if (left.outputSet.contains(a)) a: NamedExpression
              else Alias(Literal(null, a.dataType), a.name)()) :+
              Alias(Literal(1), rnAttr.name)(),
            Filter(Not(leftNotNull), dedupLeft))
          Union(mainOut :: padOut :: Nil)
        }
      }
      } // peel match
  }
}
