package graft.query

/** Span-query algebra mirroring the reference's compositional span surface
  * (/root/reference/lupyne/engine/queries.py:213-241, behavior pinned by the
  * str() forms at /root/reference/tests/test_engine.py:324-342):
  *
  *   Q.span(f, t)                 → [[SpanTerm]]
  *   span[a:b]                    → [[SpanSlice]] (SpanPositionRangeQuery)
  *   span.mask(name)              → [[SpanMask]]  (FieldMaskingSpanQuery)
  *   span1 | span2                → [[SpanOrQ]]
  *   span1 - span2                → [[SpanNotQ]]
  *   SpanQ.near(spans, slop, io)  → [[SpanNearQ]]
  *   big.containing(little)       → [[SpanContainingQ]]
  *   little.within(big)           → [[SpanWithinQ]]
  *
  * A match is a half-open position interval [start, end). `slack` carries how
  * far a composite match stretches beyond its minimal width — the quantity
  * Lucene's SpanScorer feeds the sloppy weight 1/(1+slack), and exactly the
  * sloppy-freq weighting the gold-pinned [[Near]] scorer already uses.
  */
sealed trait SpanQ extends Serializable {

  /** The field this span query reads as (masks rewrite it). */
  def field: String

  def slice(start: Int, end: Int): SpanQ = SpanSlice(this, start, end)
  def mask(name: String): SpanQ = SpanMask(this, name)
  def |(other: SpanQ): SpanQ = SpanOrQ(Seq(this, other))
  def -(other: SpanQ): SpanQ = SpanNotQ(this, other)
  def containing(little: SpanQ): SpanQ = SpanContainingQ(this, little)
  def within(big: SpanQ): SpanQ = SpanWithinQ(this, big)
  def near(others: SpanQ*): SpanQ = SpanNearQ(this +: others, 0, true)

  /** Score-bearing query node wrapping this span. */
  def toQuery: Query = SpanWrap(this)
}

final case class SpanTerm(field: String, term: String) extends SpanQ
final case class SpanNearQ(clauses: Seq[SpanQ], slop: Int, inOrder: Boolean) extends SpanQ {
  require(clauses.nonEmpty)
  def field: String = clauses.head.field
}
final case class SpanOrQ(clauses: Seq[SpanQ]) extends SpanQ {
  require(clauses.nonEmpty)
  def field: String = clauses.head.field
}
final case class SpanNotQ(include: SpanQ, exclude: SpanQ) extends SpanQ {
  def field: String = include.field
}
final case class SpanContainingQ(big: SpanQ, little: SpanQ) extends SpanQ {
  def field: String = big.field
}
final case class SpanWithinQ(little: SpanQ, big: SpanQ) extends SpanQ {
  def field: String = little.field
}
/** Position-range restriction: matches with start ≥ `start` AND end ≤ `end`
  * (Lucene SpanPositionRangeQuery; reference `span[slice]`).
  */
final case class SpanSlice(q: SpanQ, start: Int, end: Int) extends SpanQ {
  def field: String = q.field
}
/** Report the inner spans as `field` so cross-field composition type-checks
  * (FieldMaskingSpanQuery); evaluation still reads the inner leaf's postings.
  */
final case class SpanMask(q: SpanQ, field: String) extends SpanQ

object SpanQ {
  def near(clauses: Seq[SpanQ], slop: Int = 0, inOrder: Boolean = true): SpanQ =
    SpanNearQ(clauses, slop, inOrder)

  /** All (realField, term) leaves, left-to-right. */
  def leaves(q: SpanQ): Seq[(String, String)] = q match {
    case SpanTerm(f, t)         => Seq((f, t))
    case SpanNearQ(cs, _, _)    => cs.flatMap(leaves)
    case SpanOrQ(cs)            => cs.flatMap(leaves)
    case SpanNotQ(inc, exc)     => leaves(inc) ++ leaves(exc)
    case SpanContainingQ(b, l)  => leaves(b) ++ leaves(l)
    case SpanWithinQ(l, b)      => leaves(l) ++ leaves(b)
    case SpanSlice(s, _, _)     => leaves(s)
    case SpanMask(s, _)         => leaves(s)
  }

  /** Leaves that MUST occur in any matching doc — the conjunctive core that
    * drives rarest-first pruning. An Or contributes only leaves common to all
    * branches; a Not's exclude and a Containing/Within partner ARE required
    * (their absence ⇒ different matches, but Not excludes nothing and
    * Containing/Within match nothing — only Containing/Within need both
    * sides; Not only needs the include side).
    */
  def requiredLeaves(q: SpanQ): Set[(String, String)] = q match {
    case SpanTerm(f, t)        => Set((f, t))
    case SpanNearQ(cs, _, _)   => cs.flatMap(requiredLeaves).toSet
    case SpanOrQ(cs)           => cs.map(requiredLeaves).reduce(_ intersect _)
    case SpanNotQ(inc, _)      => requiredLeaves(inc)
    case SpanContainingQ(b, l) => requiredLeaves(b) ++ requiredLeaves(l)
    case SpanWithinQ(l, b)     => requiredLeaves(l) ++ requiredLeaves(b)
    case SpanSlice(s, _, _)    => requiredLeaves(s)
    case SpanMask(s, _)        => requiredLeaves(s)
  }
}

/** Per-document span evaluation over decoded position lists.
  * Spans are (start, end, slack) triples, kept sorted by (start, end).
  */
object SpanEval {

  type Span = (Int, Int, Int) // start, end-exclusive, slack beyond minimal width

  /** Evaluate `q` for one doc. `lists(slot)` holds the ascending positions of
    * each leaf, slots assigned by `slotOf` on (realField, term); a missing
    * leaf is an empty array.
    */
  def eval(q: SpanQ, slotOf: Map[(String, String), Int], lists: Array[Array[Int]]): Array[Span] =
    q match {
      case SpanTerm(f, t) =>
        lists(slotOf((f, t))).map(p => (p, p + 1, 0))
      case SpanNearQ(cs, slop, inOrder) =>
        val subs = cs.map(eval(_, slotOf, lists)).toArray
        if (subs.exists(_.isEmpty)) Array.empty
        else if (inOrder) nearOrdered(subs, slop)
        else nearUnordered(subs, slop)
      case SpanOrQ(cs) =>
        cs.flatMap(eval(_, slotOf, lists)).toArray.sortBy(s => (s._1, s._2))
      case SpanNotQ(inc, exc) =>
        val in = eval(inc, slotOf, lists)
        val ex = eval(exc, slotOf, lists)
        if (ex.isEmpty) in
        else in.filter(s => !ex.exists(e => s._1 < e._2 && e._1 < s._2)) // overlap test
      case SpanContainingQ(big, little) =>
        val b = eval(big, slotOf, lists)
        val l = eval(little, slotOf, lists)
        b.filter(s => l.exists(x => s._1 <= x._1 && x._2 <= s._2))
      case SpanWithinQ(little, big) =>
        val l = eval(little, slotOf, lists)
        val b = eval(big, slotOf, lists)
        l.filter(x => b.exists(s => s._1 <= x._1 && x._2 <= s._2))
      case SpanSlice(s, start, end) =>
        eval(s, slotOf, lists).filter(x => x._1 >= start && x._2 <= end)
      case SpanMask(s, _) => eval(s, slotOf, lists)
    }

  /** Ordered near over sub-span lists: for each first-clause span, greedily
    * chain the earliest following span per clause (start ≥ previous end);
    * match slack = Σ gaps BETWEEN consecutive sub-spans ≤ slop — i.e.
    * (end − start) − Σ ACTUAL sub-span widths, Lucene NearSpansOrdered's
    * matchWidth. A sub-span's internal slack counts only inside that
    * sub-query's own slop, never again here. The ONE ordered-near walk in
    * the engine: `Searcher.spans(Near)` routes here over width-1 term spans
    * (on which this reduces to the Near scorer's greedy position chain).
    */
  private def nearOrdered(subs: Array[Array[Span]], slop: Int): Array[Span] = {
    val out = Array.newBuilder[Span]
    val first = subs(0)
    var i = 0
    while (i < first.length) {
      val s0 = first(i)
      var end = s0._2
      var widths = s0._2 - s0._1 // ACTUAL width of the chosen sub-match
      var ok = true
      var c = 1
      while (c < subs.length && ok) {
        val l = subs(c)
        var j = 0
        while (j < l.length && l(j)._1 < end) j += 1
        if (j >= l.length) ok = false
        else {
          val sc = l(j)
          end = sc._2
          widths += sc._2 - sc._1
          c += 1
        }
      }
      if (ok) {
        val slack = (end - s0._1) - widths // Σ gaps between sub-spans
        if (slack <= slop) out += ((s0._1, end, slack))
      }
      i += 1
    }
    out.result()
  }

  /** Unordered near: sliding window over one span per clause; emit when the
    * window's gap slack ((max end − min start) − Σ actual widths) ≤ slop,
    * then advance ONLY the earliest-starting clause — later windows sharing
    * the other sub-spans are still enumerated (advancing all pointers would
    * undercount the sloppy frequency). Overlapping sub-spans yield negative
    * slack, clamped to 0 (documented divergence: recent Lucene rejects some
    * overlap shapes in unordered near).
    */
  private def nearUnordered(subs: Array[Array[Span]], slop: Int): Array[Span] = {
    val n = subs.length
    val ptr = new Array[Int](n)
    val out = Array.newBuilder[Span]
    while (ptr.indices.forall(i => ptr(i) < subs(i).length)) {
      var mn = Int.MaxValue; var mx = Int.MinValue; var mnIdx = 0
      var widths = 0
      var i = 0
      while (i < n) {
        val s = subs(i)(ptr(i))
        if (s._1 < mn) { mn = s._1; mnIdx = i }
        if (s._2 > mx) mx = s._2
        widths += s._2 - s._1
        i += 1
      }
      val slack = (mx - mn) - widths
      if (slack <= slop) out += ((mn, mx, math.max(0, slack)))
      ptr(mnIdx) += 1
    }
    out.result()
  }

  /** Sloppy span frequency: Σ 1/(1+slack) — SpanScorer-shaped, and identical
    * to the gold-pinned Near scorer on term-only spans.
    */
  def freq(spans: Array[Span]): Double = {
    var f = 0.0
    var i = 0
    while (i < spans.length) { f += 1.0 / (1 + math.max(0, spans(i)._3)); i += 1 }
    f
  }
}
