package graft

import graft.exec.Searcher
import graft.index._
import graft.query.{Query => Q, _}

/** Span algebra behavioral golds (reference surface queries.py:213-241,
  * str() forms pinned at test_engine.py:324-342; interval semantics are
  * Lucene's: [start, end) with end exclusive, containment = enclosing
  * interval, SpanNot = non-overlap).
  *
  * Corpus positions (content):
  *   p0: a b c d e a b   → a:0,5  b:1,6  c:2  d:3  e:4
  *   p1: c a a d b       → c:0    a:1,2  d:3  b:4
  *   p2: x y z
  * alias field: p0 "b q" → b:0 q:1
  */
class SpanSpec extends SparkTestBase {

  lazy val source = {
    val s = spark
    import s.implicits._
    Seq(
      ("r", "p0", "c", "a b c d e a b", "b q"),
      ("r", "p1", "c", "c a a d b", ""),
      ("r", "p2", "c", "x y z", "")
    ).toDF("repo", "path", "commit", "content", "alias")
  }

  lazy val schema = IndexSchema(
    keyColumns = Seq("repo", "path", "commit"),
    fields = Map(
      "content" -> TextField("standard", positions = true),
      "alias" -> TextField("standard", positions = true)))

  lazy val searcher = new Searcher(IndexBuilder.build(source, schema, 2))

  private def spansOf(sq: SpanQ): Map[Long, Seq[(Int, Int)]] =
    searcher.spans(sq).collect().map { r =>
      r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getInt(0), x.getInt(1)))
    }.toMap

  val a = Q.span("content", "a")
  val b = Q.span("content", "b")
  val c = Q.span("content", "c")
  val d = Q.span("content", "d")
  val nearAD = SpanQ.near(Seq(a, d), slop = 2, inOrder = true)

  test("span term: spans == term positions; count parity (test_engine.py:184-185)") {
    assert(spansOf(a) === Map(0L -> Seq((0, 1), (5, 6)), 1L -> Seq((1, 2), (2, 3))))
    assert(searcher.spans(a).count() === searcher.docFreq("content", "a"))
  }

  test("slice: position-range restriction (span[a:b] → SpanPositionRangeQuery)") {
    assert(spansOf(a.slice(0, 3)) === Map(0L -> Seq((0, 1)), 1L -> Seq((1, 2), (2, 3))))
    assert(spansOf(a.slice(2, Int.MaxValue)) === Map(0L -> Seq((5, 6)), 1L -> Seq((2, 3))))
  }

  test("or: merged sorted span union") {
    assert(spansOf(a | c) === Map(
      0L -> Seq((0, 1), (2, 3), (5, 6)),
      1L -> Seq((0, 1), (1, 2), (2, 3))))
  }

  test("near over spans: ordered chaining with slack ≤ slop") {
    assert(spansOf(nearAD) === Map(
      0L -> Seq((0, 4)),          // a0 → d3, slack 2
      1L -> Seq((1, 4), (2, 4)))) // a1 → d3 slack 1; a2 → d3 slack 0
    // unordered near finds d-before-a windows too
    val un = SpanQ.near(Seq(d, a), slop = 2, inOrder = false)
    assert(spansOf(un).keySet === Set(0L, 1L))
  }

  test("not: include spans overlapping an exclude span are dropped") {
    assert(spansOf(nearAD - c) === Map(
      0L -> Seq.empty,          // (0,4) overlaps c(2,3)
      1L -> Seq((1, 4), (2, 4))// c(0,1) touches only the boundary — no overlap
    ).filter(_._2.nonEmpty))
  }

  test("containing / within") {
    assert(spansOf(nearAD.containing(a)) === Map(
      0L -> Seq((0, 4)),
      1L -> Seq((1, 4), (2, 4))))
    assert(spansOf(c.within(nearAD)) === Map(0L -> Seq((2, 3))))
    assert(spansOf(nearAD.containing(Q.span("content", "e"))) === Map.empty)
  }

  test("mask: cross-field composition reads the inner field's postings") {
    val q = SpanQ.near(Seq(a, Q.span("alias", "q").mask("content")), slop = 0, inOrder = true)
    assert(spansOf(q) === Map(0L -> Seq((0, 2)))) // content a:0 then alias q:1
  }

  test("or-branch leaves are optional: near(a, b|c) prunes on 'a' only") {
    val q = SpanQ.near(Seq(a, b | c), slop = 0, inOrder = true)
    assert(SpanQ.requiredLeaves(q) === Set(("content", "a")))
    assert(spansOf(q) === Map(0L -> Seq((0, 2), (5, 7))))
  }

  test("span scoring: SpanWrap(term) ranks and scores exactly like Term") {
    val viaSpan = searcher.search(a.toQuery, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaTerm = searcher.search(Term("content", "a"), 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSpan.toSeq === viaTerm.toSeq)
    // and composes with the boolean algebra
    val hits = searcher.search(Q.all(nearAD.toQuery, Term("content", "e")), 10)
      .collect().map(_.getLong(0))
    assert(hits.toSeq === Seq(0L)) // only p0 has 'e'
  }

  test("pure disjunction (no required leaves) still matches: a|x over all docs") {
    val q = a | Q.span("content", "x")
    assert(spansOf(q).keySet === Set(0L, 1L, 2L))
  }

  test("nested near: a sub-span's internal slack never counts against the outer slop") {
    // p1 "c a a d b": inner near(c, a, slop=1) from c0 chains a1 → span (0,2,slack 0)
    // and there is no tighter start; inner near(c, d, slop=3) → (0,4, slack 2).
    // outer near(inner, b, slop=0): gap between (0,4) and b(4,5) is 0 — the
    // inner slack of 2 must NOT be re-charged to the outer window.
    val inner = SpanQ.near(Seq(c, d), slop = 3, inOrder = true)
    val outer = SpanQ.near(Seq(inner, b), slop = 0, inOrder = true)
    assert(spansOf(outer) === Map(1L -> Seq((0, 5))))
    // and with an outer gap of 1 (p0: near(a,c,slop 1)=(0,3); e at 4 gives gap 1)
    val inner0 = SpanQ.near(Seq(a, c), slop = 1, inOrder = true)
    assert(spansOf(SpanQ.near(Seq(inner0, Q.span("content", "e")), slop = 0, inOrder = true))
      === Map.empty) // gap d(3) separates: slack 1 > 0
    assert(spansOf(SpanQ.near(Seq(inner0, Q.span("content", "e")), slop = 1, inOrder = true))
      === Map(0L -> Seq((0, 5))))
  }

  test("unordered near enumerates windows sharing a sub-span (no pointer over-advance)") {
    // p0 a:0,5 b:1,6 — windows (0,1),(1,5)?,(5,6): with slop 0 the pairs
    // (a0,b1) and (a5,b6) both match; after (a0,b1) matched, b1 must still
    // pair against a5's window evaluation path (only the min pointer moves)
    val q = SpanQ.near(Seq(a, b), slop = 0, inOrder = false)
    assert(spansOf(q)(0L) === Seq((0, 2), (5, 7)))
    // overlapping windows: unordered near(b, near(a,b,0)) on p0 —
    // sub-spans (1,2) and (0,2) overlap; slack clamps at 0, still a match
    val overlap = SpanQ.near(Seq(b, SpanQ.near(Seq(a, b), 0, true)), slop = 0, inOrder = false)
    assert(spansOf(overlap).contains(0L))
  }
}
