package graft.query

/** Logical query algebra, mirroring the reference's constructor surface
  * (/root/reference/lupyne/engine/queries.py) as an immutable Scala ADT.
  * Evaluation is in [[graft.exec.Searcher]]; these nodes are pure plan.
  */
sealed trait Query {

  /** Lucene-style operator sugar (queries.py:180-210). */
  def &(other: Query): Query = Query.all(this, other)
  def |(other: Query): Query = Query.any(this, other)
  def -(other: Query): Query = Bool(Seq(Occur.Must -> this, Occur.MustNot -> other))
  def unary_+ : Query = Bool(Seq(Occur.Must -> this))
  def unary_- : Query = Bool(Seq(Occur.MustNot -> this))

  /** Strip scoring → constant 1 (queries.py:172-174). */
  def constant: Query = Constant(this)

  /** Multiply score (queries.py:176-178). */
  def boost(v: Double): Query = Boost(this, v)
}

object Occur extends Enumeration {
  val Should, Must, Filter, MustNot = Value
}

final case class Term(field: String, term: String) extends Query
/** Term-in-set (TermInSetQuery — constant score, queries.py:30-33). */
final case class TermSet(field: String, terms: Seq[String]) extends Query
final case class Bool(clauses: Seq[(Occur.Value, Query)]) extends Query
/** DisjunctionMax: max(clauses) + tiebreak * (sum - max) (queries.py:60-68). */
final case class DisMax(tiebreak: Double, disjuncts: Seq[Query]) extends Query
/** Positional phrase; None = position gap placeholder (queries.py:98-109). */
final case class Phrase(field: String, terms: Seq[Option[String]], slop: Int = 0) extends Query
/** Span-near: window-constrained positional match (queries.py:70-85). */
final case class Near(field: String, terms: Seq[String], slop: Int, inOrder: Boolean) extends Query
final case class Prefix(field: String, prefix: String) extends Query
/** Lexicographic term range, half-open [lower, upper) by default (queries.py:92-96). */
final case class TermRange(field: String, lower: Option[String], upper: Option[String],
    includeLower: Boolean = true, includeUpper: Boolean = false) extends Query
final case class Wildcard(field: String, pattern: String) extends Query
final case class Regexp(field: String, pattern: String) extends Query
/** Fuzzy term expansion with Lucene FuzzyQuery defaults: maxEdits 2,
  * no required common prefix, adjacent transposition = one edit
  * (queries.py:116-119).
  */
final case class Fuzzy(field: String, term: String, maxEdits: Int = 2,
    prefixLength: Int = 0, transpositions: Boolean = true) extends Query
/** Numeric point-set over a docvalue column (queries.py:136-141). */
final case class Points(field: String, values: Seq[Double]) extends Query
/** Multi-interval numeric range over a docvalue column (queries.py:143-170). */
final case class NumRanges(field: String, intervals: Seq[(Option[Double], Option[Double])],
    includeLower: Boolean = true, includeUpper: Boolean = false) extends Query
/** Score-bearing wrapper so span queries compose with the boolean algebra
  * (the span ADT itself lives in Span.scala).
  */
final case class SpanWrap(span: SpanQ) extends Query
case object AllDocs extends Query
case object NoDocs extends Query
final case class Boost(q: Query, boost: Double) extends Query
final case class Constant(q: Query) extends Query

object Query {
  /** SHOULD disjunction (queries.py:35-48). */
  def any(qs: Query*): Query = Bool(qs.map(Occur.Should -> _))
  /** MUST conjunction (queries.py:50-53). */
  def all(qs: Query*): Query = Bool(qs.map(Occur.Must -> _))
  /** FILTER conjunction — matches constrain, scores don't (queries.py:55-58). */
  def filter(scored: Query, filters: Query*): Query =
    Bool((Occur.Must -> scored) +: filters.map(Occur.Filter -> _))
  def term(field: String, value: String): Query = Term(field, value)
  def terms(field: String, values: String*): Query = TermSet(field, values)
  def phrase(field: String, values: String*): Query =
    Phrase(field, values.map(v => if (v == null) None else Some(v)))
  def near(field: String, values: Seq[String], slop: Int = 0, inOrder: Boolean = true): Query =
    Near(field, values, slop, inOrder)
  /** Span-term entry into the span algebra (queries.py:70-76 Q.span). */
  def span(field: String, value: String): SpanTerm = SpanTerm(field, value)
  def prefix(field: String, value: String): Query = Prefix(field, value)
  def range(field: String, lower: String, upper: String): Query =
    TermRange(field, Option(lower), Option(upper))
  def points(field: String, values: Double*): Query = Points(field, values)
  def ranges(field: String, intervals: (Option[Double], Option[Double])*): Query =
    NumRanges(field, intervals)
  def alldocs: Query = AllDocs
}
