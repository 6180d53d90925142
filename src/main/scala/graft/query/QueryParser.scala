package graft.query

import graft.analysis.Analyzer

/** Hand-written recursive-descent parser for the classic Lucene query-string
  * grammar subset the reference exposes (Analyzer.parse,
  * /root/reference/lupyne/engine/analyzers.py:130-157; behavior pinned at
  * /root/reference/tests/test_engine.py:102-103,158,178):
  *
  *   field:term   "quoted phrase"[~slop]   wild*card   fuzzy~[n]   term^boost
  *   [a TO b] / {a TO b}   AND / OR / NOT / && / || / + / -   ( groups )
  *
  * Default operator is OR (SHOULD); `op = "and"` switches to MUST. Term and
  * phrase text runs through the field analyzer.
  *
  * Several default fields (with per-field boosts) give Lucene
  * MultiFieldQueryParser semantics (reference Analyzer.parse fields/boosts
  * variant, analyzers.py:140-150; pinned at tests/test_engine.py:43-46):
  * every DEFAULT-field atom expands per-clause into a SHOULD across the
  * fields — `searches` over (body, title) parses to
  * `body:search title:search`, and with op=and each clause-group is a MUST —
  * while an explicit `field:` prefix suppresses expansion.
  */
final class QueryParser(defaultFields: Seq[(String, Double)], analyzerOf: String => Analyzer, op: String) {

  /** Single shared analyzer for every field — the reference's shape (its
    * parser IS an analyzer method). The primary constructor instead resolves
    * an analyzer PER FIELD, so multi-field expansion analyzes each clause
    * with the analyzer whose output that field's index actually contains
    * (e.g. a stemmed title next to a code-tokenized body).
    */
  def this(defaultFields: Seq[(String, Double)], analyzer: Analyzer, op: String) =
    this(defaultFields, (_: String) => analyzer, op)
  def this(field: String, analyzer: Analyzer, op: String) =
    this(Seq(field -> 1.0), (_: String) => analyzer, op)
  def this(field: String, analyzer: Analyzer) = this(field, analyzer, "or")

  private val must = op.equalsIgnoreCase("and")

  def parse(input: String): Query = {
    val toks = lex(input)
    val p = new Parser(toks)
    val q = p.parseQuery(defaultFields)
    q
  }

  // ------------------------------------------------------------------ lexer

  private sealed trait Tok
  private case object LParen extends Tok
  private case object RParen extends Tok
  private case object Plus extends Tok
  private case object Minus extends Tok
  private case object AndOp extends Tok
  private case object OrOp extends Tok
  private case object NotOp extends Tok
  private case class Phrase0(text: String, slop: Int, boost: Double) extends Tok
  private case class Range0(lower: String, upper: String, incl: Boolean, boost: Double) extends Tok
  private case class Word(text: String, fuzzy: Option[Int], boost: Double) extends Tok
  private case class FieldName(name: String) extends Tok

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    def readBoost(j0: Int): (Double, Int) = {
      var j = j0
      if (j < n && s(j) == '^') {
        j += 1
        val st = j
        while (j < n && (s(j).isDigit || s(j) == '.')) j += 1
        (s.substring(st, j).toDoubleOption.getOrElse(1.0), j)
      } else (1.0, j)
    }
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += LParen; i += 1 }
      else if (c == ')') {
        val (_, j) = readBoost(i + 1) // group boost not supported (rare) — skipped
        out += RParen
        i = j
      }
      else if (c == '+') { out += Plus; i += 1 }
      else if (c == '-') { out += Minus; i += 1 }
      else if (c == '"') {
        val end = s.indexOf('"', i + 1)
        val text = if (end < 0) s.substring(i + 1) else s.substring(i + 1, end)
        var j = if (end < 0) n else end + 1
        var slop = 0
        if (j < n && s(j) == '~') {
          j += 1
          val st = j
          while (j < n && s(j).isDigit) j += 1
          slop = if (j > st) s.substring(st, j).toInt else 0
        }
        val (b, j2) = readBoost(j)
        out += Phrase0(text, slop, b)
        i = j2
      }
      else if (c == '[' || c == '{') {
        val close = if (c == '[') ']' else '}'
        val end = s.indexOf(close, i)
        val body = s.substring(i + 1, if (end < 0) n else end)
        val parts = body.split("\\s+TO\\s+")
        val lower = parts.headOption.getOrElse("").trim
        val upper = if (parts.length > 1) parts(1).trim else ""
        val (b, j) = readBoost(if (end < 0) n else end + 1)
        out += Range0(lower, upper, c == '[', b)
        i = j
      }
      else {
        // bare word: up to whitespace or structural char; may end with ':'
        val st = i
        while (i < n && !s(i).isWhitespace && !"()\"[]{}^".contains(s(i)) &&
            !(s(i) == ':' )) i += 1
        if (i < n && s(i) == ':') {
          out += FieldName(s.substring(st, i))
          i += 1
        } else {
          var word = s.substring(st, i)
          word match {
            case "AND" | "&&" => out += AndOp
            case "OR" | "||"  => out += OrOp
            case "NOT" | "!"  => out += NotOp
            case _ =>
              var fuzzy: Option[Int] = None
              val tilde = word.lastIndexOf('~')
              if (tilde >= 0) {
                val suffix = word.substring(tilde + 1)
                suffix.toDoubleOption match {
                  case Some(d) => fuzzy = Some(d.toInt); word = word.substring(0, tilde)
                  case None if suffix.isEmpty => fuzzy = Some(2); word = word.substring(0, tilde)
                  case None => // not a fuzzy marker; keep the raw word
                }
              }
              val (b, j) = readBoost(i)
              i = j
              out += Word(word, fuzzy, b)
          }
        }
      }
    }
    out.result()
  }

  // ----------------------------------------------------------------- parser

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = { val t = toks(pos); pos += 1; t }

    def parseQuery(fields: Seq[(String, Double)]): Query = {
      val clauses = scala.collection.mutable.ArrayBuffer.empty[(Occur.Value, Query)]
      var pendingOccur: Option[Occur.Value] = None
      var lastWasOr = false
      var lastWasAnd = false
      def add(q: Query): Unit = {
        val defaultOccur = if (must) Occur.Must else Occur.Should
        val occur = pendingOccur.getOrElse(
          if (lastWasAnd) Occur.Must else if (lastWasOr) Occur.Should else defaultOccur)
        // classic-parser quirk: `a AND b` promotes the previous clause to MUST
        if (lastWasAnd && clauses.nonEmpty && clauses.last._1 == Occur.Should)
          clauses(clauses.length - 1) = (Occur.Must, clauses.last._2)
        clauses += ((occur, q))
        pendingOccur = None; lastWasAnd = false; lastWasOr = false
      }
      while (peek.exists(t => t != RParen)) {
        next() match {
          case Plus  => pendingOccur = Some(Occur.Must)
          case Minus => pendingOccur = Some(Occur.MustNot)
          case NotOp => pendingOccur = Some(Occur.MustNot)
          case AndOp => lastWasAnd = true
          case OrOp  => lastWasOr = true
          case LParen =>
            val sub = parseQuery(fields)
            if (peek.contains(RParen)) next()
            add(sub)
          case RParen => // unreachable (guarded)
          case FieldName(f) => add(parseAtom(f)) // explicit field: no expansion
          case t => add(atomToQuery(fields, t))
        }
      }
      val cs = clauses.toVector.filterNot(_._2 == NoDocs)
      cs match {
        case Vector()                  => NoDocs
        case Vector((Occur.Should, q)) => q
        case Vector((Occur.Must, q))   => q
        case _                         => Bool(cs)
      }
    }

    private def parseAtom(field: String): Query = {
      next() match {
        case LParen =>
          val sub = parseQuery(Seq(field -> 1.0))
          if (peek.contains(RParen)) next()
          sub
        case t => singleFieldAtom(field, t)
      }
    }

    /** Default-field atom: expand across the default fields (SHOULD of the
      * per-field atoms, each with its boost — MultiFieldQueryParser shape).
      */
    private def atomToQuery(fields: Seq[(String, Double)], t: Tok): Query =
      if (fields.length == 1 && fields.head._2 == 1.0) singleFieldAtom(fields.head._1, t)
      else {
        val subs = fields.map { case (f, b) => (singleFieldAtom(f, t), b) }
          .collect { case (q, b) if q != NoDocs => withBoost(q, b) }
        subs match {
          case Seq()  => NoDocs
          case Seq(q) => q
          case qs     => Bool(qs.map(Occur.Should -> _))
        }
      }

    private def singleFieldAtom(field: String, t: Tok): Query = t match {
      case Phrase0(text, slop, b) =>
        val terms = analyzerOf(field).terms(text)
        val q: Query =
          if (terms.isEmpty) NoDocs
          else if (terms.length == 1) Term(field, terms.head)
          else Phrase(field, terms.map(Some(_)), slop)
        withBoost(q, b)
      case Range0(lo, hi, incl, b) =>
        val lower = if (lo == "*" || lo.isEmpty) None else Some(lo)
        val upper = if (hi == "*" || hi.isEmpty) None else Some(hi)
        withBoost(TermRange(field, lower, upper, incl, incl), b)
      case Word(text, fuzzyEdits, b) =>
        if (text.isEmpty) return NoDocs
        val q: Query = fuzzyEdits match {
          case Some(ed) => Fuzzy(field, analyzerOf(field).terms(text).headOption.getOrElse(text), ed)
          case None =>
            if (text.contains('*') || text.contains('?')) {
              val lowered = text.toLowerCase(java.util.Locale.ROOT)
              if (lowered.endsWith("*") && !lowered.dropRight(1).exists(c => c == '*' || c == '?'))
                Prefix(field, lowered.dropRight(1))
              else Wildcard(field, lowered)
            } else {
              val terms = analyzerOf(field).terms(text)
              if (terms.isEmpty) NoDocs
              else if (terms.length == 1) Term(field, terms.head)
              else {
                // Lucene classic default (autoGeneratePhraseQueries=false): a
                // bare word that analyzes into several tokens (hyphens,
                // camelCase under the code analyzer) becomes a BooleanQuery
                // of the tokens under the default operator — NOT an exact
                // phrase, which would be stricter than the reference.
                val occ = if (must) Occur.Must else Occur.Should
                Bool(terms.map(t => occ -> (Term(field, t): Query)))
              }
            }
        }
        withBoost(q, b)
      case _ => NoDocs
    }

    private def withBoost(q: Query, b: Double): Query = if (b == 1.0) q else Boost(q, b)
  }
}
