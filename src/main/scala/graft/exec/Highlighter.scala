package graft.exec

import graft.analysis.Analyzer
import graft.query._

/** Searcher-less highlighter mirroring the reference's UnifiedHighlighter
  * usage (Analyzer.highlight, /root/reference/lupyne/engine/analyzers.py:159-169;
  * Hits.highlights, documents.py:391-402; gold `word <b>right</b> word` at
  * tests/test_engine.py:588-592): re-analyze content, wrap query-matching
  * terms in <b>…</b>, select top passages by match density.
  */
object Highlighter {

  /** Terms a query matches on `field` (multi-term expansion not applied). */
  def queryTerms(q: Query, field: String): Set[String] = q match {
    case Term(f, t) if f == field      => Set(t)
    case TermSet(f, ts) if f == field  => ts.toSet
    case Phrase(f, ts, _) if f == field => ts.flatten.toSet
    case Near(f, ts, _, _) if f == field => ts.toSet
    case Bool(cs) => cs.collect { case (o, sub) if o != Occur.MustNot => queryTerms(sub, field) }
      .foldLeft(Set.empty[String])(_ ++ _)
    case DisMax(_, ds)  => ds.map(queryTerms(_, field)).foldLeft(Set.empty[String])(_ ++ _)
    case Boost(sub, _)  => queryTerms(sub, field)
    case Constant(sub)  => queryTerms(sub, field)
    case _              => Set.empty
  }

  /** Passage selection shared by [[highlight]] and [[bestPassages]]: split
    * at sentence enders (or newlines) followed by whitespace, score each
    * passage by matching token count, keep the top `maxPassages` with ≥ 1
    * hit in document order (stable sort ⇒ ties go to the earlier passage).
    */
  private def selectPassages(analyzer: Analyzer, terms: Set[String], text: String,
      maxPassages: Int): Vector[(Int, Int)] = {
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < text.length - 1) {
      val c = text(i)
      if ((c == '.' || c == '!' || c == '?' || c == '\n') && text(i + 1).isWhitespace)
        bounds += i + 1
      i += 1
    }
    bounds += text.length
    val passages = bounds.toSeq.distinct.sorted.sliding(2).collect {
      case Seq(a, b) if b > a => (a, b)
    }.toVector
    val scored = passages.map { case (a, b) =>
      val toks = analyzer.tokens(text.substring(a, b))
      val hits = toks.count(t => terms.contains(t.term))
      (a, b, hits)
    }
    scored.filter(_._3 > 0).sortBy(-_._3).take(maxPassages).sortBy(_._1)
      .map { case (a, b, _) => (a, b) }
  }

  /** The selected passages UNWRAPPED (analyzer-preprocessed, stripped) —
    * the oracle-checkable half of highlighting: which passage the density
    * policy picks is plain SQL, whereas tag insertion needs match offsets
    * no SQL engine surfaces. `highlight` == this with matches wrapped.
    */
  def bestPassages(analyzer: Analyzer, terms: Set[String], text: String,
      maxPassages: Int = 1): Vector[String] =
    if (terms.isEmpty || text.isEmpty) Vector.empty
    else selectPassages(analyzer, terms, text, maxPassages)
      .map { case (a, b) => analyzer.preprocess(text.substring(a, b)).strip }

  /** Highlight `text`: split into sentence-ish passages, score by matching
    * token count, keep the top `maxPassages` (document order), wrap matches.
    */
  def highlight(analyzer: Analyzer, terms: Set[String], text: String, maxPassages: Int = 1): String = {
    if (terms.isEmpty || text.isEmpty) return text
    val keep = selectPassages(analyzer, terms, text, maxPassages)
    if (keep.isEmpty) return ""
    keep.map { case (a, b) =>
      // token offsets refer to the analyzer's preprocessed view of the text
      // (identical for plain analyzers; camelCase-split for the code one)
      val seg = analyzer.preprocess(text.substring(a, b))
      val toks = analyzer.tokens(seg).filter(t => terms.contains(t.term))
      val sb = new java.lang.StringBuilder
      var last = 0
      toks.foreach { t =>
        sb.append(seg, last, t.startOffset).append("<b>")
          .append(seg, t.startOffset, t.endOffset).append("</b>")
        last = t.endOffset
      }
      sb.append(seg, last, seg.length)
      sb.toString.strip
    }.mkString("...")
  }
}
