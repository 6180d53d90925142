package graft.analysis

import java.util.regex.Pattern

/** A single token produced by analysis.
  *
  * Mirrors the attribute surface of the reference's token stream
  * (charTerm / position / offsets / type / payload —
  * /root/reference/lupyne/engine/analyzers.py:12-74) as a plain immutable
  * value.
  *
  * @param term        normalized term text
  * @param pos         token position (ordinal within the field value)
  * @param startOffset character start offset in the original text
  * @param endOffset   character end offset (exclusive)
  * @param typ         token type attribute (Lucene TypeAttribute; the
  *                    standard tokenizer stamps "<ALPHANUM>")
  * @param payload     optional per-position bytes carried into the posting
  *                    list (Lucene PayloadAttribute)
  */
final case class Token(term: String, pos: Int, startOffset: Int, endOffset: Int,
    typ: String = "<ALPHANUM>", payload: Array[Byte] = null)

/** Analyzer = tokenizer + filter chain, composed as pure Scala functions
  * (reference: Analyzer(tokenizer, *filters) at
  * /root/reference/lupyne/engine/analyzers.py:93-128).
  *
  * Analyzers must be deterministic and serializable: they run inside Spark
  * tasks (tokenization is the scan-side transform of the index build) and
  * inside the query parser on the driver. Every analyzer's token output is
  * also expressible as a SQL recipe (regex extraction), which is what the
  * correctness oracle uses — see [[Analyzers.standardSqlRegex]].
  */
trait Analyzer extends Serializable {
  def name: String

  /** Tokenize one text value. Positions are dense ordinals starting at 0. */
  def tokens(text: String): IndexedSeq[Token]

  /** Terms only (allocation-light path for length counting). */
  def terms(text: String): IndexedSeq[String] = tokens(text).map(_.term)

  /** The text view token offsets refer to (identity unless the analyzer
    * rewrites before tokenizing, like the code analyzer's camelCase split).
    */
  def preprocess(text: String): String = text

  /** Whether this analyzer's filter chain attaches payloads — when true, the
    * index build encodes a payload entry per position for every field using
    * it (uniform per field, so posting blocks never mix payload layouts).
    */
  def producesPayloads: Boolean = false
}

/** Analyzer + token-filter chain (the reference's custom-TokenFilter
  * extension point, analyzers.py:77-90; payload example pinned at
  * tests/test_engine.py:15-21,34-52). Filters are plain `Token => Token`
  * functions applied in order.
  */
final class ChainAnalyzer(
    val name: String,
    base: Analyzer,
    filters: Seq[Token => Token],
    override val producesPayloads: Boolean = false
) extends Analyzer {
  override def preprocess(text: String): String = base.preprocess(text)
  override def tokens(text: String): IndexedSeq[Token] =
    base.tokens(text).map(t => filters.foldLeft(t)((x, f) => f(x)))
}

object TokenFilters {

  /** Lucene TypeAsPayloadTokenFilter: stamp the token type into the payload
    * (the reference test's custom filter, tests/test_engine.py:15-21).
    */
  val typeAsPayload: Token => Token =
    t => t.copy(payload = if (t.typ == null) null else t.typ.getBytes("UTF-8"))

  /** PorterStemFilter as a chain stage. */
  val porterStem: Token => Token = t => t.copy(term = PorterStemmer.stem(t.term))
}

/** Regex-driven analyzer: extract matches of `pattern`, optionally lowercase.
  * An optional `pre` step rewrites the text before extraction (used by the
  * code-aware analyzer to split camelCase); offsets then refer to the
  * rewritten text for pre != identity.
  */
final class RegexAnalyzer(
    val name: String,
    patternStr: String,
    lowercase: Boolean,
    pre: String => String = identity
) extends Analyzer {
  @transient private lazy val pattern: Pattern = Pattern.compile(patternStr)

  override def preprocess(text: String): String = pre(text)

  override def tokens(text: String): IndexedSeq[Token] = {
    val t = pre(text)
    val m = pattern.matcher(t)
    val out = IndexedSeq.newBuilder[Token]
    var pos = 0
    while (m.find()) {
      val raw = m.group()
      val term = if (lowercase) raw.toLowerCase(java.util.Locale.ROOT) else raw
      out += Token(term, pos, m.start(), m.end())
      pos += 1
    }
    out.result()
  }
}

object Analyzers {

  /** Word pattern approximating Lucene's StandardTokenizer (UAX#29 word
    * break) for ASCII-dominant text: runs of word chars, with internal
    * apostrophes/periods kept (MidLetter), e.g. "don't", "U.S.C".
    * RE2-compatible (no lookaround) so the same pattern drives the DuckDB
    * oracle. Reference behavior: Analyzer.standard at
    * /root/reference/lupyne/engine/analyzers.py:105-108 (StandardTokenizer +
    * LowerCaseFilter, no stopwords).
    */
  val standardRegex = "[A-Za-z0-9_]+(?:['.][A-Za-z0-9_]+)*"

  /** The same contract written for the oracle's regexp_extract_all. */
  val standardSqlRegex = "[A-Za-z0-9_]+(?:['.][A-Za-z0-9_]+)*"

  /** Default analyzer: standard word-break + lowercase, no stopwords. */
  val standard: Analyzer = new RegexAnalyzer("standard", standardRegex, lowercase = true)

  /** WhitespaceTokenizer equivalent (no lowercasing), reference
    * /root/reference/lupyne/engine/analyzers.py:110-113.
    */
  val whitespace: Analyzer = new RegexAnalyzer("whitespace", "\\S+", lowercase = false)

  /** Code-aware analyzer (north_rule): splits snake_case and camelCase
    * identifiers into sub-tokens, then standard word extraction + lowercase.
    * Spec (mirrored 1:1 in the oracle SQL):
    *   1. insert a space between a [a-z0-9] char and a following [A-Z]
    *   2. replace '_' with space
    *   3. extract [A-Za-z0-9]+ runs, lowercase.
    */
  val codePreRegex = "([a-z0-9])([A-Z])"
  val code: Analyzer = new RegexAnalyzer(
    "code",
    "[A-Za-z0-9]+",
    lowercase = true,
    pre = (s: String) => s.replaceAll(codePreRegex, "$1 $2").replace('_', ' ')
  )

  private val registry = scala.collection.concurrent.TrieMap[String, Analyzer](
    "standard" -> standard, "whitespace" -> whitespace, "code" -> code,
    "porter" -> StemmingAnalyzer)

  /** Resolve an analyzer by registered name (schemas store names so they
    * serialize into index manifests).
    */
  def byName(name: String): Analyzer = registry.getOrElse(name,
    throw new IllegalArgumentException(s"unknown analyzer '$name' — register it first"))

  /** Register a custom analyzer/filter-chain under a name (the reference's
    * pluggable-Analyzer extension point). Names resolve at plan time on the
    * driver; the resolved analyzer object itself ships serialized inside
    * task closures, so executors never consult this registry.
    */
  def register(a: Analyzer): Unit = registry.put(a.name, a)
}
