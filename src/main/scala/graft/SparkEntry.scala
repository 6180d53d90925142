package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{Index, IndexBuilder, IndexSchema, KeywordField, TextField}
import graft.exec.{Searcher, SortSpec}
import graft.query.{Query => Q, _}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's native input is the source-code-shaped table of
  * BASELINE.json input_hint; the driver's `documents.parquet` is mapped onto
  * that shape (repo=source, path/commit derived from doc_id, content=text).
  * Every query below has a DuckDB oracle in [[SparkEntry.oracleSql]] that
  * recomputes the full inverted-index + BM25 semantics in ANSI-ish SQL;
  * scores are compared as round(score*10^4) integers.
  */
object SparkEntry {

  // ------------------------------------------------------------- the corpus

  /** Map the driver's documents table onto the engine's input shape. */
  def corpus(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("source").as("repo"),
        concat(lit("doc/"), lpad(col("doc_id").cast("string"), 8, "0")).as("path"),
        col("doc_id").cast("string").as("commit"),
        col("lang"),
        col("text").as("content"),
        col("n_chars"))

  val schema: IndexSchema = IndexSchema(
    keyColumns = Seq("repo", "path", "commit"),
    fields = Map(
      "content" -> TextField("standard", positions = true),
      "lang" -> KeywordField,
      "repo" -> KeywordField))

  private val cache = scala.collection.concurrent.TrieMap.empty[String, Searcher]

  def searcher(spark: SparkSession, sfDir: String): Searcher =
    cache.getOrElseUpdate(sfDir, {
      val idx = IndexBuilder.build(corpus(spark, sfDir), schema).cached()
      idx.blocks.count() // materialize the cache once
      new Searcher(idx)
    })

  /** Quantize a double score for engine↔oracle comparison. */
  private def qz(c: Column): Column = floor(c * 10000d + 0.5d).cast("long")

  // ------------------------------------------------------------ entry point

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val s = searcher(spark, "/root/testdata/sf0.001")
    s.search(Term("content", "data"), 10)
      .select(col("docId").as("docid"), qz(col("score")).as("score_q"))
  }

  // ---------------------------------------------------------------- queries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_term_topk" -> ((sp, dir) => {
      searcher(sp, dir).search(Term("content", "data"), 10)
        .select(col("docId").as("docid"), qz(col("score")).as("score_q"))
    }),
    "q_bool_or_topk" -> ((sp, dir) => {
      searcher(sp, dir).search(Term("content", "spark") | Term("content", "join"), 10)
        .select(col("docId").as("docid"), qz(col("score")).as("score_q"))
    }),
    "q_bool_and_not_topk" -> ((sp, dir) => {
      val q = Bool(Seq(
        Occur.Must -> Term("content", "data"),
        Occur.Must -> Term("content", "spark"),
        Occur.MustNot -> Term("content", "join")))
      searcher(sp, dir).search(q, 10)
        .select(col("docId").as("docid"), qz(col("score")).as("score_q"))
    }),
    "q_phrase_topk" -> ((sp, dir) => {
      searcher(sp, dir).search(Q.phrase("content", "key", "order"), 10)
        .select(col("docId").as("docid"), qz(col("score")).as("score_q"))
    }),
    "q_count_fastpath" -> ((sp, dir) => {
      val s = searcher(sp, dir)
      val spark = sp
      import spark.implicits._
      Seq(("the", s.docFreq("content", "the"))).toDF("term", "docfreq")
    }),
    "q_terms_prefix" -> ((sp, dir) => {
      searcher(sp, dir).terms("content", prefix = "s", counts = true)
        .select(col("term"), col("docFreq").as("docfreq"))
    }),
    "q_facets_lang" -> ((sp, dir) => {
      searcher(sp, dir).facets(Term("content", "data"), "lang")
        .select(col("lang"), col("cnt"))
    }),
    "q_sort_nchars" -> ((sp, dir) => {
      searcher(sp, dir)
        .search(Term("content", "join"), 10, sorts = Seq(SortSpec("n_chars", descending = true)))
        .select(col("docId").as("docid"), col("n_chars"))
    }),
    "q_prefix_docs" -> ((sp, dir) => {
      searcher(sp, dir).search(Prefix("content", "jo"), 20)
        .select(col("docId").as("docid"))
    }),
    "q_suggest" -> ((sp, dir) => {
      searcher(sp, dir).suggest("content", "joon", 10)
        .select(col("term"), col("docFreq").as("docfreq"), col("dist").cast("long").as("dist"),
          floor(col("sim") * 10000d + 0.5d).cast("long").as("sim_q"))
    }),
    "q_doclengths" -> ((sp, dir) => {
      searcher(sp, dir).docLengths("content")
        .select(col("docId").as("docid"), col("dlq").cast("long").as("dlq"))
    }),
    "q_dedup_exact" -> ((sp, dir) => {
      val s = searcher(sp, dir)
      s.index.docs.agg(
        org.apache.spark.sql.functions.count(lit(1)).as("n_docs"),
        countDistinct(col("__sha256_content")).as("n_distinct"))
    })
  )

  // ----------------------------------------------------------------- oracle

  /** Shared DuckDB CTE prelude: corpus mapping (docid = dense rank over the
    * engine's key order), tokenization (same regex contract as
    * [[graft.analysis.Analyzers.standard]]), tf, quantized doc lengths
    * (SmallFloat top-4-bit closed form), and collection stats.
    */
  private val prelude: String =
    """WITH corpus AS (
      |  SELECT row_number() OVER (ORDER BY source, lpad(CAST(doc_id AS VARCHAR), 8, '0'), CAST(doc_id AS VARCHAR)) - 1 AS docid,
      |         doc_id, source AS repo, lang, text AS content, n_chars
      |  FROM documents
      |), tokp AS (
      |  SELECT docid, unnest(toks) AS term, unnest(range(len(toks))) AS pos
      |  FROM (SELECT docid, regexp_extract_all(lower(content), '[a-z0-9_]+(?:[''.][a-z0-9_]+)*') AS toks FROM corpus)
      |), tf AS (
      |  SELECT docid, term, count(*) AS tf FROM tokp GROUP BY 1, 2
      |), dl AS (
      |  SELECT c.docid, count(t.term) AS dl FROM corpus c LEFT JOIN tokp t USING (docid) GROUP BY 1
      |), dlq AS (
      |  SELECT docid, CASE WHEN dl < 16 THEN dl ELSE (dl >> (length(bin(dl)) - 5)) << (length(bin(dl)) - 5) END AS dlq FROM dl
      |), stats AS (
      |  SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl
      |)""".stripMargin

  private def inList(terms: Seq[String]): String =
    terms.map(t => s"'${t.replace("'", "''")}'").mkString("(", ", ", ")")

  /** BM25-scored CTE over a term set: per-doc sum of matching-term scores +
    * match count (for AND) — mirrors Searcher.evalTerm/evalBool exactly.
    */
  private def scoredCte(terms: Seq[String]): String =
    s""", tdf AS (
       |  SELECT term, count(*) AS df FROM tf WHERE term IN ${inList(terms)} GROUP BY 1
       |), scored AS (
       |  SELECT f.docid,
       |         sum(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) * f.tf / (f.tf + 1.2 * (0.25 + 0.75 * q.dlq / s.avgdl))) AS score,
       |         count(*) AS nm
       |  FROM tf f JOIN tdf d USING (term) JOIN dlq q USING (docid) CROSS JOIN stats s
       |  WHERE f.term IN ${inList(terms)}
       |  GROUP BY 1
       |)""".stripMargin

  private val topk = "CAST(floor(score * 10000 + 0.5) AS BIGINT) AS score_q"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q_term_topk" ->
      s"""$prelude${scoredCte(Seq("data"))}
         |SELECT docid, $topk FROM scored ORDER BY score DESC, docid LIMIT 10""".stripMargin,
    "q_bool_or_topk" ->
      s"""$prelude${scoredCte(Seq("spark", "join"))}
         |SELECT docid, $topk FROM scored ORDER BY score DESC, docid LIMIT 10""".stripMargin,
    "q_bool_and_not_topk" ->
      s"""$prelude${scoredCte(Seq("data", "spark"))}
         |SELECT docid, $topk FROM scored
         |WHERE nm = 2 AND docid NOT IN (SELECT docid FROM tf WHERE term = 'join')
         |ORDER BY score DESC, docid LIMIT 10""".stripMargin,
    "q_phrase_topk" ->
      s"""$prelude, p0 AS (
         |  SELECT docid, list(pos) AS ps FROM tokp WHERE term = 'key' GROUP BY 1
         |), p1 AS (
         |  SELECT docid, list(pos) AS ps FROM tokp WHERE term = 'order' GROUP BY 1
         |), ph AS (
         |  SELECT p0.docid, len(list_intersect(list_transform(p0.ps, x -> x + 1), p1.ps)) AS freq
         |  FROM p0 JOIN p1 USING (docid)
         |), phd AS (
         |  SELECT (SELECT count(*) FROM tf WHERE term = 'key') AS df0,
         |         (SELECT count(*) FROM tf WHERE term = 'order') AS df1
         |), phs AS (
         |  SELECT ph.docid,
         |         (ln(1 + (s.n - d.df0 + 0.5) / (d.df0 + 0.5)) + ln(1 + (s.n - d.df1 + 0.5) / (d.df1 + 0.5)))
         |           * ph.freq / (ph.freq + 1.2 * (0.25 + 0.75 * q.dlq / s.avgdl)) AS score
         |  FROM ph JOIN dlq q USING (docid) CROSS JOIN stats s CROSS JOIN phd d
         |  WHERE ph.freq > 0
         |)
         |SELECT docid, $topk FROM phs ORDER BY score DESC, docid LIMIT 10""".stripMargin,
    "q_count_fastpath" ->
      s"""$prelude SELECT 'the' AS term, count(*) AS docfreq FROM tf WHERE term = 'the'""",
    "q_terms_prefix" ->
      s"""$prelude SELECT term, count(*) AS docfreq FROM tf WHERE term LIKE 's%' GROUP BY 1 ORDER BY term""",
    "q_facets_lang" ->
      s"""$prelude SELECT c.lang, count(*) AS cnt
         |FROM corpus c JOIN (SELECT DISTINCT docid FROM tf WHERE term = 'data') m USING (docid)
         |GROUP BY 1""".stripMargin,
    "q_sort_nchars" ->
      s"""$prelude SELECT c.docid, c.n_chars
         |FROM corpus c JOIN (SELECT DISTINCT docid FROM tf WHERE term = 'join') m USING (docid)
         |ORDER BY c.n_chars DESC, c.docid ASC LIMIT 10""".stripMargin,
    "q_prefix_docs" ->
      s"""$prelude SELECT DISTINCT docid FROM tf WHERE term LIKE 'jo%' ORDER BY docid LIMIT 20""",
    "q_suggest" ->
      s"""$prelude, cand AS (
         |  SELECT term, count(*) AS docfreq, levenshtein(term, 'joon') AS dist,
         |         1.0 - levenshtein(term, 'joon')::DOUBLE / least(length(term), 4)::DOUBLE AS sim
         |  FROM tf WHERE term <> 'joon' AND substring(term, 1, 1) = 'j' AND levenshtein(term, 'joon') <= 2
         |  GROUP BY 1
         |)
         |SELECT term, docfreq, dist, CAST(floor(sim * 10000 + 0.5) AS BIGINT) AS sim_q
         |FROM cand ORDER BY sim DESC, docfreq DESC, term ASC LIMIT 10""".stripMargin,
    "q_doclengths" ->
      s"""$prelude SELECT docid, dlq FROM dlq""",
    "q_dedup_exact" ->
      "SELECT count(*) AS n_docs, count(DISTINCT text) AS n_distinct FROM documents"
  )
}
