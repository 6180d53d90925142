package graft

import graft.index._
import graft.exec.{Bm25, Searcher, SortSpec}
import graft.query.{Query => Q, _}

/** End-to-end engine slice (SURVEY.md §7.1 step 1-2): tiny corpus, BM25
  * scores checked against hand-computed Lucene-parity values.
  */
class EngineSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  lazy val source = {
    val s = spark
    import s.implicits._
    Seq(
      ("r/a", "p0", "c0", "en", "hello world hello"),
      ("r/a", "p1", "c1", "en", "hello spark"),
      ("r/b", "p2", "c2", "de", "world of spark spark"),
      ("r/b", "p3", "c3", "de", "goodbye cruel world")
    ).toDF("repo", "path", "commit", "lang", "content")
  }

  lazy val schema = IndexSchema(
    keyColumns = Seq("repo", "path", "commit"),
    fields = Map("content" -> TextField("standard", positions = true), "lang" -> KeywordField))

  lazy val index: Index = IndexBuilder.build(source, schema, numPartitions = 3).cached()
  lazy val searcher = new Searcher(index)

  test("deterministic docIds: dense rank over (repo, path, commit)") {
    val got = index.docs.select("docId", "path").collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq((0L, "p0"), (1L, "p1"), (2L, "p2"), (3L, "p3")))
    // invariant to partitioning
    val index2 = IndexBuilder.build(source.repartition(7), schema, numPartitions = 5)
    val got2 = index2.docs.select("docId", "path").collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got2.toSeq === got.toSeq)
  }

  test("sha256 invariant column stamped") {
    val rows = index.docs.select("content", "__sha256_content").collect()
    rows.foreach { r =>
      val expect = java.security.MessageDigest.getInstance("SHA-256")
        .digest(r.getString(0).getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(1) === expect)
    }
  }

  test("field stats: docCount and sumTotalTermFreq") {
    assert(index.fieldStats("content") === FieldStats(4, 12))
    assert(index.fieldStats("lang").docCount === 4)
  }

  test("termDict docFreq/totalTermFreq") {
    val m = searcher.termStats("content", Seq("hello", "world", "spark", "of"))
    assert(m("hello") === (2L, 3L))
    assert(m("world") === (3L, 3L))
    assert(m("spark") === (2L, 3L))
    assert(m("of") === (1L, 1L))
    assert(searcher.docFreq("content", "absent") === 0L)
    assert(searcher.docFreq("lang", "en") === 2L)
  }

  test("term query: hand-computed BM25 scores and order") {
    val hits = searcher.search(Term("content", "hello"), 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // N=4, df=2, idf=ln(1+2.5/2.5)=ln 2; avgdl=3
    val idf = math.log(2.0)
    val s0 = idf * 2.0 / (2.0 + 1.2 * (0.25 + 0.75 * 3 / 3.0)) // doc0 tf=2 dl=3
    val s1 = idf * 1.0 / (1.0 + 1.2 * (0.25 + 0.75 * 2 / 3.0)) // doc1 tf=1 dl=2
    assert(hits.map(_._1).toSeq === Seq(0L, 1L))
    assert(math.abs(hits(0)._2 - s0) < 1e-12)
    assert(math.abs(hits(1)._2 - s1) < 1e-12)
  }

  test("keyword field: omitted norms (K = k1)") {
    val hits = searcher.search(Term("lang", "de"), 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val idf = Bm25.idf(4, 2)
    val expect = idf * 1.0 / (1.0 + 1.2)
    assert(hits.map(_._1).toSeq === Seq(2L, 3L)) // equal scores -> docId tiebreak
    hits.foreach(h => assert(math.abs(h._2 - expect) < 1e-12))
  }

  test("boolean: AND, OR, NOT, FILTER") {
    val and = searcher.search(Term("content", "hello") & Term("content", "spark"), 10).collect()
    assert(and.map(_.getLong(0)).toSeq === Seq(1L))
    // AND score = sum of clause scores
    val sHello = searcher.eval(Term("content", "hello")).filter(col("docId") === 1).collect()(0).getDouble(1)
    val sSpark = searcher.eval(Term("content", "spark")).filter(col("docId") === 1).collect()(0).getDouble(1)
    assert(math.abs(and(0).getDouble(1) - (sHello + sSpark)) < 1e-12)

    val or = searcher.search(Term("content", "hello") | Term("content", "spark"), 10).collect()
    assert(or.map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L, 2L))

    val not = searcher.search(Term("content", "world") - Term("content", "spark"), 10).collect()
    assert(not.map(_.getLong(0)).sorted.toSeq === Seq(0L, 3L))

    val filtered = searcher.search(Q.filter(Term("content", "world"), Term("lang", "de")), 10).collect()
    assert(filtered.map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    // FILTER adds no score
    val wScore2 = searcher.eval(Term("content", "world")).filter(col("docId") === 2).collect()(0).getDouble(1)
    assert(math.abs(filtered.find(_.getLong(0) == 2).get.getDouble(1) - wScore2) < 1e-12)
  }

  test("phrase: exact positional match") {
    val hits = searcher.search(Q.phrase("content", "hello", "world"), 10).collect()
    assert(hits.map(_.getLong(0)).toSeq === Seq(0L))
    val hits2 = searcher.search(Q.phrase("content", "of", "spark"), 10).collect()
    assert(hits2.map(_.getLong(0)).toSeq === Seq(2L))
    assert(searcher.count(Q.phrase("content", "spark", "hello")) === 0L)
    // phrase freq: doc2 "spark spark" -> phrase "spark spark" freq 1
    assert(searcher.count(Q.phrase("content", "spark", "spark")) === 1L)
  }

  test("phrase with gap placeholder") {
    // "hello _ hello" matches doc0 (positions 0 and 2)
    assert(searcher.count(Phrase("content", Seq(Some("hello"), None, Some("hello")))) === 1L)
    assert(searcher.count(Phrase("content", Seq(Some("world"), None, Some("spark")))) === 1L) // doc2: world . spark
  }

  test("near: slop and order") {
    // doc1 "hello spark": near(spark, hello) unordered slop 0 matches, ordered does not
    assert(searcher.count(Near("content", Seq("spark", "hello"), 0, inOrder = false)) === 1L)
    assert(searcher.count(Near("content", Seq("spark", "hello"), 0, inOrder = true)) === 0L)
    // doc0 "hello world hello": hello..hello distance 2 -> slop 1 ordered
    assert(searcher.count(Near("content", Seq("hello", "hello"), 1, inOrder = true)) === 1L)
  }

  test("multi-term: prefix, wildcard, fuzzy, range — constant score") {
    val p = searcher.search(Prefix("content", "hel"), 10).collect()
    assert(p.map(_.getLong(0)).sorted.toSeq === Seq(0L, 1L))
    assert(p.forall(_.getDouble(1) === 1.0))
    assert(searcher.count(Wildcard("content", "sp?rk")) === 2L)
    assert(searcher.count(Wildcard("content", "*oo*")) === 1L) // goodbye
    assert(searcher.count(Fuzzy("content", "hallo", 2)) === 2L)
    assert(searcher.count(TermRange("content", Some("go"), Some("hf"))) === 3L) // goodbye, hello
  }

  test("numeric ranges and alldocs over docvalues") {
    assert(searcher.count(AllDocs) === 4L)
    assert(searcher.count(NoDocs) === 0L)
  }

  test("boost and constant") {
    val base = searcher.eval(Term("content", "hello")).filter(col("docId") === 0).collect()(0).getDouble(1)
    val boosted = searcher.eval(Term("content", "hello").boost(2.5)).filter(col("docId") === 0).collect()(0).getDouble(1)
    assert(math.abs(boosted - base * 2.5) < 1e-12)
    val const = searcher.eval(Term("content", "hello").constant).collect().map(_.getDouble(1))
    assert(const.forall(_ === 1.0))
  }

  test("dismax") {
    val q = DisMax(0.5, Seq(Term("content", "hello"), Term("content", "spark")))
    val doc1 = searcher.eval(q).filter(col("docId") === 1).collect()(0).getDouble(1)
    val h = searcher.eval(Term("content", "hello")).filter(col("docId") === 1).collect()(0).getDouble(1)
    val s = searcher.eval(Term("content", "spark")).filter(col("docId") === 1).collect()(0).getDouble(1)
    assert(math.abs(doc1 - (math.max(h, s) + 0.5 * math.min(h, s))) < 1e-12)
  }

  test("facets and groupBy") {
    val f = searcher.facets(Term("content", "world"), "lang").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f === Map("en" -> 1L, "de" -> 2L))
    val g = searcher.groupBy("lang", Term("content", "world"), groups = 2, docsPerGroup = 1).collect()
    assert(g.length === 2)
  }

  test("sort by docvalue column") {
    val sorted = searcher.search(Term("content", "world"), 10, sorts = Seq(SortSpec("path", descending = true)))
    assert(sorted.collect().map(_.getLong(0)).toSeq === Seq(3L, 2L, 0L))
  }

  test("terms dictionary, complete, suggest") {
    val t = searcher.terms("content", prefix = "s").collect().map(_.getString(0))
    assert(t.toSeq === Seq("spark"))
    val slice = searcher.terms("content", prefix = "g", stop = "i").collect().map(_.getString(0))
    assert(slice.toSeq === Seq("goodbye", "hello"))
    val c = searcher.complete("content", "", 3).collect().map(_.getString(0))
    assert(c.head === "world") // df 3 tops
    val sg = searcher.suggest("content", "spork").collect().map(_.getString(0))
    assert(sg.toSeq === Seq("spark"))
  }

  test("morelikethis") {
    val q = searcher.morelikethis(0, "content", minTermFreq = 2, minDocFreq = 1)
    assert(q === Q.any(Term("content", "hello")))
    // the raw-text overload ranks identically from un-indexed content
    assert(searcher.morelikethisText("hello hello goodbye", "content",
      minTermFreq = 2, minDocFreq = 1) === Q.any(Term("content", "hello")))
  }

  test("doc/contains: stored-row access with tombstone awareness (searcher[id])") {
    assert(searcher.contains(0L))
    assert(searcher.doc(0L).get.getAs[String]("content") === "hello world hello")
    assert(searcher.doc(0L, Seq("path")).get.getString(0) === "p0")
    assert(searcher.doc(99L).isEmpty && !searcher.contains(99L))
    // tombstoned ids read as absent (liveDocs semantics)
    val deleted = searcher.delete(Term("content", "goodbye"))
    assert(!deleted.contains(3L) && deleted.doc(3L).isEmpty)
    assert(deleted.contains(0L))
  }

  test("registerViews: index tables compose with ad-hoc spark.sql") {
    searcher.registerViews("g")
    assert(spark.sql("SELECT count(*) FROM g_docs").collect()(0).getLong(0) === 4L)
    val df = spark.sql(
      "SELECT term, docFreq FROM g_terms WHERE field = 'content' AND term = 'hello'")
      .collect()(0)
    assert(df.getString(0) === "hello" && df.getLong(1) === 2L)
    // engine results join back to SQL state (docvalue columns)
    val hits = searcher.search(Term("content", "hello"), 10)
    hits.createOrReplaceTempView("g_hits")
    val langs = spark.sql(
      "SELECT d.lang, count(*) FROM g_hits h JOIN g_docs d USING (docId) GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs === Map("en" -> 2L))
  }

  test("totalHits relation: int when exact, float when a lower-bound estimate") {
    // 'world' matches 3 docs: a generous threshold counts exactly
    val exact = searcher.totalHits(Term("content", "world"), threshold = 100)
    assert(exact === graft.exec.TotalHits(3L, exact = true))
    assert(exact.count === 3L) // reference surface: int ⇔ EQUAL_TO
    // a threshold below the hit count early-terminates → GTE lower bound
    val est = searcher.totalHits(Term("content", "world"), threshold = 2)
    assert(est === graft.exec.TotalHits(2L, exact = false))
    assert(est.count === 2.0) // float ⇔ estimate (documents.py:350-355)
    assert(est.count.isInstanceOf[Double])
    // threshold <= 0 = exhaustive exact count (count() contract)
    assert(searcher.totalHits(Term("content", "world"), threshold = 0) ===
      graft.exec.TotalHits(3L, exact = true))
  }

  test("driver entry point returns rows on sf0.001") {
    assume(new java.io.File("/root/testdata/sf0.001/documents.parquet").exists)
    assert(SparkEntry.entry(spark).collect().nonEmpty)
  }

  test("top-k is a prefix of the full ranking") {
    val all = searcher.search(Term("content", "world") | Term("content", "hello"), 0).collect().map(_.getLong(0))
    val top2 = searcher.search(Term("content", "world") | Term("content", "hello"), 2).collect().map(_.getLong(0))
    assert(top2.toSeq === all.take(2).toSeq)
  }

  test("fuzzy: transposed typo matches at distance 1 (FuzzyQuery transpositions=true)") {
    // 'sprak' → 'spark' is ONE edit under damerau, TWO under plain levenshtein
    assert(searcher.count(Fuzzy("content", "sprak", 1)) === 2)
    assert(searcher.count(Fuzzy("content", "sprak", 1, transpositions = false)) === 0)
    // prefixLength anchors the first chars (no expansion beyond the prefix)
    assert(searcher.count(Fuzzy("content", "zpark", 1, prefixLength = 1)) === 0)
    assert(searcher.count(Fuzzy("content", "zpark", 1, prefixLength = 0)) === 2)
    // suggest ranks through damerau too
    val sg = searcher.suggest("content", "sprak").collect().map(_.getString(0))
    assert(sg.head === "spark")
  }

  test("empty-text values contribute no sentinel: docCount counts docs with ≥1 term") {
    val s = spark
    import s.implicits._
    val src = Seq(
      ("r", "p0", "c", "en", "hello world"),
      ("r", "p1", "c", "en", ""),        // analyzes to zero tokens
      ("r", "p2", "c", "", "hello")      // empty keyword value skipped too
    ).toDF("repo", "path", "commit", "lang", "content")
    val idx = IndexBuilder.build(src, schema, 2)
    assert(idx.fieldStats("content") === FieldStats(2, 3)) // p1 not counted
    assert(idx.fieldStats("lang").docCount === 2)          // p2's "" skipped
    val se = new Searcher(idx)
    // docLengths only lists docs holding the field
    assert(se.docLengths("content").collect().map(_.getLong(0)).sorted.toSeq === Seq(0L, 2L))
    // BM25 idf uses the corrected docCount: hello df=2 over docCount=2
    val w = Bm25.idf(2, 2)
    val hit = se.search(Term("content", "hello"), 1).collect()(0)
    assert(math.abs(hit.getDouble(1) - Bm25.score(1, 1, w, 1.5)) < 1e-9)
  }

  test("binary stored values ride the doc store and come back via select= (documents.py:45-48)") {
    val s = spark
    import s.implicits._
    val src = Seq(
      ("r", "p0", "c", "hello world", Array[Byte](1, 2, 3)),
      ("r", "p1", "c", "hello spark", Array[Byte](-1, 0, 127))
    ).toDF("repo", "path", "commit", "content", "blob")
    val idx = IndexBuilder.build(src,
      IndexSchema(Seq("repo", "path", "commit"),
        Map("content" -> TextField("standard", positions = true))), 2)
    val hit = new Searcher(idx).search(Term("content", "spark"), 1, select = Seq("blob"))
      .collect()(0)
    assert(hit.getAs[Array[Byte]]("blob").toSeq === Seq[Byte](-1, 0, 127))
  }

  test("DocIds: negative integral keys order by magnitude (signed-hex encoding)") {
    val s = spark
    import s.implicits._
    val df = Seq(5L, -1L, 0L, -100L, 3L).toDF("k")
    val ids = graft.index.DocIds.assign(df, Seq("k"), 3)
      .select("k", "docId").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.sortBy(_._2).map(_._1).toSeq === Seq(-100L, -1L, 0L, 3L, 5L))
  }
}
