package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.index._
import graft.exec.{Searcher, SortSpec}
import graft.query.{Query => Q, _}

/** Golden-value parity with the reference test suite
  * (/root/reference/tests/test_engine.py, test_rest.py, test_graphql.py) on
  * the same public-domain corpus (US constitution, 35 docs, parsed exactly
  * like tests/conftest.py:56-69). The corpus text is read from the reference
  * checkout at test time; the suite is skipped if it is absent.
  */
case class ConDoc(ord: Int, article: String, amendment: String, date: String,
    year: java.lang.Long, text: String)

class ConstitutionSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  val fixturePath = "/root/reference/tests/fixtures/constitution.txt"
  def available: Boolean = Files.exists(Paths.get(fixturePath))

  def parseCorpus(): Seq[ConDoc] = {
    val lines = Files.readAllLines(Paths.get(fixturePath)).asScala.toVector
    val docs = scala.collection.mutable.ArrayBuffer.empty[ConDoc]
    var header: Option[String] = None
    var body = new StringBuilder
    def flush(): Unit = header.foreach { h =>
      val stripped = h.reverse.dropWhile(c => c == '.' || c == '\n').reverse
      val Array(kind, rest) = stripped.split("\\s+", 2)
      if (kind == "Article")
        docs += ConDoc(docs.length, rest, null, null, null, body.toString)
      else {
        val Array(num, mdY) = rest.split("\\s+")
        val Array(m, d, y) = mdY.split("/")
        val date = f"${y.toInt}%04d-${m.toInt}%02d-${d.toInt}%02d"
        docs += ConDoc(docs.length, null, num, date, y.toLong, body.toString)
      }
    }
    lines.foreach { l =>
      if (l.startsWith("Article ") || l.startsWith("Amendment ")) {
        flush(); header = Some(l); body = new StringBuilder
      } else body.append(l).append("\n")
    }
    flush()
    docs.toSeq
  }

  lazy val searcher: Searcher = {
    val s = spark
    import s.implicits._
    val df = spark.createDataset(parseCorpus()).toDF()
    val schema = IndexSchema(
      keyColumns = Seq("ord"),
      fields = Map(
        "text" -> TextField("standard", positions = true, offsets = true),
        "article" -> KeywordField,
        "amendment" -> KeywordField,
        "date" -> KeywordField))
    new Searcher(IndexBuilder.build(df, schema, numPartitions = 4).cached())
  }

  def assumeFixture(): Unit = assume(available, "reference fixture not present")

  test("corpus shape: 35 docs, articles Preamble+1..7, amendments 1..27") {
    assumeFixture()
    assert(searcher.index.numDocs === 35)
    val articles = searcher.terms("article").collect().map(_.getString(0)).toSet
    assert(articles === (1 to 7).map(_.toString).toSet + "Preamble")
    val amendments = searcher.terms("amendment").collect().map(_.getString(0)).map(_.toInt).sorted
    assert(amendments.toSeq === (1 to 27))
  }

  test("terms: right/rights counts (test_engine.py:140-152)") {
    assumeFixture()
    val t = searcher.terms("text", prefix = "right", counts = true).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(t.toSeq === Seq("right" -> 13L, "rights" -> 1L))
    val slice = searcher.terms("text", prefix = "right", stop = "right_", counts = true).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(slice.toSeq === Seq("right" -> 13L))
    val fuzzy1 = searcher.terms("text", prefix = "right", counts = true, distance = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(fuzzy1.toSeq === Seq("eight" -> 3L, "right" -> 13L, "rights" -> 1L))
    // the fuzzy prefix knob (reference terms(..., prefix=N), indexers.py:220-246):
    // minPrefix=1 pins the first character, excluding 'eight'
    val pinned = searcher.terms("text", prefix = "right", distance = 1, minPrefix = 1)
      .collect().map(_.getString(0))
    assert(pinned.toSeq === Seq("right", "rights"))
  }

  test("terms: senite distance 2 (test_engine.py:153)") {
    assumeFixture()
    val t = searcher.terms("text", prefix = "senite", distance = 2).collect().map(_.getString(0))
    assert(t.toSeq === Seq("senate", "sent"))
  }

  test("people: count 8; top-5 is prefix of full ranking (test_engine.py:161-171)") {
    assumeFixture()
    assert(searcher.docFreq("text", "people") === 8L)
    val all = searcher.search(Term("text", "people"), 0).collect().map(_.getLong(0))
    assert(all.length === 8)
    val top5 = searcher.search(Term("text", "people"), 5).collect().map(_.getLong(0))
    assert(top5.toSeq === all.take(5).toSeq)
  }

  test("phrase 'We the People' hits only the Preamble (test_engine.py:158-160)") {
    assumeFixture()
    val hits = searcher.search(searcher.parse("\"We the People\"", "text"), 0,
      select = Seq("article")).collect()
    assert(hits.length === 1)
    assert(hits(0).getAs[String]("article") === "Preamble")
  }

  test("freedom hits amendment 1 (test_engine.py:172-175)") {
    assumeFixture()
    val hits = searcher.search(searcher.parse("freedom", "text"), 0, select = Seq("amendment")).collect()
    assert(hits.length === 1)
    assert(hits(0).getAs[String]("amendment") === "1")
  }

  test("date:[1919 TO 1921] → amendments 18,19 (test_engine.py:176-181)") {
    assumeFixture()
    val q = searcher.parse("date:[1919 TO 1921]", "text")
    val hits = searcher.search(q, 0, select = Seq("amendment")).collect()
      .map(_.getAs[String]("amendment")).sorted
    assert(hits.toSeq === Seq("18", "19"))
  }

  test("near persons/papers slop 2 hits amendment 4 (test_engine.py:186-190)") {
    assumeFixture()
    val q = Near("text", Seq("persons", "papers"), slop = 2, inOrder = true)
    val hits = searcher.search(q, 0, select = Seq("amendment")).collect()
    assert(hits.map(_.getAs[String]("amendment")).toSeq === Seq("4"))
    // span count == docFreq for single-term span (test_engine.py:182-185)
    assert(searcher.count(Near("text", Seq("persons"), 0, inOrder = true)) ===
      searcher.docFreq("text", "persons"))
  }

  test("termvector/positionvector/spans golds (test_engine.py:186-195)") {
    assumeFixture()
    val amendment4 = 8L + 3L // Preamble + 7 articles, then amendments in order
    val tv = searcher.termVector(amendment4, "text")
    assert(tv("persons") === 2)
    val pv = searcher.positionVector(amendment4, "text")
    assert(pv("persons").map(_._1) === Seq(10, 48))
    val pvo = searcher.positionVector(amendment4, "text", offsets = true)
    assert(pvo("persons") === Seq((46, 53), (301, 308)))
    val sp = searcher.spans(Near("text", Seq("persons", "papers"), slop = 2, inOrder = true)).collect()
    assert(sp.length === 1 && sp(0).getLong(0) === amendment4)
    val spans = sp(0).getSeq[org.apache.spark.sql.Row](1).map(r => (r.getInt(0), r.getInt(1)))
    assert(spans === Seq((10, 13)))
    // offsets read FROM THE INDEX (positions(offsets=True), indexers.py:256-275)
    val off = searcher.positions("text", "persons", offsets = true).collect()
      .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getInt(0), x.getInt(1)))).toMap
    assert(off(amendment4) === Seq((46, 53), (301, 308)))
    assert(off.keySet === searcher.positions("text", "persons").collect().map(_.getLong(0)).toSet)
  }

  test("complete (test_engine.py:215-221)") {
    assumeFixture()
    assert(searcher.complete("missing", "", 1).collect().isEmpty)
    assert(searcher.complete("text", "", 2).collect().map(_.getString(0)).toSeq === Seq("the", "shall"))
    assert(searcher.complete("text", "con", 2).collect().map(_.getString(0)).toSeq ===
      Seq("congress", "constitution"))
    assert(searcher.complete("text", "congress", 2).collect().map(_.getString(0)).toSeq === Seq("congress"))
    assert(searcher.complete("text", "congresses", 1).collect().isEmpty)
  }

  test("suggest (test_engine.py:222-224)") {
    assumeFixture()
    assert(searcher.suggest("text", "write", 1).collect().map(_.getString(0)).toSeq === Seq("writs"))
    assert(searcher.suggest("text", "write", 3).collect().map(_.getString(0)).toSeq ===
      Seq("writs", "writ", "written"))
    assert(searcher.suggest("text", "write", 3, maxEdits = 1).collect().map(_.getString(0)).toSeq ===
      Seq("writs", "writ"))
  }

  test("spellcheck parse rewrites (test_engine.py:225-229)") {
    assumeFixture()
    assert(searcher.parse("text:write", "text", spellcheck = true) === Term("text", "writs"))
    assert(searcher.parse("\"hello world\"", "text", spellcheck = true) ===
      Phrase("text", Seq(Some("held"), Some("would")), 0))
    assert(searcher.parse("vwxyz", "text", spellcheck = true) === Term("text", "vwxyz"))
  }

  test("morelikethis includes united/states (test_engine.py:196-201)") {
    assumeFixture()
    val q = searcher.morelikethis(0, "text", minTermFreq = 2, minDocFreq = 2)
    val terms = q match { case Bool(cs) => cs.map(_._2).collect { case Term(_, t) => t }.toSet; case _ => Set.empty[String] }
    assert(Set("united", "states").subsetOf(terms))
  }

  test("morelikethis from raw text: 'jury' → text:jury; empty on absent field (test_engine.py:202-206)") {
    assumeFixture()
    val q = searcher.morelikethisText("jury", "text", minDocFreq = 4, minTermFreq = 1)
    assert(q === Q.any(Term("text", "jury")))
    // a field with no stats yields the empty query (reference: "" string form)
    assert(searcher.morelikethisText("jury", "article") === NoDocs)
    // and the ranked-OR form still works from external text never indexed
    val q2 = searcher.morelikethisText("united states of united states", "text",
      minTermFreq = 2, minDocFreq = 2)
    val terms = q2 match {
      case Bool(cs) => cs.map(_._2).collect { case Term(_, t) => t }.toSet
      case Term(_, t) => Set(t)
      case _ => Set.empty[String]
    }
    assert(Set("united", "states").subsetOf(terms))
  }

  test("BM25 score anchor: text:right count 13, top id 9, doc 33 score 0.648349") {
    assumeFixture()
    // test_rest.py:42-48 (count/top id), test_graphql.py:56-65 (exact score)
    val hits = searcher.search(Term("text", "right"), 0).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits.length === 13)
    assert(hits.head._1 === 9L)
    val s33 = hits.find(_._1 == 33L).map(_._2).getOrElse(Double.NaN)
    assert(math.abs(s33 - 0.648349) < 1e-6, s"doc33 score was $s33")
  }

  test("highlight: word <b>right</b> word (test_engine.py:588-592)") {
    assumeFixture()
    val out = searcher.highlight(Term("text", "right"), "text", "word right word")
    assert(out === "word <b>right</b> word")
  }

  test("batch highlights on hits (test_engine.py:593-597)") {
    assumeFixture()
    val q = Term("text", "right")
    val hl = searcher.search(q, 0, select = Seq("text"))
      .withColumn("hl", searcher.highlightCol(q, "text"))
      .collect()
    assert(hl.length === 13)
    // original-case term wrapped (reference wraps the stored text verbatim)
    hl.foreach(r => assert(r.getAs[String]("hl").toLowerCase.contains("<b>right</b>")))
  }

  test("bestPassages: density selection, earliest-tie, tag-stripped-highlight parity") {
    assumeFixture()
    import graft.analysis.Analyzers
    val text = "No right here at all. right and right again, right! just one right. nothing."
    // densest passage wins (3 hits beats 1 and 1)
    val best = graft.exec.Highlighter.bestPassages(Analyzers.standard, Set("right"), text)
    assert(best === Vector("right and right again, right!"))
    // tie on hits: document order (stable sort keeps the earlier passage)
    val tie = graft.exec.Highlighter.bestPassages(Analyzers.standard, Set("nothing", "no"), text)
    assert(tie === Vector("No right here at all."))
    // parity: bestPassages == highlight with the <b></b> tags stripped
    for (mp <- 1 to 3) {
      val hl = graft.exec.Highlighter.highlight(Analyzers.standard, Set("right"), text, mp)
      val bp = graft.exec.Highlighter.bestPassages(Analyzers.standard, Set("right"), text, mp)
      assert(bp.mkString("...") === hl.replace("<b>", "").replace("</b>", ""))
    }
    // no hits anywhere -> empty (highlight's "" contract)
    assert(graft.exec.Highlighter.bestPassages(Analyzers.standard, Set("absent"), text).isEmpty)
    // column surface over the searcher's analyzer
    val q = Term("text", "right")
    val col1 = searcher.search(q, 1, select = Seq("text"))
      .withColumn("p", searcher.bestPassageCol(q, "text"))
      .collect()
    assert(col1.forall(_.getAs[String]("p").toLowerCase.contains("right")))
    assert(col1.forall(!_.getAs[String]("p").contains("<b>")))
  }

  test("leading wildcard + index-order sort (test_engine.py:104,168)") {
    assumeFixture()
    // '*hello'-style leading wildcard (allowLeadingWildcard)
    val q = searcher.parse("text:*ights", "text")
    assert(q === Wildcard("text", "*ights"))
    assert(searcher.count(q) === 2) // docs containing terms ending in 'ights' (rights, weights)
    // sort=INDEXORDER: docId-ascending with scores retained
    val hits = searcher.search(Term("text", "people"), 5,
      sorts = Seq(graft.exec.SortSpec("docId"))).collect()
    val ids = hits.map(_.getLong(0))
    assert(ids.toSeq === ids.sorted.toSeq)
    assert(hits.forall(_.getAs[Double]("score") > 0))
  }

  test("parser: default OR vs op=and (test_engine.py:103)") {
    assumeFixture()
    assert(searcher.count(searcher.parse("text:right people", "text")) > 0)
    val orQ = searcher.parse("right people", "text")
    val andQ = searcher.parse("right people", "text", op = "and")
    val (orN, andN) = (searcher.count(orQ), searcher.count(andQ))
    assert(orN + andN === 13L + 8L) // inclusion–exclusion over df(right), df(people)
    assert(andN > 0 && andN < orN)
  }
}
