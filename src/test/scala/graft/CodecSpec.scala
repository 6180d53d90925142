package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{Posting, PostingCodec, VByte}
import graft.util.SmallFloat

/** Property-style roundtrip tests with a fixed seed (no external generators:
  * the offline cache has no scalatest↔scalacheck bridge).
  */
class CodecSpec extends AnyFunSuite {
  private def rnd = new scala.util.Random(42)

  test("vbyte roundtrip: longs") {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    val vals = Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Int.MaxValue.toLong, Long.MaxValue)
    vals.foreach(VByte.writeLong(_, buf))
    val r = new VByte.Reader(buf.toArray)
    vals.foreach(v => assert(r.readLong() === v))
    assert(!r.hasNext)
  }

  test("vbyte roundtrip: random ints") {
    val g = rnd
    (1 to 200).foreach { _ =>
      val arr = Array.fill(g.nextInt(500))(g.nextInt(Int.MaxValue))
      assert(VByte.decodeInts(VByte.encodeInts(arr), arr.length).toSeq === arr.toSeq)
    }
  }

  test("smallfloat: exact below 32, monotone, top-5-bit lossy above") {
    (0 until 32).foreach(i => assert(SmallFloat.quantizeLength(i) === i))
    assert(SmallFloat.quantizeLength(33) === 32)
    assert(SmallFloat.quantizeLength(50) === 50) // 0b110010: 5 significant bits — the BM25 anchor
    assert(SmallFloat.quantizeLength(51) === 50)
    assert(SmallFloat.quantizeLength(100) === 100) // 0b1100100 -> exact (low bits 0)
    assert(SmallFloat.quantizeLength(101) === 100)
    assert(SmallFloat.quantizeLength(255) === 248)
    // closed form the SQL oracle uses
    def sqlForm(len: Int): Int =
      if (len < 16) len
      else {
        val numBits = 32 - Integer.numberOfLeadingZeros(len)
        (len >> (numBits - 5)) << (numBits - 5)
      }
    val g = rnd
    var prev = -1
    (0 to 100000).foreach { i =>
      val q = SmallFloat.quantizeLength(i)
      assert(q === sqlForm(i))
      assert(q <= i && q >= prev) // lossy-down and monotone
      prev = q
    }
    (1 to 1000).foreach { _ =>
      val i = g.nextInt(SmallFloat.MaxValue)
      assert(SmallFloat.quantizeLength(i) === sqlForm(i))
    }
    // saturation above the byte-encodable max
    assert(SmallFloat.quantizeLength(SmallFloat.MaxValue + 12345) === SmallFloat.MaxValue)
  }

  private def randomPostings(g: scala.util.Random): List[Posting] = {
    val n = 1 + g.nextInt(300)
    var doc = 0L
    List.fill(n) {
      doc += 1 + g.nextInt(1000)
      val tf = 1 + g.nextInt(50)
      val positions = {
        var p = g.nextInt(5)
        Array.fill(tf) { p += 1 + g.nextInt(7); p }
      }
      Posting(doc, tf, SmallFloat.quantizeLength(tf * 4), positions)
    }
  }

  test("posting block roundtrip with positions + block-max metadata") {
    val g = rnd
    (1 to 50).foreach { _ =>
      val ps = randomPostings(g)
      val blocks = PostingCodec.encodeRun("text", "t", ps.iterator).toList
      assert(blocks.map(_.numDocs).sum === ps.length)
      assert(blocks.forall(_.numDocs <= PostingCodec.BlockSize))
      val decoded = blocks.flatMap(b => PostingCodec.decodeBlock(b, withPositions = true))
      assert(decoded.map(_.docId) === ps.map(_.docId))
      assert(decoded.map(_.tf) === ps.map(_.tf))
      assert(decoded.map(_.dlq) === ps.map(_.dlq))
      decoded.zip(ps).foreach { case (d, p) => assert(d.positions.toSeq === p.positions.toSeq) }
      blocks.foreach { b =>
        val in = ps.filter(p => p.docId >= b.firstDocId && p.docId <= b.lastDocId)
        assert(b.numDocs === in.length) // skip pointers bracket exactly
        assert(b.maxTf === in.map(_.tf).max)
        assert(b.sumTf === in.map(_.tf.toLong).sum)
        assert(b.minDlq === in.map(_.dlq).min)
      }
    }
  }

  test("posting block decode without positions") {
    val ps = Seq(Posting(1, 2, 8, Array(1, 5)), Posting(9, 1, 4, Array(0)))
    val b = PostingCodec.encodeBlock("text", "x", ps)
    val d = PostingCodec.decodeBlock(b, withPositions = false)
    assert(d.map(_.docId).toSeq === Seq(1L, 9L))
    assert(d.forall(_.positions == null))
  }

  test("null positions encode as empty blob (positions disabled)") {
    val ps = Seq(Posting(1, 2, 8, null), Posting(9, 1, 4, null))
    val b = PostingCodec.encodeBlock("text", "x", ps)
    assert(b.positionsBlob.isEmpty)
    val d = PostingCodec.decodeBlock(b, withPositions = true)
    assert(d.map(_.tf).toSeq === Seq(2, 1))
    assert(d.forall(_.positions == null))
  }

  test("highlighter is offset-safe for pre-rewriting analyzers (code)") {
    import graft.analysis.Analyzers
    import graft.exec.Highlighter
    // the code analyzer splits camelCase by inserting spaces — offsets refer
    // to that preprocessed view; highlighting must not over/under-slice
    val out = Highlighter.highlight(Analyzers.code, Set("merge"), "parseBuild merge", 1)
    assert(out === "parse Build <b>merge</b>")
    val out2 = Highlighter.highlight(Analyzers.code, Set("build"), "parseBuildMerge tail", 1)
    assert(out2.contains("<b>Build</b>"))
  }

  test("parser robustness: trailing boost/fuzzy markers do not crash") {
    import graft.query._
    val p = new QueryParser("f", graft.analysis.Analyzers.standard)
    assert(p.parse("hello^") === Term("f", "hello"))
    assert(p.parse("word~abc").isInstanceOf[Query]) // no NumberFormatException
    assert(p.parse("term~1") === Fuzzy("f", "term", 1))
    assert(p.parse("boosted^2.5") === Boost(Term("f", "boosted"), 2.5))
  }

  test("parser: multi-token bare word → Bool under default op (autoGeneratePhraseQueries=false)") {
    import graft.query._
    val p = new QueryParser("f", graft.analysis.Analyzers.standard)
    assert(p.parse("well-known") ===
      Bool(Seq(Occur.Should -> Term("f", "well"), Occur.Should -> Term("f", "known"))))
    val pAnd = new QueryParser("f", graft.analysis.Analyzers.standard, op = "and")
    assert(pAnd.parse("well-known") ===
      Bool(Seq(Occur.Must -> Term("f", "well"), Occur.Must -> Term("f", "known"))))
    // quoted input still parses as a phrase
    assert(p.parse("\"well known\"") ===
      Phrase("f", Seq(Some("well"), Some("known")), 0))
  }

  test("posting block roundtrip with payloads + offsets") {
    val r = rnd
    val run = (0 until 64).scanLeft(0L)((d, _) => d + 1 + r.nextInt(50)).tail.map { docId =>
      val tf = 1 + r.nextInt(5)
      var pos = -1
      val positions = Array.fill(tf) { pos += 1 + r.nextInt(9); pos }
      val payloads = positions.map(p => s"pay$p".getBytes("UTF-8"))
      var start = 0
      val offsets = positions.flatMap { _ =>
        start += 1 + r.nextInt(20)
        val end = start + 1 + r.nextInt(10)
        Seq(start, end)
      }
      Posting(docId, tf, 1 + r.nextInt(30), positions, payloads, offsets)
    }
    val block = PostingCodec.encodeBlock("f", "t", run)
    val back = PostingCodec.decodeBlock(block, withPositions = true,
      withPayloads = true, withOffsets = true)
    run.zip(back).foreach { case (a, b) =>
      assert(a.docId === b.docId && a.tf === b.tf && a.dlq === b.dlq)
      assert(a.positions.toSeq === b.positions.toSeq)
      assert(a.payloads.map(new String(_, "UTF-8")).toSeq ===
        b.payloads.map(new String(_, "UTF-8")).toSeq)
      assert(a.offsets.toSeq === b.offsets.toSeq)
    }
    // decoding without the extras skips them
    val lean = PostingCodec.decodeBlock(block, withPositions = false)
    assert(lean.forall(p => p.payloads == null && p.offsets == null))
  }

  test("multi-field parse: per-clause field expansion (test_engine.py:43-46)") {
    import graft.query._
    // str(stemmer.parse("searches", field=["body","title"])) == "body:search title:search"
    val p = new QueryParser(Seq("body" -> 1.0, "title" -> 1.0),
      graft.analysis.Analyzers.byName("porter"), "or")
    assert(p.parse("searches") ===
      Bool(Seq(Occur.Should -> Term("body", "search"), Occur.Should -> Term("title", "search"))))
    // boosts: "(body:search)^1.0 (title:search)^2.0"
    val pb = new QueryParser(Seq("body" -> 1.0, "title" -> 2.0),
      graft.analysis.Analyzers.byName("porter"), "or")
    assert(pb.parse("searches") ===
      Bool(Seq(Occur.Should -> Term("body", "search"),
        Occur.Should -> Boost(Term("title", "search"), 2.0))))
    // op=and: EACH clause must match in SOME field (per-clause groups)
    val pAnd = new QueryParser(Seq("f1" -> 1.0, "f2" -> 1.0),
      graft.analysis.Analyzers.standard, "and")
    assert(pAnd.parse("right people") === Bool(Seq(
      Occur.Must -> Bool(Seq(Occur.Should -> Term("f1", "right"), Occur.Should -> Term("f2", "right"))),
      Occur.Must -> Bool(Seq(Occur.Should -> Term("f1", "people"), Occur.Should -> Term("f2", "people"))))))
    // explicit field: prefix suppresses expansion
    assert(pAnd.parse("f9:only") === Term("f9", "only"))
    // an atom analyzing to zero tokens drops out even with field boosts —
    // Boost(NoDocs) must never survive as an impossible MUST clause
    val pBoosted = new QueryParser(Seq("f1" -> 2.0, "f2" -> 3.0),
      graft.analysis.Analyzers.standard, "and")
    // (single surviving clause unwraps from the top-level Bool)
    assert(pBoosted.parse("é spark") === Bool(Seq(
      Occur.Should -> Boost(Term("f1", "spark"), 2.0),
      Occur.Should -> Boost(Term("f2", "spark"), 3.0))))
    // per-field analyzers: each field's clause uses ITS index's analyzer
    val mixed = new QueryParser(Seq("body" -> 1.0, "title" -> 1.0),
      (f: String) => if (f == "title") graft.analysis.Analyzers.byName("porter")
                     else graft.analysis.Analyzers.standard, "or")
    assert(mixed.parse("searches") === Bool(Seq(
      Occur.Should -> Term("body", "searches"),   // standard: unstemmed
      Occur.Should -> Term("title", "search")))) // porter: stemmed
  }

  test("EditDistance.damerau: OSA semantics (transposition = 1 edit)") {
    import graft.util.EditDistance.damerau
    assert(damerau("spark", "spark") === 0)
    assert(damerau("sprak", "spark") === 1) // adjacent transposition
    assert(damerau("sprak", "sparks") === 2)
    assert(damerau("", "abc") === 3 && damerau("abc", "") === 3)
    assert(damerau("kitten", "sitting") === 3) // plain levenshtein agrees
    assert(damerau("ca", "abc") === 3) // RESTRICTED: no edit inside a transposed pair
    assert(damerau("ab", "ba") === 1)
  }

  test("analyzers: standard, whitespace, code") {
    import graft.analysis.Analyzers
    assert(Analyzers.standard.terms("Hello, World! don't U.S.C. x_1").toSeq ===
      Seq("hello", "world", "don't", "u.s.c", "x_1"))
    assert(Analyzers.whitespace.terms("Hello,  World!").toSeq === Seq("Hello,", "World!"))
    assert(Analyzers.code.terms("parseHTTPResponse snake_case fooBar x9y").toSeq ===
      Seq("parse", "HTTPResponse".toLowerCase, "snake", "case", "foo", "bar", "x9y"))
    val toks = Analyzers.standard.tokens("a b a")
    assert(toks.map(t => (t.term, t.pos)) === Seq(("a", 0), ("b", 1), ("a", 2)))
    assert(toks.map(t => (t.startOffset, t.endOffset)) === Seq((0, 1), (2, 3), (4, 5)))
  }
}
