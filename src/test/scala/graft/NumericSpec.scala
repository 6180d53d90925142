package graft

import java.nio.file.{Files, Paths}

import graft.exec.{Searcher, SortSpec}
import graft.index._
import graft.query.{Query => Q, _}

case class AmendmentDoc(ord: Int, amendment: Long, dateEpoch: Double, size: Long)

/** Numeric point/range + calendar golds over the amendments-only corpus
  * (/root/reference/tests/test_engine.py:534-575 test_numeric).
  */
class NumericSpec extends SparkTestBase {

  def available: Boolean = Files.exists(Paths.get("/root/reference/tests/fixtures/constitution.txt"))

  lazy val searcher: Searcher = {
    val s = spark
    import s.implicits._
    val docs = new ConstitutionSpec().parseCorpus().filter(_.amendment != null)
    val rows = docs.zipWithIndex.map { case (d, i) =>
      val Array(y, m, dd) = d.date.split("-").map(_.toInt)
      AmendmentDoc(i, d.amendment.toLong, DateTimeRanges.timestamp(Seq(y, m, dd)), d.text.length.toLong)
    }
    val schema = IndexSchema(keyColumns = Seq("ord"), fields = Map.empty)
    new Searcher(IndexBuilder.build(spark.createDataset(rows).toDF(), schema, 4).cached())
  }

  test("date prefix/range/duration golds (test_engine.py:544-561)") {
    assume(available)
    assert(searcher.count(DateTimeRanges.prefix("dateEpoch", Seq(1791, 12))) === 10)
    // range(None, (1921,12), lower=False, upper=True)
    assert(searcher.count(NumRanges("dateEpoch",
      Seq((None, Some(DateTimeRanges.timestamp(Seq(1921, 12))))),
      includeLower = false, includeUpper = true)) === 19)
    val hits = searcher.search(
      DateTimeRanges.range("dateEpoch", Some(Seq(1919, 1, 1)), Some(Seq(1921, 12, 31))),
      0, select = Seq("amendment")).collect()
    assert(hits.map(_.getAs[Long]("amendment")).sorted.toSeq === Seq(18L, 19L))
    // duration([2009], days=-100*365) -> 12 amendments in [1909-ish, 2009]
    assert(searcher.count(DateTimeRanges.duration("dateEpoch",
      java.time.LocalDateTime.of(2009, 1, 1, 0, 0), days = -100L * 365)) === 12)
    // within(seconds) of now -> nothing (all dates past)
    assert(searcher.count(DateTimeRanges.within("dateEpoch",
      java.time.LocalDateTime.of(2026, 1, 1, 0, 0), days = 1)) === 0)
  }

  test("numeric ranges partition + sorted top-k prefix (test_engine.py:562-574)") {
    assume(available)
    val sizes = searcher.index.docs.select("docId", "size").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val big = sizes.filter(_._2 >= 1000).toSeq.sortBy { case (id, sz) => (sz, id) }.map(_._1)
    val hits = searcher.search(Q.ranges("size", (Some(1000.0), None)), 0,
      sorts = Seq(SortSpec("size"))).collect().map(_.getLong(0))
    assert(hits.toSeq === big)
    val top3 = searcher.search(Q.ranges("size", (Some(1000.0), None)), 3,
      sorts = Seq(SortSpec("size"))).collect().map(_.getLong(0))
    assert(top3.toSeq === big.take(3))
    assert(searcher.count(Q.ranges("size", (None, Some(1000.0)))) === sizes.size - big.size)
    // points query
    val one = searcher.search(Q.points("amendment", 1.0), 0, select = Seq("amendment")).collect()
    assert(one.length === 1 && one(0).getAs[Long]("amendment") === 1L)
  }
}
