package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.exec.Searcher
import graft.index._
import graft.query.{Query => Q, _}

case class ZipDoc(ord: Int, zipcode: String, latitude: String, longitude: String,
    state: String, city: String, county: String, location: String)

/** Golden parity with the reference's zipcodes grouping/facets/nested-field
  * suite (/root/reference/tests/test_engine.py:360-397), same CSV fixture
  * read from the reference at test time (subset CA/AK/WY/PR, conftest
  * parsing: city/county title-cased, lat/lng "%08.3f").
  */
class ZipcodesSpec extends SparkTestBase {

  val fixturePath = "/root/reference/tests/fixtures/zipcodes.txt"
  def available: Boolean = Files.exists(Paths.get(fixturePath))

  /** Python str.title() equivalent for ASCII. */
  def title(s: String): String = {
    val sb = new StringBuilder
    var prevAlpha = false
    s.foreach { c =>
      sb.append(if (c.isLetter && !prevAlpha) c.toUpper else c.toLower)
      prevAlpha = c.isLetter
    }
    sb.toString
  }

  def parse(): Seq[ZipDoc] = {
    val states = Set("CA", "AK", "WY", "PR")
    Files.readAllLines(Paths.get(fixturePath)).asScala
      .map(_.split(","))
      .filter(a => states(a(3)))
      .zipWithIndex
      .map { case (Array(zip, lat, lng, state, city, county), i) =>
        val (c2, c3) = (title(city), title(county))
        ZipDoc(i, zip, f"${lat.toDouble}%08.3f", f"${lng.toDouble}%08.3f",
          state, c2, c3, s"$state.$c3.$c2")
      }.toSeq
  }

  lazy val searcher: Searcher = {
    val s = spark
    import s.implicits._
    val df = spark.createDataset(parse()).toDF()
      .withColumnRenamed("location", "state.county.city")
    val schema = IndexSchema(
      keyColumns = Seq("ord"),
      fields = Map(
        "zipcode" -> KeywordField,
        "state.county.city" -> NestedField(".")))
    new Searcher(IndexBuilder.build(df, schema, numPartitions = 4).cached())
  }

  def assumeFixture(): Unit = assume(available, "reference fixture not present")

  test("nested components: states and CA counties (test_engine.py:371-378)") {
    assumeFixture()
    val states = searcher.terms("state").collect().map(_.getString(0))
    assert(states.head === "AK" && states.last === "WY")
    val counties = searcher.terms("state.county", prefix = "CA").collect()
      .map(_.getString(0).split('.').last)
    assert(counties.head === "Alameda" && counties.last === "Yuba")
    // hits of prefix query on the component field cover the same counties
    val hitCounties = searcher.search(searcher.nestedPrefix("state.county.city", "CA"), 0,
      select = Seq("county")).collect().map(_.getAs[String]("county")).distinct.sorted
    assert(hitCounties.toSeq === counties.toSeq)
  }

  test("CA.Los Angeles cities (test_engine.py:378-381)") {
    assumeFixture()
    val cities = searcher.terms("state.county.city", prefix = "CA.Los Angeles").collect()
      .map(_.getString(0).split('.').last)
    assert(cities.head === "Acton" && cities.last === "Woodland Hills")
    val hitCities = searcher.search(searcher.nestedPrefix("state.county.city", "CA.Los Angeles"), 0,
      select = Seq("city")).collect().map(_.getAs[String]("city")).distinct.sorted
    assert(hitCities.toSeq === cities.toSeq)
  }

  test("zipcode 90210 → Beverly Hills (test_engine.py:382-384)") {
    assumeFixture()
    val hit = searcher.search(Term("zipcode", "90210"), 0,
      select = Seq("state", "county", "city", "longitude")).collect()
    assert(hit.length === 1)
    assert(hit(0).getAs[String]("state") === "CA")
    assert(hit(0).getAs[String]("county") === "Los Angeles")
    assert(hit(0).getAs[String]("city") === "Beverly Hills")
    assert(hit(0).getAs[String]("longitude") === "-118.406")
  }

  test("facets on component field under zipcode:90* (test_engine.py:385-393)") {
    assumeFixture()
    val f = searcher.facets(Prefix("zipcode", "90"), "state.county").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nonzero = f.filter(_._2 > 0).keys.toSeq.sorted
    assert(nonzero === Seq("CA.Los Angeles", "CA.Orange"))
    assert(f("CA.Los Angeles") > 100 && f("CA.Orange") > 10)
    assert(f("CA.Los Angeles") === 264)
    // facet-queries variant: identical counts per CA.* county
    val caTerms = searcher.terms("state.county", prefix = "CA.").collect().map(_.getString(0))
    val byQuery = searcher.facetQueries(Prefix("zipcode", "90"),
      caTerms.map(t => t -> (Term("state.county", t): Q)).toMap)
    assert(byQuery("CA.Los Angeles") === 264L)
    assert(byQuery.values.sum === f.values.sum)
  }

  test("groupby: top group CA.Los Angeles (test_engine.py:394-397)") {
    assumeFixture()
    val g = searcher.groupBy("state.county", Term("state", "CA"), groups = 1, docsPerGroup = 1)
      .collect()
    assert(g.length === 1)
    assert(g(0).getString(0) === "CA.Los Angeles")
    assert(g(0).getAs[Long]("groupCount") > 100)
  }

  test("GroupingSearch options: value sort + allGroups (test_engine.py:398-403)") {
    assumeFixture()
    // sort=sortfield(field), allGroups=True over alldocs: every group has a
    // positive count; there are >100 groups; groups ⊇ the zipcode:90* facets
    val all = searcher.groupBy("state.county", AllDocs, groups = 0, docsPerGroup = 1,
      byValue = true).collect()
    assert(all.length > 100)
    assert(all.forall(_.getAs[Long]("groupCount") > 0))
    val values = all.map(_.getString(0))
    assert(values.toSeq === values.sorted.toSeq) // value-ordered
    val facetVals = searcher.facets(Prefix("zipcode", "90"), "state.county").collect()
      .map(_.getString(0)).toSet
    assert(facetVals.subsetOf(values.toSet))
  }

  test("filtered copy (test_engine.py:399-409)") {
    assumeFixture()
    val total = searcher.index.numDocs
    val caCount = searcher.count(Term("state", "CA"))
    assert(caCount === 2647) // CA subset gold (test_engine.py:427)
    val ca = searcher.copyIndex(Term("state", "CA"))
    assert(ca.numDocs === caCount)
    val caSearcher = new Searcher(ca)
    assert(caSearcher.terms("state").collect().map(_.getString(0)).toSeq === Seq("CA"))
    val rest = searcher.copyIndex(Term("state", "CA"), exclude = true)
    assert(rest.numDocs + caCount === total)
    assert(!new Searcher(rest).terms("state").collect().map(_.getString(0)).contains("CA"))
  }
}
