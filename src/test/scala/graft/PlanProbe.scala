package graft
import org.apache.spark.sql.SparkSession
import graft.fixtures.CodeCorpus
import graft.index._
import graft.exec.Searcher
import graft.query.{Query => Q, _}

/** Physical-plan evidence for the key query shapes: exchange counts,
  * codegen spans, parquet pushdown, top-k operator, and the bucket
  * semi-join that prunes wider terms' blocks in positional/conjunctive
  * queries. Queries are EXECUTED first so AQE's final plan is inspected,
  * not the pre-execution placeholder.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("planprobe").toString
    val schema = IndexSchema(Seq("repo","path","commit"),
      Map("content" -> TextField("code", true), "lang" -> KeywordField))
    IndexBuilder.build(CodeCorpus.generate(spark, 5000, 8), schema, 8).save(dir)
    val s = new Searcher(IndexBuilder.load(spark, dir))
    def probe(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.collect() // materialize so AQE finalizes the plan
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(p).length
      // codegen stages render as "*(n) Operator" in the final plan string
      val wsc = """\*\(\d+\)""".r.findAllIn(p).toSeq.distinct.length
      println(s"== $label: exchanges=$ex codegenSpans=$wsc " +
        s"pushed=${p.contains("PushedFilters: [IsNotNull")} " +
        s"takeOrdered=${p.contains("TakeOrderedAndProject")} " +
        s"bucketSemiJoin=${p.contains("LeftSemi")} " +
        s"broadcast=${p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin")}")
    }
    probe("term_topk", s.search(Term("content","parse"), 10))
    probe("bool_or (WAND)", s.search(Q.any(Term("content","parse"), Term("content","merge")), 10))
    probe("bool_and (conjunction intersect)", s.search(Q.all(Term("content","parse"), Term("content","merge")), 10))
    probe("bool_and rare+hot", s.search(Q.all(Term("content","scanhash"), Term("content","def")), 10))
    probe("phrase (bucket intersect)", s.search(Q.phrase("content","we","the","people"), 10))
    probe("span_containing", s.spans(
      SpanQ.near(Seq(Q.span("content","parse"), Q.span("content","merge")), slop = 5, inOrder = true)
        .containing(Q.span("content","def"))))
    probe("facets", s.facets(Term("content","parse"), "lang"))
    probe("groupby (no global window)", s.groupBy("lang", Term("content","parse"), groups = 2))
    probe("sorted", s.search(Term("content","parse"), 10, sorts=Seq(graft.exec.SortSpec("lang"))))
    probe("fuzzy (trigram-prefiltered expansion)", s.search(Fuzzy("content","mergebatch",1), 10))
    probe("facets_multi (one pass, N fields)",
      s.facetsMulti(Term("content","parse"), Seq("lang","repo")))
    println(s.search(Term("content","parse"), 10).queryExecution.executedPlan.toString
      .linesIterator.take(30).mkString("\n"))
    spark.stop()
  }
}
