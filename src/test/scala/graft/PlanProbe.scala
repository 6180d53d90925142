package graft
import org.apache.spark.sql.SparkSession
import graft.fixtures.CodeCorpus
import graft.index._
import graft.exec.Searcher
import graft.query.{Query => Q, _}
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
    def count(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(p).length
      val wsc = "WholeStageCodegen".r.findAllIn(p).length
      println(s"== $label: exchanges=$ex codegenSpans=$wsc " +
        s"pushed=${p.contains("PushedFilters: [IsNotNull")} takeOrdered=${p.contains("TakeOrderedAndProject")}")
    }
    count("term_topk", s.search(Term("content","parse"), 10))
    count("bool_or (WAND)", s.search(Q.any(Term("content","parse"), Term("content","merge")), 10))
    count("bool_and", s.search(Q.all(Term("content","parse"), Term("content","merge")), 10))
    count("phrase", s.search(Q.phrase("content","we","the","people"), 10))
    count("facets", s.facets(Term("content","parse"), "lang"))
    count("sorted", s.search(Term("content","parse"), 10, sorts=Seq(graft.exec.SortSpec("lang"))))
    println(s.search(Term("content","parse"), 10).queryExecution.executedPlan.toString.linesIterator.take(30).mkString("\n"))
    spark.stop()
  }
}
