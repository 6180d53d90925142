package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.exec.Searcher
import graft.index._
import graft.query._
import graft.streaming.StreamingIndexer

/** Structured-Streaming incremental indexing: micro-batches become atomic
  * segments; the committed view refreshes by re-opening.
  */
case class StreamDoc(repo: String, path: String, commit: String, lang: String, content: String)

class StreamingSpec extends SparkTestBase {
  type Doc = StreamDoc
  val Doc = StreamDoc

  val schema = IndexSchema(
    keyColumns = Seq("repo", "path", "commit"),
    fields = Map("content" -> TextField("standard", positions = true)))

  test("micro-batches append segments; reopen sees new docs; docIds stay dense") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val source = MemoryStream[StreamDoc]
    val query = StreamingIndexer.start(source.toDF(), schema, dir, ckpt)
    try {
      source.addData(
        Doc("r", "p0", "c", "en", "hello world"),
        Doc("r", "p1", "c", "en", "hello spark"))
      query.processAllAvailable()
      assert(StreamingIndexer.version(spark, dir) === 1L)
      val v1 = new Searcher(StreamingIndexer.open(spark, dir, schema))
      assert(v1.index.numDocs === 2)
      assert(v1.docFreq("content", "hello") === 2)

      source.addData(Doc("r", "p2", "c", "en", "streaming hello index"))
      query.processAllAvailable()
      assert(StreamingIndexer.version(spark, dir) === 2L)
      // the old handle still reads the old snapshot only after refresh
      val v2 = new Searcher(StreamingIndexer.open(spark, dir, schema))
      assert(v2.index.numDocs === 3)
      assert(v2.docFreq("content", "hello") === 3)
      val bucket = 1L << IndexBuilder.SaltShift
      val ids = v2.index.docs.select("docId").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(0L, 1L, bucket)) // new segment at the next salt bucket
      assert(v2.search(Term("content", "streaming"), 10).collect().map(_.getLong(0)).toSeq === Seq(bucket))
      // lineage carries per-segment metrics
      val segs = spark.read.parquet(s"$dir/segments").collect()
      assert(segs.map(_.getAs[Long]("docsIndexed")).sum === 3L)
      // replay idempotence: re-appending batch 1 changes nothing material
      StreamingIndexer.appendSegment(
        Seq(Doc("r", "p2", "c", "en", "streaming hello index")).toDF(), schema, dir, 1L)
      val v3 = new Searcher(StreamingIndexer.open(spark, dir, schema))
      assert(v3.index.numDocs === 3)
      assert(v3.docFreq("content", "hello") === 3)
    } finally query.stop()
  }
}
