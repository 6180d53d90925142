package graft.index

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.exec.Searcher
import graft.query.Query
import graft.streaming.StreamingIndexer

/** Writer + searcher facade with the reference's UX
  * (engine.Indexer: add → commit → search; delete/update;
  * /root/reference/lupyne/engine/indexers.py:614-661): buffered docs become
  * one atomic segment per commit; deletes persist as a tombstone table and
  * apply on open; `refresh()` re-resolves the latest committed view.
  *
  * This is the small-batch/driver-side door into the same segment machinery
  * the bulk paths use ([[IndexBuilder]], [[CheckpointedBuild]],
  * [[graft.streaming.StreamingIndexer]]).
  */
final class Indexer(
    val spark: SparkSession,
    val dir: String,
    val schema: IndexSchema,
    val sourceSchema: StructType
) {
  private val buf = ArrayBuffer.empty[Row]
  private val pendingDeletes = ArrayBuffer.empty[Query]
  private var cachedSearcher: Option[Searcher] = None

  private def fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Buffer one document (field → value map; missing fields become null). */
  def add(doc: (String, Any)*): Unit = {
    val m = doc.toMap
    buf += Row.fromSeq(sourceSchema.fieldNames.toSeq.map(f => m.get(f).orNull))
  }

  /** Queue a delete-by-query, applied at commit (tombstones). */
  def delete(q: Query): Unit = pendingDeletes += q

  /** Atomic delete-by-query + re-add (IndexWriter.update semantics). */
  def update(matchQ: Query, doc: (String, Any)*): Unit = {
    delete(matchQ)
    add(doc: _*)
  }

  private def nextSegId: Long =
    if (!fs.exists(new Path(s"$dir/segments"))) 0L
    else spark.read.parquet(s"$dir/segments").agg(max(col("segmentId")))
      .collect()(0).getInt(0).toLong + 1L

  /** Durably commit buffered adds (one segment) and queued deletes. */
  def commit(): Unit = {
    // deletes resolve against the pre-commit view (delete-then-add order,
    // matching IndexWriter.update)
    val deleteIds =
      if (pendingDeletes.isEmpty || !fs.exists(new Path(s"$dir/segments"))) None
      else {
        val s = searcher
        val ids = pendingDeletes.map(q => s.eval(q).select("docId")).reduce(_ unionByName _)
        Some(ids.distinct().collect().map(_.getLong(0))) // small driver-side batch
      }
    if (buf.nonEmpty) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(buf.toSeq, math.max(1, buf.size / 10000)), sourceSchema)
      StreamingIndexer.appendSegment(df, schema, dir, nextSegId)
      buf.clear()
    }
    deleteIds.filter(_.nonEmpty).foreach { ids =>
      import spark.implicits._
      ids.toSeq.toDF("docId").write.mode("append").parquet(s"$dir/deletes")
    }
    pendingDeletes.clear()
    refresh()
  }

  /** Latest committed view, tombstones applied. A never-committed directory
    * behaves as an empty index (the reference supports querying one).
    */
  def searcher: Searcher = cachedSearcher.getOrElse {
    if (!fs.exists(new Path(s"$dir/segments"))) {
      val empty = IndexBuilder.build(
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sourceSchema), schema)
      val s = new Searcher(empty)
      cachedSearcher = Some(s)
      return s
    }
    val base = StreamingIndexer.open(spark, dir, schema)
    val idx =
      if (fs.exists(new Path(s"$dir/deletes")))
        base.withDeletes(spark.read.parquet(s"$dir/deletes"))
      else base
    val s = new Searcher(idx)
    cachedSearcher = Some(s)
    s
  }

  def refresh(): Unit = cachedSearcher = None

  def count(q: Query): Long = searcher.count(q)
  def search(q: Query, k: Int = 10) = searcher.search(q, k)
  def version: Long = StreamingIndexer.version(spark, dir)
}
