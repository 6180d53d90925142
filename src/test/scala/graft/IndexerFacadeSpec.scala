package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.index._
import graft.query.{Query => Q, _}

/** The reference-style writer UX: add → commit → search, delete/update,
  * durable across reopen (test_engine.py:56-128 shape).
  */
class IndexerFacadeSpec extends SparkTestBase {

  val srcSchema = StructType(Seq(
    StructField("repo", StringType), StructField("path", StringType),
    StructField("commit", StringType), StructField("lang", StringType),
    StructField("content", StringType)))

  val idxSchema = IndexSchema(
    keyColumns = Seq("repo", "path", "commit"),
    fields = Map("content" -> TextField("standard", positions = true), "lang" -> KeywordField))

  test("add/commit/search/delete/update lifecycle, durable across reopen") {
    val dir = Files.createTempDirectory("graft-indexer").toString
    val w = new Indexer(spark, dir, idxSchema, srcSchema)
    w.add("repo" -> "r", "path" -> "p0", "commit" -> "c", "lang" -> "en",
      "content" -> "hello world")
    w.add("repo" -> "r", "path" -> "p1", "commit" -> "c", "lang" -> "en",
      "content" -> "hello spark")
    w.commit()
    assert(w.version === 1L)
    assert(w.count(Term("content", "hello")) === 2L)

    // second commit: new segment, ids continue
    w.add("repo" -> "r", "path" -> "p2", "commit" -> "c", "lang" -> "de",
      "content" -> "goodbye world")
    w.commit()
    assert(w.count(Term("content", "world")) === 2L)
    // each commit is a bucket-aligned segment (WAND-safe docId offsets)
    assert(w.search(Term("content", "goodbye")).collect().map(_.getLong(0)).toSeq ===
      Seq(1L << IndexBuilder.SaltShift))

    // update = delete + re-add
    w.update(Term("content", "spark"),
      "repo" -> "r", "path" -> "p1", "commit" -> "c2", "lang" -> "en",
      "content" -> "updated flink text")
    w.commit()
    assert(w.count(Term("content", "spark")) === 0L)
    assert(w.count(Term("content", "flink")) === 1L)
    assert(w.count(Term("content", "hello")) === 1L) // p0 only

    // durable: a fresh handle sees the same state
    val r = new Indexer(spark, dir, idxSchema, srcSchema)
    assert(r.version === 3L)
    assert(r.count(Term("content", "hello")) === 1L)
    assert(r.count(Term("content", "flink")) === 1L)
    assert(r.searcher.index.numLiveDocs === 3L)
  }
}
