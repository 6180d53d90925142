package graft

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.index._
import graft.query.{Query => Q, _}

/** Model-based lifecycle sweep: a random sequence of writer operations
  * (buffered adds, delete-by-query, docvalue-only updates, commits,
  * compaction, reopen) runs against BOTH the Indexer facade and a trivial
  * driver-side model of the reference semantics; after every commit the
  * visible state must agree (doc set by key, per-term counts, docvalues).
  * The model encodes the contract explicitly: deletes queued in a commit
  * resolve against the PRE-ADD committed view (delete-then-add order),
  * docvalue updates hit committed docs only, and compaction changes no
  * visible state. Fixed seed: failures reproduce.
  */
class LifecyclePropertySpec extends SparkTestBase {

  val srcSchema = StructType(Seq(
    StructField("repo", StringType), StructField("path", StringType),
    StructField("commit", StringType), StructField("content", StringType),
    StructField("note", StringType)))

  val idxSchema = IndexSchema(
    keyColumns = Seq("repo", "path", "commit"),
    fields = Map("content" -> TextField("standard", positions = true)))

  val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")

  case class ModelDoc(key: String, tokens: Vector[String], var note: String)

  test("random writer-op sequences: facade state ≡ reference model after every commit") {
    val rnd = new scala.util.Random(20260817L)
    val dir = Files.createTempDirectory("graft-lifeprop").toString
    var w = new Indexer(spark, dir, idxSchema, srcSchema)

    val committed = scala.collection.mutable.LinkedHashMap.empty[String, ModelDoc]
    val buffer = scala.collection.mutable.ArrayBuffer.empty[ModelDoc]
    val pendingDeletes = scala.collection.mutable.ArrayBuffer.empty[String]
    var nextId = 0

    def randDoc(): ModelDoc = {
      val toks = Vector.fill(1 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.length)))
      val d = ModelDoc(f"p$nextId%04d", toks, "n" + rnd.nextInt(3))
      nextId += 1
      d
    }

    def check(): Unit = {
      val s = w.searcher
      // doc set by key
      val gotKeys = s.index.deletes match {
        case _ => // numLiveDocs path: read live docs' paths
          val live = s.index.deletes match {
            case None    => s.index.docs
            case Some(d) => s.index.docs.join(d, Seq("docId"), "left_anti")
          }
          live.select("path").collect().map(_.getString(0)).sorted.toSeq
      }
      assert(gotKeys === committed.keys.toSeq.sorted, "live doc keys diverged")
      // per-term counts over live docs
      vocab.foreach { t =>
        val expect = committed.valuesIterator.count(_.tokens.contains(t)).toLong
        assert(w.count(Term("content", t)) === expect, s"count($t) diverged")
      }
      // docvalues multiset
      val notes = s.docvalues("note").collect().map(_.getString(1)).sorted.toSeq
      assert(notes === committed.valuesIterator.map(_.note).toSeq.sorted, "docvalues diverged")
    }

    def modelCommit(): Unit = {
      // deletes resolve against the PRE-ADD committed view
      if (pendingDeletes.nonEmpty) {
        val doomed = committed.valuesIterator
          .filter(d => pendingDeletes.exists(d.tokens.contains)).map(_.key).toSeq
        doomed.foreach(committed.remove)
      }
      buffer.foreach(d => committed(d.key) = d)
      buffer.clear()
      pendingDeletes.clear()
    }

    (1 to 24).foreach { step =>
      rnd.nextInt(6) match {
        case 0 | 1 => // add 1-3 docs
          (0 until 1 + rnd.nextInt(3)).foreach { _ =>
            val d = randDoc()
            buffer += d
            w.add("repo" -> "r", "path" -> d.key, "commit" -> "c",
              "content" -> d.tokens.mkString(" "), "note" -> d.note)
          }
        case 2 => // queue a delete-by-term
          val t = vocab(rnd.nextInt(vocab.length))
          pendingDeletes += t
          w.delete(Term("content", t))
        case 3 => // commit + verify
          w.commit()
          modelCommit()
          check()
        case 4 => // docvalue-only update on committed docs (commit first to
          // keep the facade's pending ops and the model in lockstep)
          w.commit()
          modelCommit()
          val t = vocab(rnd.nextInt(vocab.length))
          val v = "u" + step
          w.updateDocValues(Term("content", t), "note" -> v)
          committed.valuesIterator.filter(_.tokens.contains(t)).foreach(_.note = v)
          check()
        case 5 => // compact (visible state must not change) or reopen
          w.commit()
          modelCommit()
          if (rnd.nextBoolean()) w.compact()
          else { w.close(); w = new Indexer(spark, dir, idxSchema, srcSchema) }
          check()
      }
    }
    w.commit()
    modelCommit()
    check()
    assert(committed.nonEmpty, "degenerate run — model ended empty")
  }
}
