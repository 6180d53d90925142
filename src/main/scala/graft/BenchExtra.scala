package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{IndexBuilder, IndexSchema, KeywordField, TextField}

/** Extra diagnostics (guide §1.4) — noop-sink isolation of the stages
  * behind the headline bench numbers. NOT part of the frozen measurement
  * harness: graft.Bench is untouched; these numbers are cited in
  * OPTIMIZATION_r08.md as attribution evidence, never as the contract
  * metric. Each section labels its jobs for the (disabled-by-default) UI.
  */
object BenchExtra {

  private def time[A](label: String, spark: SparkSession)(f: => A): Double = {
    spark.sparkContext.setJobDescription(label)
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"$label%-55s $s%8.3f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchextra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // --- passage window family ------------------------------------------
    for (rep <- 1 to 2) {
      time(s"window-hash pass (md5, explode only) rep$rep", spark) {
        noop(graft.ops.Dedup.cpuParallel(docs)
          .select(col("doc_id"), explode(graft.ops.Dedup.passageHashes(col("text"), 8)).as("h")))
      }
      time(s"window-hash pass (xxh64 twin) rep$rep", spark) {
        noop(graft.ops.Dedup.cpuParallel(docs)
          .select(col("doc_id"), explode(graft.ops.Dedup.passageHashesXx(col("text"), 8)).as("h")))
      }
      time(s"passageDups end-to-end rep$rep", spark) {
        noop(graft.ops.Dedup.passageDups(docs, "doc_id", "text", 8))
      }
      time(s"passageDupLocations end-to-end rep$rep", spark) {
        noop(graft.ops.Dedup.passageDupLocations(docs, "doc_id", "text", 8))
      }
      time(s"excise (locations + rebuild) rep$rep", spark) {
        val locs = graft.ops.Dedup.passageDupLocations(docs, "doc_id", "text", 8)
        noop(graft.ops.Dedup.excisePassages(docs, "doc_id", "text", locs, 8))
      }
    }

    // --- index build stage split ----------------------------------------
    val schema = SparkEntry.schema
    val corpus = SparkEntry.corpus(spark, sfDir)
    for (rep <- 1 to 2) {
      val prepared = IndexBuilder.prepareDocs(corpus, schema, cpus * 2)
      time(s"prepareDocs (docId assignment) rep$rep", spark) { noop(prepared) }
      time(s"tokensOf rep$rep", spark) {
        noop(IndexBuilder.tokensOf(prepared.repartition(cpus * 2), schema).toDF())
      }
      time(s"blocksOf (token shuffle + block encode) rep$rep", spark) {
        noop(IndexBuilder.blocksOf(
          IndexBuilder.tokensOf(prepared.repartition(cpus * 2), schema), schema, cpus * 2).toDF())
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-bx-idx").toString
    time("full build()", spark) {
      val built = IndexBuilder.build(corpus, schema)
      built.blocks.count()
      time("  save() (4 range-laid-out tables)", spark) { built.save(dir) }
      built.docs.unpersist(); built.blocks.unpersist()
    }
    time("load + termDict cache", spark) {
      val idx = IndexBuilder.load(spark, dir)
      idx.termDict.cache().count()
    }

    // --- events index build ---------------------------------------------
    for (rep <- 1 to 2) {
      time(s"events index build (100k keyword rows) rep$rep", spark) {
        val src = spark.read.parquet(s"$sfDir/events.parquet")
        val idx = IndexBuilder.build(src, SparkEntry.eventsSchema).cached()
        idx.blocks.count()
        idx.docs.unpersist(); idx.blocks.unpersist(); idx.termDict.unpersist()
      }
      time(s"events prepareDocs only rep$rep", spark) {
        noop(IndexBuilder.prepareDocs(
          spark.read.parquet(s"$sfDir/events.parquet"), SparkEntry.eventsSchema, cpus * 2))
      }
    }

    // --- minhash signature pass -----------------------------------------
    for (rep <- 1 to 2) {
      time(s"minhash sig pass (shingles + md5 minhash, noop) rep$rep", spark) {
        noop(graft.ops.Dedup.cpuParallel(docs).select(col("doc_id"),
          graft.ops.TextOps.shingles(col("text"), 3).as("sh"))
          .withColumn("sig", graft.ops.Dedup.minhash(col("sh"), 8)))
      }
    }
    spark.stop()
  }
}
