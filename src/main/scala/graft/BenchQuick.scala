package graft

import org.apache.spark.sql.SparkSession

/** Targeted per-query timing for optimization A/Bs (guide §1): run ONLY the
  * named declared queries — cold + N warm reps each — against the same
  * session shape as [[Bench]]. NOT part of the frozen measurement harness
  * (Bench/Verify untouched); numbers from here are attribution evidence in
  * OPTIMIZATION_r08.md, never the contract metric.
  *
  * Usage: sbt 'runMain graft.BenchQuick q_dedup_minhash_capped q_dedup_apply'
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_QUICK_REPS)
  */
object BenchQuick {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_QUICK_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-benchquick")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      spark.sparkContext.setJobDescription(s"quick:$name")
      val cold = time(fn(spark, sfDir).collect())
      val warm = (1 to reps).map(_ => time(fn(spark, sfDir).collect()))
      println(f"$name%-28s cold $cold%7.3f  warm min ${warm.min}%7.3f  " +
        warm.map(w => f"$w%.3f").mkString("[", ", ", "]"))
    }
    spark.stop()
  }
}
