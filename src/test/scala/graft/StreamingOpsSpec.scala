package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingOps

/** Stream-native pipeline ops: watermarked windowed aggregation, state-backed
  * exact dedup across micro-batches, and custom keyed state
  * (mapGroupsWithState) — each driven through MemoryStream micro-batches.
  */
class StreamingOpsSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowedCounts: event-time windows aggregate under a watermark (update mode)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.windowedCounts(src.toDF().toDF("ts", "event_type"),
        "ts", "event_type", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("wincounts").outputMode(OutputMode.Update).start()
    try {
      src.addData((ts(1), "click"), (ts(2), "click"), (ts(11), "view"))
      q.processAllAvailable()
      src.addData((ts(4), "click")) // within watermark: updates the first window
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .selectExpr("win.start", "event_type", "cnt").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      // update mode emits running values; the LAST update per (window, type) is current
      val latest = rows.groupBy(x => (x._1, x._2)).map { case (k, vs) => k -> vs.map(_._3).max }
      assert(latest(("2026-01-01 10:00:00.0", "click")) === 3L)
      assert(latest(("2026-01-01 10:10:00.0", "view")) === 1L)
    } finally q.stop()
  }

  test("dedupExact: duplicate content suppressed across micro-batches (state-backed)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = StreamingOps.dedupExact(src.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("streamdedup").outputMode(OutputMode.Append).start()
    try {
      src.addData((0L, "alpha beta"), (1L, "gamma"))
      q.processAllAvailable()
      src.addData((2L, "alpha beta"), (3L, "delta")) // doc 2 duplicates doc 0's content
      q.processAllAvailable()
      val ids = spark.table("streamdedup").select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(0L, 1L, 3L)) // the cross-batch duplicate is dropped
    } finally q.stop()
  }

  test("runningStats: custom keyed state accumulates across batches (mapGroupsWithState)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(String, String)]
    val q = StreamingOps.runningStats(src.toDF().toDF("repo", "content"), "repo", "content")
      .toDF("repo", "docs", "tokens")
      .writeStream.format("memory").queryName("runstats").outputMode(OutputMode.Update).start()
    try {
      src.addData(("r/a", "one two three"), ("r/b", "four"))
      q.processAllAvailable()
      src.addData(("r/a", "five six"))
      q.processAllAvailable()
      val latest = spark.table("runstats").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
      assert(latest("r/a") === (("r/a", 2L, 5L))) // 2 docs, 3+2 tokens
      assert(latest("r/b") === (("r/b", 1L, 1L)))
    } finally q.stop()
  }
}
