package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming operators for a continuous training-data pipeline, composed
  * from Structured Streaming's incremental-execution primitives so the same
  * declarative shapes run on an unbounded source (reference-style batch
  * semantics are pinned by the engine; these are the stream-native forms a
  * 100 TB/day ingest needs).
  */
object StreamingOps {

  /** Event-time windowed counts with a watermark: the watermark bounds both
    * result lateness and the aggregation state (closed windows evict), the
    * standard unbounded-aggregation defense. Output works in update mode
    * (running counts) or append mode (finalized windows only).
    */
  def windowedCounts(stream: DataFrame, tsCol: String, groupCol: String,
      windowDuration: String, watermarkDelay: String): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration).as("win"), col(groupCol))
      .agg(count(lit(1)).as("cnt"))

  /** Streaming exact dedup by content hash: the state-backed built-in
    * (`dropDuplicates`) keeps one fingerprint per distinct content forever;
    * with an event-time column the watermarked variant
    * (`dropDuplicatesWithinWatermark`) BOUNDS the state — duplicates are
    * only suppressed within the watermark horizon, the standard trade for
    * an unbounded corpus (batch jobs sweep the long tail).
    */
  def dedupExact(stream: DataFrame, textCol: String, tsCol: Option[String] = None,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val hashed = stream.withColumn("__content_sha",
      sha2(col(textCol).cast("string"), 256))
    val deduped = tsCol match {
      case Some(ts) => hashed.withWatermark(ts, watermarkDelay)
        .dropDuplicatesWithinWatermark("__content_sha")
      case None => hashed.dropDuplicates("__content_sha")
    }
    deduped.drop("__content_sha")
  }

  /** Custom keyed state via mapGroupsWithState — the door for semantics the
    * built-ins can't express: a running (docs, tokens) profile per key,
    * emitted as an update each batch. State is one small tuple per key;
    * production deployments bound it with an event-time timeout tied to the
    * watermark (a processing-time timeout makes the engine self-trigger
    * micro-batches continuously to fire expirations — a busy loop on an
    * otherwise idle stream — so it is not the default here).
    */
  def runningStats(stream: DataFrame, keyCol: String, textCol: String): Dataset[(String, Long, Long)] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(col(keyCol).cast("string"),
        graft.ops.TextOps.tokenCount(col(textCol)).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (String, Long, Long)](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long)], state: GroupState[(Long, Long)]) =>
          // fold the iterator — never buffer the group (a hot key's batch
          // is unbounded; .toSeq held it all to count and sum, r8)
          var docs = 0L
          var toks = 0L
          rows.foreach { r => docs += 1; toks += r._2 }
          val (docs0, toks0) = state.getOption.getOrElse((0L, 0L))
          val next = (docs0 + docs, toks0 + toks)
          state.update(next)
          (key, next._1, next._2)
      }
  }
}
