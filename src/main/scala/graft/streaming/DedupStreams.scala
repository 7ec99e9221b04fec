package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming face of exact deduplication: drop content-duplicate
  * documents as they arrive. A 100 TB ingest never sees its corpus at
  * rest, so dedup must run on the stream; keying state on the sha2
  * digest (not the text) keeps the state store rows small, and
  * `dropDuplicatesWithinWatermark` expires state once the watermark
  * passes, so the store is bounded by the dedup horizon rather than
  * corpus size. The batch face with identical semantics is
  * `DedupOps.exact` (same digest key).
  */
object DedupStreams {

  /** Streaming exact dedup over any frame with (`ts`, `textCol`):
    * keeps the first arrival of each distinct text within the
    * watermark horizon. */
  def dedupStream(docs: DataFrame, textCol: String = "text",
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", sha2(col(textCol), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Batch face for the oracle gate: the first arrival — by event
    * time, event_id tiebreak — of each (user_id, event_type) key over
    * the events table. This is what the streaming dedup computes when
    * the stream is replayed in event-time order; expressing the
    * "first" deterministically (min over the time order, not
    * dropDuplicates' arbitrary partition order) is what makes it
    * cross-engine checkable. One shuffle on the dedup key. */
  def dedupBatch(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").as("first_ts"))
      .orderBy(col("user_id"), col("event_type"))
  }
}
