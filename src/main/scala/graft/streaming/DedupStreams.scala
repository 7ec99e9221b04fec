package graft.streaming

import org.apache.spark.sql.DataFrame
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
}
