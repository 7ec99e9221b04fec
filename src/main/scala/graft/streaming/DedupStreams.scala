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

  /** Static reference index for streaming decontamination: the
    * reference corpus's banded MinHash signatures plus its shingle
    * sets — built once in batch (in production: written to parquet and
    * broadcast/loaded by the streaming job). Returns
    * (bandIndex(band, bsig, ref_id), refSets(ref_id, ref_hs, ref_n)). */
  def referenceIndex(reference: DataFrame, numPerm: Int = 64,
                     bands: Int = 16): (DataFrame, DataFrame) = {
    val staged = Tables.spread(reference)
      .select(col("doc_id"), graft.ops.TextOps.toks(col("text")).as("__t"))
      .select(col("doc_id"),
        graft.ops.DedupOps.shingleHashesExpr(col("__t")).as("hs"))
    val sets = staged.select(col("doc_id").as("ref_id"),
      col("hs").as("ref_hs"), size(col("hs")).as("ref_n"))
    val bandIndex = staged.select(col("doc_id").as("ref_id"),
      posexplode(array(
        graft.ops.DedupOps.bandSigsExpr(col("hs"), numPerm, bands): _*))
        .as(Seq("band", "bsig")))
    (bandIndex, sets)
  }

  /** Streaming decontamination: flag documents arriving on a stream
    * whose n-gram Jaccard with any document of a STATIC reference
    * corpus reaches `threshold` — the online face of
    * [[graft.ops.DedupOps.decontaminate]]. Everything per-document is
    * a row-local projection (shingles, MinHash bands — no stateful
    * aggregation), candidates come from stream-static equi joins on
    * (band, bandSig) against the prebuilt index, exact Jaccard
    * verifies in the row, and the only state is the
    * watermark-bounded dedup of band-collision duplicates. Append
    * mode throughout; state never grows with corpus size. */
  def decontaminateStream(docs: DataFrame,
                          bandIndex: DataFrame, refSets: DataFrame,
                          threshold: Double = 0.8,
                          numPerm: Int = 64, bands: Int = 16,
                          watermark: String = "1 hour"): DataFrame = {
    val staged = docs
      .withColumn("__t", graft.ops.TextOps.toks(col("text")))
      .withColumn("hs", graft.ops.DedupOps.shingleHashesExpr(col("__t")))
      .withWatermark("ts", watermark)
    val banded = staged.select(col("doc_id"), col("ts"), col("hs"),
      posexplode(array(
        graft.ops.DedupOps.bandSigsExpr(col("hs"), numPerm, bands): _*))
        .as(Seq("band", "bsig")))
    banded
      .join(bandIndex, Seq("band", "bsig"))
      .join(refSets, Seq("ref_id"))
      .withColumn("common",
        graft.functions.SetExprs.sortedIntersectCount(col("hs"), col("ref_hs")))
      .withColumn("jaccard", round(col("common").cast("double") /
        (size(col("hs")) + col("ref_n") - col("common")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("ts"), col("ref_id"), col("jaccard"))
      .dropDuplicatesWithinWatermark("doc_id", "ref_id")
  }

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
