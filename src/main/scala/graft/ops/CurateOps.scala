package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed filter chain a training
  * pipeline runs before tokenization, demonstrating that the
  * library's stages compose as one lazy plan:
  *
  *   1. quality gate (length + stopword-ratio, TextOps.qualityScores'
  *      exact predicate),
  *   2. exact dedup (keep the minimum doc_id per distinct text),
  *   3. decontamination against a held-out reference corpus
  *      (DedupOps.decontaminate's verified-pair contract).
  *
  * Every stage is a narrow filter or one keyed shuffle; the output is
  * the surviving document ids, ready to semi-join the full corpus.
  */
object CurateOps {

  def curate(corpus: DataFrame, reference: DataFrame,
             threshold: Double = 0.8): DataFrame = {
    val good = corpus.join(
      TextOps.qualityScoresOn(corpus.select(col("doc_id"), col("text")))
        .filter(col("quality_flag") === "good").select(col("doc_id")),
      "doc_id")
    // exact dedup: one shuffle on the content digest, then a
    // broadcast-friendly semi join back on the kept ids
    val keep = good
      .groupBy(sha2(col("text"), 256).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val deduped = good.join(keep, Seq("doc_id"), "left_semi")
    val contaminated = DedupOps.decontaminate(deduped, reference, threshold)
      .select(col("doc_id")).distinct()
    deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }
}
