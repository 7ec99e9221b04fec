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

  /** Cluster-aware CANONICAL selection — the keep-best step after
    * near-dup clustering: [[DedupOps.connectedComponents]] tells you
    * which documents are the same content; this picks WHICH copy
    * survives, by QUALITY (highest stopword_ratio, doc_id tiebreak)
    * instead of the arbitrary min-id convention — near-dup families
    * usually contain one clean copy and N mangled ones, and min-id
    * keeps whichever got crawled first. One quality join + one
    * map-side-combinable max_by per cluster; emits (cluster_id,
    * keep_id, q, n_members) for the clustered docs (singletons keep
    * themselves trivially and are not repeated here). */
  def canonicalPerCluster(clusters: DataFrame, docs: DataFrame): DataFrame = {
    val q = TextOps.qualityScoresOn(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("stopword_ratio").as("q"))
    clusters.join(q, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        max_by(col("doc_id"), struct(col("q"), -col("doc_id"))).as("keep_id"),
        max(col("q")).as("q"),
        count(lit(1)).as("n_members"))
      .orderBy(col("cluster_id"))
  }

  /** Web-corpus curation — the CommonCrawl-shaped front half of the
    * pipeline, composed as one lazy plan over a (doc_id, text, url)
    * frame:
    *
    *   1. URL canonicalization (TextOps.canonicalUrl — row-local, so
    *      it rides the scan),
    *   2. URL dedup: keep the FIRST document (min doc_id) per
    *      canonical page — the same page fetched as `...?utm_source=x`,
    *      `...#frag`, `...:80/` collapses to one row. One
    *      map-side-combinable min per canonical key + a semi join
    *      back (the exact-dedup shape, narrower than a window),
    *   3. quality gate (TextOps.qualityScores' exact predicate),
    *   4. exact text dedup among the survivors (mirrors can serve the
    *      same body under genuinely different canonical URLs).
    *
    * Output: surviving (doc_id, canonical). Every stage is a narrow
    * projection or one keyed map-side-combinable shuffle — no windows,
    * no products; [[curate]] is the back half (decontamination). */
  def curateWeb(withUrls: DataFrame): DataFrame = {
    val canon = withUrls.withColumn("canonical",
      TextOps.canonicalUrl(col("url")))
    val firstPerPage = canon
      .groupBy(col("canonical")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val pages = canon.join(firstPerPage, Seq("doc_id"), "left_semi")
    val good = pages.join(
      TextOps.qualityScoresOn(pages.select(col("doc_id"), col("text")))
        .filter(col("quality_flag") === "good").select(col("doc_id")),
      "doc_id")
    val keep = good
      .groupBy(sha2(col("text"), 256).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    good.join(keep, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("canonical"))
      .orderBy(col("doc_id"))
  }

  /** Token-budget selection — the data-constrained-training shape:
    * rank documents by quality and keep the best until a global token
    * budget is exhausted (a run that can afford B tokens wants the
    * HIGHEST-quality B tokens, not a uniform sample).
    *
    * The global running total over the quality order is a distributed
    * PREFIX SUM exactly like [[TextOps.packOn]]'s: range-partition by
    * the rank key (score desc, doc_id), partition-local running sums,
    * then one broadcast cumulative offset per partition — the naive
    * `sum over (order by score)` window would sort the corpus in ONE
    * partition, the classic scale-killer. Keep rule: a doc survives if
    * the running total INCLUDING it fits the budget (so the output is
    * a prefix of the quality ranking, deterministic under the rounded
    * score's doc_id tiebreak).
    *
    * Caching contract (PrefixSum): one row-count-sized cached
    * intermediate per call, freed by `spark.catalog.clearCache()` —
    * long-lived sessions composing many pipelines own that call. */
  def tokenBudget(corpus: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0: $budgetTokens")
    val scored = TextOps.qualityScoresOn(corpus.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("stopword_ratio").as("score"),
        col("n_tokens").cast("long").as("n_tokens"))
    val rankKeys = Seq(col("score").desc, col("doc_id").asc)
    // shared distributed prefix sum (PrefixSum: plan shape +
    // exchange-reuse guard); inclusive total = exclusive + own tokens
    PrefixSum.exclusive(scored, rankKeys, col("n_tokens"))
      .withColumn("cum_tokens", col("__cum") + col("n_tokens"))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("doc_id"), col("score"), col("n_tokens"), col("cum_tokens"))
      // cum_tokens is strictly increasing along the rank order
      // (n_tokens ≥ 1 — toks never returns an empty array), so this
      // IS the quality ranking, with a unique sort key
      .orderBy(col("cum_tokens"))
  }
}
