package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Size-based routing between an operator's EXACT face and its
  * declared SCALE tier — the dial that makes the tiering *the API*
  * instead of a convention.
  *
  * The registry deliberately keeps exact faces registered beside
  * their scale tiers (exact triangles beside DOULION sampling, exact
  * trailing-window distincts beside the HLL face, all-pairs cosine
  * beside DIMSUM, brute-force ANN beside IVF): the exact face is the
  * correctness anchor the scale tier is oracled against. But nothing
  * used to CHOOSE — a caller pointing the exact face at a 100 TB
  * input would run the O(m^1.5) wedge join or the all-pairs explode
  * by accident. These wrappers route on the INPUT SIZE CATALYST
  * ALREADY ESTIMATES (`optimizedPlan.stats.sizeInBytes` — the same
  * statistic the broadcast-join threshold reads; for a parquet scan
  * it is file-size-derived, a pure planning lookup that launches no
  * job), against an explicit bytes dial with a conservative default.
  * Small input → the exact face, bit-identical to calling it
  * directly; big input → the scale tier, same frame the registry
  * oracles. The output schema is STABLE across the dial: a consumer
  * binds columns by name and must not break at the corpus size where
  * the tier silently flips. Where the faces' value-column names
  * differ ([[minhashVerifyAuto]]'s exact `jaccard` vs estimated
  * `est_jaccard`), the router emits one shared name plus an
  * `is_estimate` marker — the estimate-vs-exact difference stays
  * declared per row instead of per schema.
  *
  * The thresholds are dials, not magic: plan-stats bytes are an
  * UPPER-BOUND-ish raw-scan estimate (pre-filter, decompressed), so
  * set them to the point where the exact face's measured scaling
  * curve (SCALING.md) leaves the interactive budget — the defaults
  * encode those measurements, erring toward the scale tier since
  * every scale tier is itself value-oracled. */
object Routing {

  sealed trait Tier
  case object Exact extends Tier
  case object Scale extends Tier

  /** Catalyst's size estimate for the frame — no job, no I/O beyond
    * the listing Spark has already done to plan the scan. */
  def planBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  def tierFor(input: DataFrame, exactMaxBytes: Long): Tier =
    if (planBytes(input) <= BigInt(exactMaxBytes)) Exact else Scale

  /** Default dial: 4 GiB of estimated input. Every exact face below
    * is superlinear (wedge join m^1.5, 7× support explode into exact
    * distinct, all-pairs per-basket explode, |corpus|×|queries|
    * scoring); at ~4 GiB of scan their measured curves (SCALING.md)
    * are still interactive on a single executor-equivalent, past it
    * the scale tier is the only answer that survives 100×. */
  val DefaultExactMaxBytes: Long = 4L << 30

  /** DOULION's edge-keep rate for an input of `bytes` estimated scan
    * size: the fixed-rate tier's sampled wedge work grows as
    * (p·m)^1.5 — measured ≈11× per 10× at the sf1→sf10 decade
    * (SCALING.md round 12) while the estimator's relative error
    * shrinks (triangle count grows with the graph), so the rate is
    * statistical headroom the fixed tier never spends. Scaling
    * p ∝ m^(−1/3) makes sampled wedge work LINEAR in m while
    * p³·T — the error denominator — stays roughly constant when
    * triangles grow ∝ m (disjoint-community growth, the ScaleUp
    * shape and the web-graph norm). Anchored at `permille` for
    * `exactMaxBytes`-sized input (the dial boundary, where the
    * sampled tier takes over from exact), floored at 30‰ so a
    * sparse-triangle graph can't starve the estimator. */
  def adaptivePermille(bytes: BigInt, permille: Int = 300,
                       exactMaxBytes: Long = DefaultExactMaxBytes): Int = {
    val ratio = bytes.toDouble / math.max(1L, exactMaxBytes).toDouble
    if (ratio <= 1.0) permille
    else math.max(30, (permille / math.cbrt(ratio)).toInt)
  }

  /** [[GraphOps.trianglesOn]] (exact count) below the dial,
    * [[GraphOps.trianglesSampledOn]] (DOULION estimate) above it —
    * with the keep rate itself adapted to the input size
    * ([[adaptivePermille]]): pass `permille` > 0 to pin a fixed rate
    * (the oracled registry entry's posture), 0 (default) to let the
    * dial scale it. */
  def trianglesAuto(s: SparkSession, d: String, maxBasket: Int = 16,
                    permille: Int = 0,
                    exactMaxBytes: Long = DefaultExactMaxBytes): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("basket"), col("l_partkey").as("item"))
    tierFor(pairs, exactMaxBytes) match {
      case Exact => GraphOps.trianglesOn(pairs, maxBasket)
      case Scale =>
        val p = if (permille > 0) permille
                else adaptivePermille(planBytes(pairs),
                  exactMaxBytes = exactMaxBytes)
        GraphOps.trianglesSampledOn(pairs, maxBasket, p)
    }
  }

  /** [[Analytics.dauWau]] (exact trailing-window distinct) below the
    * dial, [[Analytics.dauWauChecked]] (HLL beside exact with
    * tolerance verdicts) above it. */
  def dauWauAuto(s: SparkSession, d: String,
                 exactMaxBytes: Long = DefaultExactMaxBytes): DataFrame =
    tierFor(Tables.events(s, d), exactMaxBytes) match {
      case Exact => Analytics.dauWau(s, d)
      case Scale => Analytics.dauWauChecked(s, d)
    }

  /** [[Recommend.itemCosine]] (exact all-pairs cosine) below the
    * dial, [[Recommend.itemCosineDimsum]] (sampled) above it. */
  def itemCosineAuto(s: SparkSession, d: String, minCount: Long = 2,
                     topK: Int = 5, gamma: Int = 16, topN: Int = 50,
                     maxBasket: Int = 16,
                     exactMaxBytes: Long = DefaultExactMaxBytes): DataFrame =
    tierFor(Tables.lineitem(s, d), exactMaxBytes) match {
      case Exact => Recommend.itemCosine(s, d, minCount, topK, maxBasket)
      case Scale => Recommend.itemCosineDimsum(s, d, gamma, topN, maxBasket)
    }

  /** Second dial for the ANN ladder: past it the IVF tier's
    * full-precision candidate scoring is no longer the bottleneck-
    * free answer — IVF still reads the probed cells' RAW float
    * vectors (256 B/vec at dim 64), so the serving index is the full
    * corpus; PQ codes at m=8 are 32× smaller, the index that still
    * fits an executor fleet's memory at 100 TB. 256 GiB of estimated
    * scan ≈ the aggregate page-cache budget of a realistic serving
    * tier at full precision; past it IVF·PQ (gate with cells, rank
    * with ADC codes, exact-rescore only the shortlist) is the
    * declared composed tier (SURVEY §2.5 `ann_ivfpq_topk`). */
  val DefaultIvfMaxBytes: Long = 256L << 30

  /** Build-cost dial INSIDE the IVF band: below it the √n-cell
    * exact-assignment fit ([[SimilarityOps.ivfTopK]]) is affordable;
    * past it that fit is the ladder's one superlinear term
    * (O(n^1.5·d), measured 9.9×/decade at sf10 — VERDICT r15) and
    * the rung switches to [[SimilarityOps.ivfTopKSampled]]: centroid
    * fit on an md5-bucket-capped sample, PINNED cell count, one
    * LINEAR corpus assignment (the FAISS train-on-sample posture).
    * 32 GiB ≈ 128M dim-64 vectors — the point where n·√n passes
    * ~50× the linear pass's work and the build, not the serving
    * scan, dominates the tier's cost. */
  val DefaultIvfExactBuildMaxBytes: Long = 32L << 30

  /** Four-rung ANN ladder (the [[decontaminateAuto]] shape):
    * [[SimilarityOps.bruteForceTopK]] (exact scoring) below the first
    * dial, [[SimilarityOps.ivfTopK]] (cell-gated, full-precision
    * scoring, exact √n-cell build) between the first dial and the
    * build dial, [[SimilarityOps.ivfTopKSampled]] (same serving
    * shape, LINEAR sampled build — the rung that removes the
    * ladder's one superlinear build term) between the build dial and
    * the memory dial, [[SimilarityOps.ivfPqTopK]] (cell-gated +
    * ADC-coded candidates, exact rescore of the shortlist — the
    * memory-bounded tier that actually ships at 100 TB) past the
    * last. All rungs emit the same (q_id, vec_id, cosine, rank)
    * contract with true-cosine scores — the rungs trade recall and
    * build cost, never schema. */
  def annTopKAuto(s: SparkSession, d: String, k: Int = 5,
                  nQueries: Int = 10,
                  exactMaxBytes: Long = DefaultExactMaxBytes,
                  ivfBuildMaxBytes: Long = DefaultIvfExactBuildMaxBytes,
                  ivfMaxBytes: Long = DefaultIvfMaxBytes): DataFrame = {
    val bytes = planBytes(Tables.embeddings(s, d))
    if (bytes <= BigInt(exactMaxBytes))
      SimilarityOps.bruteForceTopK(s, d, k, nQueries)
    else if (bytes <= BigInt(ivfBuildMaxBytes))
      SimilarityOps.ivfTopK(s, d, k, nQueries)
    else if (bytes <= BigInt(ivfMaxBytes))
      SimilarityOps.ivfTopKSampled(s, d, k, nQueries)
    else
      SimilarityOps.ivfPqTopK(s, d, k, nQueries)
  }

  /** [[SimilarityOps.mmrRerank]] (exact-scored shortlist) below the
    * dial, [[SimilarityOps.mmrRerankIvf]] (IVF shortlist) above it —
    * the greedy diversification stage is SHARED (config-bounded
    * either way); only the retrieval that feeds it tiers, which is
    * exactly the declared difference (an IVF shortlist can miss a
    * candidate the exact scan finds). */
  def mmrRerankAuto(s: SparkSession, d: String, k: Int = 5,
                    shortlist: Int = 20, nQueries: Int = 10,
                    lam10: Int = 7,
                    exactMaxBytes: Long = DefaultExactMaxBytes): DataFrame =
    tierFor(Tables.embeddings(s, d), exactMaxBytes) match {
      case Exact => SimilarityOps.mmrRerank(s, d, k, shortlist, nQueries, lam10)
      case Scale => SimilarityOps.mmrRerankIvf(s, d, k, shortlist, nQueries, lam10)
    }

  /** [[SimilarityOps.knnClassify]] (brute-force scored holdout)
    * below the dial, [[SimilarityOps.knnClassifyIvf]] (IVF-shortlist
    * scored) above it — the majority VOTE stage is the shared
    * `knnVote` either way (any scorer feeds it), so the dial swaps
    * only the scorer: O(n) per query exact vs O(nProbe·√n) IVF, the
    * declared SURVEY tier relationship. Both faces emit the same
    * (q_id, true_label, pred_label, votes) contract. */
  def knnClassifyAuto(s: SparkSession, d: String, k: Int = 5,
                      nProbe: Int = 2,
                      exactMaxBytes: Long = DefaultExactMaxBytes): DataFrame =
    tierFor(Tables.embeddings(s, d), exactMaxBytes) match {
      case Exact => SimilarityOps.knnClassify(s, d, k)
      case Scale => SimilarityOps.knnClassifyIvf(s, d, k, nProbe)
    }

  /** [[DedupOps.minhashLsh]] (banded candidates + EXACT shingle-set
    * Jaccard verify — a second pass over the candidate docs' sets)
    * below the dial, [[DedupOps.minhashEstPairs]] (verify-by-
    * signature: the same banding, Jaccard estimated from the
    * component agreement of signatures already in hand — no second
    * pass) above it. At the scale where the exact verify's set join
    * is the dominant cost, the estimator (unbiased, σ =
    * √(J(1−J)/numPerm)) is the only verification that survives 100×.
    *
    * STABLE SCHEMA across the dial (ADVICE r13): every Auto router
    * asserts schema stability, and this one routes faces whose value
    * column names differ (`jaccard` exact vs `est_jaccard`) — a
    * consumer selecting by name would break at the corpus size where
    * the tier silently flips. The router therefore emits the shared
    * contract (id1, id2, jaccard, is_estimate): the value column
    * binds by one name, and `is_estimate` carries the verification
    * method so the variance contract stays declared per row. The
    * underlying faces keep their distinct names for direct callers. */
  def minhashVerifyAuto(s: SparkSession, d: String,
                        threshold: Double = 0.8,
                        exactMaxBytes: Long = DefaultExactMaxBytes): DataFrame = {
    val docs = Tables.documents(s, d)
    tierFor(docs, exactMaxBytes) match {
      case Exact => DedupOps.minhashLsh(s, d, threshold = threshold)
        .withColumn("is_estimate", lit(false))
      case Scale => DedupOps.minhashEstPairs(docs, threshold = threshold)
        .withColumnRenamed("est_jaccard", "jaccard")
        .withColumn("is_estimate", lit(true))
    }
  }

  /** [[DedupOps.simhashPairsCheckedOn]] at 4×15-bit bands
    * (hamming ≤ 7) below the dial, 3×20-bit bands (hamming ≤ 5)
    * above it — the width term measured at the sf10 decade (SCALING
    * round 13: random band collisions grow n²/2^chunkBits, 38.5×/
    * decade at 15 bits vs the 5.3× control) routed instead of
    * asserted. Both faces are registry-oracled checked constructions
    * with the same (id1, id2, hamming, jaccard) schema; the declared
    * difference is the recall window (pigeonhole exactness to
    * hamming 7 vs 5), which is exactly the trade the caller must
    * own past ~2^15 documents. */
  def simhashAuto(s: SparkSession, d: String, threshold: Double = 0.8,
                  exactMaxBytes: Long = DefaultExactMaxBytes): DataFrame = {
    val docs = Tables.documents(s, d)
    tierFor(docs, exactMaxBytes) match {
      case Exact => DedupOps.simhashPairsCheckedOn(docs, threshold = threshold)
      case Scale => DedupOps.simhashPairsCheckedOn(docs, maxHamming = 5,
        bands = 3, threshold = threshold)
    }
  }

  /** [[DedupOps.embeddingPairs]] (exact all-pairs cosine, n²/2)
    * below the dial, [[DedupOps.embeddingPairsLsh]] (multi-table
    * hyperplane LSH candidates) above it — the two faces share the
    * (id1, id2, cosine) contract, so this is the one route where the
    * tiers are schema-identical. ([[DedupOps.semanticDedup]] is NOT
    * a tier of this pair frame: it emits per-doc keep verdicts under
    * a clustering contract — a different declared output.) */
  def embeddingPairsAuto(s: SparkSession, d: String,
                         threshold: Double = 0.45, nTables: Int = 4,
                         exactMaxBytes: Long = DefaultExactMaxBytes): DataFrame =
    tierFor(Tables.embeddings(s, d), exactMaxBytes) match {
      case Exact => DedupOps.embeddingPairs(s, d, threshold)
      case Scale => DedupOps.embeddingPairsLsh(s, d, threshold, nTables = nTables)
    }

  /** [[Analytics.percentiles]] (exact interpolated — value→count
    * buffers that grow with group distinct-cardinality) below the
    * dial, [[Analytics.percentilesApprox]] (GK sketch: fixed-size
    * mergeable buffers, spec-bounded rank error) above it. The scale
    * tier is the PURE sketch, not the checked face the registry
    * oracles (`q_percentiles_approx` → percentilesChecked): checked
    * runs the exact aggregate BESIDE the sketch to gate it
    * cross-engine, which re-imports exactly the buffer growth this
    * route exists to shed. */
  def percentilesAuto(s: SparkSession, d: String, accuracy: Int = 10000,
                      exactMaxBytes: Long = DefaultExactMaxBytes): DataFrame =
    tierFor(Tables.events(s, d), exactMaxBytes) match {
      case Exact => Analytics.percentiles(s, d)
      case Scale => Analytics.percentilesApprox(s, d, accuracy)
    }

  /** [[Analytics.profile]] exact (countDistinct expands into one
    * replicated pass per distinct column) below the dial, HLL++
    * sketch profile above it — same (column, n_rows, n_nulls,
    * n_distinct) schema either way; only the distinct's exactness
    * changes, which is the declared difference. Frame-based (profile
    * is a generic-frame operator, not a table face). */
  def profileAuto(df: DataFrame, cols: Seq[String], rsd: Double = 0.02,
                  exactMaxBytes: Long = DefaultExactMaxBytes): DataFrame =
    tierFor(df, exactMaxBytes) match {
      case Exact => Analytics.profile(df, cols, approx = false)
      case Scale => Analytics.profile(df, cols, approx = true, rsd = rsd)
    }

  /** The decontamination ladder keyed on REFERENCE size — the dial
    * input is the reference, not the corpus, because all three tiers
    * scale the same way in the corpus (linear scans) and differ only
    * in what they do with the reference:
    *  - reference fits a broadcast (≤ `bcastMaxBytes`, default
    *    64 MiB — the eval-benchmark shape): [[DedupOps
    *    .decontaminateBroadcast]], fully map-side, zero corpus
    *    shuffles;
    *  - reference too big to broadcast whole but its band keys fit a
    *    Bloom filter (≤ `bloomMaxBytes`): [[DedupOps
    *    .decontaminateBloom]], codegen'd might_contain in the corpus
    *    scan, only candidates shuffle;
    *  - otherwise the symmetric shuffled [[DedupOps.decontaminate]].
    * All three emit the same verified (doc_id, ref_id, jaccard)
    * contract and are oracled against the same entry. */
  /** The span LOCATOR's dial — [[DedupOps.decontaminateSpansBroadcast]]
    * (map-side gram probe + broadcast span slice; the corpus is never
    * exchanged) while the reference's estimated bytes fit the
    * broadcast budget, [[DedupOps.decontaminateSpans]] (symmetric
    * gram-key equi-join) past it. Both faces emit identical values
    * from one shared island-merge core — the dial trades only plan
    * shape, which is exactly why it can be automatic. */
  def decontaminateSpansAuto(corpus: DataFrame, reference: DataFrame,
                             n: Int = 10,
                             bcastMaxBytes: Long = 64L << 20): DataFrame =
    if (planBytes(reference) <= BigInt(bcastMaxBytes))
      DedupOps.decontaminateSpansBroadcast(corpus, reference, n)
    else
      DedupOps.decontaminateSpans(corpus, reference, n)

  def decontaminateAuto(corpus: DataFrame, reference: DataFrame,
                        threshold: Double = 0.8,
                        numPerm: Int = 64, bands: Int = 16,
                        bcastMaxBytes: Long = 64L << 20,
                        bloomMaxBytes: Long = DefaultExactMaxBytes): DataFrame = {
    val refBytes = planBytes(reference)
    if (refBytes <= BigInt(bcastMaxBytes))
      DedupOps.decontaminateBroadcast(corpus, reference, threshold,
        numPerm, bands)
    else if (refBytes <= BigInt(bloomMaxBytes))
      DedupOps.decontaminateBloom(corpus, reference, threshold,
        numPerm, bands)
    else
      DedupOps.decontaminate(corpus, reference, threshold, numPerm, bands)
  }
}
