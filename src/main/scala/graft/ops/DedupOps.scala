package graft.ops

import graft.Tables
import graft.functions.SimHash
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, each a
  * different cost/recall point:
  *
  *  - exact: hash-groupBy — one shuffle keyed on the content hash.
  *  - minhash LSH: banded MinHash signatures; candidate pairs come
  *    from equality joins on band signatures (never an all-pairs
  *    product), then exact-Jaccard verification touches candidates
  *    only. This is the 100 TB path: O(n·bands) shuffle rows.
  *  - simhash: 64-bit signatures, 8×8-bit banding (pigeonhole
  *    guarantees recall for hamming ≤ 7), bit_count verification.
  *  - exact n-gram Jaccard: inverted-index self-join — the exact
  *    baseline the probabilistic paths are measured against.
  *  - embedding cosine: random-hyperplane LSH buckets, then exact
  *    cosine within bucket.
  */
object DedupOps {

  // ---- shared text shingling ------------------------------------------

  /** (doc_id, hs, n): each doc's distinct k-token shingle hashes as a
    * sorted array — computed entirely inside the scan projection (no
    * shuffle), and the base for signatures, prefixes, and
    * verification alike. */
  private[ops] def docShingleSets(docs: DataFrame, k: Int = 3): DataFrame = {
    val t = TextOps.toks(col("text"))
    val n = size(t)
    val starts = when(n >= k, sequence(lit(1), n - (k - 1)))
      .otherwise(array().cast("array<int>"))
    val shingles = transform(starts, i => concat_ws(" ", slice(t, i, lit(k))))
    docs.select(col("doc_id"),
        array_sort(array_distinct(transform(shingles, s => xxhash64(s)))).as("hs"))
      .withColumn("n", size(col("hs")))
  }

  /** (doc_id, h): exploded distinct shingle hashes. */
  private[ops] def shingleHashes(docs: DataFrame, k: Int = 3): DataFrame =
    docShingleSets(docs, k).select(col("doc_id"), explode(col("hs")).as("h"))

  /** Exact Jaccard for candidate pairs, joining each side's already
    * materialized sorted shingle-set array (array_intersect). */
  private def verifyJaccard(pairs: DataFrame, sets: DataFrame): DataFrame = {
    pairs
      .join(sets.select(col("doc_id").as("id1"), col("hs").as("hs1")), "id1")
      .join(sets.select(col("doc_id").as("id2"), col("hs").as("hs2")), "id2")
      .withColumn("common", size(array_intersect(col("hs1"), col("hs2"))))
      .withColumn("jaccard", round(col("common").cast("double") /
        (size(col("hs1")) + size(col("hs2")) - col("common")), 4))
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  // ---- exact -----------------------------------------------------------

  /** Exact dedup: group on sha2(text); keep the minimum doc_id.
    * Grouping on the 64-hex digest, not the raw text, keeps shuffle
    * rows narrow at scale. */
  def exact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(sha2(col("text"), 256).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))

  // ---- MinHash + LSH ---------------------------------------------------

  /** MinHash signature matrix: numPerm independent hash functions
    * realized as xxhash64(shingleHash, permIndex); the signature is
    * numPerm parallel min-aggregates over one (doc_id, h) pass —
    * map-side partial aggregation, no row blowup. */
  private def minhashSignatures(sh: DataFrame, numPerm: Int): DataFrame = {
    val aggs = (0 until numPerm).map(j =>
      min(xxhash64(col("h"), lit(j))).as(s"mh$j"))
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Candidate pairs whose exact Jaccard ≥ threshold, surfaced by
    * banded MinHash LSH (numPerm=64, 16 bands × 4 rows ⇒ pairs with
    * J≈0.8+ are caught with prob ≥ 1-(1-0.8⁴)¹⁶ ≈ 0.9994). */
  def minhashLsh(s: SparkSession, d: String,
                 threshold: Double = 0.8,
                 numPerm: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numPerm / bands
    // reused by signature build AND exact verification — materialize once
    val sets = docShingleSets(Tables.documents(s, d)).cache()
    val sh = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val sig = minhashSignatures(sh, numPerm)
    val bandSigs = (0 until bands).map { b =>
      xxhash64((lit(b) +: (b * rows until (b + 1) * rows).map(j => col(s"mh$j"))): _*)
    }
    // both sides of the candidate self-join read this — cache so the
    // 64-aggregate signature pass runs once, not twice
    val banded = sig.select(col("doc_id"),
      posexplode(array(bandSigs: _*)).as(Seq("band", "bsig"))).cache()
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    verifyJaccard(cand, sets)
      .filter(col("jaccard") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  // ---- SimHash ---------------------------------------------------------

  /** Candidate near-dup pairs by SimHash hamming distance ≤
    * maxHamming. Banding: 8 chunks of 8 bits — any pair within
    * hamming 7 shares at least one chunk (pigeonhole), so recall is
    * exact for the default. SimHash scores token-*distribution*
    * similarity, so on narrow-vocabulary corpora it is a recall-
    * oriented candidate generator (feed survivors to an exact
    * verifier); at larger corpus scale, widen chunks (4×16) to keep
    * per-bucket fanout bounded. */
  def simhashPairs(s: SparkSession, d: String, maxHamming: Int = 7): DataFrame = {
    val t = TextOps.toks(col("text"))
    val sigs = Tables.documents(s, d)
      .select(col("doc_id"), SimHash.simhash64(s, t).as("sig"))
    val chunks = (0 until 8).map(i =>
      shiftright(col("sig"), i * 8).bitwiseAND(lit(0xFFL)))
    val chunked = sigs.select(col("doc_id"), col("sig"),
      posexplode(array(chunks: _*)).as(Seq("chunk_idx", "chunk_val"))).cache()
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id1"), col("id2"))
  }

  // ---- exact n-gram Jaccard -------------------------------------------

  /** Exact all-pairs n-gram Jaccard ≥ threshold with prefix filtering
    * (PPJoin family, Xiao et al., WWW'08): under ANY fixed global
    * shingle order, a pair at Jaccard ≥ t must collide inside each
    * side's first |d| - ⌈t·|d|⌉ + 1 shingles. Using hash order as
    * the global order makes the prefix a `slice` of the already
    * sorted per-doc shingle array — zero extra shuffles — and only
    * those prefix postings are self-joined, with a length filter
    * (t·max ≤ min) ahead of exact set verification. */
  def ngramJaccard(s: SparkSession, d: String, threshold: Double = 0.8): DataFrame = {
    // one scan-side pass feeds prefix build and verification alike
    val sets = docShingleSets(Tables.documents(s, d)).cache()
    val prefixLen = (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int")
    val prefix = sets.select(col("doc_id"), col("n"),
      explode(slice(col("hs"), lit(1), greatest(prefixLen, lit(0)))).as("h"))
    val cand = prefix.as("a")
      .join(prefix.as("b"), col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id") &&
        least(col("a.n"), col("b.n")) >=
          ceil(lit(threshold) * greatest(col("a.n"), col("b.n"))))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    verifyJaccard(cand, sets)
      .filter(col("jaccard") >= threshold)
      .orderBy(col("id1"), col("id2"))
  }

  // ---- embedding cosine ------------------------------------------------

  /** Embedding near-dup pairs: random-hyperplane LSH buckets vectors
    * (SimilarityOps.lshBucket), exact cosine verifies within buckets.
    * nBits controls bucket granularity / recall. */
  def embeddingPairs(s: SparkSession, d: String,
                     threshold: Double = 0.95, nBits: Int = 4): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val bucketed = emb.withColumn("bucket",
      SimilarityOps.lshBucket(col("embedding"), nBits)).cache()
    val cand = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        col("a.embedding").as("e1"), col("b.embedding").as("e2"))
    cand
      .withColumn("cosine", round(SimilarityOps.cosine(col("e1"), col("e2")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id1"), col("id2"), col("cosine"))
      .orderBy(col("id1"), col("id2"))
  }
}
