package graft

import graft.ops.DedupOps

class DedupSpec extends SparkSpec {

  test("exact dedup: keep_id count equals distinct texts") {
    val out = DedupOps.exact(spark, sf)
    val distinctTexts = Tables.documents(spark, sf)
      .select("text").distinct().count()
    assert(out.count() === distinctTexts)
  }

  test("minhash LSH finds the same pairs as exact n-gram Jaccard") {
    val lsh = DedupOps.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = DedupOps.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // LSH can only miss, never invent; at J≥0.8 with 16x4 banding the
    // miss probability is ~6e-4 per pair, so expect exact equality here.
    assert(lsh === exact)
    assert(exact.nonEmpty)  // the corpus has planted near-dups
  }

  test("simhash pairs: near-dup docs land within hamming distance") {
    val sim = DedupOps.simhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = DedupOps.ngramJaccard(spark, sf, threshold = 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ~99%-similar docs must collide in simhash space
    assert(planted.nonEmpty && planted.subsetOf(sim))
  }

  test("embedding pairs: output respects the threshold and ordering") {
    val out = DedupOps.embeddingPairs(spark, sf, threshold = 0.4).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }
}
