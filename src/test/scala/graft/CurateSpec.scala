package graft

import graft.ops.CurateOps

class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("curate: quality gate, exact dedup, and decontamination compose") {
    // good, long, stopword-bearing base text (> 100 chars)
    val a = "the quick brown fox jumps over the lazy dog and runs to the " +
      "river in the morning light while birds sing of summer days ahead"
    val b = "every model of the world is built from data and the data must " +
      "be clean of leaks to keep the evaluation honest and fair for all"
    val c = "completely different unique content about mountains and rivers " +
      "that no other document in this corpus shares with anything else here"
    val corpus = Seq(
      2L  -> a,               // kept
      4L  -> a,               // exact duplicate of 2 → dropped
      6L  -> (b + " extra"),  // near-dups reference doc 1 → contaminated
      8L  -> "too short",     // fails the quality gate
      10L -> c                // kept
    ).toDF("doc_id", "text")
    val reference = Seq(1L -> b).toDF("doc_id", "text")
    val out = CurateOps.curate(corpus, reference)
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(2L, 10L))
  }
}
