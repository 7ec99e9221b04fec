package graft

import graft.ops.SampleOps
import org.apache.spark.sql.functions._

class SampleSpec extends SparkSpec {

  test("hash sampling is deterministic, consistent across tables, ~fraction") {
    val docs = Tables.documents(spark, sf)
    val ids1 = SampleOps.sampleByHash(docs, "doc_id", 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = SampleOps.sampleByHash(docs, "doc_id", 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2) // reproducible run to run
    // consistency: a DIFFERENT table keyed by the same id samples the
    // same key set — the property rand() sampling can never give
    val derived = docs.select(col("doc_id"), length(col("text")).as("len"))
    val ids3 = SampleOps.sampleByHash(derived, "doc_id", 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids3)
    // 64/256 = 25% ± sampling noise on a small corpus
    val frac = ids1.size.toDouble / docs.count()
    assert(frac > 0.10 && frac < 0.40, s"fraction $frac")
    // edge buckets: 0 keeps nothing, 256 keeps everything
    assert(SampleOps.sampleByHash(docs, "doc_id", 0).count() === 0)
    assert(SampleOps.sampleByHash(docs, "doc_id", 256).count() === docs.count())
  }

  test("hash split partitions every row once at ~80/10/10") {
    val docs = Tables.documents(spark, sf)
    val out = SampleOps.hashSplit(docs, "doc_id")
    assert(out.count() === docs.count()) // total preserved
    val byRow = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(byRow.map(_._1).distinct.length === byRow.length) // one label each
    val counts = byRow.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    val n = byRow.length.toDouble
    assert(counts("train") / n > 0.6, s"train share ${counts("train") / n}")
    // split assignment agrees with standalone sampling on the same
    // buckets: the first 204/256 sample IS the train set
    val trainIds = byRow.filter(_._2 == "train").map(_._1).toSet
    val sampled = SampleOps.sampleByHash(docs, "doc_id", 204)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds === sampled)
  }
}
