package graft

import graft.ops.MultimodalOps

class MultimodalSpec extends SparkSpec {

  test("extractFeatures: one row per document, deterministic features") {
    val out = MultimodalOps.extractFeatures(spark, sf)
    assert(out.columns.toSeq === Seq(
      "doc_id", "source", "byte_len", "width", "height", "features"))
    val rows = out.collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getInt(2) > 0)            // byte_len
      assert(r.getInt(3) % 16 === 0)     // width from stub decoder grid
      assert(r.getString(5).split(",").length === 8) // 8-dim JSON vector
    }
    // determinism: second run yields identical features
    val again = MultimodalOps.extractFeatures(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
