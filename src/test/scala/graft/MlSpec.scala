package graft

import graft.ops.MlOps
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {

  test("cluster: every vector assigned, clusters are used, deterministic") {
    val out = MlOps.cluster(spark, sf).collect()
    assert(out.length === Tables.embeddings(spark, sf).count())
    val used = out.map(_.getInt(1)).distinct
    assert(used.length > 1)
    val again = MlOps.cluster(spark, sf).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("classify: predictions cover the test split with sane labels") {
    val out = MlOps.classify(spark, sf)
    val n = Tables.embeddings(spark, sf).filter(col("vec_id") % 5 === 0).count()
    assert(out.count() === n)
    out.collect().foreach { r =>
      val p = r.getInt(2)
      assert(p >= 0 && p <= 9)
    }
  }
}
