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

  test("in-plan kmeans separates two obvious blobs and reports their " +
       "true majority labels") {
    import spark.implicits._
    // blob A at (0, 0) with label 0, blob B at (1, 1) with label 1;
    // seeds are vec_ids 0 (in A) and 1 (in B)
    val emb = Seq(
      (0L, 0, Array(0.0f, 0.1f)), (2L, 0, Array(0.1f, 0.0f)),
      (4L, 0, Array(0.05f, 0.05f)),
      (1L, 1, Array(1.0f, 0.9f)), (3L, 1, Array(0.9f, 1.0f)),
      (5L, 1, Array(0.95f, 0.95f)))
      .toDF("vec_id", "label", "embedding")
    val rows = MlOps.kmeansPlanOn(emb, k = 2, iters = 2).collect()
    assert(rows.length === 2)
    val byCluster = rows.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(byCluster(0L)._1 === 3L && byCluster(0L)._3 === 0)
    assert(byCluster(1L)._1 === 3L && byCluster(1L)._3 === 1)
    // within-blob spread is tiny relative to the blob separation
    rows.foreach(r => assert(r.getDouble(2) < 0.05, r.toString))
  }

  test("in-plan kmeans on sf embeddings: clusters cover every vector") {
    val rows = MlOps.kmeansPlan(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ===
      Tables.embeddings(spark, sf).count())
    assert(rows.forall(_.getDouble(2) > 0))
  }
}
