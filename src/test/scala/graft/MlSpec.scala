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

  test("checked cluster face: every row's verdicts hold") {
    val rows = MlOps.clusterChecked(spark, sf).collect()
    assert(rows.length === Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      assert(r.getBoolean(1), s"cluster out of range: $r")
      assert(r.getBoolean(2), s"assignment is not the centroid argmin: $r")
    }
  }

  test("checked classify face: distribution/argmax verdicts hold on the split") {
    val rows = MlOps.classifyChecked(spark, sf).collect()
    val n = Tables.embeddings(spark, sf).filter(col("vec_id") % 5 === 0).count()
    assert(rows.length === n)
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"scoring contract violated: $r")
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

  test("evalClassification: hand fixture incl. hallucinated + starved class") {
    import spark.implicits._
    // true classes {0, 1, 2}; class 3 is hallucinated (predicted, never
    // true), class 2 is starved (true, never predicted)
    val preds = Seq(
      (0, 0), (0, 0), (0, 1),     // class 0: 3 true, 2 tp
      (1, 1), (1, 3),             // class 1: 2 true, 1 tp
      (2, 0), (2, 3)              // class 2: 2 true, 0 tp
    ).toDF("true_label", "pred_label")
    val out = MlOps.evalClassification(preds).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out.keySet === Set(0, 1, 2, 3)) // full union of axes
    // class 0: n_true=3 n_pred=3 tp=2 → p=r=0.6667, f1=0.6667
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getLong(3)) === ((3L, 3L, 2L)))
    assert(out(0).getDouble(4) === 0.6667 && out(0).getDouble(5) === 0.6667)
    // class 1: n_pred=2, tp=1 → p=0.5, r=0.5, f1=0.5
    assert(out(1).getDouble(4) === 0.5 && out(1).getDouble(6) === 0.5)
    // starved class 2: predicted never → precision 0 (not null), recall 0
    assert((out(2).getLong(2), out(2).getDouble(4), out(2).getDouble(6)) === ((0L, 0.0, 0.0)))
    // hallucinated class 3: n_true=0 → recall 0 row still present
    assert((out(3).getLong(1), out(3).getLong(2), out(3).getDouble(5)) === ((0L, 2L, 0.0)))
  }
}
