package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers:
  *  - brute force: broadcast the (small) query set against the
  *    corpus — the exact baseline; corpus is never self-joined.
  *  - LSH: random-hyperplane buckets shared by queries and corpus —
  *    only same-bucket pairs are scored.
  *  - IVF: one k-means-lite assignment pass builds centroid cells;
  *    queries probe their nearest cell(s) only. Two-stage top-k
  *    (cell-local then global) keeps the shuffle narrow.
  */
object SimilarityOps {

  /** Cosine similarity of two float-array columns — a native
    * codegen'd Catalyst expression (graft.functions.CosineSim); the
    * equivalent zip_with/aggregate composition evaluates its lambdas
    * interpreted and is ~5× slower in the ANN hot loop. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExprs.cosineSim(a, b)

  private def queries(s: SparkSession, d: String, nQueries: Int): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  /** Exact top-k: broadcast the query set, score every corpus vector,
    * rank per query. */
  def bruteForceTopK(s: SparkSession, d: String,
                     k: Int = 5, nQueries: Int = 10): DataFrame = {
    val corpus = Tables.embeddings(s, d)
    val scored = corpus.crossJoin(broadcast(queries(s, d, nQueries)))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 4).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  private val dim = 64

  /** Deterministic random-hyperplane bucket id (nBits sign bits).
    * Planes are fixed-seed Gaussian literals baked into the plan; the
    * per-row work is nBits compact zip_with/aggregate dot products
    * instead of an unrolled nBits×dim expression tree, which keeps
    * codegen small and fast. */
  private[ops] def lshBucket(emb: Column, nBits: Int): Column = {
    val rng = new java.util.Random(42)
    val planes: Seq[Seq[Float]] =
      Seq.fill(nBits)(Seq.fill(dim)(rng.nextGaussian().toFloat))
    planes.zipWithIndex.map { case (p, i) =>
      when(graft.functions.VectorExprs.dotProduct(emb, typedLit(p)) >= 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed approximate top-k: queries and corpus share the
    * bucket id; only same-bucket candidates are scored. Recall trades
    * against nBits. */
  def lshTopK(s: SparkSession, d: String,
              k: Int = 5, nQueries: Int = 10, nBits: Int = 4): DataFrame = {
    val corpus = Tables.embeddings(s, d)
      .withColumn("bucket", lshBucket(col("embedding"), nBits))
    val q = queries(s, d, nQueries)
      .withColumn("bucket", lshBucket(col("q_emb"), nBits))
    val scored = corpus.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 4).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** IVF approximate top-k. Cells come from a deterministic seed set
    * (first nCells vectors) refined by one mean-update pass — a
    * k-means-lite fit done entirely with joins and aggregates; the
    * centroid table stays small and is broadcast everywhere. Queries
    * probe their nProbe nearest cells (multi-probe recovers most of
    * the recall single-probe IVF loses at cell boundaries). */
  def ivfTopK(s: SparkSession, d: String,
              k: Int = 5, nQueries: Int = 10, nCells: Int = 8,
              nProbe: Int = 2): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val seeds = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))

    def nearestCells(df: DataFrame, vecCol: String, cents: DataFrame,
                     probes: Int): DataFrame = {
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("sim", cosine(col(vecCol), col("c_emb")))
      val w = Window.partitionBy(col(df.columns.head))
        .orderBy(col("sim").desc, col("cell"))
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= probes).drop("rnk", "sim", "c_emb")
    }

    // one refinement pass: assign to seeds, recompute cell means
    val assigned = nearestCells(emb, "embedding", seeds, 1)
    val dims = (0 until dim).map(i =>
      avg(element_at(col("embedding"), i + 1)).as(s"m$i"))
    val centroids = assigned.groupBy(col("cell"))
      .agg(dims.head, dims.tail: _*)
      .select(col("cell"), array((0 until dim).map(i => col(s"m$i")): _*)
        .cast("array<float>").as("c_emb"))

    val cells = nearestCells(emb, "embedding", centroids, 1)
    val qCells = nearestCells(queries(s, d, nQueries), "q_emb", centroids, nProbe)

    val scored = cells.join(broadcast(qCells), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 4).as("cosine"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col("q_id"), col("rank"))
  }
}
