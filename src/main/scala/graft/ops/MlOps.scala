package graft.ops

import graft.Tables
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.StandardScaler
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MLlib pipelines over the embeddings table — the distributed
  * counterpart of the reference's feature-engineering → model
  * workflow (GluePySparkMLFeatureEngineering.ipynb prepares features
  * in Spark, then ships to a managed trainer; here training itself
  * is Spark-native). Seeds are fixed so outputs are deterministic.
  */
object MlOps {

  private def featurized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("features", array_to_vector(col("embedding")))

  /** KMeans clustering of the embedding space (fixed seed). The
    * fitted centroids are broadcast by MLlib's transform — scoring
    * is a narrow map over the corpus. */
  def cluster(s: SparkSession, d: String, k: Int = 8): DataFrame = {
    val df = featurized(s, d).cache()
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").fit(df)
    model.transform(df)
      .select(col("vec_id"), col("prediction").as("cluster"))
      .orderBy(col("vec_id"))
  }

  /** Scaler → logistic-regression Pipeline predicting the label
    * column; time-honored 80/20 split on a deterministic key. */
  def classify(s: SparkSession, d: String): DataFrame = {
    val df = featurized(s, d).cache()
    val train = df.filter(col("vec_id") % 5 =!= 0)
    val test  = df.filter(col("vec_id") % 5 === 0)
    val pipeline = new Pipeline().setStages(Array(
      new StandardScaler().setInputCol("features").setOutputCol("scaled"),
      new LogisticRegression().setFeaturesCol("scaled").setLabelCol("label")
        .setMaxIter(20)))
    val model = pipeline.fit(train)
    model.transform(test)
      .select(col("vec_id"), col("label"),
        col("prediction").cast("int").as("predicted"))
      .orderBy(col("vec_id"))
  }
}
