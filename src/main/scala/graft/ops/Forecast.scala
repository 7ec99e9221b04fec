package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed quantile forecasting — the capability the reference
  * delegates to SageMaker DeepAR (GluePySparkMLFeatureEngineering
  * cells 49-57: context_length=14, prediction_length, quantile
  * predictions [0.1, 0.5, 0.9]) re-expressed as a Spark-native
  * seasonal-naive model with empirical residual quantiles: per
  * series, pred(t) = value(t - period) + q50(residuals), with
  * [q10, q90] as the prediction interval. Everything is windows +
  * exact `percentile` aggregates — one shuffle per stage, scales
  * with series count, no driver state.
  */
object Forecast {

  /** Forecast the last `horizon` days of each event_type series.
    * Output: event_type, day, actual, pred, lo, hi. */
  def seasonalNaive(s: SparkSession, d: String,
                    period: Int = 7, horizon: Int = 7): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lagged = daily.withColumn("lagp", lag(col("cnt"), period).over(w))
    val mx = daily.agg(max(col("day")).as("mx"))
    val t = lagged.crossJoin(broadcast(mx))

    val train = t
      .filter(col("day") <= col("mx") - expr(s"interval $horizon day") &&
              col("lagp").isNotNull)
      .withColumn("resid", col("cnt") - col("lagp"))
    val qs = train.groupBy(col("event_type")).agg(
      expr("percentile(resid, 0.1)").as("q10"),
      expr("percentile(resid, 0.5)").as("q50"),
      expr("percentile(resid, 0.9)").as("q90"))

    t.filter(col("day") > col("mx") - expr(s"interval $horizon day"))
      .join(broadcast(qs), Seq("event_type"))
      .select(col("event_type"), col("day"),
        col("cnt").as("actual"),
        round(col("lagp") + col("q50"), 4).as("pred"),
        round(col("lagp") + col("q10"), 4).as("lo"),
        round(col("lagp") + col("q90"), 4).as("hi"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Forecast evaluation: per-series MAE and interval coverage —
    * the capability of TestingForecastResults.ipynb's quantile
    * plots, as a metric table. */
  def evaluate(s: SparkSession, d: String): DataFrame =
    seasonalNaive(s, d)
      .groupBy(col("event_type"))
      .agg(
        round(avg(abs(col("actual") - col("pred"))), 4).as("mae"),
        round(avg(when(col("actual") >= col("lo") &&
                       col("actual") <= col("hi"), 1.0d).otherwise(0.0d)), 4)
          .as("coverage"))
      .orderBy(col("event_type"))
}
