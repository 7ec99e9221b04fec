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

  /** Additive Holt-Winters (triple exponential smoothing) per series
    * — the classical-model step up from seasonal-naive: level, trend,
    * and a rotating seasonal vector updated by one recursion over the
    * observed days, then `horizon` point forecasts
    * level + h·trend + seas[(n+h-1) mod period].
    *
    * The recursion is inherently sequential PER SERIES, so it runs in
    * `flatMapGroups` — one task per series, state O(period), series
    * count = parallelism: exactly the work shape a driver-side loop
    * would serialize and this keeps distributed. Initialization is
    * the classical one (level = first-season mean, trend =
    * season-mean difference / period, seas = first-season residuals);
    * series shorter than two seasons emit nothing.
    *
    * Cross-engine determinism: the oracle replays the SAME recursion
    * in a DuckDB recursive CTE with the arithmetic written
    * identically — including `(1 - 0.3)` kept as a subtraction, since
    * the double literal 0.7 is NOT the same IEEE value — so the 4dp
    * forecasts match bit-for-bit. Output: (event_type, h, pred). */
  def holtWinters(s: SparkSession, d: String, period: Int = 7,
                  horizon: Int = 7, alpha: Double = 0.3,
                  beta: Double = 0.1, gamma: Double = 0.2): DataFrame = {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("event_type"), col("day"), col("cnt"))
      .as[(String, java.sql.Timestamp, Long)]
    daily.groupByKey(_._1)
      .flatMapGroups { (k: String, it: Iterator[(String, java.sql.Timestamp, Long)]) =>
        val ys = it.toArray.sortBy(_._2.getTime).map(_._3.toDouble)
        val n = ys.length
        if (n < 2 * period) Iterator.empty
        else {
          var level = ys.take(period).sum / period
          val m2 = ys.slice(period, 2 * period).sum / period
          var trend = (m2 - level) / period
          val seas = Array.tabulate(period)(i => ys(i) - level)
          var t = period
          while (t < n) {
            val y = ys(t)
            val sOld = seas(t % period)
            val newLevel = alpha * (y - sOld) + (1 - alpha) * (level + trend)
            trend = beta * (newLevel - level) + (1 - beta) * trend
            seas(t % period) = gamma * (y - newLevel) + (1 - gamma) * sOld
            level = newLevel
            t += 1
          }
          (1 to horizon).iterator.map { h =>
            (k, h, level + h * trend + seas((n + h - 1) % period))
          }
        }
      }
      .toDF("event_type", "h", "pred")
      .select(col("event_type"), col("h"), round(col("pred"), 4).as("pred"))
      .orderBy(col("event_type"), col("h"))
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
