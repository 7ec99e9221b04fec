package graft

import graft.ops.{Forecast, TimeSeriesOps}
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  test("resampleDaily produces a dense daily spine with zero-filled gaps") {
    val out = TimeSeriesOps.resampleDaily(spark, sf).collect()
    val days = out.map(_.getTimestamp(0).getTime)
    val diffs = days.sliding(2).map(p => p(1) - p(0)).toSet
    assert(diffs === Set(86400000L)) // every consecutive step is exactly 1 day
    val total = out.map(_.getLong(1)).sum
    assert(total === Tables.orders(spark, sf).count())
  }

  test("pivotWide browse column equals click+view totals") {
    val wide = TimeSeriesOps.pivotWide(spark, sf)
    val browse = wide.agg(sum("browse")).first().getLong(0)
    val clickView = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "view")).count()
    assert(browse === clickView)
  }

  test("trainTestSplit marks exactly the trailing days as test") {
    val out = TimeSeriesOps.trainTestSplit(spark, sf, testDays = 5).collect()
    val (test, train) = out.partition(_.getString(2) == "test")
    assert(test.length === 5)
    assert(test.map(_.getTimestamp(0)).min.after(
      train.map(_.getTimestamp(0)).max))
  }

  test("deeparExport emits one ordered series per type with valid JSON") {
    val rows = TimeSeriesOps.deeparExport(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("click", "error", "purchase", "signup", "view"))
    rows.foreach { r =>
      val json = r.getString(2)
      assert(json.startsWith("""{"start":"""))
      assert(json.contains(""""target":["""))
    }
  }

  test("seasonalNaive forecasts the holdout horizon with ordered bounds") {
    val f = Forecast.seasonalNaive(spark, sf).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val (lo, pred, hi) = (r.getDouble(4), r.getDouble(3), r.getDouble(5))
      assert(lo <= pred && pred <= hi)
    }
  }

  test("evaluate yields per-type MAE and coverage in [0,1]") {
    val e = Forecast.evaluate(spark, sf).collect()
    assert(e.nonEmpty)
    e.foreach { r =>
      assert(r.getDouble(1) >= 0)
      val cov = r.getDouble(2)
      assert(cov >= 0 && cov <= 1)
    }
  }
}
