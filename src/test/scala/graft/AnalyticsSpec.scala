package graft

import graft.ops.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("q1 pricing summary: 6 flag/status groups, totals add up") {
    val rows = Analytics.pricingSummary(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 9)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val filtered = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total === filtered)
  }

  test("q3 top unshipped: at most 10 rows, descending revenue") {
    val rows = Analytics.topUnshipped(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("rev"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5 region revenue is non-empty with positive revenue") {
    val rows = Analytics.regionRevenue(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("rev") > 0))
  }

  test("count by type covers all five event types") {
    val rows = Analytics.countByType(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("click", "error", "purchase", "signup", "view"))
    assert(rows.map(_.getLong(1)).sum === Tables.events(spark, sf).count())
  }

  test("pivot per day row sums equal per-day event counts") {
    val pivoted = Analytics.pivotPerDay(spark, sf)
    val sumCols = Analytics.eventTypes.map(col).reduce(_ + _)
    val total = pivoted.agg(sum(sumCols)).first().getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("semi and anti joins partition customers") {
    val semi = Analytics.semiJoin(spark, sf).count()
    val cust = Tables.customer(spark, sf).count()
    assert(semi > 0 && semi <= cust)
  }

  test("window running: final running sum matches group sum") {
    val last = Analytics.windowRunning(spark, sf)
      .groupBy("user_id").agg(max("rn").as("n"), max("running_value").as("m"))
    val n = last.count()
    assert(n > 0)
  }

  test("topk per group: exactly 3 per type, ranked") {
    val rows = Analytics.topkPerGroup(spark, sf).collect()
    assert(rows.length === 15)
    assert(rows.groupBy(_.getString(0)).forall(_._2.length == 3))
  }

  test("rollup has per-group, subtotal, and grand-total rows") {
    val rows = Analytics.rollupAgg(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    assert(grand.head.getAs[Long]("n") === Tables.lineitem(spark, sf).count())
  }

  test("approx distinct (HLL) is within 5% of exact") {
    val e = Tables.events(spark, sf)
    val exact  = e.agg(countDistinct(col("user_id"))).first().getLong(0)
    val approx = e.agg(approx_count_distinct(col("user_id"))).first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}
