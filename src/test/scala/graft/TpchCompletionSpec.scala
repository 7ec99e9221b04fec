package graft

import graft.ops.Analytics
import org.apache.spark.sql.functions._

/** Invariants for the round-11 TPC-H completion block (Q7/Q8/Q14/
  * Q15/Q17/Q18 adapted to this schema). Each test cross-checks the
  * face against an independent recomputation at sf0.001 — the oracle
  * gate does the value-exact cross-engine compare; these pin the
  * SEMANTICS (gates, ratios, ordering) so a refactor can't silently
  * change what the query means. */
class TpchCompletionSpec extends SparkSpec {

  test("q7 nation volume: only the two nations, both directions, positive rev") {
    val rows = Analytics.nationVolume(spark, sf).collect()
    assert(rows.nonEmpty)
    val ok = Set("NATION_3", "NATION_8")
    assert(rows.forall { r =>
      val sn = r.getAs[String]("supp_nation")
      val cn = r.getAs[String]("cust_nation")
      ok(sn) && ok(cn) && sn != cn
    })
    assert(rows.forall(_.getAs[Double]("rev") > 0))
    assert(rows.forall { r =>
      val y = r.getAs[Int]("l_year"); y == 1996 || y == 1997 })
  }

  test("q8 market share: ppm is the exact floor of the micro-sum ratio") {
    val rows = Analytics.marketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ppm = r.getAs[Long]("share_ppm")
      val nat = BigInt(math.round(r.getAs[Double]("nation_rev") * 10000))
      val tot = BigInt(math.round(r.getAs[Double]("total_rev") * 10000))
      assert(ppm >= 0 && ppm <= 1000000L)
      assert(nat <= tot)
      assert(BigInt(ppm) === nat * 1000000 / tot)
    }
  }

  test("q14 promo revenue: promo share consistent and years ordered") {
    val rows = Analytics.promoRevenue(spark, sf).collect()
    assert(rows.nonEmpty)
    val years = rows.map(_.getAs[Int]("l_year"))
    assert(years.sameElements(years.sorted))
    rows.foreach { r =>
      val ppm = r.getAs[Long]("promo_ppm")
      val promo = BigInt(math.round(r.getAs[Double]("promo_rev") * 10000))
      val tot = BigInt(math.round(r.getAs[Double]("total_rev") * 10000))
      assert(promo <= tot && BigInt(ppm) === promo * 1000000 / tot)
    }
  }

  test("q15 top supplier: carries the true per-supplier quarterly max") {
    val rows = Analytics.topSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val faceMax = rows.map(_.getAs[Double]("total_rev")).distinct
    assert(faceMax.length === 1) // ties all publish the same max
    val trueMax = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) *
        10000).cast("long")).as("rm"))
      .agg(max(col("rm"))).collect()(0).getLong(0)
    assert(faceMax(0) === trueMax / 10000.0)
  }

  test("q17 small-qty gate matches the 0.2×avg definition on exact integers") {
    val row = Analytics.smallQtyRevenue(spark, sf).collect()(0)
    val nLines = row.getAs[Long]("n_lines")
    // independent recomputation with a window instead of the
    // aggregate-join shape
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(spark, sf).filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey"))
    val li = Tables.lineitem(spark, sf)
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey").as("pk"),
        col("l_quantity").cast("long").as("qc"))
    val w = Window.partitionBy(col("pk"))
    val expected = li
      .withColumn("sumq", sum(col("qc")).over(w))
      .withColumn("nq", count(lit(1)).over(w))
      .filter(col("qc") * 5 * col("nq") < col("sumq"))
      .count()
    assert(nLines === expected)
    assert(row.getAs[Double]("avg_yearly") >= 0)
  }

  test("q13 order-count distribution: custdist sums to the customer count") {
    val rows = Analytics.orderCountDist(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("custdist")).sum
    assert(total === Tables.customer(spark, sf).count())
    // weighted count sum = total orders (every order has a customer)
    val weighted = rows.map(r =>
      r.getAs[Long]("c_count") * r.getAs[Long]("custdist")).sum
    assert(weighted === Tables.orders(spark, sf).count())
  }

  test("q19 discount bands: scalar row, band-filter count matches direct") {
    val row = Analytics.discountBands(spark, sf).collect()(0)
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .count()
    assert(row.getAs[Long]("n_lines") === direct)
    assert(row.getAs[Double]("revenue") >= 0)
  }

  test("q22 global sales: gates are exact-integer versions of the averages") {
    val rows = Analytics.globalSales(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => (0 until 5).contains(
      r.getAs[Int]("cntrycode"))))
    // every selected customer's balance beats the positive mean and
    // engagement sits below the mean — recompute the thresholds
    val cust = Tables.customer(spark, sf)
    val posMeanCents = cust
      .filter(col("c_acctbal") > 0)
      .agg(avg(round(col("c_acctbal") * 100))).collect()(0).getDouble(0)
    val numcust = rows.map(_.getAs[Long]("numcust")).sum
    val direct = cust
      .join(Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_acctbal"))
      .agg(count(col("o_orderkey")).as("n_ord"))
    val meanOrd = direct.agg(avg(col("n_ord"))).collect()(0).getDouble(0)
    val expected = direct.filter(
      round(col("c_acctbal") * 100) > posMeanCents &&
        col("n_ord") < meanOrd).count()
    assert(numcust === expected)
  }

  test("q18 large orders: every row's sum_qty exact and over threshold") {
    val rows = Analytics.largeOrders(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getAs[Long]("sum_qty") > 250))
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
    // spot-check one order's quantity sum against a direct aggregate
    val k = rows.head.getAs[Long]("o_orderkey")
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === k)
      .agg(sum(col("l_quantity").cast("long"))).collect()(0).getLong(0)
    assert(direct === rows.head.getAs[Long]("sum_qty"))
  }
}
