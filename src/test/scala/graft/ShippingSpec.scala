package graft

import graft.ops.Shipping
import org.apache.spark.sql.functions._

/** Invariants for the round-12 TPC-H shipping block (Q12/Q21 over the
  * derived commit/receipt offsets + ship modes). The oracle gate does
  * the value-exact cross-engine compare at five scales; these pin the
  * SEMANTICS — offset ranges, both Q12 gate branches genuinely
  * populated, and Q21's one-aggregate reformulation equal to a direct
  * exists/not-exists recomputation. */
class ShippingSpec extends SparkSpec {

  private def derived() = {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber")).collect()
      .map { r =>
        val (ok, pk, sk) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val ln = r.getInt(3).toLong
        val commit = (ok * 13 + sk * 7 + ln * 3) % 61 - 30
        val receipt = (ok * 11 + pk * 3 + ln * 7) % 30 + 1
        val mode = Shipping.MODES(((ok * 3 + pk * 5 + ln) % 7).toInt)
        (ok, sk, commit, receipt, mode)
      }
    li
  }

  test("derived shipping columns: offsets in range, every mode present, " +
       "both q12 gate branches and both lateness outcomes populated") {
    val rows = derived()
    assert(rows.forall(t => t._3 >= -30 && t._3 <= 30))
    assert(rows.forall(t => t._4 >= 1 && t._4 <= 30))
    assert(rows.map(_._5).distinct.sorted ===
      Shipping.MODES.sorted.toArray)
    // q12's conjunctive gate (ship < commit < receipt) holds for some
    // rows and fails for others — the filter is a real filter
    val gate = rows.count(t => t._3 > 0 && t._3 < t._4)
    assert(gate > 0 && gate < rows.length)
    // late (receipt > commit) and on-time both occur — q21's split is real
    val late = rows.count(t => t._4 > t._3)
    assert(late > 0 && late < rows.length)
  }

  test("q12: counts match an independent per-mode recomputation") {
    val prio = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // replicate the registry defaults: SHIP/RAIL, receipt year 1997
    val shipTs = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_shipdate")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3).toLong, r.get(4) match {
          case t: java.sql.Timestamp => t.toLocalDateTime
          case l: java.time.LocalDateTime => l
        }))
    val expect = collection.mutable.Map[String, (Long, Long)]()
    shipTs.foreach { case (ok, pk, sk, ln, ts) =>
      val commit = (ok * 13 + sk * 7 + ln * 3) % 61 - 30
      val receipt = (ok * 11 + pk * 3 + ln * 7) % 30 + 1
      val mode = Shipping.MODES(((ok * 3 + pk * 5 + ln) % 7).toInt)
      val rcptYear = ts.plusDays(receipt).getYear
      if (Seq("SHIP", "RAIL").contains(mode) && commit > 0 &&
          commit < receipt && rcptYear == 1997) {
        val high = Seq("1-URGENT", "2-HIGH").contains(prio(ok))
        val (h, l) = expect.getOrElse(mode, (0L, 0L))
        expect(mode) = if (high) (h + 1, l) else (h, l + 1)
      }
    }
    val out = Shipping.shipmodePriority(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === expect.toMap)
    assert(out.nonEmpty)
  }

  test("q21: the one-aggregate plan equals a direct exists/not-exists " +
       "recomputation, for the nation that actually has culprits") {
    val fOrders = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val rows = derived().filter(t => fOrders(t._1))
    // direct semantics: per order, the supplier set and the late set;
    // culprit orders have >= 2 suppliers and exactly one late one
    val expect = collection.mutable.Map[Long, Long]()
    rows.groupBy(_._1).foreach { case (_, ls) =>
      val supps = ls.map(_._2).toSet
      val lateSupps = ls.filter(t => t._4 > t._3).map(_._2).toSet
      if (supps.size >= 2 && lateSupps.size == 1)
        expect(lateSupps.head) = expect.getOrElse(lateSupps.head, 0L) + 1
    }
    assert(expect.nonEmpty, "no culprit orders at this sf — tune hashes")
    val nationOf = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    val nameOf = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nk = nationOf(expect.maxBy(_._2)._1)
    val out = Shipping.suppliersWaiting(spark, sf, s"NATION_$nk").collect()
    val expectNation = expect.filter { case (skk, _) => nationOf(skk) == nk }
      .map { case (skk, n) => nameOf(skk) -> n }.toMap
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap === expectNation)
    // ordering: numwait desc, then name
    val keys = out.map(r => (-r.getLong(1), r.getString(0)))
    assert(keys.sameElements(keys.sorted))
  }
}
