package graft

import graft.ops.GraphOps
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  test("pagerank: star hub out-ranks its leaves, leaves tie, and the " +
       "scaled mass sums to N") {
    import spark.implicits._
    // undirected star a—{b,c,d}: the hub receives three whole leaf
    // ranks per round, each leaf a third of the hub's
    val pairs = Seq(("a", "b"), ("a", "c"), ("a", "d")).toDF("src", "dst")
    val rows = GraphOps.pageRankOn(pairs, iters = 5, topN = 10).collect()
    assert(rows.length === 4)
    val byNode = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(byNode("a") > byNode("b"))
    assert(byNode("b") === byNode("c") && byNode("c") === byNode("d"))
    // deterministic integer iteration ⇒ EXACT values: the bipartite
    // star oscillates around the fixed point (eigenvalue −d), and
    // round 5 lands at hub 0.581662 · 4 = 2.3266 (hand-iterated)
    assert(byNode("a") === 2.3266, s"hub ${byNode("a")}")
    assert(byNode("b") === 0.5578, s"leaf ${byNode("b")}")
    // total mass is conserved up to integer-truncation loss
    val mass = rows.map(_.getDouble(1)).sum
    assert(mass <= 4.0 + 1e-9 && mass > 3.99, s"mass $mass")
  }

  test("pagerank: sf graph ranks every supplier (the degree hubs) " +
       "above every order, descending") {
    val rows = GraphOps.pageRank(spark, sf).collect()
    assert(rows.length === 20)
    val ranks = rows.map(_.getDouble(1))
    assert(ranks.sameElements(ranks.sortBy(-_)))
    // sf0.001 has ~10 suppliers; all of them outrank every order node
    val (sups, ords) = rows.partition(_.getString(0).startsWith("s"))
    assert(sups.nonEmpty && ords.nonEmpty)
    assert(sups.map(_.getDouble(1)).min > ords.map(_.getDouble(1)).max)
    assert(sups.forall(_.getDouble(1) > 1.0)) // hubs above average
  }
}
