package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relation-shaped data. Companion to
  * [[DedupOps.clusters]] (connected components): where clustering
  * answers "which nodes belong together", PageRank answers "which
  * nodes matter" — the influence/centrality face of the same
  * edge-list representation.
  */
object GraphOps {

  /** PageRank over the order↔supplier bipartite graph implied by
    * lineitem (an edge per distinct (order, supplier) pair). See
    * [[pageRankOn]] for the iteration design and the cross-engine
    * arithmetic contract. */
  def pageRank(s: SparkSession, d: String, iters: Int = 5,
               topN: Int = 20): DataFrame =
    pageRankOn(Tables.lineitem(s, d)
      .select(concat(lit("o"), col("l_orderkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct(), iters, topN)

  /** PageRank over any (src, dst) pair list. Pairs are symmetrized
    * (both directions added), so the graph is undirected and every
    * node has in- and out-edges — no dangling-mass correction needed.
    * A FIXED `iters`-round power iteration: each round is one
    * equi-join of the rank frame to the edge list and one
    * map-side-combinable sum per destination — one shuffle on the
    * node key per round, the same O(edges) exchange GraphX's Pregel
    * would do, with Catalyst free to pick broadcast vs shuffle per
    * round. No driver-side convergence loop (contrast
    * [[DedupOps.clusters]], where rounds are data-dependent): the
    * round count is fixed, and the only driver action is the node
    * count (the clusters/IVF scalar precedent) — it folds the
    * teleport constant into each round as a literal instead of
    * re-deriving an N subtree per round.
    *
    * FIXED-POINT INTEGER arithmetic: ranks live as BIGINTs in units
    * of 1e-10 (R = r·10^10), damping as the integer pair
    * `dampingPct`/100 (teleport mass (100−dampingPct)·10^8). Double
    * or decimal iterates are one rounding-tie away from cross-engine
    * divergence (Java rounds on the double's shortest decimal
    * rendering, C engines on the binary value — chained quantizations
    * amplify a single flipped tie; both failure modes were OBSERVED
    * against DuckDB before this design), while integer division is
    * bit-identical everywhere. Truncation drops < 1e-10 mass per edge
    * per round — far below the 4dp output precision for any realistic
    * in-degree (a 10^6-degree hub accumulates ≤ ~1e-3 absolute error;
    * raise the scale constant if your graph has such hubs). Output
    * ranks scale by N (so they're O(1)) with half-up 4dp rounding
    * still in integer math, ordered with a node tiebreak under a
    * TakeOrdered top-k.
    *
    * 100 TB posture: the symmetrized edge+degree frame materializes
    * ONCE through a lazy localCheckpoint and every round reads that
    * copy (without it Catalyst inlines the derivation per round —
    * 104 scans in the unrolled tree; an explicit cache() measured
    * 50% slower than even that). Rounds are fixed and few; each is a
    * narrow join+agg on the node key — no all-pairs anything.
    */
  def pageRankOn(pairs: DataFrame, iters: Int, topN: Int,
                 dampingPct: Int = 85): DataFrame = {
    require(dampingPct > 0 && dampingPct < 100,
      s"dampingPct must be in (0, 100), got $dampingPct")
    val teleport = (100L - dampingPct) * 100000000L // (1-d)·10^10
    val edges = pairs.select(col("src"), col("dst"))
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // each of the five rounds references the edge/degree frame and
    // Catalyst would otherwise inline its whole derivation per round
    // (measured: 104 parquet scans in the unrolled tree); a LAZY
    // localCheckpoint truncates the lineage so every round reads the
    // one materialized copy — the dedup_clusters pattern. Storage is
    // one edge-width frame per call, freed with the RDD reference.
    val withDeg = edges.join(outdeg, "src").localCheckpoint(false)
    val nodes = withDeg.select(col("src").as("node")).distinct()
      .localCheckpoint(false)
    // node count as a driver scalar — the iterative-operator
    // precedent (clusters' convergence sums, IVF's cell count): the
    // teleport constant folds into the per-round expression as a
    // literal instead of re-deriving an N subtree every round
    val n = nodes.count()
    val init = nodes.select(col("node"), lit(10000000000L / n).as("r"))
    val ranks = (1 to iters).foldLeft(init) { (prev, _) =>
      withDeg.join(prev.withColumnRenamed("node", "src"), "src")
        .withColumn("__c", expr("r div outdeg"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__c")).as("__s"))
        .select(col("node"),
          expr(s"${teleport / n} + ($dampingPct * __s) div 100").as("r"))
    }
    // N-scaled output, half-up at 4dp — still pure integer math
    // (q counts 1e-4 units), then one exact-integer-to-double cast
    ranks
      .select(col("node"),
        (expr(s"(r * $n + 500000) div 1000000").cast("double") / 10000.0)
          .as("rank_scaled"))
      .orderBy(col("rank_scaled").desc, col("node"))
      .limit(topN)
  }
}
