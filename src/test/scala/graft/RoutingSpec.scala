package graft

import graft.ops.{Analytics, GraphOps, Recommend, Routing, SimilarityOps}
import org.apache.spark.sql.DataFrame

/** The scale-tier dial: below the bytes threshold the router must be
  * bit-identical to the exact face, above it bit-identical to the
  * scale tier — no third behavior, no schema surprises beyond the
  * chosen face's own. Thresholds are forced to the two extremes so
  * the test pins the ROUTING, not the box's file sizes. */
class RoutingSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("plan-stats dial: positive bytes, monotone tier choice") {
    val b = Routing.planBytes(Tables.events(spark, sf))
    assert(b > 0)
    assert(Routing.tierFor(Tables.events(spark, sf), Long.MaxValue)
      === Routing.Exact)
    assert(Routing.tierFor(Tables.events(spark, sf), 0L) === Routing.Scale)
  }

  test("triangles route: exact face under the dial, DOULION over it") {
    assert(rows(Routing.trianglesAuto(spark, sf,
        exactMaxBytes = Long.MaxValue))
      === rows(GraphOps.triangles(spark, sf)))
    assert(rows(Routing.trianglesAuto(spark, sf, exactMaxBytes = 0L))
      === rows(graft.ops.GraphOps.trianglesSampledOn(
        Tables.lineitem(spark, sf).select(
          org.apache.spark.sql.functions.col("l_orderkey").as("basket"),
          org.apache.spark.sql.functions.col("l_partkey").as("item")),
        16, 300)))
  }

  test("dau/wau route: exact distinct under the dial, HLL face over it") {
    assert(rows(Routing.dauWauAuto(spark, sf, exactMaxBytes = Long.MaxValue))
      === rows(Analytics.dauWau(spark, sf)))
    assert(rows(Routing.dauWauAuto(spark, sf, exactMaxBytes = 0L))
      === rows(Analytics.dauWauChecked(spark, sf)))
  }

  test("item-cosine route: all-pairs under the dial, DIMSUM over it") {
    assert(rows(Routing.itemCosineAuto(spark, sf,
        exactMaxBytes = Long.MaxValue))
      === rows(Recommend.itemCosine(spark, sf)))
    assert(rows(Routing.itemCosineAuto(spark, sf, exactMaxBytes = 0L))
      === rows(Recommend.itemCosineDimsum(spark, sf)))
  }

  test("ANN route: brute force under the dial, IVF over it") {
    assert(rows(Routing.annTopKAuto(spark, sf,
        exactMaxBytes = Long.MaxValue))
      === rows(SimilarityOps.bruteForceTopK(spark, sf)))
    assert(rows(Routing.annTopKAuto(spark, sf, exactMaxBytes = 0L))
      === rows(SimilarityOps.ivfTopK(spark, sf)))
  }

  test("embedding-pairs route: exact all-pairs under the dial, " +
       "hyperplane LSH over it") {
    import graft.ops.DedupOps
    assert(rows(Routing.embeddingPairsAuto(spark, sf,
        exactMaxBytes = Long.MaxValue))
      === rows(DedupOps.embeddingPairs(spark, sf)))
    assert(rows(Routing.embeddingPairsAuto(spark, sf, exactMaxBytes = 0L))
      === rows(DedupOps.embeddingPairsLsh(spark, sf, threshold = 0.45,
        nTables = 4)))
  }
}
