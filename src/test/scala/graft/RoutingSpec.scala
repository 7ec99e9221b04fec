package graft

import graft.ops.{Analytics, DedupOps, GraphOps, Recommend, Routing, SimilarityOps}
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
    val pairs = Tables.lineitem(spark, sf).select(
      org.apache.spark.sql.functions.col("l_orderkey").as("basket"),
      org.apache.spark.sql.functions.col("l_partkey").as("item"))
    // pinned-rate posture: permille passed explicitly
    assert(rows(Routing.trianglesAuto(spark, sf, permille = 300,
        exactMaxBytes = 0L))
      === rows(graft.ops.GraphOps.trianglesSampledOn(pairs, 16, 300)))
    // adaptive posture (default): the dial derives the keep rate
    // from the same plan-bytes estimate the tier choice reads
    assert(rows(Routing.trianglesAuto(spark, sf, exactMaxBytes = 0L))
      === rows(graft.ops.GraphOps.trianglesSampledOn(pairs, 16,
        Routing.adaptivePermille(Routing.planBytes(pairs),
          exactMaxBytes = 0L))))
  }

  test("adaptivePermille: anchored at the dial boundary, m^(-1/3) " +
       "above it, floored, zero-dial safe") {
    // at or below the boundary: the anchor rate, untouched
    assert(Routing.adaptivePermille(BigInt(4L << 30)) === 300)
    assert(Routing.adaptivePermille(BigInt(1)) === 300)
    // one decade over: 300/cbrt(10) = 139 — sampled wedge work back
    // to linear in m
    assert(Routing.adaptivePermille(BigInt((4L << 30) * 10)) === 139)
    // three decades over: 300/10 = 30, exactly at the floor
    assert(Routing.adaptivePermille(BigInt((4L << 30) * 1000)) === 30)
    // six decades over: floored, never starves the estimator
    assert(Routing.adaptivePermille(BigInt(4L << 30) * 1000000) === 30)
    // a zero dial must not divide by zero (the tier-forcing test
    // input): the guard anchors it at 1 byte, so 100 bytes is two
    // "decades" over → 300/cbrt(100) = 64
    assert(Routing.adaptivePermille(BigInt(100), exactMaxBytes = 0L) === 64)
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

  test("ANN route: four rungs — brute force, IVF, sampled-build IVF, " +
       "IVF*PQ") {
    // rung 1: every dial above the input → exact face
    assert(rows(Routing.annTopKAuto(spark, sf,
        exactMaxBytes = Long.MaxValue))
      === rows(SimilarityOps.bruteForceTopK(spark, sf)))
    // rung 2: exact dial forced under, build + memory dials above →
    // IVF with the exact √n-cell build
    assert(rows(Routing.annTopKAuto(spark, sf, exactMaxBytes = 0L,
        ivfBuildMaxBytes = Long.MaxValue, ivfMaxBytes = Long.MaxValue))
      === rows(SimilarityOps.ivfTopK(spark, sf)))
    // rung 3: build dial also forced under → the LINEAR sampled
    // build (the rung that removes the ladder's superlinear fit)
    assert(rows(Routing.annTopKAuto(spark, sf, exactMaxBytes = 0L,
        ivfBuildMaxBytes = 0L, ivfMaxBytes = Long.MaxValue))
      === rows(SimilarityOps.ivfTopKSampled(spark, sf)))
    // rung 4: all dials forced under → the composed IVF*PQ tier
    // (the memory-bounded index that actually ships at 100 TB)
    assert(rows(Routing.annTopKAuto(spark, sf, exactMaxBytes = 0L,
        ivfBuildMaxBytes = 0L, ivfMaxBytes = 0L))
      === rows(SimilarityOps.ivfPqTopK(spark, sf)))
    // all four rungs share the (q_id, vec_id, cosine, rank) contract
    assert(Routing.annTopKAuto(spark, sf, exactMaxBytes = 0L,
        ivfBuildMaxBytes = 0L, ivfMaxBytes = 0L).schema
      === SimilarityOps.bruteForceTopK(spark, sf).schema)
  }

  test("mmr route: exact-scored shortlist under the dial, IVF " +
       "shortlist over it — the greedy stage shared") {
    assert(rows(Routing.mmrRerankAuto(spark, sf,
        exactMaxBytes = Long.MaxValue))
      === rows(SimilarityOps.mmrRerank(spark, sf)))
    assert(rows(Routing.mmrRerankAuto(spark, sf, exactMaxBytes = 0L))
      === rows(SimilarityOps.mmrRerankIvf(spark, sf)))
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

  test("knn-classify route: brute-force scorer under the dial, IVF " +
       "shortlist over it — the vote stage shared") {
    assert(rows(Routing.knnClassifyAuto(spark, sf,
        exactMaxBytes = Long.MaxValue))
      === rows(SimilarityOps.knnClassify(spark, sf)))
    assert(rows(Routing.knnClassifyAuto(spark, sf, exactMaxBytes = 0L))
      === rows(SimilarityOps.knnClassifyIvf(spark, sf)))
    // both tiers emit the same classifier contract
    assert(Routing.knnClassifyAuto(spark, sf, exactMaxBytes = 0L)
      .schema === SimilarityOps.knnClassify(spark, sf).schema)
  }

  test("minhash verify route: exact set verify under the dial, " +
       "signature estimate over it — one stable schema") {
    val docs = Tables.documents(spark, sf)
    val exact = Routing.minhashVerifyAuto(spark, sf,
      exactMaxBytes = Long.MaxValue)
    val est = Routing.minhashVerifyAuto(spark, sf, exactMaxBytes = 0L)
    // STABLE SCHEMA across the dial (ADVICE r13): a consumer binding
    // `jaccard` by name must survive the tier flip; the verification
    // method rides the is_estimate marker instead of the column name
    assert(exact.columns.toSeq === Seq("id1", "id2", "jaccard",
      "is_estimate"))
    assert(exact.schema === est.schema)
    assert(rows(exact.drop("is_estimate"))
      === rows(DedupOps.minhashLsh(spark, sf)))
    assert(rows(est.drop("is_estimate"))
      === rows(DedupOps.minhashEstPairs(docs, threshold = 0.8)
        .withColumnRenamed("est_jaccard", "jaccard")))
    assert(exact.select("is_estimate").distinct().collect()
      .map(_.getBoolean(0)).toSeq === Seq(false))
    assert(est.select("is_estimate").distinct().collect()
      .map(_.getBoolean(0)).toSeq === Seq(true))
  }

  test("simhash route: 4x15 bands under the dial, 3x20 bands over it") {
    val docs = Tables.documents(spark, sf)
    assert(rows(Routing.simhashAuto(spark, sf,
        exactMaxBytes = Long.MaxValue))
      === rows(DedupOps.simhashPairsCheckedOn(docs)))
    assert(rows(Routing.simhashAuto(spark, sf, exactMaxBytes = 0L))
      === rows(DedupOps.simhashPairsCheckedOn(docs,
        maxHamming = 5, bands = 3)))
    // both widths emit the same (id1, id2, hamming, jaccard) contract
    assert(Routing.simhashAuto(spark, sf, exactMaxBytes = 0L)
      .schema === DedupOps.simhashPairsCheckedOn(docs).schema)
  }

  test("percentiles route: exact interpolation under the dial, GK sketch over it") {
    assert(rows(Routing.percentilesAuto(spark, sf,
        exactMaxBytes = Long.MaxValue))
      === rows(Analytics.percentiles(spark, sf)))
    assert(rows(Routing.percentilesAuto(spark, sf, exactMaxBytes = 0L))
      === rows(Analytics.percentilesApprox(spark, sf)))
  }

  test("profile route: exact multi-distinct under the dial, HLL++ over it") {
    val df = Tables.orders(spark, sf)
    val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice")
    assert(rows(Routing.profileAuto(df, cols,
        exactMaxBytes = Long.MaxValue))
      === rows(Analytics.profile(df, cols, approx = false)))
    assert(rows(Routing.profileAuto(df, cols, exactMaxBytes = 0L))
      === rows(Analytics.profile(df, cols, approx = true)))
    // the two tiers share the schema — the declared contract of this
    // route (only the distinct's exactness differs)
    assert(Routing.profileAuto(df, cols, exactMaxBytes = 0L)
      .schema === Analytics.profile(df, cols).schema)
  }

  test("decontaminate ladder: broadcast / bloom / shuffled by reference size") {
    import graft.ops.DedupOps
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val ref = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 2 =!= 0)
    // tiny reference → the map-side broadcast face
    assert(rows(Routing.decontaminateAuto(corpus, ref,
        bcastMaxBytes = Long.MaxValue, bloomMaxBytes = Long.MaxValue))
      === rows(DedupOps.decontaminateBroadcast(corpus, ref)))
    // middle regime → the Bloom-probe face
    assert(rows(Routing.decontaminateAuto(corpus, ref,
        bcastMaxBytes = 0L, bloomMaxBytes = Long.MaxValue))
      === rows(DedupOps.decontaminateBloom(corpus, ref)))
    // big reference → the symmetric shuffled face
    assert(rows(Routing.decontaminateAuto(corpus, ref,
        bcastMaxBytes = 0L, bloomMaxBytes = 0L))
      === rows(DedupOps.decontaminate(corpus, ref)))
  }

  test("span-locator route: broadcast probe under the reference " +
       "budget, symmetric gram join past it — identical values") {
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 2 === 0)
    val ref = docs.filter(
      org.apache.spark.sql.functions.col("doc_id") % 2 =!= 0)
    val bcast = rows(Routing.decontaminateSpansAuto(corpus, ref,
      bcastMaxBytes = Long.MaxValue))
    val sym = rows(Routing.decontaminateSpansAuto(corpus, ref,
      bcastMaxBytes = 0L))
    assert(bcast === rows(DedupOps.decontaminateSpansBroadcast(corpus, ref)))
    assert(sym === rows(DedupOps.decontaminateSpans(corpus, ref)))
    // the two tiers trade plan shape only — values are identical
    assert(bcast === sym)
  }
}
