package graft

import graft.ops.SampleOps
import org.apache.spark.sql.functions._

class SampleSpec extends SparkSpec {

  test("hash sampling is deterministic, consistent across tables, ~fraction") {
    val docs = Tables.documents(spark, sf)
    val ids1 = SampleOps.sampleByHash(docs, "doc_id", 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = SampleOps.sampleByHash(docs, "doc_id", 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2) // reproducible run to run
    // consistency: a DIFFERENT table keyed by the same id samples the
    // same key set — the property rand() sampling can never give
    val derived = docs.select(col("doc_id"), length(col("text")).as("len"))
    val ids3 = SampleOps.sampleByHash(derived, "doc_id", 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids3)
    // 64/256 = 25% ± sampling noise on a small corpus
    val frac = ids1.size.toDouble / docs.count()
    assert(frac > 0.10 && frac < 0.40, s"fraction $frac")
    // edge buckets: 0 keeps nothing, 256 keeps everything
    assert(SampleOps.sampleByHash(docs, "doc_id", 0).count() === 0)
    assert(SampleOps.sampleByHash(docs, "doc_id", 256).count() === docs.count())
  }

  test("stratified sampling honors per-class quotas deterministically") {
    val events = Tables.events(spark, sf).select("event_id", "event_type")
    val out = SampleOps.sampleStratified(events, "event_id", "event_type",
      Map("error" -> 256, "click" -> 64, "view" -> 0), defaultBuckets = 128)
    val got = out.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = events.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("error") === all("error"))       // 256 buckets = keep whole
    assert(!got.contains("view"))               // 0 buckets = drop class
    val clickFrac = got("click").toDouble / all("click")
    assert(clickFrac > 0.10 && clickFrac < 0.40, s"click $clickFrac") // ~64/256
    val sigFrac = got("signup").toDouble / all("signup")
    assert(sigFrac > 0.35 && sigFrac < 0.65, s"signup $sigFrac")      // ~128/256
    // per-key agreement with the flat sampler: same bucketing, so a
    // kept click is exactly a click in the flat 64-bucket sample
    val clicks = events.filter(col("event_type") === "click")
    val flat = SampleOps.sampleByHash(clicks, "event_id", 64)
      .select("event_id").collect().map(_.getLong(0)).toSet
    val strat = out.filter(col("event_type") === "click")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(strat === flat)
  }

  test("domain mixing realizes target shares with exact bucket arithmetic") {
    import spark.implicits._
    // 3 domains × 200 keys; shares a:2 b:1 (c unlisted → dropped),
    // budget 450 of 600: desired a = 300 ≥ 200 → keep-all clamp;
    // desired b = 150 → buckets = 256·150 div 200 = 192
    val rows = for (dom <- Seq("a", "b", "c"); i <- 0 until 200)
      yield (dom.hashCode.toLong * 1000 + i, dom)
    val df = rows.toDF("id", "dom")
    val out = SampleOps.mixDomains(df, "id", "dom",
      Map("a" -> 2L, "b" -> 1L), totalBudget = 450L)
      .select("id", "dom").collect().map(r => (r.getLong(0), r.getString(1)))
    // driver-side replica of the predicate (the oracle's arithmetic)
    def hexBucket(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8"))
        .take(1).map(b => f"${b & 0xff}%02x").mkString
    }
    val expected = rows.collect {
      case (id, "a") => (id, "a") // keep-all
      case (id, "b") if hexBucket(id) < f"${192}%02x" => (id, "b")
    }
    assert(out.toSet === expected.toSet)
    assert(out.count(_._2 == "a") === 200)
    assert(!out.exists(_._2 == "c"))
    // the partial domain's achieved count sits near 200·192/256 = 150
    val nb = out.count(_._2 == "b")
    assert(math.abs(nb - 150) < 30, s"b kept $nb, expected ~150")
  }

  test("domain mixing: a listed positive allocation never silently vanishes") {
    import spark.implicits._
    // 2000-row domain, budget allots it 2 rows: 256·2 div 2000 = 0
    // buckets — without the ≥1 floor the whole domain would disappear
    // from the mixture with no signal. The floor keeps one bucket
    // (~count/256 rows); a zero-row allocation still drops.
    val rows = (0 until 2000).map(i => (i.toLong, "big")) ++
      (0 until 50).map(i => (100000L + i, "tiny"))
    val df = rows.toDF("id", "dom")
    val kept = SampleOps.mixDomains(df, "id", "dom",
        Map("big" -> 1L, "tiny" -> 24L), totalBudget = 50L)
      .select("id", "dom").collect().map(r => (r.getLong(0), r.getString(1)))
    val nBig = kept.count(_._2 == "big")
    assert(nBig > 0, "positive-share domain vanished from the mixture")
    assert(nBig < 50, s"floor must keep ONE bucket, not the domain: $nBig")
    // zero allocation (share·budget div Σshares = 0) is a real drop:
    // the caller asked for nothing
    val none = SampleOps.mixDomains(df, "id", "dom",
        Map("big" -> 1L, "tiny" -> 99L), totalBudget = 50L)
      .filter(col("dom") === "big").count()
    assert(none === 0L)
  }

  test("hash split partitions every row once at ~80/10/10") {
    val docs = Tables.documents(spark, sf)
    val out = SampleOps.hashSplit(docs, "doc_id")
    assert(out.count() === docs.count()) // total preserved
    val byRow = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(byRow.map(_._1).distinct.length === byRow.length) // one label each
    val counts = byRow.groupBy(_._2).view.mapValues(_.length).toMap
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    val n = byRow.length.toDouble
    assert(counts("train") / n > 0.6, s"train share ${counts("train") / n}")
    // split assignment agrees with standalone sampling on the same
    // buckets: the first 204/256 sample IS the train set
    val trainIds = byRow.filter(_._2 == "train").map(_._1).toSet
    val sampled = SampleOps.sampleByHash(docs, "doc_id", 204)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds === sampled)
  }

  test("weighted sampling: heavy weights dominate, keys valid, reruns equal") {
    import spark.implicits._
    // ids 0-99 weight 1000, ids 100-199 weight 1
    val df = (0L until 200L).map(i =>
      (i, if (i < 100) 1000 else 1)).toDF("id", "w")
    val got = SampleOps.sampleWeighted(df, "id", col("w"), k = 50).collect()
    assert(got.length === 50)
    // exponential keys: u^(1/1000) ≈ 1 for heavy rows, u^1 = u for
    // light rows — the heavy class must dominate the top-k
    val heavy = got.count(_.getLong(0) < 100L)
    assert(heavy >= 45, s"only $heavy heavy rows in top-50")
    assert(got.forall { r =>
      val k = r.getDouble(2); k > 0.0 && k <= 1.0 })
    // determinism: an identical second run returns identical rows
    val again = SampleOps.sampleWeighted(df, "id", col("w"), k = 50).collect()
    assert(got.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
