package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins. AQE's skew-join split handles most
  * cases at runtime; explicit salting remains the tool when one key
  * dominates so heavily that even split shuffle blocks hot-spot (the
  * classic power-law user_id / null-key cases at 100 TB).
  */
object SkewOps {

  /** Salted equi-join: the large side gets a deterministic salt from
    * a unique column (so re-runs partition identically); the small
    * side is replicated saltFactor times. The join key becomes
    * (key, salt), spreading a hot key over saltFactor reducers.
    * Result is exactly the plain inner join's rows. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 uniqueCol: String, saltFactor: Int = 8): DataFrame = {
    val l = large.withColumn("__salt",
      pmod(xxhash64(col(uniqueCol)), lit(saltFactor.toLong)))
    val saltValues = array((0 until saltFactor).map(i => lit(i.toLong)): _*)
    val s = small.withColumn("__salt", explode(saltValues))
    l.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-filtered semi join — the generic runtime-filter shape for
    * "huge fact, selective key set": fold the small side's keys into
    * a fixed-size Bloom filter, probe it codegen'd INSIDE the large
    * side's scan, then run the exact left_semi join over the
    * survivors. The result is exactly the plain left_semi join's
    * (false positives die in the exact join); the difference is that
    * at 100 TB the fact side's shuffle carries only matching + fpp
    * rows instead of every row — the dominant cost of a selective
    * semi join is the probe-side exchange, and this removes it.
    * Spark's own InjectRuntimeFilter does this when its heuristics
    * prove selectivity; this operator is the explicit form for plans
    * where they can't. One scalar `count()` sizes the filter bits
    * (build-side-sized action, same concession the dedup Bloom face
    * makes); the filter BUILD itself is lazy — a scalar subquery in
    * the returned plan (see BloomProbe), so nothing else runs or is
    * cached at construction time, and BloomProbe.maxNumBits bounds
    * the build side explicitly. */
  def bloomSemiJoin(large: DataFrame, small: DataFrame, largeKey: String,
                    smallKey: String, fpp: Double = 0.01): DataFrame = {
    val keys = small.select(xxhash64(col(smallKey)).as("__k"))
    val probe = graft.functions.BloomProbe.mightContain(
      keys, "__k", math.max(1L, keys.count()), fpp, xxhash64(col(largeKey)))
    large.filter(probe)
      .join(small, col(largeKey) === col(smallKey), "left_semi")
  }
}
