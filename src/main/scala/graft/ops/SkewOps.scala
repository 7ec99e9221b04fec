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
}
