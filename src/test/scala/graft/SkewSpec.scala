package graft

import graft.ops.SkewOps
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows") {
    val events = Tables.events(spark, sf)
    val dim = Tables.events(spark, sf)
      .select(col("user_id")).distinct()
      .withColumn("segment", concat(lit("seg_"), col("user_id") % 3))
    val plain = events.join(dim, Seq("user_id"))
      .select("event_id", "segment").orderBy("event_id").collect()
    val salted = SkewOps.saltedJoin(events, dim, "user_id",
        uniqueCol = "event_id", saltFactor = 8)
      .select("event_id", "segment").orderBy("event_id").collect()
    assert(plain.length === salted.length)
    assert(plain.map(_.toString).sameElements(salted.map(_.toString)))
  }
}
