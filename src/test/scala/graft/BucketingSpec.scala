package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("co-bucketed join plans without a shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val events = Tables.events(spark, sf)
    Sources.writeBucketed(events.select("event_id", "user_id", "value"),
      "ev_a", s"$dir/a", "user_id")
    Sources.writeBucketed(events.select("user_id", "event_type"),
      "ev_b", s"$dir/b", "user_id")
    val joined = spark.table("ev_a").join(spark.table("ev_b"), "user_id")
    val plan = joined.queryExecution.executedPlan.toString
    // both sides are bucketed on the join key: no ShuffleExchange
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS ev_a")
    spark.sql("DROP TABLE IF EXISTS ev_b")
  }
}
