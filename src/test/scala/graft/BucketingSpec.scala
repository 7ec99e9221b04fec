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

  test("compaction shrinks a fragmented dataset to byte-sized files, data intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val events = Tables.events(spark, sf).select("event_id", "user_id", "value")
    // fragment: 40 tiny files, the post-streaming-ingest shape
    events.repartition(40).write.mode("overwrite").parquet(s"$dir/frag")
    def dataFiles(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.getName.startsWith("part-")).toSeq
    assert(dataFiles(s"$dir/frag").length === 40)
    val n = Sources.compact(spark, s"$dir/frag", s"$dir/compacted",
      targetFileBytes = 1L << 30)
    assert(n === 1 && dataFiles(s"$dir/compacted").length === 1)
    // content unchanged
    val before = events.collect().map(_.toString).sorted.toSeq
    val after = spark.read.parquet(s"$dir/compacted").collect()
      .map(_.toString).sorted.toSeq
    assert(after === before)
    // a small byte target yields proportionally more files
    val bytes = dataFiles(s"$dir/compacted").map(_.length).sum
    val n2 = Sources.compact(spark, s"$dir/compacted", s"$dir/recompacted",
      targetFileBytes = math.max(1L, bytes / 4))
    assert(n2 >= 3 && dataFiles(s"$dir/recompacted").length === n2)
    // guarded misuse: in-place compaction (the overwrite-while-
    // reading corruption pattern) and nonpositive targets must refuse
    intercept[IllegalArgumentException] {
      Sources.compact(spark, s"$dir/compacted", s"$dir/compacted")
    }
    // output nested under the input tree is the same hazard in
    // disguise (recursive listing would double-count on a re-run),
    // in either direction
    intercept[IllegalArgumentException] {
      Sources.compact(spark, s"$dir/compacted", s"$dir/compacted/out")
    }
    intercept[IllegalArgumentException] {
      Sources.compact(spark, s"$dir/compacted/part", s"$dir/compacted")
    }
    intercept[IllegalArgumentException] {
      Sources.compact(spark, s"$dir/compacted", s"$dir/x", targetFileBytes = 0)
    }
  }
}
