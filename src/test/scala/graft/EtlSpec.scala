package graft

import graft.etl.Mapping
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("applyMapping renames and casts in one projection") {
    val out = Mapping.applyMapping(Tables.orders(spark, sf), Seq(
      ("o_orderkey", "orderkey", "string"),
      ("o_totalprice", "total", "double")))
    assert(out.schema === StructType(Seq(
      StructField("orderkey", StringType),
      StructField("total", DoubleType))))
    assert(out.count() === Tables.orders(spark, sf).count())
  }

  test("resolveChoice nulls out uncastable values instead of failing") {
    val df = Seq(("1", "ok"), ("x", "bad"), ("3", "ok")).toDF("v", "tag")
    val out = Mapping.resolveChoice(df, Seq(("v", "v_long", "bigint")))
    val got = out.select("v_long").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSet === Set(Some(1L), None, Some(3L)))
  }

  test("resolveChoiceStruct fills the first matching slot, nulls the rest") {
    val df = Seq(("a", "42"), ("b", "abc"), ("c", "7.5")).toDF("id", "v")
    val out = Mapping.resolveChoiceStruct(df,
      Seq("v" -> Seq("bigint", "double", "string")))
    assert(out.schema("v").dataType === StructType(Seq(
      StructField("bigint", LongType),
      StructField("double", DoubleType),
      StructField("string", StringType))))
    val got = out.select("id", "v.bigint", "v.double", "v.string").collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got("a") === ((Some(42L), None, None)))        // int wins first
    assert(got("b") === ((None, None, Some("abc"))))      // only string parses
    assert(got("c") === ((None, Some(7.5), None)))        // double beats string
  }

  test("dropNullFields drops only all-null columns") {
    val df = Seq((1, Option.empty[String], "a"), (2, None, "b"))
      .toDF("id", "allnull", "kept")
    val out = Mapping.dropNullFields(df)
    assert(out.columns.toSeq === Seq("id", "kept"))
  }

  test("canonicalize unions sources with origin tags") {
    val a = Seq(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
      .toDF("event_ts")
    val b = Seq(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
      .toDF("event_ts")
    val out = Mapping.canonicalize(Seq("a" -> a, "b" -> b))
    assert(out.columns.toSeq === Seq("src", "event_ts"))
    assert(out.select("src").as[String].collect().sorted.toSeq === Seq("a", "b"))
  }

  test("dedupRows removes exact duplicates on the projection") {
    val df = Seq((1, "x"), (1, "x"), (2, "y")).toDF("k", "v")
    assert(Mapping.dedupRows(df, Seq("k", "v")).count() === 2)
  }

  test("expectations count violations per rule; null predicate = violation") {
    val df = Seq(
      (Some(5), Some("a")),   // passes both
      (Some(-1), Some("a")),  // fails positive
      (None, Some("b")),      // null value: fails positive (unknown != pass)
      (Some(3), None)         // null key: fails key_present
    ).toDF("v", "k")
    val out = Mapping.expectations(df, Seq(
        ("key_present", col("k").isNotNull),
        ("positive", col("v") > 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out === Map(
      "key_present" -> ((1L, 0.25)),
      "positive" -> ((2L, 0.5))))
    // rule names are literals, not parsed SQL: quotes/backticks and
    // internal-alias collisions must pass through untouched
    val tricky = Mapping.expectations(df, Seq(
        ("it's `quoted`", col("v") > 0), ("__total", col("k").isNotNull)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tricky === Map("it's `quoted`" -> 2L, "__total" -> 1L))
  }

  test("expectations edges: empty rule list refuses, empty frame reports zeros") {
    intercept[IllegalArgumentException] {
      Mapping.expectations(Seq((1, "a")).toDF("v", "k"), Seq.empty)
    }
    // an empty input frame is a defined edge — 0 violations at rate
    // 0.0 per rule, never null counts or a 0/0 rate
    val empty = Seq.empty[(Option[Int], Option[String])].toDF("v", "k")
    val out = Mapping.expectations(empty, Seq(
        ("key_present", col("k").isNotNull), ("positive", col("v") > 0)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out === Map(
      "key_present" -> ((0L, 0.0)), "positive" -> ((0L, 0.0))))
  }
}
