package graft

import graft.etl.Mapping
import graft.sources.Sources
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-io").toString

  test("CSV source: header + schema roundtrip matches the parquet original") {
    val dir = tmp()
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.write.mode("overwrite").option("header", "true").csv(dir)
    val back = Sources.readCsv(spark, dir, orders.schema)
    assert(back.count() === orders.count())
    val a = orders.orderBy("o_orderkey").collect().map(_.toString)
    val b = back.orderBy("o_orderkey").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("CSV inference discovers workable types") {
    val dir = tmp()
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val inferred = Sources.readCsvInferred(spark, dir)
    assert(inferred.schema("o_orderkey").dataType.typeName === "integer" ||
           inferred.schema("o_orderkey").dataType.typeName === "long")
    assert(inferred.schema("o_totalprice").dataType.typeName === "double")
  }

  test("reference ETL pipeline shape: csv -> applyMapping -> tagged parquet") {
    val dir = tmp()
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("string").as("event_time"),
        col("user_id"), col("event_type"))
      .write.mode("overwrite").option("header", "true").csv(s"$dir/raw")
    val raw = Sources.readCsvInferred(spark, s"$dir/raw")
    val mapped = Mapping.applyMapping(raw, Seq(
      ("event_id", "event_id", "long"),
      ("event_time", "event_ts", "timestamp"),
      ("user_id", "user_id", "long")))
      .withColumn("type", lit("events"))
    Sources.writePartitioned(mapped, s"$dir/canonical", Seq("type"))
    val back = Sources.readPartitioned(spark, s"$dir/canonical")
    assert(back.count() === Tables.events(spark, sf).count())
    assert(back.schema("event_ts").dataType.typeName.startsWith("timestamp"))
  }

  test("partitioned sink: partition filter prunes the file scan") {
    val dir = tmp()
    Sources.writePartitioned(
      Tables.events(spark, sf).withColumn("day", to_date(col("ts"))),
      dir, Seq("event_type"))
    val pruned = Sources.readPartitioned(spark, dir)
      .filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ===
      Tables.events(spark, sf).filter(col("event_type") === "click").count())
    // partition pruning shows up as a pushed partition filter in the scan
    assert(plan.contains("PartitionFilters") || plan.contains("partitionFilters"))
  }

  test("registerTable persists an external catalog table over files in place") {
    val dir = tmp()
    Tables.nation(spark, sf).write.mode("overwrite").parquet(s"$dir/nation")
    Sources.registerTable(spark, "graft_nation", s"$dir/nation")
    // registration is idempotent and the table is queryable by name
    Sources.registerTable(spark, "graft_nation", s"$dir/nation")
    assert(spark.sql("SELECT count(*) AS n FROM graft_nation").first().getLong(0)
      === Tables.nation(spark, sf).count())
    assert(spark.catalog.tableExists("graft_nation"))
    // external: dropping the table leaves the files untouched
    spark.sql("DROP TABLE graft_nation")
    assert(spark.read.parquet(s"$dir/nation").count() > 0)
  }

  test("JSONL roundtrip: declared schema, corrupt lines don't kill the scan") {
    val dir = tmp()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "n_chars", "text")
    Sources.writeJsonl(docs, s"$dir/docs", Seq("lang"))
    val back = Sources.readJsonl(spark, s"$dir/docs", docs.schema)
    assert(back.count() === docs.count())
    // value-level parity (jsonl partitioned by lang restores the column)
    val a = docs.orderBy("doc_id").collect().map(_.toString)
    val b = back.select("doc_id", "lang", "n_chars", "text")
      .orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
    // a corrupt line yields a null-field row, not a failed scan
    val corrupt = s"$dir/corrupt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(corrupt))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$corrupt/part-0.json"),
      """{"doc_id": 1, "lang": "en", "n_chars": 5, "text": "hello"}
        |not json at all
        |""".stripMargin)
    val parsed = Sources.readJsonl(spark, corrupt, docs.schema)
    assert(parsed.count() === 2)
    assert(parsed.filter(col("doc_id").isNull).count() === 1)
  }

  test("ORC faces: partitioned roundtrip with pruning, same as parquet") {
    val dir = tmp()
    Sources.writeOrc(
      Tables.events(spark, sf).withColumn("day", to_date(col("ts"))),
      dir, Seq("event_type"))
    val pruned = Sources.readOrc(spark, dir)
      .filter(col("event_type") === "click")
    assert(pruned.count() ===
      Tables.events(spark, sf).filter(col("event_type") === "click").count())
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("partitionFilters"))
  }

  test("binaryFile source: glob prunes at listing, codecs decode content") {
    val dir = tmp()
    val p = java.nio.file.Paths.get(dir)
    // a mixed media directory: BMPs, WAVs, and an oversized blob
    for (id <- 0L until 4L) {
      java.nio.file.Files.write(p.resolve(s"img_$id.bmp"),
        graft.ops.MmSynth.bmpBytes(id))
      java.nio.file.Files.write(p.resolve(s"snd_$id.wav"),
        graft.ops.MmSynth.wavBytes(id))
    }
    java.nio.file.Files.write(p.resolve("huge.bmp"), new Array[Byte](2048))
    // glob filter: only BMPs enter the scan; size guard drops the blob
    val bmps = Sources.readBinaryFiles(spark, dir, glob = "*.bmp",
      maxBytes = 1024)
    val rows = bmps.select("path", "content").collect()
    assert(rows.length === 4)
    assert(rows.forall(_.getString(0).endsWith(".bmp")))
    // the ingested bytes ARE the codec's input: every payload decodes
    rows.foreach { r =>
      val bytes = r.getAs[Array[Byte]]("content")
      assert(graft.ops.BmpCodec.decode(0L, bytes).isDefined)
    }
    // and the WAV face sees only WAVs
    val wavs = Sources.readBinaryFiles(spark, dir, glob = "*.wav")
    assert(wavs.count() === 4)
  }

  test("schema evolution: mergeSchema reconciles old and new file footers") {
    val dir = tmp()
    // v1 files: (event_id, user_id); later files add `score`
    Tables.events(spark, sf).select("event_id", "user_id")
      .limit(100).write.mode("append").parquet(dir)
    Tables.events(spark, sf).select(col("event_id"), col("user_id"),
        col("value").as("score"))
      .limit(50).write.mode("append").parquet(dir)
    val merged = Sources.readEvolved(spark, dir)
    assert(merged.columns.toSet === Set("event_id", "user_id", "score"))
    assert(merged.count() === 150)
    // old files surface the new column as null
    assert(merged.filter(col("score").isNull).count() === 100)
  }

  test("schemaDiff reports added, removed, and retyped columns exactly") {
    import org.apache.spark.sql.types._
    val before = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("score", DoubleType), StructField("tag", StringType)))
    val after = StructType(Seq(
      StructField("id", LongType, nullable = true), // relaxed: quiet 3am
      StructField("name", StringType),              // unchanged → absent
      StructField("score", StringType),             // retyped: loud 3am
      StructField("geo", StringType)))              // added; tag removed
    val diff = Sources.schemaDiff(before, after)
    assert(diff === Seq(
      ("geo", "added", "", "string"),
      ("id", "nullability", "required", "nullable"),
      ("score", "retyped", "double", "string"),
      ("tag", "removed", "string", "")))
    // drift the audit flags as retyped is exactly what mergeSchema
    // refuses at read time — catching it here keeps the failure in
    // the gate
    assert(Sources.schemaDiff(before, before).isEmpty)
  }

  test("stats manifest: pruned read opens only intersecting files, " +
       "returns exactly the full-scan answer, empty range keeps schema") {
    import org.apache.spark.sql.functions._
    val dir = tmp() + "/data"
    // range-partitioned on value => per-file envelopes are tight
    Sources.writeSorted(Tables.events(spark, sf)
      .select(col("event_id"), col("value")), dir,
      Seq("value"), numFiles = 4)
    Sources.writeStatsManifest(spark, dir, Seq("value"))
    val manifest = spark.read.parquet(s"$dir/_manifest")
    assert(manifest.count() === 4)
    // a narrow slice: compare against the unpruned answer
    val full = spark.read.parquet(dir)
      .filter(col("value") >= 10.0 && col("value") <= 20.0)
    val pruned = Sources.readPruned(spark, dir, "value", 10.0, 20.0)
    assert(pruned.count() === full.count())
    assert(full.count() > 0, "slice must be non-trivial")
    // the pruned plan must read FEWER files than exist
    val touched = pruned.select(input_file_name()).distinct().count()
    assert(touched < 4, s"pruning must skip files, touched=$touched")
    // manifest rows agree with per-file truth: global min/max recover
    val g = manifest.agg(min(col("min_value")), max(col("max_value")))
      .collect().head
    val t = spark.read.parquet(dir).agg(min(col("value")), max(col("value")))
      .collect().head
    assert(g.getDouble(0) === t.getDouble(0) && g.getDouble(1) === t.getDouble(1))
    // a range beyond the data: zero rows, schema intact, no data scan
    val empty = Sources.readPruned(spark, dir, "value", 1e12, 2e12)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("event_id", "value"))
    // hidden _manifest dir must stay invisible to plain data reads
    assert(spark.read.parquet(dir).columns.toSeq === Seq("event_id", "value"))
  }

  test("stats manifest: a file appended after the manifest write " +
       "fails the pruned read loudly until the manifest is rewritten") {
    import org.apache.spark.sql.functions._
    val dir = tmp() + "/stale"
    Sources.writeSorted(Tables.events(spark, sf)
      .select(col("event_id"), col("value")), dir,
      Seq("value"), numFiles = 2)
    Sources.writeStatsManifest(spark, dir, Seq("value"))
    // sanity: fresh manifest serves the pruned read
    assert(Sources.readPruned(spark, dir, "value", 0.0, 1e9).count() > 0)
    // a writer appends a file the manifest has never seen — every
    // pruned read would silently miss its rows, so it must THROW
    spark.range(1).select(lit(999999L).as("event_id"),
      lit(15.0).as("value")).write.mode("append").parquet(dir)
    val e = intercept[IllegalStateException] {
      Sources.readPruned(spark, dir, "value", 10.0, 20.0)
    }
    assert(e.getMessage.contains("STALE"))
    // rewriting the manifest re-covers the directory and the read
    // now includes the appended row
    Sources.writeStatsManifest(spark, dir, Seq("value"))
    val again = Sources.readPruned(spark, dir, "value", 10.0, 20.0)
    assert(again.filter(col("event_id") === 999999L).count() === 1)
  }

  test("GraftExtensions: SQL functions resolve in an extended session") {
    // The shared test context is built withExtensions(GraftExtensions)
    // (SparkSpec.shared) and newSession() re-derives its session state
    // from those extensions — so a fresh session view proves the
    // injection works without stopping the shared context (the old
    // stop-and-rebuild here was fatal once suites ran concurrently).
    val s2 = SparkSpec.shared.newSession()
    try {
      val r = s2.sql(
        """SELECT simhash64(array('a','b')) AS sh,
          |  cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
          |             array(cast(1.0 as float), cast(0.0 as float))) AS cs,
          |  dot_product(array(cast(2.0 as float)), array(cast(3.0 as float))) AS dp,
          |  count_in_set(array('a','b','a','c'), array('a','c')) AS cis,
          |  winnow_fingerprint(array('a','b','c','d','e','f'), 3, 4) AS wf,
          |  sorted_intersect_count(array(1L, 3L, 5L, 9L),
          |                         array(2L, 3L, 5L, 8L, 9L)) AS sic
          |""".stripMargin).first()
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9)
      assert(math.abs(r.getDouble(2) - 6.0) < 1e-9)
      assert(r.getInt(3) === 3)
      assert(r.getSeq[Long](4).nonEmpty)
      assert(r.getInt(5) === 3)
    } finally { /* shared-JVM session: leave running for other suites */ }
  }

}
