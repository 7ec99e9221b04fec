package graft

import graft.sources.Sources
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Data-layout evidence: sorting is what turns parquet's min/max row
  * group stats into a skip index. Both layouts below hold IDENTICAL
  * rows and answer the query identically — the only difference is how
  * many rows the reader had to surface to get there, measured from
  * the scan node's own metrics. At 100 TB this gap is the difference
  * between a point-range query touching gigabytes or the full table.
  */
class LayoutSpec extends SparkSpec {

  /** Run the frame and return (result keys, rows the parquet reader
    * actually surfaced after row-group pruning — the scan metric, not
    * the post-filter count). AQE is disabled by the caller so the
    * executed plan is the plain physical tree the scan sits in. */
  private def runAndMeasure(df: DataFrame): (Set[Long], Long) = {
    val keys = df.collect().map(_.getLong(0)).toSet
    val scanned = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
    (keys, scanned)
  }

  test("pruned checksum gate: the pruned path and the full-scan " +
       "filter publish identical signatures, and the working dir is " +
       "reclaimed") {
    val before = Option(new java.io.File("/tmp").listFiles()).toSeq.flatten
      .count(_.getName.startsWith("graft_layout_gate_"))
    val rows = Sources.prunedChecksum(spark, sf).collect()
    assert(rows.length === 2)
    val byTbl = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byTbl.keySet === Set("full_filtered", "pruned_read"))
    assert(byTbl("full_filtered") === byTbl("pruned_read"),
      s"pruned read diverged from the filtered full scan: $byTbl")
    assert(byTbl("full_filtered")._1 > 0, "empty band — gate is vacuous")
    // per-invocation working files are reclaimed before return
    val after = Option(new java.io.File("/tmp").listFiles()).toSeq.flatten
      .count(_.getName.startsWith("graft_layout_gate_"))
    assert(after === before, "layout gate leaked its temp dir")
  }

  test("sorted layout: a pushed range predicate skips most row groups") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 200k rows whose key ordering is decorrelated from insertion
      // order (hash), so the "as-ingested" layout interleaves the full
      // key range through every file — the shape raw ingest produces
      val data = spark.range(200000).select(
        pmod(xxhash64(col("id")), lit(1000000L)).as("k"),
        col("id").as("payload"))
      // small row groups so the 3 MB corpus has many: the skipping
      // granularity a real table gets from its default 128 MB groups
      val opts = Map(
        "parquet.block.size" -> (64 * 1024).toString,
        "parquet.page.size" -> (8 * 1024).toString)
      data.repartition(4).write.mode("overwrite").options(opts)
        .parquet(s"$dir/ingested")
      Sources.writeSorted(data, s"$dir/sorted", Seq("k"),
        numFiles = 4, writerOptions = opts)

      // ~2% of the key space; the filter must reach the scan on both
      def query(path: String): DataFrame =
        spark.read.parquet(path)
          .filter(col("k") >= 100000L && col("k") < 120000L)

      val plan = query(s"$dir/sorted").queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters:") &&
        plan.contains("GreaterThanOrEqual(k,"), plan.take(2000))

      val (sortedKeys, sortedScanned) = runAndMeasure(query(s"$dir/sorted"))
      val (rawKeys, rawScanned) = runAndMeasure(query(s"$dir/ingested"))

      // identical answers from identical data...
      assert(sortedKeys === rawKeys)
      assert(sortedKeys.nonEmpty)
      // ...but the unsorted layout's row groups all span the full key
      // range — min/max pruning can reject nothing, the reader
      // surfaces every row
      assert(rawScanned === 200000L, s"raw layout scanned $rawScanned")
      // the sorted layout skips the row groups (and, being
      // range-partitioned, 3 of 4 files) outside the predicate — at
      // least 5x less surfaced here; in practice ~30x at this shape
      assert(sortedScanned * 5 < rawScanned,
        s"sorted layout scanned $sortedScanned of $rawScanned")
      // and never fewer rows than actually match (pruning is sound)
      assert(sortedScanned >= sortedKeys.size)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("z-order: BOTH clustered columns skip; linear sort only its leading one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // 2-D uniform points whose two coordinates are independent of
      // insertion order and of each other
      val data = spark.range(200000).select(
        col("id"),
        pmod(xxhash64(col("id")), lit(100000L)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(100000L)).as("y"))
      val opts = Map(
        "parquet.block.size" -> (64 * 1024).toString,
        "parquet.page.size" -> (8 * 1024).toString)
      Sources.writeSorted(data, s"$dir/linear", Seq("x"),
        numFiles = 4, writerOptions = opts)
      Sources.writeZOrdered(data, s"$dir/z", Seq("x", "y"),
        numFiles = 4, writerOptions = opts)

      // ~6% selectivity on each axis
      def onY(path: String) = spark.read.parquet(path)
        .filter(col("y") >= 50000L && col("y") < 56000L).select(col("id"))
      def onX(path: String) = spark.read.parquet(path)
        .filter(col("x") >= 50000L && col("x") < 56000L).select(col("id"))

      val (linYKeys, linYScan) = runAndMeasure(onY(s"$dir/linear"))
      val (zYKeys, zYScan) = runAndMeasure(onY(s"$dir/z"))
      val (linXKeys, linXScan) = runAndMeasure(onX(s"$dir/linear"))
      val (zXKeys, zXScan) = runAndMeasure(onX(s"$dir/z"))

      // identical answers from identical data on every path
      assert(zYKeys === linYKeys && zXKeys === linXKeys)
      assert(zYKeys.nonEmpty && zXKeys.nonEmpty)
      // x-sorted layout: y spans the full range in every row group —
      // nothing skips on the non-leading column
      assert(linYScan === 200000L, s"linear layout scanned $linYScan on y")
      // z-order: each row group is a compact cell of (x, y) space, so
      // the y predicate prunes groups too — at least 2x here, ~4-8x
      // at this shape
      assert(zYScan * 2 < linYScan,
        s"z-order scanned $zYScan of $linYScan on the second column")
      // and x skips on BOTH layouts (linear is best on its leading
      // column; z still prunes substantially)
      assert(linXScan * 4 < 200000L, s"linear scanned $linXScan on x")
      assert(zXScan * 2 < 200000L, s"z-order scanned $zXScan on x")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("skewed column: min/max z-codes quietly degrade, rank codes hold") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zskew").toString
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // s is heavy-tailed: 99.5% of values in [0, 1000), 0.5% outliers
      // around 10^12. Min/max normalization maps the BULK to code 0
      // (the range is outlier-stretched 10^9×), so every row group
      // spans the whole bulk and nothing skips on in-bulk predicates;
      // rank codes follow the population, so the bulk still spreads
      // over the full code space.
      val data = spark.range(200000).select(
        col("id"),
        pmod(xxhash64(col("id")), lit(100000L)).as("x"),
        when(pmod(xxhash64(col("id"), lit(7)), lit(200L)) === 0,
          lit(1000000000000L) + pmod(xxhash64(col("id"), lit(8)), lit(1000L)))
          .otherwise(pmod(xxhash64(col("id"), lit(9)), lit(1000L))).as("s"))
      val opts = Map(
        "parquet.block.size" -> (64 * 1024).toString,
        "parquet.page.size" -> (8 * 1024).toString)
      Sources.writeZOrdered(data, s"$dir/minmax", Seq("x", "s"),
        numFiles = 4, writerOptions = opts, codeScheme = "minmax")
      Sources.writeZOrdered(data, s"$dir/rank", Seq("x", "s"),
        numFiles = 4, writerOptions = opts, codeScheme = "rank")

      // ~10% of the bulk — the everyday predicate the outliers break
      def onS(path: String) = spark.read.parquet(path)
        .filter(col("s") >= 400L && col("s") < 500L).select(col("id"))

      val (mmKeys, mmScan) = runAndMeasure(onS(s"$dir/minmax"))
      val (rkKeys, rkScan) = runAndMeasure(onS(s"$dir/rank"))
      assert(rkKeys === mmKeys)
      assert(rkKeys.nonEmpty)
      // min/max: the bulk all carries code 0 on s — row groups cannot
      // reject an in-bulk range, the reader surfaces ~everything
      assert(mmScan > 150000L, s"minmax unexpectedly skipped: $mmScan")
      // rank codes keep skipping under the same skew
      assert(rkScan * 2 < mmScan, s"rank scanned $rkScan of $mmScan")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
