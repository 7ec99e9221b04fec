package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(cpus)
    // Warm the JVM/codegen/IO paths AND the common execution machinery
    // (scan, hash agg, broadcast join, window, sort) so the first
    // timed queries aren't charged for engine bring-up — measured at
    // ~2s of one-time JIT otherwise landing on whichever query runs
    // first. Generic plans only: no timed query's plan is pre-run.
    locally {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag").count().collect()
      li.select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("l_suppkey")).orderBy(col("l_extendedprice"))))
        .join(broadcast(spark.read.parquet(s"$sfDir/nation.parquet")),
          col("l_suppkey") % 25 === col("n_nationkey"))
        .groupBy(col("n_name")).agg(sum(col("l_extendedprice")).as("s"))
        .orderBy(col("s").desc).limit(5).collect()
      // MLlib bring-up (BLAS init, optimizer/aggregator JIT): the
      // first estimator fit in a JVM measured 6–15s above its steady
      // state, a one-time cost that landed on whichever MLlib entry
      // ran first and swamped its pin. Tiny fits on a 16-row frame
      // warm the path; the timed entries' own models still fit on
      // the real data.
      import org.apache.spark.ml.classification.LogisticRegression
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val tiny = spark.range(16).select(col("id"),
        array_to_vector(array((col("id") % 3).cast("double"),
          (col("id") % 5).cast("double"))).as("features"),
        (col("id") % 2).cast("int").as("label"))
      new KMeans().setK(2).setSeed(1L).setMaxIter(2)
        .setFeaturesCol("features").fit(tiny)
      new LogisticRegression().setMaxIter(2).setFeaturesCol("features")
        .setLabelCol("label").fit(tiny)
    }
    // Fixed name order: JIT warmth and storage state then can't shift
    // between runs just because Map iteration order changed.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Operators cache() intermediates and a returned plan can't
      // unpersist them; without clearing, storage accumulates across
      // all ~50 queries and later queries pay earlier queries'
      // evictions — each query must be timed from a cold cache.
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      // noop-write runs the FULL plan (final sorts/limits included —
      // count() would let Catalyst prune them) without collect()'s
      // driver deserialization, which at larger SF distorts the
      // timing and can OOM the driver on wide results.
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(
            s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A failing query must surface as a failure, never as a ~0s
    // "improvement" to the total: the total sums OK queries only, and
    // any non-empty failed list marks the whole total non-comparable.
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val okCount = results.count(_._3)
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","ok":$okCount,"queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    // Compact headline LAST: the driver archives a bounded tail of
    // stdout, and with ~75 queries the full line above can exceed it —
    // round 5's artifact lost the total and the first 11 queries to
    // exactly that truncation. Whatever gets cut, the final short line
    // always survives a tail capture.
    println(f"""{"metric":"summary","total_s":$total%.2f,"ok":$okCount,"n":${results.size},"failed":$failed,"sf":"$sfDir"}""")
    // The stdout tail a harness archives truncates the full per-query
    // line (and sbt's own epilogue is the true last line, so a
    // parse-the-last-line consumer gets nothing) — ALSO durably write
    // the complete metric line next to the build so the full
    // per-query table survives any stdout capture window.
    // Anchor to an explicit root so the file lands in the repo even
    // when the JVM's working directory is not the build root:
    // -Dgraft.bench.dir wins, then user.dir (sbt runs from the root).
    val benchDir = java.nio.file.Paths.get(
      sys.props.getOrElse("graft.bench.dir", sys.props("user.dir")))
    val benchPath = benchDir.resolve("BENCH_LOCAL.json").toAbsolutePath
    try {
      java.nio.file.Files.writeString(benchPath,
        s"""{"metric":"total","value":$total,"unit":"sec","ok":$okCount,"queries":$qs,"failed":$failed,"sf":"$sfDir"}""" + "\n")
      System.err.println(s"[bench] wrote $benchPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] $benchPath write failed: $e") }
    spark.stop()
  }
}
