package graft

/** Dev harness: time a subset of SparkEntry.queries by name, with
  * optional repetitions — the per-query feedback loop for performance
  * work (`Bench` runs the whole registry; iterating on one operator
  * through it wastes minutes per measurement). Same session config,
  * cache isolation, and noop-write materialization as [[Bench]] so
  * numbers are comparable.
  *
  * Usage: runMain graft.BenchOne <query> [query...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val spark = GraftSession.build(cpus)
    for (r <- 1 to reps; name <- args) {
      Bench.clearStorage(spark)
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable => System.err.println(s"$name FAILED: $e"); false }
      println(f"[benchone] $name rep=$r ok=$ok t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
