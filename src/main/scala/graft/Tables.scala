package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated star schema
  * (TESTDATA.md). One parquet file per table under the sf dir.
  *
  * At cluster scale these would be directories of many files; the
  * loader is path-based so nothing here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped with two physical types for `ts`:
    * TIMESTAMP(NANOS) (reads as epoch-nanos long under the legacy
    * conf) and plain TIMESTAMP_MICROS (reads as TIMESTAMP_NTZ).
    * Adapt on the observed scan type rather than assuming either:
    * nanos-long truncates to micros (the same truncation DuckDB
    * applies), NTZ casts to session-zone TIMESTAMP (sessions run
    * UTC, so wall-clock values — and oracle parity — are unchanged). */
  def events(s: SparkSession, d: String): DataFrame = {
    // No up-front conf mutation: a loader that silently flips a
    // session-wide read conf is a trap for other nanos-parquet reads
    // in the same session. GraftSession.build sets the legacy conf at
    // session construction; this fallback engages ONLY if a
    // caller-built session scans TIMESTAMP(NANOS) data without it
    // (schema inference throws "Illegal Parquet type ... NANOS"), and
    // the set is then required for the scan itself, not scoped away.
    val df =
      try load(s, d, "events")
      catch {
        case e: Throwable if String.valueOf(e.getMessage).contains("NANOS") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(s, d, "events")
      }
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) under the legacy conf
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // TIMESTAMP_MICROS, no zone: sessions
        // run UTC, so the cast keeps wall-clock values (oracle parity)
        df.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => df
      case other => // fail LOUDLY on the next testdata regeneration
        // rather than coercing an unknown physical type to nulls
        throw new IllegalStateException(
          s"events.ts: unexpected scan type $other — adapt Tables.events")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Ensure a frame has enough partitions to occupy every core before
    * an expensive per-row stage. A small corpus arrives as ONE file =
    * one split, which would serialize shingling/decoding across a
    * 32-core executor; at cluster scale inputs are many files and this
    * is a no-op (the partition count already meets the target). */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // inputFiles is a metadata probe (no RDD materialization): with at
    // least as many files as cores the scan parallelizes on its own
    val files = try df.inputFiles.length catch { case _: Throwable => 0 }
    if (files >= target) df else df.repartition(target)
  }
}
