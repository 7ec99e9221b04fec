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
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
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
