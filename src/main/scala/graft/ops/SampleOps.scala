package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and splitting — the
  * consistent-sampling primitives of a large-scale training-data
  * pipeline. `rand()`-based sampling is neither reproducible across
  * runs nor consistent across tables; hashing a stable key is both:
  * the same document lands in the same sample/split on every run, at
  * every cluster size, and in every derived table keyed by the same
  * id — which is what makes leakage-free train/eval splits and
  * joinable subsamples possible at 100 TB.
  *
  * Rows bucket by the first two hex characters of md5(key): 256
  * uniform buckets, cut by lexicographic comparison on the hex
  * string. md5's hex form is identical in every engine, so the exact
  * bucketing predicate is SQL-portable and the DuckDB oracles share
  * it literally (a numeric xxhash64 cut would be Spark-only). The
  * filter is a row-local projection: it pushes into the scan, needs
  * no shuffle, and composes with any downstream plan. */
object SampleOps {

  /** 00-ff bucket id of a key: uniform 256-way. */
  private def bucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** The `bucket < bound` predicate for `n` of 256 buckets. n = 256
    * needs an explicit always-true: its hex form "100" is THREE
    * characters and lexicographically below every 2-char bucket. */
  private def below(b: Column, n: Int): Column =
    if (n >= 256) lit(true) else b < lit(f"$n%02x")

  /** Keep `buckets` of the 256 hash buckets (~buckets/256 of rows),
    * deterministically: the same key set survives every run. */
  def sampleByHash(df: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets >= 0 && buckets <= 256)
    df.filter(below(bucket(col(key)), buckets))
  }

  /** Stratified deterministic sampling: a per-class bucket quota
    * (class → kept buckets of 256) over the same md5 bucketing —
    * downsample the majority classes of a skewed corpus while
    * keeping rare classes whole, reproducibly. Classes absent from
    * `quotas` keep `defaultBuckets` (0 = drop). Row-local like the
    * flat sample: one CASE over the class column, no shuffle. */
  def sampleStratified(df: DataFrame, key: String, classCol: String,
                       quotas: Map[String, Int],
                       defaultBuckets: Int = 0): DataFrame = {
    require((quotas.values ++ Seq(defaultBuckets)).forall(b => b >= 0 && b <= 256))
    val b = bucket(col(key))
    val cut = quotas.foldLeft(lit(f"$defaultBuckets%02x")) {
      case (acc, (cls, n)) => when(col(classCol) === cls, lit(f"$n%02x")).otherwise(acc)
    }
    // 256 buckets ("100") needs the always-true face, same edge as
    // `below`; comparing against a per-row cut column makes that a
    // row-level condition rather than a plan-time branch
    df.filter(b < cut || cut === lit("100"))
  }

  /** Assign each row a leakage-safe split label by key hash:
    * buckets [0, train) → "train", [train, train+holdout) → "val",
    * the rest → "test". Defaults ≈ 80/10/10. */
  def hashSplit(df: DataFrame, key: String, train: Int = 204,
                holdout: Int = 26): DataFrame = {
    require(train >= 0 && holdout >= 0 && train + holdout <= 256)
    val b = bucket(col(key))
    df.withColumn("split",
      when(below(b, train), "train")
        .when(below(b, train + holdout), "val")
        .otherwise("test"))
  }
}
