package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Alias, BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** The explicit runtime-filter primitive: fold a (small) frame's LONG
  * key column into a fixed-size Bloom filter and probe it with
  * Spark's codegen'd `BloomFilterMightContain` expression — the same
  * machinery the optimizer's InjectRuntimeFilter uses, exposed for
  * plans where its size heuristics can't prove the injection. The
  * probe is a pure row-local predicate, so Catalyst keeps it in the
  * probe side's scan stage: non-matching rows die before any shuffle.
  *
  * The build is LAZY: the aggregation runs inside the returned
  * predicate as a scalar subquery (`ScalarSubquery(Aggregate(
  * BloomFilterAggregate(key)))` — InjectRuntimeFilter's exact
  * construction), so composing this operator into a larger plan
  * launches no job and serializes no filter bytes into the plan
  * string; the filter materializes once, at execution, as a subquery
  * result. [[maxNumBits]] bounds the build side explicitly: the
  * filter must ship to every probe task, so a reference whose optimal
  * filter exceeds the ceiling belongs to the shuffled tier
  * (DedupOps.decontaminate) instead — that boundary is the documented
  * regime split, and this `require` is where it is enforced.
  *
  * Build and probe must hash identically: both sides go through the
  * raw long (`putLong`/`mightContainLong`), so callers pass the SAME
  * key expression (conventionally `xxhash64(...)`) to both.
  */
object BloomProbe {

  /** Filter size ceiling in BITS (2^31 = 256 MiB serialized): beyond
    * this the per-task broadcast of the filter stops being the cheap
    * side of the trade and the shuffled decontamination tier wins.
    * ~1.9 G keys fit at fpp 0.01 under this ceiling. */
  val maxNumBits: Long = 1L << 31

  /** Optimal bit count for `expected` items at `fpp` — the standard
    * Bloom sizing formula, m = ceil(−n·ln p / (ln 2)²). */
  def optimalNumBits(expected: Long, fpp: Double): Long =
    math.ceil(-expected * math.log(fpp) / (math.log(2) * math.log(2))).toLong

  /** Membership predicate for `probe` against a Bloom filter over
    * `keys`' long column `keyCol` (`expected` sizes the bits). Lazy:
    * the build-side aggregation is part of the returned predicate's
    * plan, not a construction-time job. */
  def mightContain(keys: DataFrame, keyCol: String, expected: Long,
                   fpp: Double, probe: Column): Column = {
    require(expected > 0, s"expected item count must be > 0: $expected")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    val numBits = math.max(64L, optimalNumBits(expected, fpp))
    require(numBits <= maxNumBits,
      s"optimal filter ($numBits bits for $expected keys at fpp $fpp) exceeds " +
        s"maxNumBits=$maxNumBits — a build side this large belongs to the " +
        "shuffled tier, not a ship-everywhere filter")
    val buildPlan = keys.queryExecution.analyzed
    val key = buildPlan.output.find(_.name == keyCol).getOrElse(
      throw new IllegalArgumentException(
        s"column $keyCol not in ${buildPlan.output.map(_.name)}"))
    require(key.dataType == LongType,
      s"$keyCol must be LONG (hash the key first), got ${key.dataType}")
    val agg = new BloomFilterAggregate(key,
      Literal(expected), Literal(numBits)).toAggregateExpression()
    val build = Aggregate(Nil, Seq(Alias(agg, "__bloom")()), buildPlan)
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(build), ColumnBridge.expression(probe)))
  }
}
