package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** The explicit runtime-filter primitive: fold a (small) frame's LONG
  * key column into a fixed-size Bloom filter, serialize it into a
  * literal, and probe it with Spark's codegen'd
  * `BloomFilterMightContain` expression — the same machinery the
  * optimizer's InjectRuntimeFilter uses, exposed for plans where its
  * size heuristics can't prove the injection. The probe is a pure
  * row-local predicate, so Catalyst pushes it into the probe side's
  * scan stage: non-matching rows die before any shuffle.
  *
  * Build and probe must hash identically: both sides go through the
  * raw long (`putLong`/`mightContainLong`), so callers pass the SAME
  * key expression (conventionally `xxhash64(...)`) to both.
  */
object BloomProbe {

  /** Build a Bloom filter over `keys`' single long column `keyCol`
    * (one build-side aggregation; `expected` sizes the bits) and
    * return the codegen'd membership predicate for `probe`. */
  def mightContain(keys: DataFrame, keyCol: String, expected: Long,
                   fpp: Double, probe: Column): Column = {
    require(expected > 0, s"expected item count must be > 0: $expected")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    val bf = keys.stat.bloomFilter(keyCol, expected, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bytes, BinaryType), ColumnBridge.expression(probe)))
  }
}
