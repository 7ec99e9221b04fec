package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed Aggregator — the
  * bounded-memory heavy-hitter summary for columns whose keyspace
  * does not fit anywhere (the 100 TB vocabulary/user-id profiling
  * case, where even the exact groupBy's keyspace is the problem).
  *
  * The summary holds at most `capacity` counters. Classic stream
  * update: an unseen item either claims a free counter or decrements
  * every counter (amortized O(1): each decrement round pays for
  * `capacity` arrivals). Merge is the Agarwal et al. ("Mergeable
  * Summaries", PODS'12) construction: pointwise sum, then subtract
  * the (capacity+1)-th largest count and drop non-positives.
  *
  * Guarantees after any sequence of updates and merges over n items:
  * estimates UNDERCOUNT (est ≤ true) by at most n/capacity, so every
  * item with true frequency > n/capacity is present in the summary.
  * Estimates depend on partition/merge order within that bound —
  * this is a declared sketch, like HLL/GK, not an exact operator.
  *
  * The buffer lives as a JVM object inside ObjectHashAggregate
  * (kryo-serialized only across the shuffle), so updates mutate in
  * place — no per-row map copying.
  */
class MisraGriesAgg(capacity: Int)
    extends Aggregator[String, java.util.HashMap[String, Long],
                       Map[String, Long]] {
  require(capacity > 0)

  override def zero: java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](capacity * 2)

  override def reduce(b: java.util.HashMap[String, Long],
                      term: String): java.util.HashMap[String, Long] = {
    if (term != null) {
      val c = b.get(term)
      if (c != 0L || b.containsKey(term)) b.put(term, c + 1L)
      else if (b.size < capacity) b.put(term, 1L)
      else {
        // decrement-all: one arrival cancels one unit of every counter
        val it = b.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    b
  }

  override def merge(b1: java.util.HashMap[String, Long],
                     b2: java.util.HashMap[String, Long]):
      java.util.HashMap[String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // unboxing null yields 0L, so absent keys sum from zero
      b1.put(e.getKey, b1.get(e.getKey) + e.getValue)
    }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything —
      // at most `capacity` survivors, error grows by that count only
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - capacity - 1)
      val eit = b1.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= sub) eit.remove() else e.setValue(e.getValue - sub)
      }
    }
    b1
  }

  override def finish(b: java.util.HashMap[String, Long]): Map[String, Long] = {
    val builder = Map.newBuilder[String, Long]
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); builder += (e.getKey -> e.getValue) }
    builder.result()
  }

  override def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
    Encoders.kryo[java.util.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
