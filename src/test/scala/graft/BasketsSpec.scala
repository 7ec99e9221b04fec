package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Focused spec for the r16 capped-basket staging (ops/Baskets.scala):
  * the one-aggregate member-set + row-local pair expansion that
  * marketBasketOn reads. The pair lambda builds its index list with
  * `sequence(2, size)`, and Spark's sequence DESCENDS when start >
  * stop — so a size-1 basket would silently expand to a bogus pair
  * (with a null element_at) without the explicit emptiness guard this
  * spec pins. Also pins: dedup through collect_set, the cap DROPPING
  * oversized baskets (not truncating them), canonical a < b ordering,
  * and members() ≡ the distinct capped membership. */
class BasketsSpec extends SparkSpec {

  private def pairsDf(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("basket", "item")
  }

  test("pairsOf emits exactly the C(n,2) canonical pairs per basket " +
       "and nothing for size-1 baskets (the sequence(2,1) descend trap)") {
    // basket 1: {10,20,30} -> 3 pairs; basket 2: {7} -> 0 pairs;
    // basket 3: {5,9} -> 1 pair; duplicates must not inflate sets
    val df = pairsDf(Seq(
      (1L, 30L), (1L, 10L), (1L, 20L), (1L, 10L),
      (2L, 7L),
      (3L, 9L), (3L, 5L)))
    val got = Baskets.pairsOf(Baskets.sets(df, maxBasket = 16))
      .orderBy(col("basket"), col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, 10L, 20L), (1L, 10L, 30L), (1L, 20L, 30L),
      (3L, 5L, 9L)))
  }

  test("sets drops baskets over the cap entirely and members() is the " +
       "distinct capped membership") {
    val df = pairsDf(Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), // over a cap of 2: dropped
      (2L, 4L), (2L, 5L), (2L, 4L)))
    val sets = Baskets.sets(df, maxBasket = 2)
    val members = Baskets.members(sets)
      .orderBy(col("basket"), col("item"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(members.toSeq === Seq((2L, 4L), (2L, 5L)))
  }

  test("pairsOf matches the window+self-join derivation on a " +
       "random-shaped membership list (shape equivalence)") {
    import spark.implicits._
    // deterministic pseudo-random membership: 40 baskets, items from
    // a md5-style mix, including singleton and near-cap baskets
    val rows = (0 until 400).map { i =>
      ((i % 40).toLong, ((i * 2654435761L) % 13).toLong)
    }
    val df = rows.toDF("basket", "item")
    val viaBaskets = Baskets.pairsOf(Baskets.sets(df, maxBasket = 8))
      .select(col("basket"), col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // reference: the classic distinct -> count-window -> self-join
    val members = df.select(col("basket"), col("item")).distinct()
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("basket"))))
      .filter(col("__bsz") <= 8).drop("__bsz")
    val viaJoin = members.as("x").join(members.as("y"), "basket")
      .filter(col("x.item") < col("y.item"))
      .select(col("basket"), col("x.item").as("a"), col("y.item").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(viaBaskets === viaJoin)
  }
}
