package graft

import graft.functions.{CosineSim, DotProduct, SimHash64}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions so `spark.sql("SELECT simhash64(...)
  * , cosine_sim(...)")` works in any session built with
  * `.withExtensions(new GraftExtensions)` or via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens array<string>) - 64-bit SimHash signature"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a array<float>, b array<float>) - cosine similarity"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a array<float>, b array<float>) - dot product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("count_in_set"),
      info("count_in_set",
        "count_in_set(tokens array<string>, words array<string>) - tokens found in vocabulary (repeats counted); words must be a literal"),
      (exprs: Seq[Expression]) => graft.functions.CountInSet(exprs.head, {
        val arr = exprs(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
      })))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a array<bigint>, b array<bigint>) - common-element count of two sorted distinct arrays (one merge pass)"),
      (exprs: Seq[Expression]) =>
        graft.functions.SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("winnow_fingerprint"),
      info("winnow_fingerprint",
        "winnow_fingerprint(tokens array<string>, k int, w int) - winnowing fingerprint of k-token shingles over w-windows; k and w must be literals"),
      (exprs: Seq[Expression]) => graft.functions.WinnowFingerprint(exprs.head,
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])))
  }
}
