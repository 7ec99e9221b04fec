package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Sorted-set intersection kernel: the common-element count of two
  * SORTED distinct long arrays in one merge pass — no hash set, no
  * intermediate array. `size(array_intersect(a, b))` builds a hash
  * set of one side and an output array per row; on the dedup verify
  * path (every candidate pair of every near-dup operator) this is
  * the hot allocation, and the shingle arrays are already sorted by
  * construction, so a merge is both cheaper and allocation-free.
  * Inputs MUST be sorted ascending and duplicate-free — the
  * contract docShingleSets/shingleHashesExpr guarantee.
  */
object SetKernels {
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    var i = 0
    var j = 0
    var c = 0
    val n = a.numElements()
    val m = b.numElements()
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint>, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.SetKernels.sortedIntersectCount($l, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

object SetExprs {
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
