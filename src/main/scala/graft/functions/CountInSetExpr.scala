package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a small fixed string set (the
  * stopword-ratio primitive of `lang_id` / `quality_score`). Replaces the
  * interpreted `size(filter(arr, w => w.isInCollection(set)))` higher-order
  * chain: Spark HOF lambdas evaluate interpreted per element (round-1
  * lesson from WinnowFpsExpr), while this is one native hash-set probe per
  * element, codegen-friendly via a static call with the set attached as a
  * codegen reference object.
  */
case class CountInSetExpr(child: Expression, set: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  @transient private lazy val utf8Set: java.util.HashSet[UTF8String] =
    CountInSetExpr.toUtf8Set(set)

  override def nullSafeEval(input: Any): Any =
    CountInSetExpr.compute(input.asInstanceOf[ArrayData], utf8Set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("countInSet", utf8Set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.CountInSetExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSetExpr =
    copy(child = newChild)
}

object CountInSetExpr {

  def toUtf8Set(set: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def compute(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var i = 0
    var c = 0
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def apply(arr: Column, set: Seq[String]): Column =
    ColumnBridge.column(CountInSetExpr(ColumnBridge.expression(arr), set))
}
