package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `hash60(s) % mod` over every element of a string array in one native
  * pass — the per-element form of `TextFns.hash60` (first 15 md5 hex
  * digits as a base-16 long, here read directly as the digest's top 60
  * bits). Replaces the interpreted `transform(arr, s -> conv(substring(
  * md5(s),1,15),16,10) % mod)` higher-order chain on the shingle-hashing
  * hot path (one lambda frame + boxed hex string per element). One
  * MessageDigest instance serves the whole array; codegen-friendly via a
  * static call.
  */
case class Hash60ArrayExpr(child: Expression, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash60_array"

  override def nullSafeEval(input: Any): Any =
    Hash60ArrayExpr.compute(input.asInstanceOf[ArrayData], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Hash60ArrayExpr.compute($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Hash60ArrayExpr =
    copy(child = newChild)
}

object Hash60ArrayExpr {

  def compute(arr: ArrayData, mod: Long): ArrayData = {
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var h = 0L
      var j = 0
      while (j < 8) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      out(i) = (h >>> 4) % mod // top 60 bits = first 15 hex digits (hash60)
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def apply(arr: Column, mod: Long): Column =
    ColumnBridge.column(Hash60ArrayExpr(ColumnBridge.expression(arr), mod))
}
