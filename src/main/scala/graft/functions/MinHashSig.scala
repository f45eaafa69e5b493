package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a shingle-hash array: for each (a_i, b_i) pair,
  * min over the array of (a_i·x + b_i) mod p. One pass over the input
  * computes all k minima (vs k interpreted `array_min(transform(...))`
  * higher-order expressions — the difference is ~k× fewer array traversals
  * and zero per-element boxing, which dominates minhash cost at corpus
  * scale). Codegen'd into whole-stage pipelines.
  *
  * Semantics are identical to the per-column HOF form and to the DuckDB
  * oracle's `list_min(list_transform(hs, h -> (h*a+b)%p))`.
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  // Typed input contract, mirroring PairsExpr: the eval reads long elements
  // straight out of the ArrayData, so a mistyped SQL call (minhash_sig is
  // exposed via GraftExtensions) must fail at analysis time — an int-backed
  // UnsafeArrayData would otherwise silently read garbage. Implicit casts
  // still widen array<int> etc. to array<bigint>.
  // (return type inferred: AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private val k = a.length

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aArr = ctx.addReferenceObj("aArr", a.toArray, "long[]")
    val bArr = ctx.addReferenceObj("bArr", b.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($h * $aArr[$j] + $bArr[$j]) % ${p}L;
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  import org.apache.spark.sql.graft.ColumnBridge
  def apply(hs: Column, ab: Seq[(Long, Long)], p: Long): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(hs), ab.map(_._1), ab.map(_._2), p))
}
