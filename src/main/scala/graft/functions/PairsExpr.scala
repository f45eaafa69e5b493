package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** All ordered pairs (ids[i], ids[j]), i < j, of a sorted long array —
  * the bucket-pair generation step of LSH candidate mining done per-row.
  *
  * Replaces a bucket SELF-JOIN (`bucket.as("x").join(bucket.as("y"), keys
  * && x.id < y.id)`): Spark computes each side of a self-join as an
  * independent subplan, so the whole upstream pipeline (minhash signatures,
  * prefix selection) ran TWICE, plus a join shuffle. With
  * `groupBy(bucket).agg(sort_array(collect_list(id)))` + this kernel the
  * upstream runs once and pair generation is a tight in-row loop.
  *
  * Input ids must be sorted ascending (callers use `sort_array`), so
  * emitted pairs satisfy da < db — identical to the join formulation the
  * DuckDB oracle uses. Callers bound bucket sizes (MaxBandBucket) BEFORE
  * this expression; output size is n·(n-1)/2.
  */
case class PairsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("da", LongType, nullable = false),
      StructField("db", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "id_pairs"

  override def nullSafeEval(input: Any): Any =
    PairsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PairsExpr =
    copy(child = newChild)
}

object PairsExpr {

  def compute(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, ids.getLong(j))): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graft.ColumnBridge

  def apply(ids: Column): Column =
    ColumnBridge.column(PairsExpr(ColumnBridge.expression(ids)))
}
