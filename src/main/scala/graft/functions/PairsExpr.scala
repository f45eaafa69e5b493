package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** All unordered pairs {ids[i], ids[j]}, i < j, of a long array, emitted
  * as (da, db) = (min, max) — the bucket-pair generation step of LSH
  * candidate mining, as a LAZY Catalyst Generator.
  *
  * Replaces a bucket SELF-JOIN (`bucket.as("x").join(bucket.as("y"), keys
  * && x.id < y.id)`): Spark computes each side of a self-join as an
  * independent subplan, so the whole upstream pipeline (minhash
  * signatures, prefix selection) ran TWICE, plus a join shuffle. With
  * `groupBy(bucket).agg(collect_list(id))` + this generator the upstream
  * runs once and pairs stream out of `GenerateExec` row by row — a
  * Generator, NOT an array-returning expression, because the n·(n-1)/2
  * pair array of a hot bucket materialized in a single row would dwarf
  * the O(n) input it came from (the self-join it replaces streams its
  * output too; this keeps that property).
  *
  * Each emitted pair satisfies da < db STRICTLY: per-pair min/max makes
  * input order irrelevant (callers need no `sort_array`, and a SQL user
  * feeding `id_pairs` an unsorted array cannot get inverted pairs), and
  * equal elements emit NO pair — duplicate ids in the input (which bucket
  * members never have, but a SQL caller might) cannot produce a da = db
  * self-pair that downstream jaccard/cosine would score 1.0.
  */
case class PairsExpr(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback
    with ImplicitCastInputTypes {

  // Typed input contract: the eval below reads long elements straight out
  // of the ArrayData, so a mistyped SQL call (id_pairs is exposed via
  // GraftExtensions) must fail at analysis time — an int-backed array would
  // otherwise ClassCastException at runtime or, worse, read garbage from
  // UnsafeArrayData. Implicit casts still widen array<int> etc. to
  // array<bigint>.
  // (return type inferred: AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(LongType))

  override def elementSchema: StructType = StructType(Seq(
    StructField("da", LongType, nullable = false),
    StructField("db", LongType, nullable = false)))

  override def prettyName: String = "id_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val ids = child.eval(input).asInstanceOf[ArrayData]
    if (ids == null) Iterator.empty
    else {
      val n = ids.numElements()
      new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        private def bump(): Unit = { j += 1; if (j == n) { i += 1; j = i + 1 } }
        // skip (i, j) positions holding equal values — no self-pairs
        private def skipEqual(): Unit =
          while (j < n && ids.getLong(i) == ids.getLong(j)) bump()
        skipEqual()
        override def hasNext: Boolean = j < n
        override def next(): InternalRow = {
          val x = ids.getLong(i)
          val y = ids.getLong(j)
          val r =
            if (x < y) new GenericInternalRow(Array[Any](x, y))
            else new GenericInternalRow(Array[Any](y, x))
          bump(); skipEqual()
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): PairsExpr =
    copy(child = newChild)
}

object PairsExpr {

  import org.apache.spark.sql.graft.ColumnBridge

  /** Generator column: `df.select(PairsExpr(col("ids")))` yields the two
    * columns (da, db), one row per pair.
    */
  def apply(ids: Column): Column =
    ColumnBridge.column(PairsExpr(ColumnBridge.expression(ids)))
}
