package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Heavy-hitters aggregate over the DataSketches frequent-items sketch
  * (Misra-Gries / space-saving family): constant `maxMapSize` state per
  * group regardless of stream length, associative merges, and the classic
  * deterministic guarantee `lb ≤ true count ≤ ub` with
  * `ub − lb ≤ maximumError ≤ 3.5·n / maxMapSize` — every item whose true
  * count exceeds `maximumError` is RETAINED (no false negatives under
  * `ErrorType.NO_FALSE_NEGATIVES`).
  *
  * This is the third member of the approximate triad next to
  * `approx_count_distinct` (HLL) and `percentile_approx` (KLL-style
  * quantiles), covering the query the other two can't: "what are the top
  * items and how often do they occur" over a stream too large to count
  * exactly — at 100 TB an exact `groupBy(word).count` shuffles the whole
  * token stream by key, while this sketch reduces each partition to a
  * bounded map and ships ONE small buffer per partition to the merger.
  *
  * Exposed as a `TypedImperativeAggregate` (the same plumbing Spark's own
  * sketch aggregates use): partial sketches serialize via the DataSketches
  * wire format into the aggregation buffer and merge associatively, so the
  * plan is a standard partial→final ObjectHashAggregate.
  *
  * Estimates may depend on partition merge order when the map saturates —
  * inherent to the sketch family and why [[graft.queries.TextQueries]]
  * declares the consuming query rows-only (like `approx_stats`); the
  * lb/ub/no-false-negative guarantees hold under EVERY merge order, and
  * the spec pins exactly those.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  // stateless codec; @transient lazy so the expression tree stays
  // serializable (rebuilt on each executor after deserialization)
  @transient private lazy val serde = new ArrayOfStringsSerDe

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(
      buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(
      a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  /** array<struct<item, estimate, lb, ub>> of the retained frequent items
    * (NO_FALSE_NEGATIVES: complete above the error bound, may include
    * items below it — the exact-join consumer filters as needed).
    */
  override def eval(buf: ItemsSketch[String]): Any = {
    val rows = buf.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows.toSeq.map { r =>
      InternalRow(
        UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound)
    })
  }

  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    buf.toByteArray(serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("estimate", LongType),
    StructField("lb", LongType),
    StructField("ub", LongType))))

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "freq_items"
}

object FreqItemsAgg {
  def apply(item: Column, maxMapSize: Int): Column =
    ColumnBridge.column(
      FreqItemsAgg(ColumnBridge.expression(item), maxMapSize)
        .toAggregateExpression())
}
