package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.ColumnBridge

/** Column wrappers over Spark's own Bloom-filter Catalyst pair — the
  * `BloomFilterAggregate` builder and the codegen `BloomFilterMightContain`
  * probe. This is the exact machinery Spark's `InjectRuntimeFilter` rule
  * uses for runtime semi-join reduction; exposing it as columns lets a
  * query state the reduction EXPLICITLY where the optimizer's heuristics
  * (join-type/selectivity thresholds) would not inject it — here, pruning a
  * corpus-sized shingle stream against a small fixed eval set
  * (`DedupQueries.decontaminateBloom`).
  *
  * Both sides operate on BIGINT keys (our shingle hashes already are);
  * `mightContain` has NO false negatives, so filtering with it before an
  * exact join never changes the join's result — only its input volume.
  */
object BloomFns {

  /** Distributed Bloom build: associative sketch merge in one
    * (Object)HashAggregate — the eval set never funnels through the driver;
    * only the finished ~`nBits/8`-byte sketch does.
    */
  def bloomAgg(h: Column, nItems: Long, nBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(h), Literal(nItems), Literal(nBits))
        .toAggregateExpression())

  /** Codegen membership probe against a constant serialized sketch (the
    * filter deserializes once per task, not per row).
    */
  def mightContain(bf: Array[Byte], h: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(Literal(bf), ColumnBridge.expression(h)))

  /** Standard optimal bit count for a target false-positive rate, capped
    * (Spark's own default cap) so a corpus-derived build can't balloon.
    */
  def optimalBits(nItems: Long, fpp: Double, cap: Long = 1L << 26): Long = {
    val bits = math.ceil(-nItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    math.max(64L, math.min(bits, cap))
  }
}
