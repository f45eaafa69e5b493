package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  * Column names and value arithmetic are kept *identical* on both sides —
  * integer-exact where possible (counts, integer-cents money sums), and
  * bit-identical IEEE-754 double expressions otherwise.
  */
case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String],
    doc: String = "")

/** Session-scoped memoize-and-persist for per-(session, dir) derived
  * tables (shingle tables, signature tables, embedding norms): queries
  * reference these subplans several times and repeated invocations (the
  * bench loop, the verify dump) share one cache entry instead of leaking a
  * new one per call. When the owning SparkContext ends the entry is
  * evicted, so the map never retains stopped sessions (or their cached
  * blocks) for the JVM lifetime — a slow leak in a long-running
  * multi-tenant driver otherwise. One listener per entry; eviction is
  * idempotent.
  */
private[queries] object Memo {
  type Table = scala.collection.concurrent.TrieMap[(SparkSession, String), DataFrame]
  def table(): Table = new Table

  def memoize(memo: Table, spark: SparkSession, dir: String)(
      build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((spark, dir), {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          memo.remove((spark, dir))
      })
      build.persist()
    })
}

/** Shared DuckDB SQL fragments mirroring `graft.functions.TextFns`. */
object Oracle {
  /** Mirror of TextFns.tokens (tokenizer of reference src/mrapps/wc.go:21). */
  val toksCte: String =
    "SELECT doc_id, list_filter(string_split_regex(text, '[^\\p{L}]+'), w -> length(w) > 0) AS t FROM documents"

  /** Mirror of TextFns.hash60. */
  def hash60(s: String): String =
    s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"

  /** Word 3-gram list of token list `t` (mirror of TextFns.wordNgrams). */
  def ngrams3(t: String): String =
    s"[array_to_string($t[i:i+2], ' ') for i in generate_series(1, len($t) - 2)]"

  /** Word 2-gram (bigram) list of token list `t`. */
  def ngrams2(t: String): String =
    s"[array_to_string($t[i:i+1], ' ') for i in generate_series(1, len($t) - 1)]"
}
