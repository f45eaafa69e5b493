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
}
