package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text / dedup queries.
  *
  * Everything here stays in `org.apache.spark.sql.functions` (codegen'd /
  * vectorizable) — no Scala UDFs on the hot path. Each helper has an exact
  * DuckDB mirror used by the oracle SQL (see `graft.queries.Oracle`), so
  * Spark results hash-match the DuckDB oracle bit-for-bit.
  */
object TextFns {

  /** Tokenization of the reference word-count app: split on runs of
    * non-letters (Go `strings.FieldsFunc(unicode.IsLetter)`, reference
    * `src/mrapps/wc.go:19-32`). Java `\p{L}` is the Unicode letter class,
    * matching Go's `unicode.IsLetter` table for this corpus.
    */
  val TokenSplitRegex = "[^\\p{L}]+"

  /** Non-empty letter tokens of a text column. Native single-pass kernel
    * (TokenizeExpr): the `filter(split(text, regex), ...)` form it replaces
    * ran the filter lambda interpreted per element and materialized the
    * empty split artifacts. Same result as
    * `filter(split(text, TokenSplitRegex), t => length(t) > 0)`.
    */
  def tokens(text: Column): Column = TokenizeExpr(text)

  /** Sliding word n-grams joined with single spaces; empty array when the
    * document has fewer than `n` tokens. Native codegen'd expression
    * (WordNgramsExpr) — per-row, no shuffle, no UDF, no per-position
    * interpreted lambda.
    */
  def wordNgrams(toks: Column, n: Int): Column = WordNgramsExpr(toks, n)

  /** Deterministic 60-bit hash of a string: the first 15 hex digits of its
    * MD5, read as a base-16 integer. Chosen because both engines reproduce
    * it exactly (DuckDB: `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`), so
    * every hash-derived operator (minhash, simhash, LSH, fingerprints) is
    * verifiable against the DuckDB oracle. Always non-negative (< 2^60).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(encode(c, "UTF-8")), 1, 15), 16, 10).cast("long")

  /** Whitespace-normalized text: trim + collapse runs of whitespace. */
  def normalized(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))
}
