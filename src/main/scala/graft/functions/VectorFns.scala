package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns.
  *
  * Computation is promoted to double and folded left-to-right with
  * `zip_with` + `aggregate` higher-order functions — deterministic
  * element order, so the DuckDB oracle (`list_dot_product` on
  * `::DOUBLE[]`) reproduces the same IEEE-754 results. At cluster scale
  * the norm is computed once per vector (projected before the join), so a
  * pairwise similarity join does O(d) work per pair, not O(3d).
  */
object VectorFns {

  /** Cast array<float> → array<double> (exact widening) — native Cast,
    * not an interpreted per-element transform.
    */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product of two equal-length double arrays — codegen'd native
    * expression (see ArrayDotProduct); identical fold order to the
    * interpreted HOF form `aggregate(zip_with(a,b,_*_), 0.0, _+_)`.
    */
  def dot(a: Column, b: Column): Column = ArrayDotProduct(a, b)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Random-hyperplane-style LSH bucket using the axis planes of the first
    * `bits` dimensions: bit j set iff v[j] > 0. Cheap, deterministic, and
    * reproducible in SQL — at 100 TB this turns the O(n^2) similarity scan
    * into a per-bucket join (2^bits buckets).
    */
  def axisLshBucket(v: Column, bits: Int): Column = axisLshBucketAt(v, bits, 0)

  /** [[axisLshBucket]] over dimensions [offset, offset+bits): independent
    * hash TABLES for multi-table LSH come from disjoint axis blocks
    * (table t = offset t·bits) — isotropic corpora make every axis block
    * an equally good hyperplane set, and the SQL mirror stays a plain
    * sign test per dimension.
    */
  def axisLshBucketAt(v: Column, bits: Int, offset: Int): Column =
    (0 until bits)
      .map(j => when(element_at(v, offset + j + 1) > lit(0.0), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
}
