package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries read via this single entry so that source options (and, at
  * cluster scale, bucketing/partition layout hints) are applied uniformly.
  * Parquet scans get predicate pushdown + column pruning from Catalyst for
  * free; every query below selects only the columns it needs so the
  * `ReadSchema` stays minimal at 100 TB.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
      // read it as a raw nanos-since-epoch BIGINT and let queries derive
      // time columns with exact integer arithmetic (no double rounding).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `documents` spread across the session's shuffle parallelism. The test
    * corpus ships as one tiny single-row-group parquet file, which the scan
    * cannot split — without this every per-document CPU-heavy stage
    * (tokenize, shingle, hash) runs on one thread. One cheap shuffle of the
    * raw text buys full parallelism for everything downstream. At real
    * scale (many files / row groups) the scan splits naturally and this
    * repartition collapses to a no-op-cost rebalance keyed on doc_id.
    *
    * The partition count is pinned to `defaultParallelism` (total cores):
    * a bare `repartition(col)` lets AQE size the exchange by shuffle
    * *bytes*, and a few MB of raw text coalesces to ONE partition — which
    * serializes every downstream per-document kernel (observed: a 32-core
    * bench pinned at one core for minutes). CPU-heavy, small-byte stages
    * must pin their width explicitly; AQE only sees bytes.
    */
  def docs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    apply(spark, dir, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
  }

  /** `embeddings`, spread like [[docs]] (same single-file constraint). */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    apply(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
  }
}
