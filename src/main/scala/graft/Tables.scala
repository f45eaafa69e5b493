package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(spark, df) else df
  }

  /** Normalize `events.ts` to the engine-wide logical contract: **BIGINT
    * nanoseconds since the epoch**, whatever physical type the parquet file
    * carries. Every downstream time-axis query does exact integer bucket
    * arithmetic (`ts div 86400000000000` etc.) against this contract, so the
    * conversion must be lossless — and it is for every arrival type:
    *
    *  - `LongType`: the file is parquet TIMESTAMP(NANOS) read under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (pinned at session build
    *    by every entry point) — already nanos, pass through.
    *  - `TimestampType` (TIMESTAMP(MICROS) adjusted-to-UTC): `unix_micros`
    *    returns the stored 64-bit micros exactly; `* 1000L` to nanos is an
    *    exact integer multiply (micros ⊂ nanos).
    *  - `TimestampNTZType` (TIMESTAMP(MICROS) isAdjustedToUTC=false — what
    *    pandas/pyarrow write and Spark 4 infers as NTZ): the NTZ→TIMESTAMP
    *    cast reinterprets the wall-clock in the session zone, which is the
    *    identity on the stored micros only under UTC — required here, and
    *    pinned at session build by every entry point (the asof_join UTC
    *    standard, RelationalQueries.asofJoin).
    *
    * The normalization is a projection on the scan output: column pruning
    * and pushdown of predicates on OTHER columns are unaffected, and a
    * time-range predicate on the derived `ts` is a monotone function of the
    * physical column, which Catalyst constant-folds back through the
    * multiply for literal comparisons.
    */
  private[graft] def normalizeEventTs(spark: SparkSession, df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df // TIMESTAMP(NANOS) via nanosAsLong: already the contract
      case TimestampType =>
        df.withColumn("ts", microsToNanos(unix_micros(col("ts"))))
      case TimestampNTZType =>
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts arrived as TIMESTAMP_NTZ; the lossless reinterpretation " +
            "to epoch nanos requires spark.sql.session.timeZone=UTC — set it " +
            "at SparkSession build (every graft entry point does)")
        df.withColumn("ts", microsToNanos(unix_micros(col("ts").cast(TimestampType))))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported physical type $other; expected BIGINT " +
            "nanos, TIMESTAMP, or TIMESTAMP_NTZ")
    }

  private def microsToNanos(micros: Column): Column = micros * lit(1000L)

  /** Spread `df` across the session's parallelism ONLY when the scan
    * itself cannot (fewer split partitions than cores). The test corpus
    * ships as one tiny single-row-group parquet file, which the scan cannot
    * split — without the repartition every per-document CPU-heavy stage
    * (tokenize, shingle, hash) runs on one thread. At real scale the scan
    * splits into >= cores partitions naturally, the condition is false, and
    * NO shuffle is prepended — an unconditional `repartition` would re-move
    * every byte of a 100 TB corpus before every text query.
    *
    * When it does fire, the partition count is pinned to
    * `defaultParallelism` (total cores): a bare `repartition(col)` lets AQE
    * size the exchange by shuffle *bytes*, and a few MB of raw text
    * coalesces to ONE partition — which serializes every downstream
    * per-document kernel (observed: a 32-core bench pinned at one core for
    * minutes). CPU-heavy, small-byte stages must pin their width
    * explicitly; AQE only sees bytes.
    *
    * `df.rdd.getNumPartitions` is planning-only (file listing + split
    * arithmetic — no Spark job), so the check itself is cheap.
    */
  private def spread(spark: SparkSession, df: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val cores = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores, col(key)) else df
  }

  /** `documents`, conditionally spread (see [[spread]]). */
  def docs(spark: SparkSession, dir: String): DataFrame =
    spread(spark, apply(spark, dir, "documents"), "doc_id")

  /** `embeddings`, conditionally spread like [[docs]]. */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spread(spark, apply(spark, dir, "embeddings"), "vec_id")
}
