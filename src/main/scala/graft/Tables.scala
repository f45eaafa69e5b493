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
}
