package graft.operators

import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Fnv1a32

/** One intermediate/output record of the MapReduce surface — the reference's
  * only data type (`KeyValue{Key,Value string}`, reference
  * `src/mr/worker.go:18-21`; SURVEY §1.1).
  */
case class KV(key: String, value: String)

/** A user Map/Reduce application — the reference's plugin contract
  * (`Map(filename, contents) []KeyValue`, `Reduce(key, values []string)
  * string`; reference `src/mrapps/wc.go:14-18,34-36`, loaded at
  * `src/main/mrworker.go:32-49`).
  */
trait MRApp extends Serializable {
  def map(file: String, contents: String): IterableOnce[KV]
  def reduce(key: String, values: Seq[String]): String
}

/** The generic MapReduce engine, re-expressed on Spark.
  *
  * The reference's coordinator/worker/RPC machinery (E9-E12 in SURVEY §2.1)
  * is NOT ported: Spark's DAGScheduler + shuffle + task retry +
  * `spark.speculation` already implement scheduling, the map→reduce barrier,
  * straggler re-execution and exactly-once-visible output (atomic rename ==
  * FileOutputCommitter). What remains is the dataflow itself:
  *
  *   whole-file scan (E1, `src/mr/worker.go:73-84`)
  *     → flatMap of the user map fn (E2, `src/mr/worker.go:83`)
  *     → hash-partitioned shuffle (E3/E4, `src/mr/worker.go:86-113`)
  *     → group values by key (E5, `src/mr/worker.go:139-148` — hash
  *       grouping, NO sort, despite the Go function's name)
  *     → user reduce per distinct key (E7, `src/mr/worker.go:150-155`)
  *
  * Scale note: `mapGroups` buffers one key's values at a time — exactly the
  * reference reducer's own contract (it materializes `map[string][]string`).
  * Algebraic apps (e.g. word count) should instead use the DataFrame
  * queries in `graft.queries`, which keep partial aggregation + whole-stage
  * codegen; this generic path exists for arbitrary, non-algebraic reducers.
  */
object MapReduce {

  /** Scan input files as (fileName, wholeContents) — one record per file,
    * mirroring E1. `input_file_name` yields a URI; `fileName` keeps just the
    * final path segment, matching how the reference passes plain filenames.
    */
  def wholeFiles(spark: SparkSession, inputGlob: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(inputGlob)
      .select(
        element_at(split(input_file_name(), "/"), -1).as("file"),
        col("value").as("contents"))
      .as[(String, String)]
  }

  /** Run an MRApp end-to-end; result is the unordered set of (key, value)
    * output records (ordering contract: none — SURVEY §1.2).
    */
  def run(spark: SparkSession, inputGlob: String, app: MRApp, nReduce: Int = 10): Dataset[KV] = {
    import spark.implicits._
    val pairs = wholeFiles(spark, inputGlob).flatMap { case (f, c) => app.map(f, c) }
    pairs
      .groupByKey(_.key)
      .mapGroups((k, it) => KV(k, app.reduce(k, it.map(_.value).toSeq)))
  }

  /** Render the reference's `mr-out-*` line format: `"<key> <value>"`
    * (`fmt.Fprintf("%v %v\n")`, reference `src/mr/worker.go:150-155`).
    */
  def toOutputLines(ds: Dataset[KV]): DataFrame =
    ds.toDF().select(concat_ws(" ", col("key"), col("value")).as("value"))

  /** Exact reference partitioner: `ihash(key) % nReduce` with FNV-1a
    * (`src/mr/worker.go:25-29,90`). Only needed for byte-level layout parity
    * with the reference's intermediate files — results never depend on it.
    */
  class FnvPartitioner(val numPartitions: Int) extends Partitioner {
    override def getPartition(key: Any): Int =
      Fnv1a32.hash(key.toString.getBytes("UTF-8")) % numPartitions
  }

  /** The reference's intermediate-file JSON encoding: one object per line,
    * capitalized field names (`{"Key":…,"Value":…}`, encoder at reference
    * `src/mr/worker.go:96-113`; committed examples `src/main/mr-1-1`).
    */
  def toReferenceJson(ds: Dataset[KV]): DataFrame =
    ds.toDF().select(col("key").as("Key"), col("value").as("Value"))

  /** Read reference-format intermediate files back as KV (decoder parity
    * with `src/mr/worker.go:157-178`).
    */
  def fromReferenceJson(spark: SparkSession, path: String): Dataset[KV] = {
    import spark.implicits._
    spark.read
      .schema("Key STRING, Value STRING")
      .json(path)
      .select(col("Key").as("key"), col("Value").as("value"))
      .as[KV]
  }

  /** Map-side output partitioned exactly like the reference's `mr-<m>-<r>`
    * buckets (E3/E4) — debugging/parity aid.
    */
  def fnvPartitioned(spark: SparkSession, inputGlob: String, app: MRApp, nReduce: Int): Dataset[KV] = {
    import spark.implicits._
    val pairs = wholeFiles(spark, inputGlob).flatMap { case (f, c) => app.map(f, c) }
    pairs.rdd
      .map(kv => (kv.key, kv.value))
      .partitionBy(new FnvPartitioner(nReduce))
      .map { case (k, v) => KV(k, v) }
      .toDS()
  }
}
