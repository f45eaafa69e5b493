package graft.cli

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.{Apps, MapReduce, MRApp}

/** CLI runner — the engine's `mrsequential`/`mrworker` equivalent
  * (reference `src/main/mrsequential.go:6`: `mrsequential wc.so pg*.txt`;
  * `src/main/mrworker.go:32-49` loads arbitrary Map/Reduce plugins at
  * runtime).
  *
  * Usage: runMain graft.cli.Main <app> <outDir> <inputGlob> [--partitions=N]
  *   app ∈ wc | indexer | perfile | kvfold — or any fully-qualified
  *   class/object name implementing [[graft.operators.MRApp]], loaded
  *   reflectively: the runtime-plugin parity with the reference's `.so`
  *   loading (a library embedder just passes the instance; this flag is
  *   for the CLI path).
  *
  * Output: text files of `"<key> <value>"` lines under outDir — the
  * reference's mr-out format (src/mr/worker.go:150-155).
  *   - Default (no --partitions): ONE globally-sorted file, exactly the
  *     sequential oracle's layout (src/main/mrsequential.go:59). Correct
  *     for parity runs; single-file output is inherently driver-bounded.
  *   - `--partitions N`: the production layout — N reduce buckets by the
  *     reference's own FNV-1a `ihash(key) % N` (src/mr/worker.go:25-29),
  *     each bucket written as its own file with keys sorted WITHIN the
  *     bucket (the per-reduce-task order the reference workers produce).
  *     No global sort, no single-partition collapse — scales with N.
  */
object Main {

  val apps: Map[String, MRApp] = Map(
    "wc" -> Apps.WordCount,
    "indexer" -> Apps.Indexer,
    "perfile" -> Apps.PerFileCount,
    "kvfold" -> Apps.KvFold)

  /** Resolve a builtin app name, else reflectively load a user class:
    * first as a Scala `object <name> extends MRApp` (MODULE$ singleton),
    * else as a class with a no-arg constructor. Mirrors the reference's
    * runtime plugin contract (`mrworker.go:32-49`) without dynamic
    * linking: the classpath is the plugin surface on a JVM.
    */
  private[graft] def resolveApp(name: String): MRApp =
    apps.getOrElse(name, {
      def asObject = scala.util.Try {
        Class.forName(name + "$").getField("MODULE$").get(null)
      }
      def asClass = scala.util.Try {
        Class.forName(name).getDeclaredConstructor().newInstance()
      }
      asObject.orElse(asClass) match {
        case scala.util.Success(app: MRApp) => app
        case scala.util.Success(other) => throw new IllegalArgumentException(
          s"$name loaded but is not an MRApp (got ${other.getClass.getName})")
        case scala.util.Failure(e) => throw new IllegalArgumentException(
          s"unknown app '$name' — not a builtin (${apps.keys.mkString(", ")}) " +
            s"and not a loadable MRApp class: $e")
      }
    })

  /** Write the result in the reference's partitioned mr-out layout: one
    * file per FNV-1a bucket — EVERY bucket, like the reference's
    * per-reduce-task `mr-out-X` files (empty ones included) — with keys
    * sorted within the bucket. Exposed for the spec; the dataflow is a
    * single shuffle (`repartitionAndSortWithinPartitions`) — sort scope
    * is the bucket, never the global result. Spark's text writer emits no
    * part file for an empty partition, so missing bucket indices are
    * touched as empty `part-NNNNN-empty.txt` files after the write (the
    * RDD-backed dataset has no exchange above the partitioner, so task i
    * writes exactly `part-i`).
    */
  private[graft] def writePartitioned(spark: SparkSession,
      result: org.apache.spark.sql.Dataset[graft.operators.KV],
      outDir: String, nReduce: Int): Unit = {
    val lines = result.rdd.map(kv => (kv.key, kv.value))
      .repartitionAndSortWithinPartitions(new MapReduce.FnvPartitioner(nReduce))
      .map { case (k, v) => s"$k $v" }
    spark.createDataset(lines)(Encoders.STRING)
      .write.mode("overwrite").text(outDir)
    val present = Option(new java.io.File(outDir).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("part-"))
      .map(_.getName.stripPrefix("part-").takeWhile(_.isDigit).toInt).toSet
    (0 until nReduce).filterNot(present).foreach { i =>
      new java.io.File(outDir, f"part-$i%05d-empty.txt").createNewFile(): Unit
    }
  }

  def main(args: Array[String]): Unit = {
    val (flags, pos) = args.partition(_.startsWith("--"))
    val nPartitions: Option[Int] = flags.collectFirst {
      case f if f.startsWith("--partitions=") => f.stripPrefix("--partitions=").toInt
    }
    val badFlags = flags.filterNot(_.startsWith("--partitions="))
    if (pos.length != 3 || badFlags.nonEmpty) {
      System.err.println(
        s"usage: graft.cli.Main <${apps.keys.mkString("|")}|fqcn-of-MRApp> " +
          "<outDir> <inputGlob> [--partitions=N]")
      sys.exit(2)
    }
    val Array(appName, outDir, glob) = pos
    val app = try resolveApp(appName) catch {
      case e: IllegalArgumentException => System.err.println(e.getMessage); sys.exit(2)
    }
    // engine-required confs from the one shared source of truth
    val spark = graft.GraftSession.configure(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-$appName")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result = MapReduce.run(spark, glob, app)
    nPartitions match {
      case Some(n) => writePartitioned(spark, result, outDir, n)
      case None =>
        MapReduce.toOutputLines(result)
          .orderBy(col("value"))
          .coalesce(1)
          .write.mode("overwrite").text(outDir)
    }
    spark.stop()
  }
}
