package graft.cli

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.operators.{Apps, MapReduce, MRApp}

/** CLI runner — the engine's `mrsequential` equivalent (reference
  * `src/main/mrsequential.go:6`: `mrsequential wc.so pg*.txt`).
  *
  * Usage: runMain graft.cli.Main <app> <outDir> <inputGlob>
  *   app ∈ wc | indexer | perfile | kvfold
  *
  * Output: text files of sorted `"<key> <value>"` lines under outDir —
  * the reference's mr-out format (src/mr/worker.go:150-155), sorted like
  * the sequential oracle (src/main/mrsequential.go:59) for determinism.
  */
object Main {

  val apps: Map[String, MRApp] = Map(
    "wc" -> Apps.WordCount,
    "indexer" -> Apps.Indexer,
    "perfile" -> Apps.PerFileCount,
    "kvfold" -> Apps.KvFold)

  def main(args: Array[String]): Unit = {
    if (args.length != 3) {
      System.err.println(s"usage: graft.cli.Main <${apps.keys.mkString("|")}> <outDir> <inputGlob>")
      sys.exit(2)
    }
    val Array(appName, outDir, glob) = args
    val app = apps.getOrElse(appName, {
      System.err.println(s"unknown app '$appName' — expected one of ${apps.keys.mkString(", ")}")
      sys.exit(2)
    })
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
    MapReduce.toOutputLines(result)
      .orderBy(col("value"))
      .coalesce(1)
      .write.mode("overwrite").text(outDir)
    spark.stop()
  }
}
