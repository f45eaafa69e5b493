package graft

import org.apache.spark.sql.SparkSession

/** Temporary dev profiling main: per-stage executor times of one query. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "ngram_jaccard_prefix"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC") // asof_join requires UTC (NTZ→epoch)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // compat: nanos-typed events files read as BIGINT (Tables normalizes)
      // 1000-entry generated-class cache (static conf): the default 100
      // thrashes on the biggest plans — see Bench.scala
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(): Unit =
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime(); run()
    println(f"[cold] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val store = org.apache.spark.GraftStatusBridge.store(spark.sparkContext)
    val before = store.stageList(null).map(_.stageId).toSet
    val t1 = System.nanoTime(); run()
    println(f"[warm] ${(System.nanoTime() - t1) / 1e9}%.2f s")
    Thread.sleep(1000) // let the listener bus drain
    store.stageList(null).filterNot(s => before(s.stageId)).sortBy(_.stageId).foreach { s =>
      val wall = (for {
        a <- s.completionTime; b <- s.submissionTime
      } yield a.getTime - b.getTime).getOrElse(-1L)
      println(f"stage ${s.stageId}%3d tasks=${s.numCompleteTasks}%3d " +
        f"execRun=${s.executorRunTime}%5d ms cpu=${s.executorCpuTime / 1000000}%5d ms " +
        f"wall=$wall%5d ms  ${s.name.takeWhile(_ != '\n').take(70)}")
    }
    spark.stop()
  }
}
