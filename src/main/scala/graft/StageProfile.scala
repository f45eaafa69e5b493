package graft

import org.apache.spark.sql.SparkSession

/** Temporary dev profiling main: per-stage executor times of one query. */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "ngram_jaccard_prefix"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // engine-required confs from the one shared source of truth
    val spark = GraftSession.localBuilder("graft-stage-profile", GraftSession.envCpus(32))
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
