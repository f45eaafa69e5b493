package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (round-18): dump the POST-EXECUTION adaptive plan of a
  * declared query — `Explain` prints the initial plan
  * (`isFinalPlan=false`), which hides what AQE actually did at runtime
  * (ReusedExchange / stage reuse, AQEShuffleRead coalescing, join-strategy
  * rewrites). This runs the query through the noop sink once (warm-up
  * pass for the memoized artifacts), again for the measured final plan,
  * and prints `explain("formatted")` AFTER execution, where the adaptive
  * plan is final.
  *
  * Usage: runMain graft.FinalPlan <sfDir> <queryName>
  */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.localBuilder("graft-final-plan", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(which)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save() // build memoized artifacts
    val t0 = System.nanoTime()
    // collect() drives THIS Dataset's own QueryExecution, whose adaptive
    // plan is final afterwards — a noop write would execute a separate
    // QueryExecution and leave df's plan initial
    val n = df.collect().length
    println(f"\n===== $which (final adaptive plan; warm ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows) =====")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
