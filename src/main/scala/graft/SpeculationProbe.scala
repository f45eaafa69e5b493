package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession

/** Straggler/speculation capability probe — the reference coordinator
  * reassigns Working tasks after 10 s (src/mr/coordinator.go:12-14,
  * 122-128); Spark's analog is speculative execution. The speculation
  * thread only starts under a cluster scheduler (never in local[*]), so
  * this main is driven by scripts/speculation-run.sh on
  * local-cluster[2,2,1024] with spark.speculation=true.
  *
  * Partition 7's FIRST attempt sleeps far past the assert budget; once
  * the median-based threshold trips, the scheduler launches a second copy
  * (attempt 1), which returns immediately — the job completes long before
  * the straggling attempt would have, proving reassignment-while-working.
  * The sum assert proves results stay exactly-once despite the duplicate
  * in-flight attempt.
  */
object SpeculationProbe {
  private val StragglerSleepMs = 120000L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("speculation-probe").getOrCreate()
    import spark.implicits._
    require(spark.conf.get("spark.speculation") == "true",
      "probe must run with spark.speculation=true (see scripts/speculation-run.sh)")
    val t0 = System.nanoTime()
    val sum = spark.range(0, 8, 1, 8).as[Long].map { i =>
      val tc = TaskContext.get()
      if (i == 7 && tc != null && tc.attemptNumber() == 0)
        Thread.sleep(StragglerSleepMs)
      i
    }.reduce(_ + _)
    val secs = (System.nanoTime() - t0) / 1e9
    val ok = sum == 28 && secs < StragglerSleepMs / 2000.0
    println(f"[speculation-probe] sum=$sum elapsed=$secs%.1fs " +
      (if (ok) "PASS" else "FAIL"))
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
