package graft

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession

/** Dev probe (round 17): split a WARM query's wall time into
  *
  *   - `build`  — DataFrame construction (query fn call, includes memo hits)
  *   - `plan`   — analysis + optimization + physical planning
  *                (forcing `queryExecution.executedPlan`)
  *   - `exec`   — action time (noop write) = AQE stage round-trips +
  *                codegen + task execution + commit
  *   - `compiles` — janino class compilations during the exec phase
  *
  * Each query runs `reps` warm repetitions (after one untimed warmup) and
  * reports the MIN per phase, matching the bench's min-of-k convention.
  *
  *   sbt "runMain graft.PhaseProfile q1 q2 ..."
  */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("group_agg")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_PHASE_REPS", "3").toInt
    val spark = GraftSession.localBuilder("graft-phase-profile", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def compiles: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val store = org.apache.spark.GraftStatusBridge.store(spark.sparkContext)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // untimed warmup rep
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      var best = (Double.MaxValue, Double.MaxValue, Double.MaxValue, 0L)
      var bestCpu = Long.MaxValue
      var bestStages = 0
      (1 to reps).foreach { _ =>
        val before = store.stageList(null).map(_.stageId).toSet
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis/optimization/planning
        val t2 = System.nanoTime()
        val c0 = compiles
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        val c1 = compiles
        Thread.sleep(200) // listener bus drain
        val newStages = store.stageList(null).filterNot(s => before(s.stageId))
        val cpuMs = newStages.map(_.executorCpuTime).sum / 1000000
        val nStages = newStages.count(_.numCompleteTasks > 0)
        val cur = ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9, c1 - c0)
        if (cur._1 + cur._2 + cur._3 < best._1 + best._2 + best._3) best = cur
        if (cpuMs < bestCpu) { bestCpu = cpuMs; bestStages = nStages }
      }
      println(f"[phase] $name%-28s build=${best._1}%5.3f plan=${best._2}%5.3f " +
        f"exec=${best._3}%5.3f (compiles=${best._4}) total=${best._1 + best._2 + best._3}%5.3f " +
        f"cpuSum=${bestCpu / 1000.0}%6.2fs stages=$bestStages%3d")
    }
    spark.stop()
  }
}
