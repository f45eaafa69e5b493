package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan (and optionally run) any
  * declared query. Usage:
  *   runMain graft.Explain <sfDir> <queryName> [run]
  *   runMain graft.Explain <sfDir> all          — plans for every query
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = args(1)
    val doRun = args.length > 2 && args(2) == "run"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    // engine-required confs from the one shared source of truth
    val spark = GraftSession.localBuilder("graft-explain", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (which == "all") SparkEntry.all.keys.toSeq else Seq(which)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n===== $name =====")
      df.explain("formatted")
      if (doRun) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"[$name] rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
