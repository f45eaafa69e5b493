package graft

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession

/** Cold-tail attribution probe (dev tool): for each named query, runs it
  * COLD (first execution in this JVM, like the bench's cold pass) and
  * splits the wall time into
  *
  *  - `janino`: generated-code compilation during the run, from the
  *    [[CodegenMetrics]] compile-time histogram delta (the reservoir
  *    holds every sample until 1028 compilations, so deltas are exact
  *    for a run this size);
  *  - `exec`: summed executor task run time across the run's stages
  *    (divide by 32 for the perfectly-parallel floor);
  *  - the residual ≈ driver work — analysis/optimization, codegen
  *    SOURCE GENERATION (not compilation), scheduling.
  *
  * Then runs it once more WARM for the same query so the cold-only
  * surplus is visible per query. Evidence consumer: BASELINE.md's
  * cold-tail paragraph — if `janino` dominates the surplus, sharing
  * generated classes across same-shape queries is the lever; if `exec`
  * does, it's data first-touch; if the residual does, it's Catalyst.
  *
  *   sbt "runMain graft.ColdProfile q1 q2 ..."   (default: r15 top-10 cold)
  */
object ColdProfile {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "ann_recall_report", "ngram_jaccard_prefix", "cooc_pmi", "corpus_export",
      "cosine_rerank", "wordcount", "corpus_keep", "ann_lsh", "hard_negatives",
      "ann_ivfpq_rerank")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // engine-required confs from the one shared source of truth
    val spark = GraftSession.localBuilder("graft-cold-profile", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val store = org.apache.spark.GraftStatusBridge.store(spark.sparkContext)

    def compileMs: (Long, Long) = {
      val h = CodegenMetrics.METRIC_COMPILATION_TIME
      (h.getCount, h.getSnapshot.getValues.sum)
    }
    def profile(name: String, label: String): Unit = {
      val stagesBefore = store.stageList(null).map(_.stageId).toSet
      val (c0, ms0) = compileMs
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(300) // listener bus drain
      val (c1, ms1) = compileMs
      val execMs = store.stageList(null)
        .filterNot(s => stagesBefore(s.stageId)).map(_.executorRunTime).sum
      println(f"$label $name%-22s wall=${wallMs / 1000}%6.2fs " +
        f"janino=${(ms1 - ms0) / 1000.0}%5.2fs (${c1 - c0}%3d compiles) " +
        f"execSum=${execMs / 1000.0}%6.2fs (/$cpus=${execMs / 1000.0 / cpus}%5.2fs)")
    }
    names.foreach(profile(_, "[cold]"))
    names.foreach(profile(_, "[warm]"))
    spark.stop()
  }
}
