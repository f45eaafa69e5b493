package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rounds-cost probe for the BPE training loop: times
  * [[graft.queries.TextQueries.bpeTrainMerges]] at 10 / 100 / 500 rounds
  * and prints one JSON line per point, pinning the linear-in-rounds cost
  * the `localCheckpoint` design claims (PLANS.md records the measured
  * curve). Two dictionaries per point:
  *
  *  - `sf`: the real sf-dir dictionary. The synthetic corpus has a
  *    31-word vocabulary, so pair supply EXHAUSTS after ~40 merges —
  *    rounds past exhaustion run the full per-round machinery (pair
  *    count, TakeOrdered, merge broadcast, checkpoint) over an empty
  *    dictionary, which isolates the loop's FIXED per-round overhead.
  *  - `syn`: a hash-generated 20k-word dictionary (length-20 words over
  *    12 letters) that sustains 500+ productive merges, measuring the
  *    cost when every round does real work on a realistically long-tail
  *    dictionary.
  *
  * Linearity check: sec(500) / sec(100) ≈ 5 on both dictionaries. A
  * super-linear curve means lineage is leaking through the checkpoint
  * (the exact regression `localCheckpoint` was added to prevent — the
  * fully-lazy loop measured 64 s COLD at 10 rounds and doubled its
  * logical plan per round).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BpeCurve [rounds...]"
  */
object BpeCurve {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val roundsList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 100, 500)
    // engine-required confs from the one shared source of truth
    val spark = GraftSession.localBuilder("graft-bpe-curve", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 20k distinct length-20 words over 12 letters, counts Zipf-ish via
    // hash mod — pure column expressions, same discipline as GenScale.
    def synDict: DataFrame = spark.range(0, 20000, 1, cpus).select(
      array_join(transform(sequence(lit(1), lit(20)), i =>
        chr(lit(97) + pmod(xxhash64(lit(91L), col("id"), i), lit(12)))), "").as("word"),
      (pmod(xxhash64(lit(92L), col("id")), lit(1000L)) + 1L).as("c"))

    val dicts = Seq(
      "sf" -> graft.queries.TextQueries.bpeDictionary(spark, dir),
      "syn" -> synDict)
    for ((dname, dict) <- dicts; r <- roundsList) {
      val d = dict.persist()
      d.count() // dictionary build excluded from the timed loop
      val t0 = System.nanoTime()
      val merges = graft.queries.TextQueries.bpeTrainMerges(d, r).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"dict":"$dname","rounds":$r,"merges":$merges,"sec":$sec%.3f}""")
      d.unpersist()
    }
    spark.stop()
  }
}
