package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** Capability probe: CHECKPOINTED INCREMENTAL PROCESSING — the property
  * that makes a streaming pipeline restartable and exactly-once at the
  * sink. A file-source stream with a durable checkpoint is run to
  * completion, stopped, handed MORE input, and restarted on the same
  * checkpoint: the restarted query must process only the new files (no
  * re-emission of already-committed batches) and the sink must end up
  * exactly equal to a batch run over the union of all input — no
  * duplicates, no loss. This is the operational contract a 100 TB
  * ingest job runs under: each (say, hourly) restart picks up where the
  * offset log ends, and the parquet sink's transaction log makes
  * replayed writes idempotent.
  */
class StreamingRecoverySpec extends SparkTestBase {

  test("restart on the same checkpoint processes only new input; sink exactly-once") {
    val in = Files.createTempDirectory("graft-stream-in")
    val ckpt = Files.createTempDirectory("graft-stream-ckpt")
    val sink = Files.createTempDirectory("graft-stream-sink")

    // first input file: the sf0.001 documents parquet
    val src = Paths.get(sf("sf0.001"), "documents.parquet")
    Files.copy(src, in.resolve("batch0.parquet"), StandardCopyOption.REPLACE_EXISTING)

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(StreamingOps.docSchema)
        .parquet(in.toString)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val q = stream.writeStream
        .format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce()
    val afterFirst = spark.read.parquet(sink.toString).count()
    val batchCount = spark.read.parquet(in.resolve("batch0.parquet").toString).count()
    assert(afterFirst === batchCount)

    // second epoch: a NEW file with shifted ids (distinguishable rows).
    // Written to a scratch dir first — the file source lists plain files,
    // so the part file is copied in as a single flat parquet file.
    val scratch = Files.createTempDirectory("graft-stream-scratch")
    spark.read.parquet(in.resolve("batch0.parquet").toString)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
      .coalesce(1)
      .write.mode("overwrite").parquet(scratch.resolve("b1").toString)
    val part = Files.list(scratch.resolve("b1")).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")).head
    Files.copy(Paths.get(part), in.resolve("batch1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    runOnce()
    val out = spark.read.parquet(sink.toString)
    // exactly-once: old rows appear ONCE (not re-emitted on restart), new
    // rows appear once — the union equals a batch read of the input dir
    assert(out.count() === 2 * batchCount)
    assert(out.filter(col("doc_id") < 1000000L).count() === batchCount)
    assert(out.filter(col("doc_id") >= 1000000L).count() === batchCount)
    assert(out.select("doc_id").distinct().count() === 2 * batchCount)
  }

  test("STATEFUL restart: trailingFeatures 7-day buffer survives the checkpoint") {
    // The flatMapGroupsWithState buffer must persist across a restart:
    // epoch-2 events' features look back INTO epoch 1, so any state loss
    // (or replay) diverges from the batch backfill over the union. The
    // input splits BY TIME, satisfying the twin's documented contract
    // (per-user event-time order across triggers).
    val in = Files.createTempDirectory("graft-tf-in")
    val ckpt = Files.createTempDirectory("graft-tf-ckpt")
    val sink = Files.createTempDirectory("graft-tf-sink")
    val all = graft.Tables(spark, sf("sf0.001"), "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val Array(lo, hi) = all.agg(min(col("ts")), max(col("ts")))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val cut = lo + (hi - lo) / 2

    def writeEpoch(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val scratch = Files.createTempDirectory("graft-tf-scratch")
      df.coalesce(1).write.mode("overwrite").parquet(scratch.resolve("e").toString)
      val part = Files.list(scratch.resolve("e")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.copy(Paths.get(part), in.resolve(name), StandardCopyOption.REPLACE_EXISTING)
    }

    def runOnce(): Unit = {
      val raw = spark.readStream.schema(StreamingOps.eventSchema).parquet(in.toString)
      val stream = StreamingOps.trailingFeaturesStream(
        spark, graft.Tables.normalizeEventTs(spark, raw))
      val q = stream.toDF().writeStream
        .format("parquet")
        .option("path", sink.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeEpoch(all.filter(col("ts") <= cut), "batch0.parquet")
    runOnce()
    val firstCount = spark.read.parquet(sink.toString).count()
    writeEpoch(all.filter(col("ts") > cut), "batch1.parquet")
    runOnce()

    def key(r: org.apache.spark.sql.Row) =
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) null else r.getLong(4))
    val got = spark.read.parquet(sink.toString)
      .select("event_id", "user_id", "n_7d", "cents_7d", "gap_ns")
      .collect().map(key).toMap
    val allDir = Files.createTempDirectory("graft-tf-all")
    all.write.mode("overwrite").parquet(allDir.resolve("events.parquet").toString)
    val expected = graft.queries.RelationalQueries
      .trailingFeatures(spark, allDir.toString).collect().map(key).toMap
    assert(got.size === expected.size, "exactly one feature row per event (no replay)")
    assert(got === expected)
    // the restart actually served features ACROSS the boundary: some
    // epoch-2 event must look back at epoch-1 state
    assert(firstCount > 0 && firstCount < expected.size)
    val epoch1Max = all.filter(col("ts") <= cut)
      .agg(max(col("ts"))).collect().head.getLong(0)
    val crossBoundary = spark.read.parquet(sink.toString)
      .join(graft.Tables(spark, allDir.toString, "events")
        .select(col("event_id"), col("ts")), "event_id")
      .filter(col("ts") > cut && col("gap_ns").isNotNull &&
        col("ts") - col("gap_ns") <= epoch1Max)
    assert(crossBoundary.count() > 0,
      "vacuous: no epoch-2 feature referenced epoch-1 state")
  }
}
