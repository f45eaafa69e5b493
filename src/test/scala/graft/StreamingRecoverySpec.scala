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
}
