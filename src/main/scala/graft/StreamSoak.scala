package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** Streaming soak at scale (round-15 advice #6): the 27 batch/stream twins
  * are agreement-tested at toy scale; this main drives the three STATEFUL
  * twins a production ingest leans on hardest — trailing_features
  * (flatMapGroupsWithState event buffer), latest_by_key
  * (mapGroupsWithState upsert), daily_active_users
  * (dropDuplicatesWithinWatermark + windowed agg) — through an sf1-rate
  * file stream under the RocksDB state store, across E restart epochs
  * (E ≥ 4 ⇒ ≥ 3 checkpoint hand-offs), recording per-epoch throughput,
  * state-store row counts, and on-disk checkpoint state size.
  *
  * What "state bounded as declared" means per twin:
  *  - trailing_features: buffer = per-user events inside the 7-day
  *    horizon; the corpus spans 30 days at constant rate, so state rows
  *    must PLATEAU at ~(7/30)·n after the horizon fills, not grow with
  *    epochs consumed.
  *  - latest_by_key: exactly one state row per distinct user — flat at
  *    |users| once all users have appeared.
  *  - daily_active_users: dedup state = |users|·|days in the 25 h
  *    horizon| + open windows — plateaus, never history-sized.
  *
  * Epochs split BY EVENT TIME (the twins' documented per-user
  * event-time-order contract across triggers), so each epoch is a real
  * restart: the query reopens the RocksDB store from the checkpoint and
  * keeps folding.
  *
  * Usage: SPARK_GRAFT_SF_DIR=scratch/sf1 runMain graft.StreamSoak [epochs]
  * Prints one JSON line per query plus a final `stream_soak` summary line.
  */
object StreamSoak {

  private def dirBytes(p: Path): Long =
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size).sum
      finally s.close()
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/scratch/sf1")
    val epochs = args.lift(0).map(_.toInt).getOrElse(4)
    require(epochs >= 2, "need >= 2 epochs for a restart hand-off")
    val spark = GraftSession.localBuilder("graft-stream-soak", GraftSession.envCpus(32))
      // the off-heap store a production deployment runs; per-query state
      // no longer lives in executor heap (StreamingRecoverySpec pins the
      // provider actually serving via the checkpoint layout)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val all = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val Array(lo, hi) = all.agg(min(col("ts")), max(col("ts")))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val nRows = all.count()
    val cuts = (0 to epochs).map(i => lo + (hi - lo) * i / epochs)

    def writeEpoch(in: Path, i: Int): Long = {
      val dfE = all.filter(col("ts") > (if (i == 0) Long.MinValue else cuts(i)) &&
        col("ts") <= cuts(i + 1))
      val scratch = Files.createTempDirectory("graft-soak-scratch")
      dfE.write.mode("overwrite").parquet(scratch.resolve("e").toString)
      var k = 0
      Files.list(scratch.resolve("e")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).foreach { part =>
          Files.copy(Paths.get(part), in.resolve(f"batch$i%02d-$k%03d.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
          k += 1
        }
      dfE.count()
    }

    case class Twin(name: String, mode: String,
        build: DataFrame => DataFrame)
    val twins = Seq(
      Twin("trailing_features_stream", "append",
        ev => StreamingOps.trailingFeaturesStream(spark, ev).toDF()),
      Twin("latest_by_key_stream", "update",
        ev => StreamingOps.latestByKey(spark, ev).toDF()),
      Twin("daily_active_users_stream", "append",
        ev => StreamingOps.dailyActiveUsers(ev)))

    def jstr(s: String) = "\"" + s + "\""
    val perQuery = twins.map { t =>
      val in = Files.createTempDirectory(s"graft-soak-in-${t.name}")
      val ckpt = Files.createTempDirectory(s"graft-soak-ckpt-${t.name}")
      val epochStats = (0 until epochs).map { i =>
        val rowsIn = writeEpoch(in, i)
        val raw = spark.readStream.schema(StreamingOps.eventSchema)
          .parquet(in.toString)
        val stream = t.build(Tables.normalizeEventTs(spark, raw))
        val t0 = System.nanoTime()
        val q = stream.writeStream
          .format("noop")
          .option("checkpointLocation", ckpt.toString)
          .outputMode(t.mode)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        val ops = Option(q.lastProgress).map(_.stateOperators.toSeq).getOrElse(Seq.empty)
        val stateRows = ops.map(_.numRowsTotal).sum
        // LIVE state size: the store's own metrics — memoryUsedBytes plus
        // RocksDB's current-version SST footprint. The checkpoint DIR size
        // is reported separately and is CUMULATIVE by design (it retains
        // minBatchesToRetain versions for recovery) — growth there is
        // version retention, not state growth.
        val stateMem = ops.map(_.memoryUsedBytes).sum
        val sstBytes = ops.flatMap(o =>
          Option(o.customMetrics.get("rocksdbSstFileSize")).map(_.longValue)).sum
        val ckptBytes = dirBytes(ckpt.resolve("state"))
        spark.streams.resetTerminated()
        (rowsIn, sec, stateRows, stateMem + sstBytes, ckptBytes)
      }
      val totalRows = epochStats.map(_._1).sum
      val totalSec = epochStats.map(_._2).sum
      val epochJson = epochStats.map { case (r, s, sr, sb, cb) =>
        s"""{"rows_in":$r,"sec":$s,"state_rows":$sr,"state_bytes":$sb,"ckpt_bytes":$cb}"""
      }.mkString("[", ",", "]")
      val line = s"""${jstr(t.name)}:{"epochs":$epochJson,""" +
        s""""rows_per_sec":${totalRows / totalSec}}"""
      System.err.println(f"[soak] ${t.name}: $totalRows rows in $totalSec%.1f s, " +
        s"state rows per epoch ${epochStats.map(_._3).mkString("->")}")
      line
    }
    println(s"""{"metric":"stream_soak","sf":${jstr(sfDir)},"events":$nRows,""" +
      s""""epochs":$epochs,"provider":"rocksdb","queries":{${perQuery.mkString(",")}}}""")
    spark.stop()
  }
}
