package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingOps

/** Streaming soak at scale (round-15 advice #6, extended round 17): the
  * 27 batch/stream twins are agreement-tested at toy scale; this main
  * drives the STATEFUL twins a production ingest leans on hardest through
  * an sf1-rate file stream under the RocksDB state store, across E
  * restart epochs (E ≥ 4 ⇒ ≥ 3 checkpoint hand-offs), recording
  * per-epoch throughput, state-store row counts, rows emitted, and
  * on-disk checkpoint state size.
  *
  * Twins and what "state bounded as declared" means for each:
  *  - trailing_features: one flatMapGroupsWithState state row per user
  *    (numRowsTotal plateaus at |users| once all users have appeared —
  *    that is the metric asserted below), whose CONTENT is the user's
  *    event buffer trimmed to the 7-day horizon, so state BYTES are
  *    bounded by the horizon's event mass (~(7/30)·n events corpus-wide),
  *    never by total history consumed.
  *  - latest_by_key: exactly one state row per distinct user — flat at
  *    |users| once all users have appeared.
  *  - daily_active_users: dedup state = |users|·|days in the 25 h
  *    horizon| + open windows — plateaus, never history-sized.
  *  - follow_ups / no_follow_ups (round 17, the STREAM-STREAM join
  *    twins): each side buffers only events younger than
  *    watermark (1 h) + gap (30 min), so join state plateaus at
  *    ~rate·1.5 h per side — constant per epoch at constant rate — and
  *    the emitted rows must agree with the batch twin on the closed
  *    corpus: follow_ups emits EXACTLY the batch `funnel_pairs` rows
  *    (inner join, every pair forms once — the `batch_pairs` agreement
  *    field); no_follow_ups emits a row per stalled anchor once the
  *    watermark proves no match can arrive, so rows_out must land in
  *    [stalled_expired, stalled_total] — stalled anchors whose window
  *    provably closed vs all stalled anchors (the younger remainder is
  *    ALLOWED to stay buffered on a closed input; both bounds are
  *    recorded).
  *  - ann_probe_scaled (round 17): the capacity-law IVF index serving
  *    live queries; the only state is the per-(window, query) top-k
  *    (O(k) each) on a PROCESSING-time axis, so a soak can only witness
  *    eviction by outliving the horizon — run with
  *    SPARK_GRAFT_PROBE_HORIZON=「1 minute」and the soak sleeps each epoch
  *    past it: state_rows must DROP between epochs (old windows drained),
  *    not accumulate to |queries ever|. rows_out records the emitted
  *    top-k mass (= TopK · queries when every probe fills its heap —
  *    `expected_rows`); window content is horizon-independent, so the
  *    shortened horizon changes retention only, never rows.
  *
  * Event epochs split BY EVENT TIME (the twins' documented per-user
  * event-time-order contract across triggers), embedding epochs by
  * vec_id range; each epoch is a real restart: the query reopens the
  * RocksDB store from the checkpoint and keeps folding.
  *
  * Usage: SPARK_GRAFT_SF_DIR=scratch/sf1 [SPARK_GRAFT_PROBE_HORIZON="1 minute"]
  *          runMain graft.StreamSoak [epochs]
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

    val allEv = Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val Array(lo, hi) = allEv.agg(min(col("ts")), max(col("ts")))
      .collect().map(r => Array(r.getLong(0), r.getLong(1))).head
    val nRows = allEv.count()
    val cuts = (0 to epochs).map(i => lo + (hi - lo) * i / epochs)

    val allEmb = Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding", "label")
    lazy val nVecs = allEmb.count()

    /** Write one epoch of `src` rows matching `cond` into `in` as numbered
      * parquet part files (the stream's arriving batch); returns rows. */
    def writeEpoch(src: DataFrame, cond: Column, in: Path, i: Int): Long = {
      val dfE = src.filter(cond)
      val scratch = Files.createTempDirectory("graft-soak-scratch")
      dfE.write.mode("overwrite").parquet(scratch.resolve("e").toString)
      var k = 0
      val parts = Files.list(scratch.resolve("e"))
      try parts.toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).foreach { part =>
          Files.copy(Paths.get(part), in.resolve(f"batch$i%02d-$k%03d.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
          k += 1
        }
      finally parts.close()
      // the scratch copy served its purpose — a soak must not accumulate
      // an extra corpus copy on disk per (twin, epoch)
      val w = Files.walk(scratch)
      try w.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally w.close()
      dfE.count()
    }

    case class Twin(name: String, mode: String, input: String,
        build: DataFrame => DataFrame)
    val twins = Seq(
      Twin("trailing_features_stream", "append", "events",
        ev => StreamingOps.trailingFeaturesStream(spark, ev).toDF()),
      Twin("latest_by_key_stream", "update", "events",
        ev => StreamingOps.latestByKey(spark, ev).toDF()),
      Twin("daily_active_users_stream", "append", "events",
        ev => StreamingOps.dailyActiveUsers(ev)),
      Twin("follow_ups_stream", "append", "events",
        ev => StreamingOps.followUps(ev)),
      Twin("no_follow_ups_stream", "append", "events",
        ev => StreamingOps.noFollowUps(ev)),
      Twin("ann_probe_scaled_stream", "update", "emb",
        emb => StreamingOps.annProbeScaledStream(spark, emb, sfDir)))

    // probe-twin eviction witness: with the horizon shortened by env, park
    // each epoch long enough for the NEXT batch's watermark to drain the
    // previous epoch's windows (processing-time axis — see scaladoc)
    val probeSleepMs =
      if (sys.env.contains("SPARK_GRAFT_PROBE_HORIZON")) 75000L else 0L

    def jstr(s: String) = "\"" + s + "\""
    val perQuery = twins.map { t =>
      val in = Files.createTempDirectory(s"graft-soak-in-${t.name}")
      val ckpt = Files.createTempDirectory(s"graft-soak-ckpt-${t.name}")
      val epochStats = (0 until epochs).map { i =>
        val rowsIn = t.input match {
          case "events" => writeEpoch(allEv,
            col("ts") > (if (i == 0) Long.MinValue else cuts(i)) &&
              col("ts") <= cuts(i + 1), in, i)
          case "emb" => writeEpoch(allEmb,
            col("vec_id") >= nVecs * i / epochs &&
              col("vec_id") < nVecs * (i + 1) / epochs, in, i)
        }
        val raw = t.input match {
          case "events" =>
            Tables.normalizeEventTs(spark,
              spark.readStream.schema(StreamingOps.eventSchema).parquet(in.toString))
          case "emb" =>
            spark.readStream.schema(StreamingOps.embSchema).parquet(in.toString)
        }
        val stream = t.build(raw)
        val t0 = System.nanoTime()
        val q = stream.writeStream
          .format("noop")
          .option("checkpointLocation", ckpt.toString)
          .outputMode(t.mode)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        // recentProgress is synchronous with the terminated query (the
        // async listener bus is not) — sum the per-batch sink rows
        val progress = q.recentProgress.toSeq
        require(progress.size < 100,
          "recentProgress overflow: per-epoch batch count exceeds retention")
        val rowsOut = progress.map(_.sink.numOutputRows).filter(_ > 0).sum
        val ops = progress.lastOption.map(_.stateOperators.toSeq).getOrElse(Seq.empty)
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
        if (t.input == "emb" && probeSleepMs > 0 && i < epochs - 1)
          Thread.sleep(probeSleepMs)
        (rowsIn, sec, stateRows, stateMem + sstBytes, ckptBytes, rowsOut)
      }
      val totalRows = epochStats.map(_._1).sum
      val totalSec = epochStats.map(_._2).sum
      // batch-twin agreement on the closed corpus (the soak consumed all
      // of it), computed by the BATCH engine — what the emitted counts
      // must line up against (see scaladoc per twin)
      val agreement: String = t.name match {
        case "follow_ups_stream" =>
          val pairs = graft.queries.RelationalQueries.funnelPairs(spark, sfDir).count()
          s""","batch_pairs":$pairs"""
        case "no_follow_ups_stream" =>
          val gapUs = graft.queries.RelationalQueries.FunnelGapUs
          val evb = allEv.select(col("event_id"), expr("ts div 1000").as("us"))
          val anchored = graft.queries.RelationalQueries.funnelPairs(spark, sfDir)
            .select(col("event_id")).distinct()
          val stalled = evb.join(anchored, Seq("event_id"), "left_anti")
          val wmUs = evb.agg(max(col("us"))).head().getLong(0) - 3600L * 1000000L
          val total = stalled.count()
          val expired = stalled
            .filter(col("us") + gapUs + 1000000L < wmUs).count()
          s""","stalled_expired":$expired,"stalled_total":$total"""
        case "ann_probe_scaled_stream" =>
          s""","expected_rows":${graft.queries.SimilarityQueries.TopK * nVecs}"""
        case _ => ""
      }
      val epochJson = epochStats.map { case (r, s, sr, sb, cb, ro) =>
        s"""{"rows_in":$r,"sec":$s,"state_rows":$sr,"state_bytes":$sb,""" +
          s""""ckpt_bytes":$cb,"rows_out":$ro}"""
      }.mkString("[", ",", "]")
      val line = s"""${jstr(t.name)}:{"epochs":$epochJson,""" +
        s""""rows_per_sec":${totalRows / totalSec}$agreement}"""
      System.err.println(f"[soak] ${t.name}: $totalRows rows in $totalSec%.1f s, " +
        s"state rows per epoch ${epochStats.map(_._3).mkString("->")}, " +
        s"rows out ${epochStats.map(_._6).mkString("->")}")
      line
    }
    println(s"""{"metric":"stream_soak","sf":${jstr(sfDir)},"events":$nRows,""" +
      s""""epochs":$epochs,"provider":"rocksdb","queries":{${perQuery.mkString(",")}}}""")
    spark.stop()
  }
}
