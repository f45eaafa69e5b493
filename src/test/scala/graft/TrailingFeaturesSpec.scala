package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** Pins the round-16 skew routing of `trailing_features`: the delta/
  * prefix-sum form must be value-identical to the single-window form it
  * replaces past the skew threshold, on inputs built to break the delta
  * bookkeeping:
  *
  *  - one HOT user holding most of the corpus (the Zipf regime that
  *    motivated the rewrite: the naive frame re-aggregation is O(n·f)
  *    per user and measured 31.4 s vs 0.54 s at sf1),
  *  - duplicate timestamps (RANGE peers must all be EXCLUDED by the
  *    −1 ns upper bound, and their masses must merge in the arrival
  *    collapse),
  *  - events exactly H apart (the inclusive lower bound: an event at
  *    ts − H is still inside the frame, so its expiry must not fire
  *    until strictly after ts),
  *  - gaps longer than H (empty frames: n=0, cents=0, gap NULL).
  */
class TrailingFeaturesSpec extends SparkTestBase {

  private val H = RelationalQueries.TrailingHorizonNs

  private lazy val dir: String = {
    import spark.implicits._
    val day = 86400000000000L
    val rnd = new scala.util.Random(16)
    // hot user 1: 2000 events over ~55 days incl. duplicate timestamps;
    // user 2: sparse with a > H dead gap; user 3: events EXACTLY H apart
    val hot = Seq.tabulate(2000) { i =>
      val ts = (i / 3).toLong * (day / 12) + (if (i % 3 == 2) 0L else rnd.nextInt(1000).toLong)
      (i.toLong, 1L, ts, (rnd.nextInt(500) - 100).toLong)
    }
    val sparse = Seq((9001L, 2L, 0L, 7L), (9002L, 2L, H + 1L, 11L),
      (9003L, 2L, 3 * H + 5L, 13L))
    val edge = Seq((9101L, 3L, 0L, 1L), (9102L, 3L, H, 2L), (9103L, 3L, 2 * H, 4L),
      (9104L, 3L, 2 * H, 8L)) // tie at 2H: peers excluded from each other
    val d = Files.createTempDirectory("tf-skew")
    (hot ++ sparse ++ edge)
      .toDF("event_id", "user_id", "ts", "cents")
      .repartition(7) // adversarial placement; results must not care
      .select(col("event_id"), col("ts"), col("user_id"),
        lit("view").as("event_type"),
        (col("cents").cast("double") / 100).as("value"),
        lit("{}").as("props"))
      .write.parquet(d.resolve("events.parquet").toString)
    d.toString
  }

  private def keyOf(r: org.apache.spark.sql.Row) =
    r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
      if (r.isNullAt(4)) null else r.getLong(4)))
  private val cols = Seq("event_id", "user_id", "n_7d", "cents_7d", "gap_ns")

  test("delta form == window form on hot-user corpus with ties, horizon-edge events, dead gaps") {
    val delta = RelationalQueries.trailingFeaturesDelta(spark, dir)
      .select(cols.head, cols.tail: _*).collect().map(keyOf).toMap
    val window = RelationalQueries.trailingFeaturesWindow(spark, dir)
      .select(cols.head, cols.tail: _*).collect().map(keyOf).toMap
    assert(delta.size === window.size)
    assert(delta === window)
    // spot-pin the horizon-edge semantics directly (independent of the
    // window oracle): at ts=H the event at ts=0 is still IN frame
    // (inclusive lower bound)...
    assert(delta(9102L) === ((3L, 1L, 1L, H)))
    // ...peers at the same ts see earlier history but not each other...
    assert(delta(9103L)._2 === 1L, "tie peer must be excluded (only ts=H in frame)")
    assert(delta(9104L)._2 === 1L)
    // ...and a dead gap yields an empty frame: zero counts, NULL gap
    assert(delta(9003L) === ((2L, 0L, 0L, null)))
  }

  test("skew probe: max events per user, memoized, drives the route") {
    assert(RelationalQueries.maxEventsPerUser(spark, dir) === 2000L)
    // this corpus sits under the threshold → declared query takes the
    // window form; equivalence above makes the route value-invisible
    assert(2000L <= RelationalQueries.UserSkewRouteThreshold)
    val declared = RelationalQueries.trailingFeatures(spark, dir)
      .select(cols.head, cols.tail: _*).collect().map(keyOf).toMap
    val delta = RelationalQueries.trailingFeaturesDelta(spark, dir)
      .select(cols.head, cols.tail: _*).collect().map(keyOf).toMap
    assert(declared === delta)
  }
}
