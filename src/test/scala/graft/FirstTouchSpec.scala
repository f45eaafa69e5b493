package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** Pins the round-16 skew form of `first_touch` (sorted per-user
  * sliding-window-minimum scan) against the (user, day-bucket) join form
  * it replaces past the skew threshold, on inputs built to break the
  * deque bookkeeping:
  *
  *  - a HOT user interleaving purchases and touches densely (the Zipf
  *    regime: the join form's per-(user, bucket) candidate mass measured
  *    67.0 s vs 1.7 s at sf10),
  *  - touches AT a purchase's own timestamp (strict `< t0`: excluded),
  *  - a touch EXACTLY at t0 − 24 h (inclusive lower bound: included),
  *  - same-microsecond touches whose event_id order decides the argmin,
  *  - purchases with an empty window (NULL attribution),
  *  - back-to-back purchases at the same timestamp.
  */
class FirstTouchSpec extends SparkTestBase {

  private val W = RelationalQueries.TouchWindowNs

  private lazy val dir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    // hot user 1: 3000 events over ~10 days, ~1/3 purchases, dense ties
    val hot = Seq.tabulate(3000) { i =>
      val ts = (i / 4).toLong * (W / 300) + (if (i % 4 == 3) 0L else rnd.nextInt(2000).toLong)
      val typ = i % 4 match {
        case 0 => "purchase"
        case 1 => "view"
        case 2 => "click"
        case _ => "view"
      }
      (i.toLong, 1L, ts, typ)
    }
    val edge = Seq(
      (9001L, 2L, 0L, "view"), // exactly t0 − W for 9002: INCLUDED
      (9002L, 2L, W, "purchase"),
      (9003L, 2L, W, "click"), // touch AT t0: excluded (strict < t0)
      (9004L, 2L, 3 * W, "purchase"), // empty window → NULL attribution
      // same-microsecond pair: event_id breaks the argmin tie
      (9101L, 3L, 5000L, "view"), (9100L, 3L, 5500L, "click"),
      (9102L, 3L, 9000L, "purchase"), (9103L, 3L, 9000L, "purchase"))
    val d = Files.createTempDirectory("ft-skew")
    (hot ++ edge)
      .toDF("event_id", "user_id", "ts", "event_type")
      .repartition(7)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.parquet(d.resolve("events.parquet").toString)
    d.toString
  }

  private def keyOf(r: org.apache.spark.sql.Row) =
    r.getLong(0) -> ((r.getLong(1),
      if (r.isNullAt(2)) null else r.getLong(2),
      if (r.isNullAt(3)) null else r.getLong(3),
      if (r.isNullAt(4)) null else r.getString(4)))
  private val cols =
    Seq("purchase_id", "user_id", "first_ts_us", "first_event_id", "first_event_type")

  test("scan form == join form on dense hot-user corpus with boundary and tie cases") {
    val scan = RelationalQueries.firstTouchScan(spark, dir)
      .select(cols.head, cols.tail: _*).collect().map(keyOf).toMap
    val join = RelationalQueries.firstTouchJoin(spark, dir)
      .select(cols.head, cols.tail: _*).collect().map(keyOf).toMap
    assert(scan.size === join.size, "one row per purchase, both forms")
    assert(scan === join)
    // direct pins, independent of the join oracle:
    // inclusive lower bound — the touch exactly 24 h before IS the answer
    assert(scan(9002L) === ((2L, 0L, 9001L, "view")))
    // empty window (the only touches are > W old or at t0 itself)
    assert(scan(9004L) === ((2L, null, null, null)))
  }

  test("tie semantics: smaller event_id wins within a microsecond; same-ts purchases agree") {
    val scan = RelationalQueries.firstTouchScan(spark, dir)
      .select(cols.head, cols.tail: _*).collect().map(keyOf).toMap
    // touches at us=5 (ts 5000, eid 9101) and us=5 (ts 5500, eid 9100):
    // same microsecond, so the argmin order (us, event_id) picks 9100
    assert(scan(9102L) === ((3L, 5L, 9100L, "click")))
    assert(scan(9103L) === scan(9102L))
  }
}
