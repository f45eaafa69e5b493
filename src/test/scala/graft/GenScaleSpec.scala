package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins [[GenScale]]'s determinism claim (BASELINE.md's sf1/sf10 scale-up
  * measurements rest on it): two independent generations of the same
  * (mult, div) corpus must be CONTENT-identical, table by table — every
  * value is a pure hash of (table salt, row id), no RNG state, no
  * time-dependence. Runs on a ~1/100-of-sf0.1 corpus (150 customers,
  * 1.5 k orders, 1 k events, 50 docs, 20 vectors) so the pin costs
  * seconds, not a bench run.
  */
class GenScaleSpec extends SparkTestBase {

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** One order-independent content fingerprint per table: xor-agg of a
    * per-row hash over every column (timestamps/arrays stringified via
    * to_json so the hash covers full precision).
    */
  private def fingerprint(dir: String, table: String): (Long, BigDecimal) = {
    val df = spark.read.parquet(s"$dir/$table.parquet")
    val rowHash = xxhash64(to_json(struct(df.columns.map(col).toSeq: _*)))
    val r = df.select(
      count(lit(1)).as("n"),
      // decimal sum: order/partition independent AND overflow-free
      sum(rowHash.cast("decimal(38,0)")).as("h"))
      .head()
    (r.getLong(0), BigDecimal(r.getDecimal(1)))
  }

  test("GenScale is deterministic: two generations are content-identical") {
    val a = Files.createTempDirectory("genscale-a").toString
    val b = Files.createTempDirectory("genscale-b").toString
    GenScale.write(spark, a, mult = 1L, div = 100L)
    GenScale.write(spark, b, mult = 1L, div = 100L)
    tables.foreach { t =>
      val (na, ha) = fingerprint(a, t)
      val (nb, hb) = fingerprint(b, t)
      assert(na > 0, s"$t: generated empty")
      assert(na == nb && ha == hb,
        s"$t: generation not deterministic (rows $na vs $nb, hash $ha vs $hb)")
    }
    // sanity on the shrunken corpus's shape: lineitem fans out from orders
    val nOrd = spark.read.parquet(s"$a/orders.parquet").count()
    val nLi = spark.read.parquet(s"$a/lineitem.parquet").count()
    assert(nOrd == 1500L, s"orders $nOrd")
    assert(nLi > nOrd, "lineitem should fan out past orders")
  }
}
