package graft

import org.apache.spark.sql.{Row, SparkSession}

import graft.functions.Fnv1a32

/** The SparkSessionExtensions installation path: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` (or, equivalently,
  * `builder.withExtensions(new GraftExtensions)`) must expose every
  * native kernel as a SQL function (the SQL/JDBC/notebook surface;
  * Column-API callers import graft.functions directly).
  */
class ExtensionsSpec extends SparkTestBase {

  test("GraftExtensions registers the kernel SQL functions") {
    val base = spark // materialize the shared context first
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // with no default session but a live SparkContext, getOrCreate builds
    // a NEW session over the same context. spark.sql.extensions is a
    // STATIC conf (only honored when the context launches), so the test
    // injects via withExtensions — the same GraftExtensions.apply path the
    // conf triggers in a production session.
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      assert(s2 ne base, "expected a fresh session with extensions applied")
      val row = s2.sql(
        """SELECT fnv1a32('abc') AS f,
          |       array_dot_product(array(1d, 2d), array(3d, 4d)) AS d,
          |       word_ngrams(array('a', 'b', 'c'), 2) AS ng,
          |       tokenize('a-b c!') AS t,
          |       token_hash60('the the cat', true) AS th,
          |       shingle_hash60('a b c d', 3, 2147483647) AS sh,
          |       simhash32('the cat') AS sh32,
          |       winnow_fps('abcdefghijklmnop', 8, 4) AS wf
          |""".stripMargin).collect()(0)
      assert(row.getInt(0) === Fnv1a32.hash("abc".getBytes("UTF-8")))
      assert(row.getDouble(1) === 11.0)
      assert(row.getSeq[String](2) === Seq("a b", "b c"))
      assert(row.getSeq[String](3) === Seq("a", "b", "c"))
      assert(row.getSeq[Long](4).length === 2) // distinct {the, cat}
      assert(row.getSeq[Long](5).length === 2) // grams "a b c", "b c d"
      assert(!row.isNullAt(6)) // simhash32 of non-empty text
      assert(row.getSeq[Long](7).nonEmpty)
      // id_pairs is a GENERATOR (multi-column output): its SQL form takes
      // the multi-alias generator syntax
      val pairs = s2.sql("SELECT id_pairs(array(1L, 2L, 3L)) AS (da, db)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(pairs === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
      // minhash_sig: per-permutation minimum of (a_i*h + b_i) % p
      val mh = s2.sql(
        "SELECT minhash_sig(array(3L, 10L), array(5, 7), array(1, 0), 97) AS s")
        .collect()(0).getSeq[Long](0)
      // perm 0: min((3*5+1)%97, (10*5+1)%97) = min(16, 51) = 16
      // perm 1: min((3*7+0)%97, (10*7+0)%97) = min(21, 70) = 21
      assert(mh === Seq(16L, 21L))
      // id_pairs declares ImplicitCastInputTypes(array<bigint>): int
      // arrays widen via implicit cast; a non-castable element type fails
      // at ANALYSIS time instead of a runtime ClassCastException (or a
      // silent garbage read from an int-backed UnsafeArrayData)
      val castPairs = s2.sql("SELECT id_pairs(array(1, 2, 3)) AS (da, db)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(castPairs === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
      intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT id_pairs(array('a', 'b')) AS (da, db)").collect()
      }
      // minhash_sig declares the same contract: an INT hash array widens
      // via implicit cast (same values as the bigint form above), a
      // non-castable element type fails analysis
      val mhInt = s2.sql(
        "SELECT minhash_sig(array(3, 10), array(5, 7), array(1, 0), 97) AS s")
        .collect()(0).getSeq[Long](0)
      assert(mhInt === Seq(16L, 21L))
      intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT minhash_sig(array('a'), array(5), array(1), 97) AS s").collect()
      }
      // DESCRIBE FUNCTION must surface the registered usage string
      // (ExpressionInfo substitutes the name for _FUNC_)
      val desc = s2.sql("DESCRIBE FUNCTION id_pairs")
        .collect().map(_.getString(0)).mkString("\n")
      assert(desc.contains("id_pairs(ids)"), s"usage string lost:\n$desc")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
