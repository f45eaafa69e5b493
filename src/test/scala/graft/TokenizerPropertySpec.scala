package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen

import graft.functions.TextFns

/** Property tests pinning tokenizer semantics: the engine's `\p{L}` regex
  * split must agree with a direct Character.isLetter-based splitter (the
  * JVM mirror of Go's `strings.FieldsFunc(unicode.IsLetter)`, reference
  * src/mrapps/wc.go:21) on arbitrary strings, including non-ASCII.
  */
class TokenizerPropertySpec extends SparkTestBase {

  /** Direct port of the reference tokenizer contract to the JVM. */
  private def fieldsFuncIsLetter(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    s.codePoints().forEach { cp =>
      if (Character.isLetter(cp)) cur.appendAll(Character.toChars(cp))
      else if (cur.nonEmpty) { out += cur.result(); cur.clear() }
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaChar, Gen.numChar, Gen.oneOf(' ', '\n', '\t', ',', '.', '\'', '-', '_'),
    Gen.oneOf('é', 'ß', 'λ', '中', 'я', 'ñ'))).map(_.mkString)

  test("regex tokenizer == Character.isLetter splitter (JVM mirror of Go FieldsFunc)") {
    val samples = Gen.listOfN(200, textGen).sample.get
    import spark.implicits._
    val got = samples.toDF("text")
      .select(TextFns.tokens(col("text")).as("t"))
      .collect().map(_.getSeq[String](0).toSeq)
    samples.zip(got).foreach { case (s, tokens) =>
      assert(tokens === fieldsFuncIsLetter(s), s"input=${s.replace("\n", "\\n")}")
    }
  }

  test("Scala-side MRApp tokenizer agrees with the column tokenizer") {
    val samples = Gen.listOfN(200, textGen).sample.get
    samples.foreach { s =>
      val appTokens = s.split(TextFns.TokenSplitRegex).toSeq.filter(_.nonEmpty)
      assert(appTokens === fieldsFuncIsLetter(s), s"input=${s.replace("\n", "\\n")}")
    }
  }

  // Independent reference: the INDEX-BASED greedy leftmost scan from the
  // BPE definition (i += 2 on a merge) — deliberately a different
  // formulation than the engine's fold, so a fold-semantics bug (e.g.
  // re-matching a just-merged tail) cannot cancel out.
  private def applyGreedy(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]; var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += l + r; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refBpe(wc: Seq[(String, Long)], rounds: Int): Seq[(Long, String, String, String, Long)] = {
    var vocab = wc.map { case (w, c) => (w.map(_.toString).toVector, c) }
    (1 to rounds).flatMap { rnd =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        (0 until syms.length - 1).foreach { i =>
          val k = (syms(i), syms(i + 1)); counts(k) = counts.getOrElse(k, 0L) + c
        }
      }
      if (counts.isEmpty) None
      else {
        val ((l, r), n) = counts.toSeq.minBy { case ((a, b), m) => (-m, a, b) }
        vocab = vocab.map { case (syms, c) => (applyGreedy(syms, l, r), c) }
        Some((rnd.toLong, l, r, l + r, n))
      }
    }
  }

  test("bpe_train: merge table equals a textbook greedy-scan reference (runs, ties, cascades)") {
    // The dictionary forces the hard cases: same-symbol runs ("aaaa" must
    // merge to [aa, aa], never [a, aa, a]), a count TIE broken
    // lexicographically (cd vs ce), and cascades where a merged symbol
    // feeds later rounds.
    val wc = Seq(("aaaa", 5L), ("aab", 5L), ("abab", 3L), ("ba", 2L),
      ("cd", 7L), ("ce", 7L), ("aaab", 1L), ("z", 1L))
    import spark.implicits._
    val got = graft.queries.TextQueries.bpeTrainMerges(wc.toDF("word", "c"), rounds = 6)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val want = refBpe(wc, 6)
    assert(want.length === 6, "reference ran out of pairs — test corpus too small to pin 6 rounds")
    assert(got === want)
    // the tie round must exist and break lexicographically: cd and ce both
    // count 7, cd must win its round
    assert(want.exists { case (_, l, r, _, n) => l == "c" && r == "d" && n == 7L },
      s"expected the (c,d) tie-break round in $want")
  }

  test("bpe_train at 100 rounds: the unrolled loop stays equal to the reference " +
    "far past the kernel scale") {
    // A real tokenizer learns thousands of merges; 10 rounds is the
    // oracle-pinned kernel. This pins the SAME reference equality at
    // 100 rounds on a dictionary crafted to sustain them: 120 seeded-
    // random length-24 words over 6 letters supply well over 100
    // productive merges (structured/arithmetic word patterns collapse
    // after ~30 — randomness is load-bearing here), so every round does
    // real work — no round is vacuously empty. Catches state that only
    // drifts in deep loops (checkpoint truncation dropping a round's
    // merge, tie-break instability once counts thin out to 1s).
    val rnd6 = new scala.util.Random(42)
    val wc = (0 until 120).map { _ =>
      ((0 until 24).map(_ => ('a' + rnd6.nextInt(6)).toChar).mkString,
        (rnd6.nextInt(13) + 1).toLong)
    }
    val rounds = 100
    val want = refBpe(wc, rounds)
    assert(want.length === rounds,
      s"reference exhausted at ${want.length} rounds — crafted dictionary too small")
    import spark.implicits._
    val got = graft.queries.TextQueries.bpeTrainMerges(wc.toDF("word", "c"), rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got === want)
  }
}
