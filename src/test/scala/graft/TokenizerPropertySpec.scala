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
}
