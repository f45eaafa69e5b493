package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.operators.{Apps, MapReduce}

/** Differential test against the reference's own committed run artifacts:
  * word count over the 8 Gutenberg texts must equal the merged+sorted
  * content of /root/reference/src/main/mr-out-0..9 (a real run's output,
  * nMap=8, nReduce=10 — SURVEY §5.2). This pins tokenizer semantics
  * (Go unicode.IsLetter vs Java \p{L}) to the reference's actual output.
  */
class ReferenceFixtureSpec extends SparkTestBase {

  private val refMain = "/root/reference/src/main"

  test("wordcount on the Gutenberg corpus equals the committed mr-out-* fixtures") {
    assume(Files.exists(Paths.get(refMain)), "reference repo not mounted")
    val expected = (0 until 10)
      .flatMap(r => Files.readAllLines(Paths.get(s"$refMain/mr-out-$r")).asScala)
      .sorted

    val got = MapReduce.run(spark, s"$refMain/pg-*.txt", Apps.WordCount)
      .collect()
      .map(kv => s"${kv.key} ${kv.value}")
      .sorted
      .toSeq

    assert(got.size === expected.size,
      s"distinct word count: got ${got.size}, fixtures have ${expected.size}")
    // compare fully; on mismatch show the first few diverging lines
    val diffs = got.zip(expected).filter { case (g, e) => g != e }.take(5)
    assert(diffs.isEmpty, s"first diffs: $diffs")
  }
}
