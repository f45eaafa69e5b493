package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lint: the streaming-twin inventory that SURVEY.md declares must move in
  * lockstep with the code (round-10 verdict: `annProbeStream` landed while
  * the doc still said "all twenty-two"). Every PUBLIC Dataset-returning
  * method of [[graft.streaming.StreamingOps]] must be classified — a
  * stream SOURCE helper, a named PART of a composite twin, or a twin —
  * and each twin must appear by name in SURVEY.md's streaming block with
  * the spelled-out count matching. Adding a new op without documenting it
  * (or documenting without classifying) fails here instead of drifting
  * silently. Pure reflection + file read — no Spark session.
  */
class StreamingInventorySpec extends AnyFunSuite {

  /** Stream-source constructors (file-stream readers feeding the twins) —
    * part of the harness, not operators with a batch counterpart.
    */
  private val sources = Set("eventStream", "docStream", "embStream")

  /** Named parts of a composite twin, counted under their parent: the
    * top-k twin = `windowWordCounts` (watermark-bounded windowed counts)
    * + `topWords` (per-trigger rank-and-limit foreachBatch transform).
    */
  private val twinParts = Set("topWords")

  private def publicStreamingMethods: Set[String] = {
    val ds = classOf[org.apache.spark.sql.Dataset[_]]
    graft.streaming.StreamingOps.getClass.getDeclaredMethods.toSeq
      .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
      .filter(m => ds.isAssignableFrom(m.getReturnType))
      .map(_.getName).filterNot(_.contains("$")).toSet
  }

  private def twins: Set[String] = publicStreamingMethods -- sources -- twinParts

  test("the classification lists name real StreamingOps methods") {
    val unknown = (sources ++ twinParts) -- publicStreamingMethods
    assert(unknown.isEmpty,
      s"classified names not found in StreamingOps: ${unknown.mkString(", ")}")
  }

  test("SURVEY.md names every streaming twin and states the exact count") {
    val survey = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    val missing = (twins ++ twinParts).filterNot(survey.contains)
    assert(missing.isEmpty,
      s"streaming ops missing from SURVEY.md: ${missing.mkString(", ")} — " +
        "document the twin in the streaming block (or classify it here)")
    val words = (20 to 29).map(n => n -> ("twenty" +
      Seq("", "-one", "-two", "-three", "-four", "-five", "-six", "-seven",
        "-eight", "-nine")(n - 20))).toMap
    // words.get, not words(): a twin count outside the spelled table must
    // fail with the lint's own message, not a NoSuchElementException
    val word = words.getOrElse(twins.size, fail(
      s"twin count ${twins.size} outside the spelled-number table (20-29) — " +
        "extend `words` to cover it"))
    val expected = s"all $word"
    assert(survey.contains(expected),
      s"SURVEY.md must say '$expected' in the batch/stream agreement " +
        s"sentence — twins (${twins.size}): ${twins.toSeq.sorted.mkString(", ")}")
    // tightness: the doc must not still claim a neighboring count — the
    // lookahead keeps "all twenty" from matching inside "all twenty-three"
    (words - twins.size).values.foreach { w =>
      assert(!java.util.regex.Pattern.compile(s"all $w(?![a-z-])")
          .matcher(survey).find(),
        s"SURVEY.md claims 'all $w' but ${twins.size} twins exist")
    }
  }
}
