package graft

import java.nio.file.Files

import graft.operators.{KV, MapReduce, MRApp}

/** A user app that is NOT in cli.Main's builtin map — the reflective
  * plugin path's test subject (reference parity: `mrworker.go:32-49`
  * loads arbitrary Map/Reduce plugins at runtime).
  */
object TestReflectiveApp extends MRApp {
  def map(file: String, contents: String): IterableOnce[KV] =
    contents.split("\\s+").iterator.filter(_.nonEmpty)
      .map(w => KV(w.toUpperCase, "1"))
  def reduce(key: String, values: Seq[String]): String = values.size.toString
}

/** CLI generality (round-15 "what's missing"): runtime app loading by
  * class name and a partitioned-output mode that never collapses to one
  * partition.
  */
class CliMainSpec extends SparkTestBase {

  test("resolveApp loads an MRApp object by fully-qualified name (not in the builtin map)") {
    assert(!cli.Main.apps.contains("graft.TestReflectiveApp"))
    val app = cli.Main.resolveApp("graft.TestReflectiveApp")
    assert(app eq TestReflectiveApp)
    // and the loaded app actually runs end-to-end
    val dir = Files.createTempDirectory("cli-app")
    Files.writeString(dir.resolve("a.txt"), "red red blue")
    val out = MapReduce.run(spark, s"$dir/*.txt", app).collect()
      .map(kv => kv.key -> kv.value).toMap
    assert(out === Map("RED" -> "2", "BLUE" -> "1"))
  }

  test("resolveApp still returns builtins, and rejects a non-MRApp class with a clear error") {
    assert(cli.Main.resolveApp("wc") eq graft.operators.Apps.WordCount)
    val e = intercept[IllegalArgumentException] {
      cli.Main.resolveApp("java.lang.String")
    }
    assert(e.getMessage.contains("not an MRApp"))
    val e2 = intercept[IllegalArgumentException] {
      cli.Main.resolveApp("no.such.Klass")
    }
    assert(e2.getMessage.contains("unknown app"))
  }

  test("partitioned output: FNV bucket per file, keys sorted within bucket, content equals the sequential layout") {
    import spark.implicits._
    val inDir = Files.createTempDirectory("cli-in")
    Files.writeString(inDir.resolve("a.txt"), "cat dog cat bird emu fox gnu hen")
    Files.writeString(inDir.resolve("b.txt"), "dog dog bird ant cat fox ant yak")
    val result = MapReduce.run(spark, s"$inDir/*.txt", graft.operators.Apps.WordCount)
    val outDir = Files.createTempDirectory("cli-out").toString + "/parts"
    val n = 4
    cli.Main.writePartitioned(spark, result, outDir, n)
    val files = new java.io.File(outDir).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    assert(files.length === n, s"expected one output file per reduce bucket")
    val perFile = files.map(f =>
      scala.io.Source.fromFile(f).getLines().toVector)
    // within-bucket key order (the reference worker's per-reduce-task sort)
    perFile.foreach { lines =>
      val keys = lines.map(_.split(" ")(0))
      assert(keys === keys.sorted, s"bucket not key-sorted: $lines")
    }
    // bucket assignment is the reference's own ihash(key) % n
    perFile.zipWithIndex.foreach { case (lines, i) =>
      lines.map(_.split(" ")(0)).foreach { k =>
        assert(new MapReduce.FnvPartitioner(n).getPartition(k) === i,
          s"key $k landed in bucket $i, not its FNV bucket")
      }
    }
    // union of buckets == the sequential (global) layout's content
    val expected = result.collect().map(kv => s"${kv.key} ${kv.value}").sorted
    assert(perFile.flatten.sorted.toSeq === expected.toSeq)
  }

  test("partitioned output: empty buckets still produce a (zero-byte) file, like the reference's mr-out-X") {
    val inDir = Files.createTempDirectory("cli-in-empty")
    Files.writeString(inDir.resolve("one.txt"), "solo solo solo")
    val result = MapReduce.run(spark, s"$inDir/*.txt", graft.operators.Apps.WordCount)
    val outDir = Files.createTempDirectory("cli-out-empty").toString + "/parts"
    val n = 4 // one key -> exactly one non-empty bucket, three empty
    cli.Main.writePartitioned(spark, result, outDir, n)
    val files = new java.io.File(outDir).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    assert(files.length === n, s"expected $n files (empty buckets included), got ${files.map(_.getName).toSeq}")
    val soloBucket = new MapReduce.FnvPartitioner(n).getPartition("solo")
    files.zipWithIndex.foreach { case (f, i) =>
      val lines = scala.io.Source.fromFile(f).getLines().toVector
      if (i == soloBucket) assert(lines === Vector("solo 3"))
      else assert(lines.isEmpty, s"bucket $i should be empty, got $lines")
    }
  }
}
