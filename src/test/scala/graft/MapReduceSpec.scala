package graft

import java.nio.file.Files

import graft.operators.{Apps, KV, MapReduce}

/** Unit + property tests of the generic MapReduce surface: results match a
  * naive single-threaded fold, are invariant to the reduce partition count,
  * and the FNV partitioner places keys exactly like the reference
  * (ihash(key) % nReduce, src/mr/worker.go:90).
  */
class MapReduceSpec extends SparkTestBase {

  private lazy val corpusDir: String = {
    val d = Files.createTempDirectory("mr-corpus")
    Files.writeString(d.resolve("f1.txt"), "the quick brown fox jumps over the lazy dog\nthe fox")
    Files.writeString(d.resolve("f2.txt"), "pack my box with five dozen liquor jugs; the box")
    Files.writeString(d.resolve("f3.txt"), "fox dog fox DOG Fox")
    d.toString
  }

  private def naiveWordCount: Map[String, String] = {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog\nthe fox",
      "pack my box with five dozen liquor jugs; the box",
      "fox dog fox DOG Fox")
    texts.flatMap(_.split("[^\\p{L}]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toString }
  }

  test("WordCount app matches a naive fold") {
    val got = MapReduce.run(spark, s"$corpusDir/*.txt", Apps.WordCount)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === naiveWordCount)
  }

  test("results are invariant to nReduce / shuffle partitioning") {
    val expected = naiveWordCount
    Seq(1, 5, 10).foreach { n =>
      val got = MapReduce.fnvPartitioned(spark, s"$corpusDir/*.txt", Apps.WordCount, n)
      // partitioned map output regrouped: same multiset of pairs
      val regrouped = got.collect().groupBy(_.key)
        .map { case (k, kvs) => k -> Apps.WordCount.reduce(k, kvs.map(_.value).toSeq) }
      assert(regrouped === expected, s"nReduce=$n")
    }
  }

  test("FnvPartitioner places every key at ihash(key) % nReduce") {
    val n = 7
    val rdd = MapReduce.fnvPartitioned(spark, s"$corpusDir/*.txt", Apps.WordCount, n).rdd
    val misplaced = rdd
      .mapPartitionsWithIndex { (idx, it) =>
        it.filterNot(kv =>
          graft.functions.Fnv1a32.hash(kv.key.getBytes("UTF-8")) % n == idx)
      }.count()
    assert(misplaced === 0)
  }

  test("Indexer app: distinct docs per word, sorted CSV") {
    val got = MapReduce.run(spark, s"$corpusDir/*.txt", Apps.Indexer)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got("fox") === "2 f1.txt,f3.txt")
    assert(got("the") === "2 f1.txt,f2.txt")
    assert(got("box") === "1 f2.txt")
  }

  test("KvFold app: sorted space-joined values per fixed key") {
    val got = MapReduce.run(spark, s"$corpusDir/*.txt", Apps.KvFold)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got("a") === "f1.txt f2.txt f3.txt")
    assert(got("d") === "xyzzy xyzzy xyzzy")
  }
}
