package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._

import graft.operators.{Apps, MapReduce}

/** The reference's scheduler-probing apps (SURVEY §2.2 A3-A6 / §5.3) as
  * engine capability tests — the properties the Go harness asserts with
  * marker files and crash loops, asserted here against Spark's scheduler:
  *
  *  - jobcount  (test-mr.sh:197-220): without failures, map runs exactly
  *    once per input file — no duplicate scheduling.
  *  - mtiming/rtiming (test-mr.sh:143-195): ≥2 tasks execute concurrently.
  *  - crash (test-mr.sh:286-334): output with injected task failures equals
  *    the failure-free output (task retry + exactly-once-visible results).
  */
object SchedulerCapabilitySpec {
  // static (JVM-local) probes — valid in local mode where tasks share the JVM
  val liveTasks = new AtomicInteger(0)
  val maxConcurrent = new AtomicInteger(0)
  val mapInvocations = new AtomicInteger(0)
}

class SchedulerCapabilitySpec extends SparkTestBase {
  import SchedulerCapabilitySpec._

  private lazy val corpus: String = {
    val d = java.nio.file.Files.createTempDirectory("sched-corpus")
    (1 to 8).foreach { i =>
      java.nio.file.Files.writeString(d.resolve(s"f$i.txt"), s"alpha beta f$i gamma " * 50)
    }
    s"$d/*.txt"
  }

  test("jobcount: map executes exactly once per input file (no duplicate scheduling)") {
    mapInvocations.set(0)
    val counted = new graft.operators.MRApp {
      def map(file: String, contents: String): IterableOnce[graft.operators.KV] = {
        mapInvocations.incrementAndGet()
        Apps.WordCount.map(file, contents)
      }
      def reduce(key: String, values: Seq[String]): String =
        Apps.WordCount.reduce(key, values)
    }
    MapReduce.run(spark, corpus, counted).count()
    assert(mapInvocations.get() === 8) // one per file, reference contract
  }

  test("mtiming: >=2 tasks run concurrently") {
    liveTasks.set(0); maxConcurrent.set(0)
    import spark.implicits._
    spark.range(0, 8, 1, 8).as[Long].map { i =>
      val live = liveTasks.incrementAndGet()
      maxConcurrent.updateAndGet(m => math.max(m, live))
      Thread.sleep(300)
      liveTasks.decrementAndGet()
      i
    }.count()
    assert(maxConcurrent.get() >= 2, s"observed max concurrency ${maxConcurrent.get()}")
  }

  test("crash: output under injected task failures equals failure-free output") {
    val clean = MapReduce.run(spark, corpus, Apps.WordCount)
      .collect().map(kv => kv.key -> kv.value).toMap

    val faulty = new graft.operators.MRApp {
      def map(file: String, contents: String): IterableOnce[graft.operators.KV] = {
        // fail every task's first attempt in the map stage; retry succeeds
        val tc = TaskContext.get()
        if (tc != null && tc.attemptNumber() == 0 && tc.stageAttemptNumber() == 0)
          throw new RuntimeException("injected map fault (attempt 0)")
        Apps.WordCount.map(file, contents)
      }
      def reduce(key: String, values: Seq[String]): String =
        Apps.WordCount.reduce(key, values)
    }
    val got = MapReduce.run(spark, corpus, faulty)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === clean)
  }
}
