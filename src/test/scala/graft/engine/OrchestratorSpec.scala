package graft.engine

import graft.SparkSpec
import graft.engine.Orchestrator._

import java.util.concurrent.atomic.AtomicInteger

class OrchestratorSpec extends SparkSpec {

  test("O1: sequential steps short-circuit on failure") {
    val ran = scala.collection.mutable.ListBuffer[String]()
    val results = runPipeline("p", Seq(
      Step("a")(() => ran += "a"),
      Step("b")(() => { ran += "b"; throw new RuntimeException("boom") }),
      Step("c")(() => ran += "c"),
    ))
    assert(ran.toList == List("a", "b")) // c never runs
    assert(results.map(r => (r.name, r.succeeded)) == Seq("a" -> true, "b" -> false))
    assert(results(1).error.get.getMessage == "boom")
  }

  test("O5: retry policy retries with interval, succeeds within budget") {
    val attempts = new AtomicInteger(0)
    val results = runPipeline("p", Seq(
      Step("flaky", RetryPolicy(retries = 2, intervalMs = 1))(() =>
        if (attempts.incrementAndGet() < 3) throw new RuntimeException("transient")),
    ))
    assert(results.head.succeeded && results.head.attempts == 3)

    val results2 = runPipeline("p2", Seq(
      Step("hopeless", RetryPolicy(retries = 1, intervalMs = 1))(() =>
        throw new RuntimeException("always")),
    ))
    assert(!results2.head.succeeded && results2.head.attempts == 2)
  }

  test("file lifecycle: list → archive → delete") {
    val dir = tmpDir("lifecycle")
    val raw = s"$dir/raw"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(raw))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(raw, "f1.csv"), "a,b\n1,2")
    assert(listFiles(spark, raw, ".csv").size == 1)
    val f = listFiles(spark, raw, ".csv").head
    archiveFile(spark, f, s"$dir/archive")
    assert(listFiles(spark, s"$dir/archive", ".csv").size == 1)
    assert(deleteFile(spark, f))
    assert(listFiles(spark, raw, ".csv").isEmpty)
  }
}
