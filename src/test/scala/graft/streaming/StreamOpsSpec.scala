package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

class StreamOpsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2025-01-01 10:$minute%02d:00")

  test("windowed agg with watermark finalizes windows and drops too-late events") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = StreamOps.windowedAgg(
      input.toDF().toDF("ts", "etype", "value"),
      "ts", "etype", "value", "10 minutes", "15 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode(OutputMode.Append()).start()

    input.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0), (ts(12), "view", 5.0))
    q.processAllAvailable()
    // watermark = 10:12 - 15min → nothing finalized yet (Append emits closed windows only)
    assert(spark.table("win_agg").count() == 0)

    input.addData((ts(40), "click", 3.0)) // advances watermark to 10:25 → closes 10:00 + 10:10 windows
    q.processAllAvailable()
    input.addData((ts(3), "click", 99.0)) // later than watermark → dropped
    q.processAllAvailable()
    input.addData((ts(59), "click", 1.0)) // close the 10:40 window too
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_agg").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows.contains(("2025-01-01 10:00:00.0", "click", 2L, 3.0))) // 99.0 NOT included
    assert(rows.contains(("2025-01-01 10:10:00.0", "view", 1L, 5.0)))
  }

  test("streaming dedup drops duplicates within the watermark horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = StreamOps.dedupStream(input.toDF().toDF("ts", "k"), "ts", Seq("k"), "1 hour")
    val q = dedup.writeStream.format("memory").queryName("dedup_s")
      .outputMode(OutputMode.Append()).start()
    input.addData((ts(1), 7L), (ts(1), 7L), (ts(2), 8L))
    q.processAllAvailable()
    input.addData((ts(1), 7L)) // duplicate across micro-batches → dropped by state
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_s").count() == 2)
  }

  test("mapGroupsWithState keeps running per-key state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = StreamOps.runningSessionState(input.toDS())
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Update()).start()
    input.addData((1L, ts(1)), (1L, ts(2)), (2L, ts(3)))
    q.processAllAvailable()
    input.addData((1L, ts(5)))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    assert(last(1L) == 3L) // 2 events then +1 on the next batch, state carried
    assert(last(2L) == 1L)
  }
}
