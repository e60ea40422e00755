package graft.examples

import graft.GraftExtensions
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.{Files, Paths}

/** Runnable demo of the streaming operators over a JSON file feed: windowed
  * aggregation with watermark, streaming dedup, and the SQL-registered
  * kernels. {{{ sbt "runMain graft.examples.StreamingDemo" }}}
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Files.createTempDirectory("graft-stream-demo").toString
    val feed = s"$base/feed"
    Files.createDirectories(Paths.get(feed))
    Files.writeString(Paths.get(feed, "b1.json"), Seq(
      """{"ts":"2025-01-01T10:01:00Z","etype":"click","value":1.0}""",
      """{"ts":"2025-01-01T10:04:00Z","etype":"click","value":2.0}""",
      """{"ts":"2025-01-01T10:12:00Z","etype":"view","value":5.0}""",
      """{"ts":"2025-01-01T11:40:00Z","etype":"click","value":3.0}""",
    ).mkString("\n"))

    val raw = spark.readStream
      .schema("ts timestamp, etype string, value double").json(feed)
    val agg = StreamOps.windowedAgg(raw, "ts", "etype", "value", "10 minutes", "15 minutes")
    val q = agg.writeStream.format("memory").queryName("demo_win")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println("== windowed agg (closed windows after watermark):")
    spark.table("demo_win").orderBy("window_start", "etype").show(truncate = false)

    println("== SQL-registered kernels via spark.sql:")
    spark.sql("SELECT graft_poly_hash('hello') AS h, graft_float_dot(array(1.0F,2.0F), array(3.0F,4.0F)) AS d").show()
    spark.stop()
  }
}
