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

  test("stream-stream interval join matches clicks within the attribution window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamOps.intervalJoin(
      imps.toDF().toDF("imp_key", "imp_ts"), "imp_key", "imp_ts",
      clicks.toDF().toDF("click_key", "click_ts"), "click_key", "click_ts",
      watermarkDelay = "30 minutes", maxDelay = "10 MINUTES")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append()).start()
    imps.addData((1L, ts(0)), (2L, ts(0)))
    clicks.addData((1L, ts(5)))  // within 10 min  → match
    clicks.addData((2L, ts(25))) // outside window → no match
    clicks.addData((3L, ts(5)))  // no impression  → no match
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attrib").collect().map(_.getLong(0)).toSet
    assert(rows == Set(1L))
  }

  test("session_window agg merges gap-bridged events and splits separated ones") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val sess = StreamOps.sessionWindowAgg(
      input.toDF().toDF("ts", "uid"), "ts", "uid", gap = "5 minutes",
      watermarkDelay = "10 minutes")
    val q = sess.writeStream.format("memory").queryName("sessw")
      .outputMode(OutputMode.Append()).start()
    // user 1: events at 10:00, 10:03 (one session), 10:20 (a second session)
    input.addData((ts(0), 1L), (ts(3), 1L), (ts(20), 1L))
    q.processAllAvailable()
    input.addData((ts(59), 9L)) // advance watermark far past both sessions
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessw").collect()
      .filter(_.getLong(2) == 1L)
      .map(r => (r.getTimestamp(0).toString, r.getLong(3))).toSet
    assert(rows == Set(("2025-01-01 10:00:00.0", 2L), ("2025-01-01 10:20:00.0", 1L)))
  }

  test("throttleStream carries last-kept state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val thr = StreamOps.throttleStream(input.toDS(), minGapSeconds = 600)
    val q = thr.toDF("k", "ts").writeStream.format("memory").queryName("thr_s")
      .outputMode(OutputMode.Append()).start()

    input.addData((5L, ts(0)), (5L, ts(5)), (5L, ts(12)))
    q.processAllAvailable()
    // within batch 1: keep 10:00, drop 10:05 (<10min), keep 10:12
    input.addData((5L, ts(15)), (5L, ts(30)), (6L, ts(16)))
    q.processAllAvailable()
    // batch 2 vs KEPT state (10:12): drop 10:15, keep 10:30; new key 6 keeps its first
    q.stop()

    val kept = spark.table("thr_s").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(kept == Set(
      (5L, "2025-01-01 10:00:00.0"), (5L, "2025-01-01 10:12:00.0"),
      (5L, "2025-01-01 10:30:00.0"), (6L, "2025-01-01 10:16:00.0")))
  }

  test("funnelStream advances per-key steps across micro-batches in strict order") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val fn = StreamOps.funnelStream(input.toDS(), Seq("view", "click", "purchase"))
    val q = fn.toDF("k", "steps", "last_ts").writeStream.format("memory")
      .queryName("funnel_s").outputMode(OutputMode.Append()).start()

    input.addData((1L, "view", ts(0)), (1L, "click", ts(5)), (2L, "click", ts(1)))
    q.processAllAvailable()
    // user 1 advanced to step 2 in one batch; user 2's click without a view does nothing
    input.addData((1L, "purchase", ts(10)), (2L, "view", ts(8)))
    q.processAllAvailable()
    // user 1 completes across batches (state carried); user 2 starts now
    input.addData((2L, "click", ts(4))) // LATE: before user 2's view at ts(8) → no advance
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("funnel_s").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows == Set((1L, 2), (1L, 3), (2L, 1)))
  }

  test("zscoreStream carries the trailing frame across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val zs = StreamOps.zscoreStream(input.toDS(), window = 10, minObs = 3)
    val q = zs.toDF("k", "ts", "v", "z", "anomaly").writeStream.format("memory")
      .queryName("zscore_s").outputMode(OutputMode.Append()).start()

    // batch 1: five 10.0s — under minObs at first, then constant (std 0)
    input.addData((1 to 5).map(i => (1L, ts(i), 10.0)): _*)
    q.processAllAvailable()
    // batch 2: four more 10.0s then the spike; frame = nine 10s + one 40
    // (integer-valued doubles → the mean-centered sums are exact:
    // mean 13, var 81, std 9, z = 3 — same closed-form values as the
    // batch operator's decimal-power-sum path on this data)
    input.addData((6 to 9).map(i => (1L, ts(i), 10.0)) :+ ((1L, ts(10), 40.0)): _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("zscore_s").collect()
      .map(r => (r.getTimestamp(1).toString, Option(r.get(3)), r.getBoolean(4)))
      .sortBy(_._1)
    assert(rows.length == 10)
    // constant frames and the under-minObs prefix: z undefined, no flags
    assert(rows.init.forall { case (_, z, a) => z.isEmpty && !a })
    val spike = rows.last
    assert(spike._2.contains(3.0))
    assert(!spike._3) // |z| == threshold is NOT an anomaly (strict >)

    // batch twin agreement on the same data (exact for this integer frame)
    val batch = graft.operators.TimeSeries.rollingZscore(
      ((1 to 9).map(i => (1L, ts(i), i.toLong, 10.0)) :+ ((1L, ts(10), 10L, 40.0)))
        .toDF("k", "t", "id", "value"),
      "k", "t", "id", "value", window = 10, minObs = 3)
    val bSpike = batch.orderBy(col("t")).collect().last
    assert(bSpike.getDouble(bSpike.fieldIndex("zscore")) == 3.0)
  }

  test("zscoreStream ties on equal timestamps resolve by value, deterministically") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // three events share one timestamp: without the secondary value sort
    // they'd enter the ring in shuffle order and the tied rows' z-scores
    // would vary run-to-run; the contract is ascending-value order, so the
    // per-row outputs are a fixed function of the data
    def run(tag: String): Seq[(Double, Option[Double])] = {
      val input = MemoryStream[(Long, Timestamp, Double)]
      val zs = StreamOps.zscoreStream(input.toDS(), window = 5, minObs = 2)
      val q = zs.toDF("k", "ts", "v", "z", "anomaly").writeStream.format("memory")
        .queryName(s"zscore_tie_$tag").outputMode(OutputMode.Append()).start()
      input.addData((1L, ts(1), 30.0), (1L, ts(1), 10.0), (1L, ts(1), 20.0))
      q.processAllAvailable()
      q.stop()
      spark.table(s"zscore_tie_$tag").collect()
        .map(r => (r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double])))
        .toSeq
    }
    val a = run("a")
    // ascending-value entry order: 10 (n=1, z none), 20 (frame {10,20}:
    // mean 15 std 5 → z=1), 30 (frame {10,20,30}: mean 20, std sqrt(200/3))
    assert(a.map(_._1) == Seq(10.0, 20.0, 30.0))
    assert(a(0)._2.isEmpty && a(1)._2.contains(1.0))
    assert(a(2)._2.exists(z => math.abs(z - 10.0 / math.sqrt(200.0 / 3)) < 1e-12))
    assert(run("b") == a) // rerun identical
  }

  test("chunkOverlap + hashClassify run stateless on a stream, batch-identical") {
    // The r15 ingest stages are per-row Generate/kernel work, so they must
    // compose into readStream → transform → writeStream with NO state store
    // and produce bit-identical rows to the batch path — the contract that
    // lets one pipeline definition serve backfill and live ingest.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextOps
    val docs = Seq((1L, "a b c d e f g"), (2L, "x"), (3L, "the quick brown fox"))
    val w = TextOps.classifierWeights(64).toSeq

    val input = MemoryStream[(Long, String)]
    val streamed = TextOps.hashClassify(
      TextOps.chunkOverlap(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", chunkSize = 4, stride = 2)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_text").as("text")),
      "doc_id", "text", weights = w)
    val q = streamed.writeStream.format("memory").queryName("chunk_classify")
      .outputMode(OutputMode.Append()).start()
    input.addData(docs.take(2): _*)
    q.processAllAvailable()
    input.addData(docs.drop(2): _*) // second micro-batch: no cross-batch state
    q.processAllAvailable()
    q.stop()

    val batch = TextOps.hashClassify(
      TextOps.chunkOverlap(docs.toDF("doc_id", "text"),
        "doc_id", "text", chunkSize = 4, stride = 2)
        .select(col("doc_id"), col("chunk_idx"), col("chunk_text").as("text")),
      "doc_id", "text", weights = w)
      .collect().map(_.toSeq).toSet
    val live = spark.table("chunk_classify").collect().map(_.toSeq).toSet
    assert(live == batch && batch.nonEmpty)
  }

  test("nb classifier counts maintain on a stream; weights ≡ batch retrain") {
    // The r16 in-engine trainer's STANDING form (verdict r16 #6): per-bucket
    // class-conditional feature counts live in an AggDelta table driven by
    // micro-batches (the maintained counts ARE the model — NB needs no
    // iteration), and the weight table re-derived from streamed state must
    // equal a from-scratch batch retrain on the same corpus, bit for bit.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.engine.KeyedTable
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "spark keeps spark fast", "en"),
      (2L, "tren rapido llega", "es"),
      (3L, "spark stays fast here", "en"),
      (4L, "tren lento sale hoy", "es"),
      (5L, "fast spark spark again", "en"))
    val b = 64
    val d0 = "decimal(18,0)"
    val input = MemoryStream[(Long, String, String)]
    val feats = TextOps.nbFeatures(input.toDF().toDF("doc_id", "text", "lang"),
        "text", col("lang") === "en", buckets = b)
      .select(col("bkt"),
        when(col("__pos"), 1L).otherwise(0L).cast(d0).as("pos_inc"),
        when(col("__pos"), 0L).otherwise(1L).cast(d0).as("neg_inc"))
      .withColumn("_old_bkt", lit(null).cast("long"))
      .withColumn("_old_pos_inc", lit(null).cast(d0))
      .withColumn("_old_neg_inc", lit(null).cast(d0))
      .withColumn("_op", lit("I"))
    val agg = KeyedTable(spark, tmpDir("graft-nbflow"), Seq("bkt"), numBuckets = 4)
    val q = AggFlow.start(feats, agg, Seq("bkt"), Seq("pos_inc", "neg_inc"),
      tmpDir("graft-nbflow-ckpt"), valueType = d0, accType = "decimal(20,0)")
    input.addData(docs.take(2): _*)
    q.processAllAvailable()
    input.addData(docs.drop(2): _*) // second micro-batch accumulates state
    q.processAllAvailable()
    q.stop()
    val maintained = TextOps.nbWeightsFromCounts(spark,
      agg.current.select(col("bkt"),
        col("sum_pos_inc").cast("long").as("c_pos"),
        col("sum_neg_inc").cast("long").as("c_neg")), buckets = b)
      .collect().map(_.toSeq).toSet
    val batch = TextOps.trainHashNb(docs.toDF("doc_id", "text", "lang"),
      "doc_id", "text", col("lang") === "en", buckets = b)
      .collect().map(_.toSeq).toSet
    assert(maintained == batch && batch.nonEmpty)
  }

  test("collocation counts maintain on a stream; mined table ≡ batch mining") {
    // The standing-deployment phrase miner (verdict r16 #6): unigram and
    // bigram occurrence counts stream into two AggDelta tables (both
    // plainly additive), and the scored phrase table re-derived from
    // streamed state must equal a from-scratch batch mine of the corpus.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.engine.KeyedTable
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "new york is in new york"),
      (2L, "new york has new things"),
      (3L, "york new crossings again"),
      (4L, "the new york subway runs"))
    val input = MemoryStream[(Long, String)]
    val df = input.toDF().toDF("doc_id", "text")
    val uni = df.select(TextOps.tokens(col("text")).as("__t"))
      .select(explode(col("__t")).as("t"))
      .withColumn("_old_t", lit(null).cast("string"))
      .withColumn("_op", lit("I"))
    val bi = df.select(TextOps.tokens(col("text")).as("__t"))
      .select(explode(TextOps.ngramsRaw(col("__t"), 2)).as("g"))
      .withColumn("_old_g", lit(null).cast("string"))
      .withColumn("_op", lit("I"))
    val uniT = KeyedTable(spark, tmpDir("graft-clcu"), Seq("t"), numBuckets = 4)
    val biT = KeyedTable(spark, tmpDir("graft-clcb"), Seq("g"), numBuckets = 4)
    val q1 = AggFlow.start(uni, uniT, Seq("t"), Nil, tmpDir("graft-clcu-ckpt"))
    val q2 = AggFlow.start(bi, biT, Seq("g"), Nil, tmpDir("graft-clcb-ckpt"))
    input.addData(docs.take(2): _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    input.addData(docs.drop(2): _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    val maintained = TextOps.collocationsFromCounts(
      uniT.current.select(col("t"), col("cnt").as("n")),
      biT.current.select(col("g"), col("cnt").as("n_ab")), minCount = 2L)
      .collect().map(_.toSeq).toSet
    val batch = TextOps.collocations(docs.toDF("doc_id", "text"),
      "doc_id", "text", minCount = 2L)
      .collect().map(_.toSeq).toSet
    assert(maintained == batch && batch.nonEmpty)
  }

  test("applyPhrases runs stateless on a stream, batch-identical") {
    // The r16 phrase-application stage is one kernel pass per row with a
    // broadcast phrase table — same backfill-equals-live contract as the
    // chunk/classify pin above: no state store, rows bit-identical to the
    // batch path, and the mined table rides the plan (a phrase-table
    // refresh is a new query start, exactly like a model-weight rollout).
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.TextOps
    val docs = Seq((1L, "new york is a city"), (2L, "york new has no pair"),
      (3L, "new york new york twice"))
    val phrases = Seq(("new", "york"))

    val input = MemoryStream[(Long, String)]
    val streamed = TextOps.applyPhrases(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", phrases)
    val q = streamed.writeStream.format("memory").queryName("phrase_apply")
      .outputMode(OutputMode.Append()).start()
    input.addData(docs.take(1): _*)
    q.processAllAvailable()
    input.addData(docs.drop(1): _*)
    q.processAllAvailable()
    q.stop()

    val batch = TextOps.applyPhrases(
      docs.toDF("doc_id", "text"), "doc_id", "text", phrases)
      .collect().map(_.toSeq).toSet
    val live = spark.table("phrase_apply").collect().map(_.toSeq).toSet
    assert(live == batch && batch.nonEmpty)
    assert(live.exists(_.contains("new_york new_york twice")))
  }
}
