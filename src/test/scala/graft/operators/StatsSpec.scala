package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleFill materializes gaps, zero-counts them, and forward-fills") {
    val s = spark
    import s.implicits._
    // user 1: events on day 1 and day 4 (2-day gap); user 2: single day
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5.0),
      (1L, ts("2024-01-01 11:00:00"), 7.0),
      (1L, ts("2024-01-04 09:00:00"), 2.0),
      (2L, ts("2024-01-02 00:30:00"), 9.0),
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.resampleFill(events, "user_id", "ts", "day", "value")
      .orderBy("user_id", "bucket").collect()
    assert(out.length == 5) // user 1: 4 days, user 2: 1 day
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L, 1L)) // n_obs
    // bucket_value is null in gaps; ffill carries day-1 sum across them
    assert(u1.map(r => Option(r.get(3))).toSeq ==
      Seq(Some(12.0), None, None, Some(2.0)))
    assert(u1.map(_.getDouble(4)).toSeq == Seq(12.0, 12.0, 12.0, 2.0))
  }

  test("robustOutliers flags far points and keeps the bulk") {
    val s = spark
    import s.implicits._
    val rows = ((1 to 100).map(i => ("a", i.toLong, i.toDouble % 10)) :+
      (("a", 101L, 1000.0))).toDF("g", "id", "value")
    val out = Stats.robustOutliers(rows, "g", "value")
    val flagged = out.filter(col("iqr_outlier")).select("id").as[Long].collect()
    assert(flagged.toSeq == Seq(101L))
    val madFlagged = out.filter(col("mad_outlier")).select("id").as[Long].collect()
    assert(madFlagged.toSeq == Seq(101L))
    // bounds are per-group exact percentiles
    val r = out.filter(col("id") === 1L).select("q1", "med", "q3").head()
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 7.0)
  }

  test("histogram partitions all rows into bins spanning [min, max]") {
    val s = spark
    import s.implicits._
    val vals = (0 until 1000).map(_.toDouble).toDF("v")
    val out = Stats.histogram(vals, "v", 10).orderBy("bin").collect()
    assert(out.length == 10)
    assert(out.map(_.getLong(3)).sum == 1000L)
    assert(out.head.getDouble(1) == 0.0) // first bin_lo == min
    assert(out.last.getDouble(2) == 999.0) // last bin_hi == max
    // uniform input → equal-ish bins; max value lands in the last bin
    assert(out.last.getLong(3) == 100L)
  }

  test("corrBattery recovers an exact linear relationship") {
    val s = spark
    import s.implicits._
    val pts = (1 to 200).map(i => ("g", i.toDouble, 3.0 * i + 7.0)).toDF("g", "x", "y")
    val r = Stats.corrBattery(pts, "g", "x", "y").head()
    assert(r.getLong(1) == 200L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12) // corr
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-9) // slope
    assert(math.abs(r.getDouble(4) - 7.0) < 1e-6) // intercept
  }

  test("tfidf ranks rare terms above common ones at equal tf") {
    val s = spark
    import s.implicits._
    // 'common' appears in every doc, 'rare' only in doc 1 — same tf within doc 1
    val docs = Seq(
      (1L, "rare common"), (2L, "common filler"), (3L, "common other"),
    ).toDF("doc_id", "text")
    val out = TextOps.tfidf(docs, "doc_id", "text", 2)
      .filter(col("doc_id") === 1L).orderBy("rank").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("rare", "common"))
    assert(out.head.getDouble(4) == 3.0) // tf=1 * n_docs=3 / df=1
    assert(out.last.getDouble(4) == 1.0) // tf=1 * 3 / 3
  }

  test("Quality.report counts violations per declarative rule") {
    val s = spark
    import s.implicits._
    import Quality._
    val t = Seq(
      (Some(1L), "A", Some(10L)), (Some(2L), "B", Some(10L)), // dup fk target ok
      (Some(2L), "C", None), // dup key; null fk ignored by FK rule
      (None, "A", Some(99L)), // null key; fk 99 missing in ref
    ).toDF("k", "status", "fk")
    val ref = Seq(10L, 11L).toDF("rk")
    val out = Quality.report(t, Seq(
      NotNull("k"), Unique("k"), AcceptedValues("status", Seq("A", "B")), ForeignKey("fk", ref, "rk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("not_null:k") == 1L)
    assert(out("unique:k") == 1L) // 3 non-null keys, 2 distinct
    assert(out("accepted_values:status") == 1L) // "C"
    assert(out("foreign_key:fk") == 1L) // 99
  }

  test("property: snapshotDiff roundtrips through KeyedTable.merge (apply diff → new snapshot)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    // random old/new snapshots over an overlapping key space: inserts,
    // deletes, updates and untouched rows all occur
    def snap(): Seq[(String, Int, Double)] =
      rnd.shuffle((1 to 60).toList).take(40).map(k => (s"k$k", rnd.nextInt(3), rnd.nextInt(500) / 10.0))
    for (round <- 1 to 3) {
      val oldRows = snap(); val newRows = snap()
      val v1 = oldRows.toDF("k", "st", "v")
      val v2 = newRows.toDF("k", "st", "v")
      val diff = Relational.snapshotDiff(v1, v2, Seq("k"))
      val t = graft.engine.KeyedTable(spark, tmpDir(s"sdrt$round"), Seq("k"))
      t.merge(v1)
      // apply the recovered change stream: upsert inserts+updates, drop deletes
      val upserts = diff.filter(col("change") =!= "delete")
        .select(col("k"), col("new_st").as("st"), col("new_v").as("v"))
      if (upserts.head(1).nonEmpty) t.merge(upserts)
      val dels = diff.filter(col("change") === "delete").select("k")
      if (dels.head(1).nonEmpty) t.deleteKeys(dels)
      val got = t.current.collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2))).toSet
      assert(got == newRows.toSet, s"roundtrip mismatch at round $round")
    }
  }

  test("transitionCounts builds the empirical Markov matrix per prev type") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (1L, 10L, "a", ts("2024-01-01 10:00:00")), (2L, 10L, "b", ts("2024-01-01 10:01:00")),
      (3L, 10L, "a", ts("2024-01-01 10:02:00")), (4L, 11L, "a", ts("2024-01-01 10:00:00")),
      (5L, 11L, "a", ts("2024-01-01 10:05:00")),
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = TimeSeries.transitionCounts(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // from a: a→b (user 10) and a→a (user 11) → shares 0.5/0.5; from b: b→a only
    assert(out(("a", "b")) == (1L, 0.5) && out(("a", "a")) == (1L, 0.5))
    assert(out(("b", "a")) == (1L, 1.0))
    assert(out.size == 3)
  }

  test("retentionCohorts counts day-grain activity per cohort offset") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (10L, ts("2024-01-01 09:00:00")), (10L, ts("2024-01-01 17:00:00")), // same day: 1 active row
      (10L, ts("2024-01-03 12:00:00")),
      (11L, ts("2024-01-01 10:00:00")), (11L, ts("2024-01-02 10:00:00")),
      (12L, ts("2024-01-03 08:00:00")),
    ).toDF("user_id", "ts")
    val out = TimeSeries.retentionCohorts(events, "user_id", "ts")
      .collect().map(r => ((r.getTimestamp(0).toString.take(10), r.getInt(1)), r.getLong(2))).toMap
    assert(out(("2024-01-01", 0)) == 2L) // users 10, 11 on their cohort day
    assert(out(("2024-01-01", 1)) == 1L) // user 11 on day+1
    assert(out(("2024-01-01", 2)) == 1L) // user 10 on day+2
    assert(out(("2024-01-03", 0)) == 1L) // user 12's own cohort
    assert(out.size == 4)
  }

  test("snapshotDiff classifies insert/delete/update and drops same rows") {
    val s = spark
    import s.implicits._
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "st", "v")
    val v2 = Seq((2L, "b", 25.0), (3L, "c", 30.0), (4L, "d", 40.0)).toDF("k", "st", "v")
    val out = Relational.snapshotDiff(v1, v2, Seq("k")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "delete"), (2L, "update"), (4L, "insert"))) // 3 == same → dropped
    // old/new values travel with the change row
    val upd = Relational.snapshotDiff(v1, v2, Seq("k")).filter(col("change") === "update").head()
    assert(upd.getAs[Double]("old_v") == 20.0 && upd.getAs[Double]("new_v") == 25.0)
  }

  test("snapshotDiff handles null keys via presence, not key nullness") {
    val s = spark
    import s.implicits._
    val v1 = Seq((Option.empty[Long], "a", 1.0), (Some(7L), "b", 2.0)).toDF("k", "st", "v")
    val v2 = Seq((Option.empty[Long], "a", 1.0)).toDF("k", "st", "v")
    val out = Relational.snapshotDiff(v1, v2, Seq("k")).collect()
    // null-key row unchanged → dropped as same; key 7 only in old → delete
    assert(out.length == 1)
    assert(out.head.getLong(0) == 7L && out.head.getString(1) == "delete")
  }

  test("throttle compares exact microseconds, not truncated milliseconds") {
    val s = spark
    import s.implicits._
    val t1 = ts("2024-01-01 10:00:00"); t1.setNanos(900000) // +900 µs
    val t2 = ts("2024-01-01 10:02:00"); t2.setNanos(100000) // +100 µs → gap 119.9992 s
    val events = Seq((1L, 5L, t1), (2L, 5L, t2)).toDF("event_id", "user_id", "ts")
    val kept = TimeSeries.throttle(events, Seq("user_id"), "ts", "event_id", 120)
      .select("event_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L)) // true gap is 0.8 ms short of 120 s
  }

  test("throttle accepts non-numeric and null tie values (natural ordering)") {
    val s = spark
    import s.implicits._
    // three same-timestamp events per key: tie order decides which survives
    // the gap filter — string ties sort lexicographically, null ties first
    val t = ts("2024-01-01 10:00:00")
    val events = Seq(
      (Some("b"), 5L, t), (Some("a"), 5L, t), (None, 5L, t),
    ).toDF("tag", "user_id", "ts")
    val kept = TimeSeries.throttle(events, Seq("user_id"), "ts", "tag", 60)
      .select("tag").collect().map(r => Option(r.getString(0)))
    // null sorts first (SQL asc), so the null-tagged event is the one kept
    assert(kept.toSeq == Seq(None))
    // complex tie types are rejected up front, not at task time
    val bad = Seq((Seq(1), 5L, t)).toDF("tag", "user_id", "ts")
    intercept[IllegalArgumentException] {
      TimeSeries.throttle(bad, Seq("user_id"), "ts", "tag", 60)
    }
  }

  test("robustOutliers and quantileBuckets quote odd column names") {
    val s = spark
    import s.implicits._
    val rows = (Seq.fill(20)(1.0) :+ 100.0).zipWithIndex
      .map { case (v, i) => ("g", v + i * 0.001) }
      .toDF("grp", "the value")
    val out = Stats.robustOutliers(rows, "grp", "the value")
    assert(out.filter(col("iqr_outlier")).count() == 1)
    val buckets = Stats.quantileBuckets(rows, "the value", 4)
    assert(buckets.select("bucket").distinct().count() == 4)
  }

  test("histogram pins a degenerate (min==max) range to bin 0") {
    val s = spark
    import s.implicits._
    val out = Stats.histogram(Seq.fill(10)(5.0).toDF("v"), "v", 20).collect()
    assert(out.length == 1 && out.head.getInt(0) == 0 && out.head.getLong(3) == 10L)
  }

  test("groupMode: a null value tying for the mode loses to any non-null") {
    val s = spark
    import s.implicits._
    val rows = Seq((1L, Some("b")), (1L, None), (2L, None))
      .toDF("user_id", "event_type")
    val out = Stats.groupMode(rows, "user_id", "event_type")
      .orderBy("user_id").collect()
    assert(out(0).getString(1) == "b") // tie vs null → non-null wins
    assert(out(1).isNullAt(1)) // all-null group still yields its (null) mode
  }

  test("fuzzyMatch pairs near names within a block only") {
    val s = spark
    import s.implicits._
    val parts = Seq("red bolt", "rad bolt", "red ring", "rod ring", "blue widget",
      "red bolt" /* dup row: distinct-domain dedup */).toDF("p_name")
    val out = Relational.fuzzyMatch(parts, "p_name", 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // within-block near pairs found; "red bolt"≁"red ring" (different block)
    assert(out == Set(("rad bolt", "red bolt", 1), ("red ring", "rod ring", 1)))
  }

  test("calendarDim spans observed days with ISO weekday numbering") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (1L, ts("2024-01-05 23:59:00")), // a Friday
      (2L, ts("2024-01-08 00:01:00")), // a Monday
    ).toDF("id", "ts")
    val out = TimeSeries.calendarDim(events, "ts").orderBy("dt").collect()
    assert(out.length == 4) // Jan 5,6,7,8
    assert(out.map(_.getInt(5)).toSeq == Seq(5, 6, 7, 1)) // Fri Sat Sun Mon
    assert(out.map(_.getInt(6)).toSeq == Seq(0, 1, 1, 0)) // weekend flags
    assert(out.forall(r => r.getInt(1) == 2024 && r.getInt(3) == 1 && r.getInt(2) == 1))
  }

  test("quantileBuckets is equi-depth and value-deterministic") {
    val s = spark
    import s.implicits._
    val vals = (1 to 1000).map(_.toDouble).toDF("v")
    val out = Stats.quantileBuckets(vals, "v", 4)
    val sizes = out.groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3))
    sizes.values.foreach(n => assert(math.abs(n - 250L) <= 1, sizes.toString))
    // equal values land in equal buckets (run twice, same assignment)
    val dup = Seq.fill(100)(42.0).toDF("v").union(vals)
    val b42 = Stats.quantileBuckets(dup, "v", 4)
      .filter(col("v") === 42.0).select("bucket").distinct().count()
    assert(b42 == 1L)
  }

  test("groupMode picks the most frequent value, smallest on ties") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "b"), (1L, "b"), (1L, "a"), // b wins on count
      (2L, "z"), (2L, "y"), // tie → y (smallest)
    ).toDF("user_id", "event_type")
    val out = Stats.groupMode(rows, "user_id", "event_type")
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((1L, "b", 2L), (2L, "y", 1L)))
  }

  test("funnel requires strict event order and reports broken steps as null") {
    val s = spark
    import s.implicits._
    val events = Seq(
      // user 1 completes in order; user 2 clicks BEFORE viewing (broken at step 2);
      // user 3 views only; user 4 never views (not in funnel)
      (1L, "view", ts("2024-01-01 10:00:00")), (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:30:00")),
      (2L, "click", ts("2024-01-02 09:00:00")), (2L, "view", ts("2024-01-02 10:00:00")),
      (3L, "view", ts("2024-01-03 08:00:00")),
      (4L, "purchase", ts("2024-01-04 12:00:00")),
    ).toDF("user_id", "event_type", "ts")
    val out = TimeSeries.funnel(events, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // user 4 absent
    assert(out.map(_.getInt(4)).toSeq == Seq(3, 1, 1))
    assert(out(1).isNullAt(2) && out(1).isNullAt(3)) // user 2: click precedes view
  }

  test("debounce keeps the first event and drops sub-gap repeats") {
    val s = spark
    import s.implicits._
    val events = Seq(
      (1L, 10L, "a", ts("2024-01-01 10:00:00")),
      (2L, 10L, "a", ts("2024-01-01 10:03:00")), // 3 min after #1 → dropped
      (3L, 10L, "a", ts("2024-01-01 10:08:00")), // 5 min after #2 → kept (gap vs raw predecessor)
      (4L, 10L, "b", ts("2024-01-01 10:00:30")), // different type → kept
      (5L, 11L, "a", ts("2024-01-01 10:01:00")), // different user → kept
    ).toDF("event_id", "user_id", "event_type", "ts")
    val kept = TimeSeries.debounce(events, Seq("user_id", "event_type"), "ts", "event_id", 300)
      .select("event_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("throttle rate-limits against the KEPT stream where debounce can't") {
    val s = spark
    import s.implicits._
    // events at t=0s, 70s, 140s with a 120s gap:
    //   debounce (vs raw predecessor: 70 < 120 twice) keeps only #1;
    //   throttle keeps #1, drops #2 (70s), keeps #3 (140s ≥ 120s after #1).
    val events = Seq(
      (1L, 5L, "a", ts("2024-01-01 10:00:00")),
      (2L, 5L, "a", ts("2024-01-01 10:01:10")),
      (3L, 5L, "a", ts("2024-01-01 10:02:20")),
    ).toDF("event_id", "user_id", "event_type", "ts")
    val thr = TimeSeries.throttle(events, Seq("user_id", "event_type"), "ts", "event_id", 120)
      .select("event_id").as[Long].collect().sorted
    assert(thr.toSeq == Seq(1L, 3L))
    val deb = TimeSeries.debounce(events, Seq("user_id", "event_type"), "ts", "event_id", 120)
      .select("event_id").as[Long].collect().sorted
    assert(deb.toSeq == Seq(1L))
    // schema is preserved
    assert(TimeSeries.throttle(events, Seq("user_id"), "ts", "event_id", 1).schema == events.schema)
  }

  test("scalarQuantize codes are in range and reconstruction error is bounded") {
    val s = spark
    import s.implicits._
    val vecs = Seq(
      (1L, Array(0.0f, 10.0f)), (2L, Array(1.0f, 20.0f)), (3L, Array(0.5f, 15.0f)),
    ).toDF("vec_id", "embedding")
    val out = Similarity.scalarQuantize(vecs, "vec_id", "embedding", 4)
    val rows = out.collect()
    assert(rows.length == 6)
    assert(rows.forall(r => r.getInt(3) >= 0 && r.getInt(3) < 4))
    // max |err| ≤ half a quantization step per dimension
    val maxErr = out.groupBy("dim")
      .agg(max(abs(col("err"))).as("e"), (max("x") - min("x")).as("range"))
      .collect()
    maxErr.foreach(r => assert(r.getDouble(1) <= r.getDouble(2) / 4 / 2 + 1e-12))
    // degenerate dimension (mn == mx) → code 0, zero error at midpoint offset
    val degen = Similarity.scalarQuantize(
      Seq((1L, Array(5.0f)), (2L, Array(5.0f))).toDF("vec_id", "embedding"), "vec_id", "embedding", 4)
    assert(degen.select("code").as[Int].collect().forall(_ == 0))
  }

  test("rollingZscore: frame moments, minObs gate, and anomaly flag") {
    val s = spark
    import s.implicits._
    // key 'a': nine 10.0s then a spike; key 'b': constant (std 0 → z null)
    val rows = (1 to 9).map(i => ("a", ts(f"2024-01-01 10:${i}%02d:00"), i.toLong, 10.0)) ++
      Seq(("a", ts("2024-01-01 10:30:00"), 10L, 40.0)) ++
      (1 to 4).map(i => ("b", ts(f"2024-01-01 11:0$i:00"), (20 + i).toLong, 7.0))
    val out = TimeSeries.rollingZscore(rows.toDF("k", "t", "id", "value"),
      "k", "t", "id", "value", window = 10, minObs = 3)
    val a = out.filter(col("k") === "a").orderBy("id").collect()
    // first two rows sit under minObs → z null, anomaly false
    assert(a.take(2).forall(r => r.isNullAt(r.fieldIndex("zscore"))))
    assert(a.take(2).forall(!_.getBoolean(a(0).fieldIndex("anomaly"))))
    // rows 3..9 have std 0 (all 10.0) → z still null
    assert(a.slice(2, 9).forall(r => r.isNullAt(r.fieldIndex("zscore"))))
    // the spike: frame = nine 10s + one 40 → mean 13, var 81, std 9, z = 3
    val spike = a.last
    assert(spike.getLong(spike.fieldIndex("n_obs")) == 10L)
    assert(spike.getDouble(spike.fieldIndex("roll_mean")) == 13.0)
    assert(spike.getDouble(spike.fieldIndex("roll_std")) == 9.0)
    assert(spike.getDouble(spike.fieldIndex("zscore")) == 3.0)
    // |z| == threshold is NOT an anomaly (strict >)
    assert(!spike.getBoolean(spike.fieldIndex("anomaly")))
    // constant key: never flagged, z never defined
    val b = out.filter(col("k") === "b").collect()
    assert(b.forall(r => r.isNullAt(r.fieldIndex("zscore"))))
  }

  test("skewReport measures the per-key count distribution") {
    val s = spark
    import s.implicits._
    // 4 keys: counts 1, 1, 2, 16 → total 20, mean 5, skew 3.2
    val rows = (Seq.fill(16)("hot") ++ Seq("a", "b", "c", "c")).zipWithIndex
      .map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val r = Stats.skewReport(rows, Seq("k")).head()
    assert(r.getLong(r.fieldIndex("n_keys")) == 4L)
    assert(r.getLong(r.fieldIndex("total_rows")) == 20L)
    assert(r.getLong(r.fieldIndex("max_cnt")) == 16L)
    assert(r.getDouble(r.fieldIndex("p50")) == 1.5) // interpolated over 1,1,2,16
    assert(r.getDouble(r.fieldIndex("skew_ratio")) == 3.2)
  }

  test("profile: per-column nulls/distinct/min-max/strlen from one pass") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, Some(10.0), Some("aa")),
      (2L, Some(30.0), Some("bbbb")),
      (3L, None, Some("aa")),
      (4L, Some(10.0), None),
    ).toDF("id", "x", "tag")
    val out = Stats.profile(rows, Seq("id", "x", "tag"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("id", "x", "tag"))
    val id = out("id")
    assert(id.getLong(id.fieldIndex("n_rows")) == 4L)
    assert(id.getLong(id.fieldIndex("n_nulls")) == 0L)
    assert(id.getLong(id.fieldIndex("n_distinct")) == 4L)
    assert(id.getDouble(id.fieldIndex("min_d")) == 1.0)
    assert(id.getDouble(id.fieldIndex("max_d")) == 4.0)
    assert(id.isNullAt(id.fieldIndex("avg_len"))) // numeric: no string stats
    val x = out("x")
    assert(x.getLong(x.fieldIndex("n_nulls")) == 1L)
    assert(x.getLong(x.fieldIndex("n_distinct")) == 2L) // 10.0, 30.0
    assert(x.getDouble(x.fieldIndex("min_d")) == 10.0)
    assert(x.getDouble(x.fieldIndex("max_d")) == 30.0)
    val tag = out("tag")
    assert(tag.getLong(tag.fieldIndex("n_nulls")) == 1L)
    assert(tag.getLong(tag.fieldIndex("n_distinct")) == 2L)
    assert(tag.isNullAt(tag.fieldIndex("min_d"))) // string: no numeric stats
    assert(tag.getDouble(tag.fieldIndex("avg_len")) == (2 + 4 + 2) / 3.0)
    // the whole profile is ONE aggregation: a single scan of the input
    val scans = Stats.profile(rows, Seq("id", "x", "tag"))
      .queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        case r: org.apache.spark.sql.execution.LogicalRDD => r
      }
    assert(scans.size == 1, s"profile must not rescan per column: $scans")
  }

  test("functionalDeps: rediscovers a true FD, measures violation width") {
    val s = spark
    import s.implicits._
    // city → country holds; country → city does not (width 2 for FR);
    // id → everything (unique determinant)
    val rows = Seq(
      (1L, "paris", "FR"), (2L, "lyon", "FR"), (3L, "berlin", "DE"),
      (4L, "paris", "FR"), (5L, "berlin", "DE"),
    ).toDF("id", "city", "country")
    val out = Stats.functionalDeps(rows, Seq("id", "city", "country"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 6)
    def holds(a: String, b: String) = {
      val r = out((a, b)); r.getInt(r.fieldIndex("holds")) == 1
    }
    assert(holds("id", "city") && holds("id", "country"))
    assert(holds("city", "country"))
    assert(!holds("country", "city"))
    val cc = out(("country", "city"))
    assert(cc.getLong(cc.fieldIndex("max_branch")) == 2L) // FR → {paris, lyon}
    assert(cc.getLong(cc.fieldIndex("n_groups")) == 2L)
    assert(!holds("city", "id") && !holds("country", "id"))
  }

  test("functionalDeps: null dependents are ignored, all-null trivially holds") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("a", Some("x")), ("a", None), ("b", None), ("b", None),
    ).toDF("k", "v")
    val out = Stats.functionalDeps(rows, Seq("k", "v"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val kv = out(("k", "v"))
    // a → {x} (null skipped), b → {} (width 0): FD holds
    assert(kv.getLong(kv.fieldIndex("max_branch")) == 1L)
    assert(kv.getInt(kv.fieldIndex("holds")) == 1)
  }
}
