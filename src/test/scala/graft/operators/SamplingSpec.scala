package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def ids = {
    val s = spark
    import s.implicits._
    (1L to 10000L).toDF("id")
  }

  test("splitColumn: total partition, deterministic, near-target fractions") {
    val out = ids.select(col("id"),
      Sampling.splitColumn(col("id"), Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L)
    assert(math.abs(counts("train") - 8000L) < 200, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 150, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 150, counts.toString)
    // rerun → identical assignment (no rand())
    val again = ids.select(col("id"),
      Sampling.splitColumn(col("id"), Seq("train" -> 80, "val" -> 10, "test" -> 10)).as("split"))
    assert(out.exceptAll(again).count() == 0)
  }

  test("stratifiedSample applies per-stratum rates") {
    val s = spark
    import s.implicits._
    val df = (1L to 6000L).map(i => (i, if (i % 3 == 0) "a" else "b")).toDF("id", "grp")
    val out = Sampling.stratifiedSample(df, "grp", "id", Map("a" -> 50), defaultPct = 10)
    val rates = out.groupBy("grp").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(rates("a") - 1000L) < 120, rates.toString)  // 50% of 2000
    assert(math.abs(rates("b") - 400L) < 100, rates.toString)   // 10% of 4000
  }

  test("weightedMix tags provenance and respects weights") {
    val s = spark
    import s.implicits._
    val a = (1L to 2000L).toDF("id")
    val b = (1L to 2000L).toDF("id")
    val mixed = Sampling.weightedMix(Seq(("web", a, 75), ("books", b, 25)), "id")
    val counts = mixed.groupBy("mix_source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("web") - 1500L) < 120, counts.toString)
    assert(math.abs(counts("books") - 500L) < 100, counts.toString)
  }

  test("isqrt: exact at and around perfect squares up to the 2^52 envelope") {
    val s = spark
    import s.implicits._
    // perfect squares k² with k near 2^26, ±1 neighbors — where a raw
    // floor(sqrt(double)) is most likely to land on the wrong side
    val ks = Seq(3L, 1000003L, 33554431L, 66000001L)
    val xs = ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1)) :+ 0L :+ 1L :+ 2L
    val got = xs.toDF("x").select(col("x"), Sampling.isqrt(col("x")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (x <- xs) {
      val expect = java.math.BigInteger.valueOf(x).sqrt().longValue()
      assert(got(x) == expect, s"isqrt($x): got ${got(x)} want $expect")
    }
  }

  test("temperatureMix: smallest language whole, rates ~ sqrt(n_min/n), deterministic") {
    val s = spark
    import s.implicits._
    // three languages at 8000 / 2000 / 500 docs: keep-rates 0.25 / 0.5 / 1
    val df = (1L to 10500L).map { i =>
      (i, if (i <= 8000) "en" else if (i <= 10000) "de" else "is")
    }.toDF("doc_id", "lang")
    val out = Sampling.temperatureMix(df, "lang", "doc_id")
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("is") == 500L, kept.toString)                       // kept WHOLE
    assert(math.abs(kept("de") - 1000L) < 120, kept.toString)       // sqrt(500/2000)=0.5
    assert(math.abs(kept("en") - 2000L) < 200, kept.toString)       // sqrt(500/8000)=0.25
    // thresholds are the exact integer contract
    val thr = out.select("lang", "mix_thr").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Sampling.TemperatureBucketSpace
    assert(thr("is") == b)                                          // rate 1.0
    assert(thr("de") == java.math.BigInteger.valueOf(b * b * 500L / 2000L).sqrt().longValue())
    assert(thr("en") == java.math.BigInteger.valueOf(b * b * 500L / 8000L).sqrt().longValue())
    // rerun → identical rows (deterministic, no rand())
    assert(out.exceptAll(Sampling.temperatureMix(df, "lang", "doc_id")).count() == 0)
  }

  test("epochMix: exact fractional copy counts, deterministic, rate edges") {
    val s = spark
    import s.implicits._
    val df = (1L to 2000L).toDF("id")
    val out = Sampling.epochMix(df, "id", rateMilli = 2500)
    val counts = out.groupBy("id").count()
    assert(counts.filter(!col("count").isin(2, 3)).count() == 0) // 2 or 3 copies
    val n3 = counts.filter(col("count") === 3).count()
    assert(math.abs(n3 - 1000L) < 100, s"fractional copies: $n3") // ~half get the 3rd
    // copy_id enumerates 1..n_copies per row
    assert(out.filter(col("copy_id") > col("n_copies") || col("copy_id") < 1).count() == 0)
    // downsampling: survivors appear exactly once, ~30% of keys
    val down = Sampling.epochMix(df, "id", rateMilli = 300)
    assert(down.groupBy("id").count().filter(col("count") =!= 1).count() == 0)
    assert(math.abs(down.count() - 600L) < 100)
    // deterministic re-run; whole rates multiply exactly; rate 0 empties
    assert(out.exceptAll(Sampling.epochMix(df, "id", 2500)).count() == 0)
    assert(Sampling.epochMix(df, "id", 2000).count() == 4000)
    assert(Sampling.epochMix(df, "id", 0).count() == 0)
  }

  test("temperatureMixFromCounts: maintained counts reproduce the batch mix exactly") {
    val s = spark
    import s.implicits._
    val df = (1L to 3000L).map { i =>
      (i, if (i <= 2000) "en" else if (i <= 2800) "de" else "is")
    }.toDF("doc_id", "lang")
    // incremental path: counts arrive as base + delta batches and are
    // maintained additively (the AggDelta shape: groups + signed counts),
    // never re-derived from the full corpus
    val base = df.filter(col("doc_id") % 3 =!= 0)
      .groupBy("lang").agg(count(lit(1)).as("mix_n"))
    val delta = df.filter(col("doc_id") % 3 === 0)
      .groupBy("lang").agg(count(lit(1)).as("mix_n"))
    val maintained = base.unionByName(delta)
      .groupBy("lang").agg(sum("mix_n").as("mix_n"))
    val inc = Sampling.temperatureMixFromCounts(df, maintained, "lang", "doc_id")
    val batch = Sampling.temperatureMix(df, "lang", "doc_id")
    assert(inc.exceptAll(batch).count() == 0 && batch.exceptAll(inc).count() == 0)
    // thresholds relation itself identical too (the verdict's "identical
    // to the batch recompute" is on thresholds, not just kept rows)
    val tInc = Sampling.temperatureThresholds(maintained).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val tBat = Sampling.temperatureThresholds(
      df.groupBy("lang").agg(count(lit(1)).as("mix_n"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(tInc == tBat)
  }

  test("sketches: HLL and approx percentiles within error bounds; heavy hitters exact") {
    val s = spark
    import s.implicits._
    val df = (1L to 20000L).map(i => (i, i % 1234, (i % 100).toDouble)).toDF("id", "u", "v")
    val row = df.agg(
      Sketches.approxDistinct(col("u"), 0.02).as("ad"),
      Sketches.approxPercentiles(col("v"), Seq(0.5), 10000).as("p")).collect()(0)
    assert(math.abs(row.getAs[Long]("ad") - 1234L) <= 1234 * 0.06)
    val p50 = row.getSeq[Double](row.fieldIndex("p")).head
    assert(math.abs(p50 - 49.0) <= 2.0)
    val skewed = df.withColumn("hot", when(col("id") % 10 < 3, "hot").otherwise(concat(lit("c"), col("id"))))
    val hh = Sketches.heavyHitters(skewed, "hot", minSupport = 0.2)
      .collect().map(_.getString(0)).toSet
    assert(hh == Set("hot"))
  }

  test("VecMean aggregator: element-wise mean, nulls skipped, merge correct") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (0, Seq(1f, 2f, 3f)), (0, Seq(3f, 4f, 5f)),
      (1, Seq(10f, 20f, 30f)),
      (2, null.asInstanceOf[Seq[Float]]),
    ).toDF("cell", "v").repartition(3) // force cross-partition merge
    val out = df.groupBy("cell").agg(graft.functions.VecMean.asCol("v").as("m"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Float](1))).toMap
    assert(out(0).get == Seq(2f, 3f, 4f))
    assert(out(1).get == Seq(10f, 20f, 30f))
    assert(out(2).get == Seq.empty) // null-only group -> empty array
  }
}
