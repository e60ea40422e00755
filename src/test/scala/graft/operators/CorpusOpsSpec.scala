package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Round-3 corpus/warehouse operators: repetition signals, top terms,
  * SCD-2 interval build, and benchmark decontamination.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: duplicate n-gram fractions") {
    val df = Seq(
      (1L, "a a a b"),       // bigrams: aa,aa,ab → 3 total / 2 uniq
      (2L, "x y z"),         // no repetition
      (3L, "w"),             // too short for any n-gram
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, 3, 2, 1.0 - 2.0 / 3.0, 2, 2, 0.0))
    assert(out(1) == Row(2L, 2, 2, 0.0, 1, 1, 0.0))
    assert(out(2) == Row(3L, 0, 0, 0.0, 0, 0, 0.0))
  }

  test("topTerms: tf ranking with term tie-break and global df") {
    val df = Seq(
      (1L, "b b b a a c"),
      (2L, "a a b z z z z"),
    ).toDF("doc_id", "text")
    val out = TextOps.topTerms(df, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "b", 3L, 1, 2L), // b in both docs → df 2
      (1L, "a", 2L, 2, 2L),
      (2L, "z", 4L, 1, 1L),
      (2L, "a", 2L, 2, 2L),
    ))
  }

  test("scd2: validity intervals chain, ties break on the tie column") {
    val df = Seq(
      (7L, 100L, 1L, "bronze"),
      (7L, 200L, 2L, "silver"),
      (7L, 200L, 3L, "gold"),   // same ts as row 2: tie resolves 2 before 3
      (8L, 50L, 4L, "solo"),
    ).toDF("user_id", "t", "id", "state")
    val out = Relational.scd2(df, "user_id", "t", "id", Seq("state"))
      .orderBy("user_id", "valid_from", "state")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (7L, "bronze", 100L, Some(200L), false),
      (7L, "gold", 200L, None, true),
      (7L, "silver", 200L, Some(200L), false),
      (8L, "solo", 50L, None, true),
    ))
  }

  test("dupClusters: min-label components, chains and singletons") {
    val docs = (1L to 7L).toDF("doc_id")
    // chain 1-2-3 (transitive), pair 5-6, singletons 4 and 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(docs, "doc_id", pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("dupClusters: long chain converges (diameter > 2)") {
    val docs = (1L to 10L).toDF("doc_id")
    val pairs = (1L to 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(docs, "doc_id", pairs).collect()
    assert(out.forall(_.getLong(1) == 1L))
  }

  test("dupClustersStar ≡ dupClusters: mixed components and random graphs") {
    val docs = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val star = Dedup.dupClustersStar(docs, "doc_id", pairs)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(star.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    // random-graph equivalence with plain min-label propagation
    val rnd = new scala.util.Random(7)
    val n = 40
    val rdocs = (1L to n).toDF("doc_id")
    val rpairs = (1 to 30).map(_ => (rnd.nextInt(n.toInt) + 1L, rnd.nextInt(n.toInt) + 1L))
      .filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    val a = Dedup.dupClusters(rdocs, "doc_id", rpairs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.dupClustersStar(rdocs, "doc_id", rpairs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // no edges at all: every doc is its own cluster
    val none = Dedup.dupClustersStar(docs, "doc_id",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).collect()
    assert(none.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("dupClustersStar: O(log n) rounds survive a chain past the plain round budget") {
    // a 120-link chain has diameter 120: plain min-label propagation cannot
    // finish inside a 40-round budget, while star contraction converges
    // comfortably
    val docs = (1L to 121L).toDF("doc_id")
    val pairs = (1L to 120L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // escape disabled (starEscapeAfter >= maxIters): the original fail-fast
    // contract still holds
    intercept[IllegalArgumentException] {
      Dedup.dupClusters(docs, "doc_id", pairs, maxIters = 40, starEscapeAfter = 40).collect()
    }
    val out = Dedup.dupClustersStar(docs, "doc_id", pairs, maxIters = 40).collect()
    assert(out.forall(_.getLong(1) == 1L))
    // default escape: after starEscapeAfter unconverged propagation rounds,
    // dupClusters hands off to the star path and completes the same labels
    val escaped = Dedup.dupClusters(docs, "doc_id", pairs, maxIters = 40).collect()
    assert(escaped.forall(_.getLong(1) == 1L))
  }

  test("maxBucketWidth: default preserves output; tight cap trades recall, reported") {
    val base = "the quick brown fox jumps over the lazy dog while rain falls softly on the quiet green meadow today"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("today", "tonight")), // near-dup of 1
      (3L, "unrelated filler text having many extra words entirely"),
    ).toDF("doc_id", "text")
    val full = Dedup.minhashDedup(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val capDefault = Dedup.minhashDedup(docs, "doc_id", "text", maxBucketWidth = Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(capDefault == full && full == Set(1L, 3L))
    // cap of 1 drops every bucket the near-dup pair collides in → recall 0,
    // doc 2 survives; the companion report names the dropped buckets
    val capped = Dedup.minhashDedup(docs, "doc_id", "text", maxBucketWidth = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(capped == Set(1L, 2L, 3L))
    val wide = Dedup.overWideBuckets(docs, "doc_id", "text", maxBucketWidth = 1).collect()
    assert(wide.nonEmpty && wide.forall(_.getLong(2) > 1L))
    // lshCandidates honors the same knob
    assert(Dedup.lshCandidates(docs, "doc_id", "text", maxBucketWidth = 1).isEmpty)
    assert(!Dedup.lshCandidates(docs, "doc_id", "text").isEmpty)
  }

  test("dedupAgainstIndex: corpus wins, batch keeps smaller id, fresh survives") {
    val base = "the quick brown fox jumps over the lazy dog while rain falls softly on the quiet green meadow today"
    val tweak = base.replace("today", "tonight") // 1 word of 18 → J ≈ 0.83
    val fresh = "completely different subject matter here about spark shuffles partitions and broadcast joins at scale"
    val freshTweak = fresh.replace("scale", "cost")
    val corpus = Seq((1L, base), (2L, "unrelated corpus filler text having many extra words")).toDF("id", "text")
    val batch = Seq(
      (11L, tweak),      // near-dup of corpus doc 1 → dropped
      (12L, fresh),      // novel → kept
      (13L, freshTweak), // near-dup of batch doc 12 → dropped
    ).toDF("id", "text")
    val idx = Dedup.bandIndex(corpus, "id", "text")
    val kept = Dedup.dedupAgainstIndex(batch, "id", "text", corpus, idx)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L))
    // equivalence with whole-corpus dedup on the batch slice (corpus ids <
    // batch ids here, so minhashDedup's smaller-id survivor rule = corpus wins)
    val whole = Dedup.minhashDedup(corpus.unionByName(batch), "id", "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(whole.filter(_ > 10L) == kept)
  }

  test("dedupAgainstIndex: maxBucketWidth caps batch and index sides") {
    val base = "the quick brown fox jumps over the lazy dog while rain falls softly on the quiet green meadow today"
    val fresh = "completely different subject matter here about spark shuffles partitions and broadcast joins at scale"
    val corpus = Seq((1L, base)).toDF("id", "text")
    val batch = Seq(
      (11L, base.replace("today", "tonight")),    // near-dup of corpus 1
      (12L, fresh),
      (13L, fresh.replace("scale", "cost")),      // near-dup of batch 12
    ).toDF("id", "text")
    val idx = Dedup.bandIndex(corpus, "id", "text")
    // default preserves behavior
    val kept = Dedup.dedupAgainstIndex(batch, "id", "text", corpus, idx,
        maxBucketWidth = Int.MaxValue)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L))
    // the corpus index holds 1 doc per bucket and the batch ≤... a cap of 0
    // drops EVERY bucket on both sides: no candidates survive, nothing is
    // dropped — recall loss, never corruption
    val capped = Dedup.dedupAgainstIndex(batch, "id", "text", corpus, idx,
        maxBucketWidth = 0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(capped == Set(11L, 12L, 13L))
    // a build-time-capped index (bandIndex's own knob) is empty at width 0,
    // so only the batch-internal near-dup is caught
    val cappedIdx = Dedup.bandIndex(corpus, "id", "text", maxBucketWidth = 0)
    val keptIdx = Dedup.dedupAgainstIndex(batch, "id", "text", corpus, cappedIdx)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptIdx == Set(11L, 12L))
  }

  test("bandIndex round-trips through a KeyedTable (stored-index probe)") {
    val base = "the quick brown fox jumps over the lazy dog while rain falls softly on the quiet green meadow today"
    val corpus = Seq((1L, base)).toDF("id", "text")
    val batch = Seq((11L, base.replace("today", "tonight")), (12L, "novel words entirely")).toDF("id", "text")
    val root = tmpDir("graft-bandindex")
    val t = graft.engine.KeyedTable(spark, root, Seq("id", "band_idx"))
    t.overwrite(Dedup.bandIndex(corpus, "id", "text"))
    val kept = Dedup.dedupAgainstIndex(batch, "id", "text", corpus, t.current)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L))
  }

  test("dedupAgainstIndex: stored corpusState ≡ derived re-shingle (r18 probe path)") {
    val base = "the quick brown fox jumps over the lazy dog while rain falls softly on the quiet green meadow today"
    val fresh = "completely different subject matter here about spark shuffles partitions and broadcast joins at scale"
    val corpus = Seq(
      (1L, base),
      (2L, "unrelated corpus filler text having many extra words"),
      (3L, fresh.replace("joins", "unions")),
    ).toDF("id", "text")
    val batch = Seq(
      (11L, base.replace("today", "tonight")),  // near-dup of corpus 1
      (12L, fresh),                             // near-dup of corpus 3
      (13L, fresh.replace("scale", "cost")),    // near-dup of 12 AND corpus 3
      (14L, "a wholly novel batch document about gardening tools"),
    ).toDF("id", "text")
    val idx = Dedup.bandIndex(corpus, "id", "text")
    val st = Dedup.verifyState(Dedup.explodedShingles(corpus, "id", "text", 3))
    val derived = Dedup.dedupAgainstIndex(batch, "id", "text", corpus, idx)
      .select("id").collect().map(_.getLong(0)).toSet
    val stored = Dedup.dedupAgainstIndex(batch, "id", "text", corpus, idx,
        corpusState = Some(st))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(stored == derived)
    // 11 collides with corpus 1 at J≈0.83 (well above the 8×4 S-curve) and
    // must drop through the STORED-state verify; 14 is novel and survives.
    // 12/13 sit near the banding S-curve (J≈0.6) — whether they collide is
    // the banding's business, not this pin's: the pin is stored ≡ derived.
    assert(!stored.contains(11L) && stored.contains(14L))
  }

  test("chunkCounts ≡ chunkCids rollup (map-only n_chunks, r18)") {
    val docs = Seq(
      (1L, ""),                                  // empty → 1 empty chunk
      (2L, "one"),                               // 1 token → 1 chunk
      (3L, Seq.fill(16)("w").mkString(" ")),     // exactly chunkSize → 1
      (4L, Seq.fill(17)("w").mkString(" ")),     // chunkSize+1 → 2
      (5L, (1 to 33).map("t" + _).mkString(" ")),// 33 tokens → 3 at 16/16
      (6L, "punct,only...!!!"),                  // tokens: punct,only → 1
    ).toDF("doc_id", "text")
    for ((cs, st) <- Seq((16, 16), (5, 2), (4, 4))) {
      val viaExplode = Dedup.chunkCids(docs, "doc_id", "text", cs, st)
        .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaFormula = Dedup.chunkCounts(docs, "doc_id", "text", cs, st)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaFormula == viaExplode, s"chunkSize=$cs stride=$st")
    }
  }

  test("minhashPairsCapped ≡ (minhashPairs cap + overWideBuckets): one-pass fusion") {
    val boiler = "subscribe to our newsletter for daily updates and follow us on every social channel now"
    val docs = Seq(
      (1L, boiler),
      (2L, boiler.replace("daily", "weekly")),
      (3L, boiler.replace("daily", "nightly")),
      (4L, boiler.replace("now", "today")),
      (5L, "a completely unrelated document about growing tomatoes in raised garden beds"),
      (6L, "a completely unrelated document about growing potatoes in raised garden beds"),
    ).toDF("id", "text")
    val cap = 2
    val (p, ow) = Dedup.minhashPairsCapped(docs, "id", "text",
      n = 3, tau = 0.5, maxBucketWidth = cap, bands = 32, rowsPerBand = 1)
    val p0 = Dedup.minhashPairs(docs, "id", "text", n = 3, tau = 0.5,
      maxBucketWidth = cap, bands = 32, rowsPerBand = 1)
    val ow0 = Dedup.overWideBuckets(docs, "id", "text", maxBucketWidth = cap,
      n = 3, numHashes = 32, bands = 32, rowsPerBand = 1)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def bucketSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairSet(p) == pairSet(p0))
    assert(bucketSet(ow) == bucketSet(ow0))
    // the planted 4-doc boilerplate cluster must actually trip the cap,
    // else this pin proves nothing
    assert(ow.count() > 0)
  }

  test("contamination: containment fraction against the corpus shingle set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "lazy dogs sleep all day"),
    ).toDF("doc_id", "text")
    val quarantine = Seq(
      (10L, "the quick brown fox jumps"), // fully contained: 3 shingles, 3 hits
      (11L, "totally novel eval sentence here"), // 0 hits
      (12L, "quick brown fox waves hello"), // shares "quick brown fox" only
      (13L, "xy"), // too short for 3-grams → absent from output
    ).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, quarantine, "doc_id", "text", n = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (10L, 3L, 3L, 1.0),
      (11L, 3L, 0L, 0.0),
      (12L, 3L, 1L, 1.0 / 3.0),
    ))
  }

  test("sortedNeighborPairs: verified subset of exact all-pairs; adjacent dups found") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"), // near-dup of 1, sorts adjacent
      (3L, "totally different words entirely unrelated content here"),
      (4L, "zulu yankee xray whiskey victor uniform"),
    ).toDF("doc_id", "text")
    val snm = Dedup.sortedNeighborPairs(docs, "doc_id", "text", n = 3, tau = 0.5, window = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.5,
        persistIntermediate = false)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(snm.contains((1L, 2L)))
    assert(snm.subsetOf(exact)) // every SNM pair is a true verified near-dup
    // deterministic across runs (rank assignment is total-ordered)
    val again = Dedup.sortedNeighborPairs(docs, "doc_id", "text", n = 3, tau = 0.5, window = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == snm)
  }

  test("simhashPairs equals brute-force popcount all-pairs (pigeonhole exact)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),  // exact dup of 1
      (4L, "one two three four five six seven eight"),
      (5L, "completely disjoint vocabulary set here now then"),
    ).toDF("doc_id", "text")
    for (k <- Seq(0, 3, 7)) {
      val banded = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val sig = Dedup.simhashGroups(docs, "doc_id", "text")
      val brute = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(_._3 <= k).toSet
      assert(banded == brute, s"k=$k")
    }
    // the exact dup is always found at k=0
    val k0 = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k0.contains((1L, 3L)))
  }

  test("simhashDedup keeps exactly the docs with no smaller id within k") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"), // sig == doc 1's
      (4L, "one two three four five six seven eight"),
      (5L, "completely disjoint vocabulary set here now then"),
    ).toDF("doc_id", "text")
    for (k <- Seq(0, 3, 7)) {
      val kept = Dedup.simhashDedup(docs, "doc_id", "text", maxHamming = k)
        .collect().map(_.getLong(0)).toSet
      val sig = Dedup.simhashGroups(docs, "doc_id", "text")
      val dropped = sig.as("a").join(sig.as("b"),
          col("b.doc_id") < col("a.doc_id") &&
            bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))) <= k)
        .select(col("a.doc_id")).collect().map(_.getLong(0)).toSet
      val expect = Set(1L, 2L, 3L, 4L, 5L) -- dropped
      assert(kept == expect, s"k=$k")
    }
    // identical signatures always collapse to the smallest id
    val k0 = Dedup.simhashDedup(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(_.getLong(0)).toSet
    assert(k0.contains(1L) && !k0.contains(3L))
  }

  test("clusterRepresentatives keeps the best-scored member per cluster") {
    val docs = Seq(
      (1L, 10L), (2L, 40L), (3L, 40L), // cluster {1,2,3}: 2 and 3 tie → 2 wins
      (4L, 99L),                       // singleton: its own rep
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.clusterRepresentatives(docs, "doc_id", pairs, "score")
      .orderBy("id").collect()
    assert(out(0) == Row(1L, 1L, 2L))
    assert(out(1) == Row(2L, 1L, 2L))
    assert(out(2) == Row(3L, 1L, 2L))
    assert(out(3) == Row(4L, 4L, 4L))
  }

  test("selectByBudget keeps whole docs in score order up to the budget") {
    val docs = Seq(
      (1L, ("w " * 5).trim, 90L),  // rank 1: tokens 0..4
      (2L, ("w " * 4).trim, 80L),  // rank 2: tokens 5..8
      (3L, ("w " * 3).trim, 80L),  // rank 3 (score tie → larger id later): 9..11
      (4L, ("w " * 9).trim, 10L),  // rank 4: would end at 21 > 12 → dropped
      (5L, "w", 5L),               // rank 5: also out (selection is prefix only
                                   //   in cum order, not first-fit)
    ).toDF("doc_id", "text", "score")
    val out = TextOps.selectByBudget(docs, "doc_id", "text", "score",
      budget = 12L, bucketWidth = 32L).orderBy("doc_id").collect()
    assert(out.toSeq == Seq(
      Row(1L, 90L, 5L, 0L), Row(2L, 80L, 4L, 5L), Row(3L, 80L, 3L, 9L)))
    // bucketing is an implementation detail
    val wide = TextOps.selectByBudget(docs, "doc_id", "text", "score",
      budget = 12L, bucketWidth = 1000L).orderBy("doc_id").collect()
    assert(wide.toSeq == out.toSeq)
  }

  test("scrubDuplicateNgrams removes shared grams, keeps unique text") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over lazy dogs"),
      (2L, "intro words the quick brown fox tail end"),
      (3L, "completely different and unrelated token text"),
      (4L, "the quick brown fox"), // nothing but the shared gram
    ).toDF("doc_id", "text")
    val out = TextOps.scrubDuplicateNgrams(docs, "doc_id", "text", n = 4, minDocs = 2)
      .orderBy("doc_id").collect()
    // "the quick brown fox" starts at pos 0 (doc 1) / pos 2 (doc 2): the
    // 4 covered words vanish, everything outside the span survives.
    assert(out(0) == Row(1L, "jumps over lazy dogs", 4L))
    assert(out(1) == Row(2L, "intro words tail end", 4L))
    assert(out(2) == Row(3L, "completely different and unrelated token text", 6L))
    // fully-covered doc keeps its row with empty text, preserving the corpus
    assert(out(3) == Row(4L, "", 0L))
  }

  test("scrubDuplicateNgrams ignores within-doc repeats below minDocs") {
    val docs = Seq(
      (1L, "a b c d a b c d"), // repeated INSIDE one doc only
      (2L, "e f g h i j k l"),
    ).toDF("doc_id", "text")
    val out = TextOps.scrubDuplicateNgrams(docs, "doc_id", "text", n = 4, minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(1L, "a b c d a b c d", 8L)) // countDistinct(doc)=1 < 2
    assert(out(1) == Row(2L, "e f g h i j k l", 8L))
  }

  test("packChunks: offsets, boundary-crossing docs, bucket invariance") {
    val docs = Seq(
      (0L, ("w " * 6).trim),  // 6 tokens  → start 0,  seqs 0..0
      (1L, ("w " * 3).trim),  // 3 tokens  → start 6,  crosses the 8-boundary
      (2L, ("w " * 10).trim), // 10 tokens → start 9,  seqs 1..2
      (3L, "w"),            // 1 token   → start 19, seq 2
    ).toDF("doc_id", "text")
    val out = TextOps.packChunks(docs, "doc_id", "text", ctxLen = 8, bucketSpan = 2)
      .orderBy("doc_id").collect()
    assert(out(0) == Row(0L, 6L, 0L, 0L, 0L, 1L))
    assert(out(1) == Row(1L, 3L, 6L, 0L, 1L, 2L)) // tokens 6..8 span seqs 0,1
    assert(out(2) == Row(2L, 10L, 9L, 1L, 2L, 2L))
    assert(out(3) == Row(3L, 1L, 19L, 2L, 2L, 1L))
    // bucketing is an implementation detail: any span gives the same layout
    val wide = TextOps.packChunks(docs, "doc_id", "text", ctxLen = 8, bucketSpan = 1000)
      .orderBy("doc_id").collect()
    assert(wide.toSeq == out.toSeq)
    // the counts-based core (the learned-tokenizer composition point) is
    // the same operator: feeding it the whitespace counts reproduces
    // packChunks row for row
    val viaCounts = TextOps.packChunksCounts(
        docs.select(col("doc_id").as("id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")),
        ctxLen = 8, bucketSpan = 2)
      .withColumnRenamed("id", "doc_id").orderBy("doc_id").collect()
    assert(viaCounts.toSeq == out.toSeq)
    // arbitrary external counts (a learned tokenizer's pieces) pack too
    val learned = TextOps.packChunksCounts(
        Seq((0L, 5L), (1L, 4L)).toDF("id", "n_tokens"), ctxLen = 8)
      .orderBy("id").collect()
    assert(learned(0) == Row(0L, 5L, 0L, 0L, 0L, 1L))
    assert(learned(1) == Row(1L, 4L, 5L, 0L, 1L, 2L))
  }

  test("chunkOverlap: stride windows, overlap, short tail, fingerprints") {
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens, size 4 / stride 2 → starts 0,2,4
      (2L, "x"),             // 1 token → exactly one (short) chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunkOverlap(docs, "doc_id", "text", chunkSize = 4, stride = 2)
      .orderBy("doc_id", "chunk_idx").collect()
    // enumeration STOPS at the first window reaching the end: a start-6
    // chunk "g" would be a pure suffix of "e f g" — zero new coverage
    val expect = Seq(
      (1L, 0, 0L, 4, "a b c d"),
      (1L, 1, 2L, 4, "c d e f"),
      (1L, 2, 4L, 3, "e f g"),
      (2L, 0, 0L, 1, "x"),
    )
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (r, (id, idx, start, n, text)) =>
      assert((r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getString(4)) ==
        ((id, idx, start, n, text)))
      // fingerprint is the polyhash of the chunk text
      assert(r.getLong(5) ==
        graft.functions.Kernels.polyHash(
          org.apache.spark.unsafe.types.UTF8String.fromString(text)))
    }
    // adjacent chunks overlap by chunkSize − stride tokens
    assert(out(0).getString(4).split(" ").drop(2).toSeq ==
      out(1).getString(4).split(" ").take(2).toSeq)
  }

  test("chunkOverlap invariants: full coverage, exact reconstruction (fuzz)") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 60L).map { id =>
      val n = rnd.nextInt(40) // 0..39 tokens (0 → the [""] token contract)
      (id, (1 to n).map(i => s"t${rnd.nextInt(9)}x$i").mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for ((size, stride) <- Seq((4, 2), (5, 5), (7, 3), (1, 1))) {
      val out = TextOps.chunkOverlap(df, "doc_id", "text", size, stride)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(4)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        // fixture is lowercase ASCII words, so normTokens ≡ whitespace
        // split, with the [""] empty-doc token contract
        val toks = if (text.isEmpty) Array("") else text.split(" ")
        val chunks = out(id).sortBy(_._2)
        // starts are exactly 0, stride, … up to the first window reaching
        // the end — full coverage, no pure-suffix tail duplicates
        assert(chunks.map(_._3).toSeq == chunks.indices.map(_.toLong * stride))
        assert(chunks.length ==
          (math.max(toks.length - size, 0) + stride - 1) / stride + 1)
        assert(chunks.last._3 + size >= toks.length) // covers the last token
        assert(chunks.last._3 < toks.length)
        // each chunk is the exact token slice; stride==size tiles the doc
        chunks.foreach { case (_, _, start, text2) =>
          assert(text2 == toks.slice(start.toInt, start.toInt + size).mkString(" "))
        }
        if (stride == size)
          assert(chunks.map(_._4).mkString(" ") == toks.mkString(" "))
      }
    }
  }

  test("chunk band index: append ≡ rebuild; stored probe ≡ fresh probe") {
    val boiler = (1 to 16).map(i => s"p$i").mkString(" ") // one full chunk
    val near = (1 to 14).map(i => s"p$i").mkString(" ") + " q1 q2" // J≈0.68 vs boiler
    def doc(id: Long, parts: String*): (Long, String) = (id, parts.mkString(" "))
    val corpus = Seq(
      doc(1L, boiler, (1 to 16).map(i => s"a$i").mkString(" ")),
      doc(2L, (1 to 16).map(i => s"c$i").mkString(" ")),
    ).toDF("doc_id", "text")
    val b1 = Seq(
      doc(11L, boiler, (1 to 16).map(i => s"d$i").mkString(" ")), // exact dup + fresh
      doc(12L, near),                                             // near-dup of boiler
    ).toDF("doc_id", "text")
    val b2 = Seq(
      doc(21L, (1 to 16).map(i => s"d$i").mkString(" ")),         // dups b1's fresh chunk
      doc(22L, (1 to 16).map(i => s"e$i").mkString(" ")),         // fresh
    ).toDF("doc_id", "text")
    val bandArgs = (3, 32, 32, 1) // n, numHashes, bands, rowsPerBand
    def idx(reps: org.apache.spark.sql.DataFrame) =
      Dedup.bandIndex(reps, "cid", "chunk_text",
        bandArgs._1, bandArgs._2, bandArgs._3, bandArgs._4)
    val repsA = Dedup.chunkReps(corpus, "doc_id", "text")
    // append b1's new-text reps, then compare against a from-scratch rebuild
    val (newReps, newBands) = Dedup.chunkBandAppend(b1, "doc_id", "text", repsA)
    val repsApp = repsA.union(newReps.select("chunk_text", "cid"))
    val idxApp = idx(repsA).union(newBands)
    val repsFull = Dedup.chunkReps(corpus.union(b1), "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(rows(repsApp) == rows(repsFull))
    assert(rows(idxApp) == rows(idx(repsFull)))
    // the appended state answers a later batch exactly like the rebuilt one
    val viaApp = Dedup.chunkIncNearDup(b2, "doc_id", "text", repsApp, idxApp)
    val viaFull = Dedup.chunkIncNearDup(b2, "doc_id", "text", repsFull, idx(repsFull))
    assert(rows(viaApp) == rows(viaFull))
    // and the decisions are right: 21 loses its duplicated chunk, 22 survives
    val got = viaApp.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((21L, 1L, 0L), (22L, 1L, 1L)))
    // probe semantics on b1 itself: doc 11 keeps only its fresh chunk
    // (exact arm drops the boilerplate); doc 12's near-dup chunk verifies
    // against the corpus rep and drops (fuzzy arm)
    val p1 = Dedup.chunkIncNearDup(b1, "doc_id", "text", repsA, idx(repsA))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(p1 == Seq((11L, 2L, 1L), (12L, 1L, 0L)))
  }

  test("substringSpans: shifted boilerplate at arbitrary offsets, first copy survives") {
    val b = (1 to 10).map(i => s"b$i").mkString(" ") // 10-token boilerplate
    val c = (1 to 8).map(i => s"c$i").mkString(" ")  //  8-token boilerplate
    val docs = Seq(
      (1L, s"u1 u2 u3 $b u4 u5"),        // first occurrence of B → no spans
      (2L, s"v1 v2 v3 v4 v5 $b v6"),     // B again, SHIFTED (offset 5 vs 3)
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8"),   // all unique → no spans
      (4L, s"$c w1 w2 $c"),              // within-doc repeat of C
      (5L, s"x1 $b $c"),                 // B and C adjacent → two islands
      (6L, "short doc"),                 // < k tokens → no windows at all
    ).toDF("doc_id", "text")
    val out = Dedup.substringSpans(docs, "doc_id", "text", k = 6)
      .orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      // doc 2: windows fully inside B start at 5..9 → one span of len 10
      (2L, 5L, 10L, 5L),
      // doc 4: SECOND copy of C (starts 10..12); first copy is first-seen
      (4L, 10L, 8L, 3L),
      // doc 5: B-island (starts 1..5) and C-island (starts 11..13) stay
      // separate — the boundary windows mixing B and C tokens are unique
      (5L, 1L, 10L, 5L), (5L, 11L, 8L, 3L)))
  }

  test("substringScrub: union-of-spans token surgery, first copy survives") {
    val b = (1 to 10).map(i => s"b$i").mkString(" ")
    val c = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 $b u4 u5"),      // first occurrence of B — untouched
      (2L, s"v1 v2 v3 v4 v5 $b v6"),   // B span (5,10) removed
      (4L, s"$c w1 w2 $c"),            // within-doc second C removed
      (5L, s"x1 $b $c"),               // both islands removed → only x1 left
      (6L, "short doc"),               // < k tokens, untouched
    ).toDF("doc_id", "text")
    val out = Dedup.substringScrub(docs, "doc_id", "text", k = 6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 15L, 0L, s"u1 u2 u3 $b u4 u5"),
      (2L, 16L, 10L, "v1 v2 v3 v4 v5 v6"),
      (4L, 18L, 8L, s"$c w1 w2"),
      (5L, 19L, 18L, "x1"),
      (6L, 2L, 0L, "short doc")))
    // surgery is idempotent on this corpus: the scrubbed output re-mines
    // to zero spans (every repeated run now has exactly one copy)
    val again = Dedup.substringSpans(
      Dedup.substringScrub(docs, "doc_id", "text", k = 6),
      "doc_id", "text", k = 6)
    assert(again.count() == 0)
  }

  test("applyScrubSpans: OVERLAPPING islands scrub each position once") {
    // doc 7 establishes G1 = t1..t6 and the bridge 6-gram t4 t5 t6 s1 s2 s3;
    // doc 8's dup window starts are then {0, 3} (starts 1–2 mix G1 into s's
    // never seen as a window) — two islands whose spans [0,6) and [3,9)
    // OVERLAP. The union scrubs 9 positions, not Σ span_len = 12.
    val docs = Seq(
      (7L, "t1 t2 t3 t4 t5 t6 p1 p2 t4 t5 t6 s1 s2 s3"),
      (8L, "t1 t2 t3 t4 t5 t6 s1 s2 s3 q1 q2 q3"),
    ).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, "doc_id", "text", k = 6)
    val got = spans.orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((8L, 0L, 6L), (8L, 3L, 6L)))
    val out = Dedup.applyScrubSpans(docs, spans, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (7L, 14L, 0L, "t1 t2 t3 t4 t5 t6 p1 p2 t4 t5 t6 s1 s2 s3"),
      (8L, 12L, 9L, "q1 q2 q3")))
  }

  test("substringIncSpans/substringFpAppend: append ≡ rebuild at stride 1") {
    val b = (1 to 10).map(i => s"b$i").mkString(" ")
    val c = (1 to 8).map(i => s"c$i").mkString(" ")
    val all = Seq(
      (1L, s"u1 u2 u3 $b u4 u5"),
      (2L, s"v1 v2 v3 v4 v5 $b v6"),    // corpus-internal B repeat
      (11L, s"w1 w2 $b w3"),            // batch doc repeating corpus B
      (12L, s"$c m1 m2"),               // batch-first C occurrence
      (13L, s"n1 $c n2"),               // batch-internal C repeat
    ).toDF("doc_id", "text")
    val corpus = all.filter(col("doc_id") < 10L)
    val batch = all.filter(col("doc_id") >= 10L)
    val root = tmpDir("sfp-inc")
    val kt = graft.engine.KeyedTable(spark, root, Seq("wfp"))
    kt.overwrite(Dedup.substringFps(corpus, "doc_id", "text", k = 6))
    // probe: incremental batch spans ≡ full-rebuild spans on batch docs
    val inc = Dedup.substringIncSpans(batch, "doc_id", "text", k = 6, kt.current)
      .orderBy("doc_id", "span_start").collect().toSeq
    val full = Dedup.substringSpans(all, "doc_id", "text", k = 6)
      .filter(col("doc_id") >= 10L)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(inc == full && inc.nonEmpty)
    // maintain: merged index ≡ from-scratch index over corpus ∪ batch
    kt.merge(Dedup.substringFpAppend(batch, "doc_id", "text", k = 6, kt.current))
    val merged = kt.current.orderBy("wfp").collect().toSeq
    val rebuilt = Dedup.substringFps(all, "doc_id", "text", k = 6)
      .orderBy("wfp").collect().toSeq
    assert(merged == rebuilt)
  }

  test("windowFps kernel: rolling equals the direct per-window fold (fuzz)") {
    import graft.functions.Kernels
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def direct(toks: Seq[String], k: Int): Seq[Long] = {
      val th = toks.map(t => Kernels.polyHash(UTF8String.fromString(t)))
      (0 to toks.length - k).map(i =>
        th.slice(i, i + k).foldLeft(0L)((acc, h) => (acc * 31 + h) % Kernels.HashP))
    }
    def kernel(toks: Seq[String], k: Int): Seq[Long] = {
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val out = Kernels.windowFps(arr, k)
      (0 until out.numElements()).map(out.getLong)
    }
    val rnd = new scala.util.Random(17)
    val alpha = Seq("a", "bb", "ccc", "日", "é", "x9", "", "longtokenvalue")
    for (_ <- 0 until 300) {
      val toks = Seq.fill(rnd.nextInt(24))(alpha(rnd.nextInt(alpha.size)))
      val k = 1 + rnd.nextInt(8)
      assert(kernel(toks, k) == direct(toks, k), s"toks=$toks k=$k")
    }
    // null element nulls the whole result (boxed), like the other kernels
    val withNull = new GenericArrayData(Array[Any](UTF8String.fromString("a"), null))
    assert(Kernels.windowFps(withNull, 1) == null)
  }

  test("hashClassify: integer scores, threshold gate, empty-doc contract") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"), // identical text → identical score
      (3L, ""),                    // empty doc: one "" token, one feature
    ).toDF("doc_id", "text")
    val w = TextOps.classifierWeights(64).toSeq
    val out = TextOps.hashClassify(docs, "doc_id", "text", weights = w)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) == out(1).getLong(2))
    assert(out(0).getInt(1) == 7) // 4 unigrams + 3 bigrams
    assert(out(2).getInt(1) == 1)
    assert(out(2).getLong(2) == w(0)) // polyHash("") = 0 → bucket 0
    out.foreach(r => assert((r.getInt(3) == 1) == (r.getLong(2) >= 0L)))
    // score is the hand-computed feature-weight sum
    val feats = Seq("the", "quick", "brown", "fox",
      "the quick", "quick brown", "brown fox")
    val expect = feats.map { f =>
      val h = graft.functions.Kernels.polyHash(
        org.apache.spark.unsafe.types.UTF8String.fromString(f))
      w((h % 64).toInt)
    }.sum
    assert(out(0).getLong(2) == expect)
  }

  test("collocations: association ratio from exact counts, minCount gate") {
    val docs = Seq(
      (1L, "new york city has new buildings"),
      (2L, "new york is a city"),
      (3L, "new york again and york alone"),
    ).toDF("doc_id", "text")
    val out = TextOps.collocations(docs, "doc_id", "text", minCount = 3L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // N = 17 tokens; "new york" appears 3×; new appears 4×, york 4×
    assert(out.keySet == Set(("new", "york")))
    val (nAb, nA, nB, assoc) = out(("new", "york"))
    assert((nAb, nA, nB) == ((3L, 4L, 4L)))
    assert(assoc == (3.0 * 17.0) / (4.0 * 4.0)) // exact IEEE, no log
  }

  test("applyPhrases: greedy left-to-right merge, island edges, counts") {
    val docs = Seq(
      (1L, "a b c"),     // {ab, bc}: greedy takes a_b, c is NOT re-paired
      (2L, "a b c d"),   // {bc} only inside: a b_c d
      (3L, "a b c d"),   // islands {ab},{cd}: both merge
      (4L, "x y z"),     // no phrases → unchanged
      (5L, ""),          // empty doc: one "" token, no merge
    ).toDF("doc_id", "text")
    def run(phr: Seq[(String, String)], ids: Seq[Long]) =
      TextOps.applyPhrases(docs.filter(col("doc_id").isin(ids: _*)), "doc_id", "text", phr)
        .orderBy("doc_id").collect()
    val r1 = run(Seq(("a", "b"), ("b", "c")), Seq(1L))
    assert(r1(0).getString(4) == "a_b c" && r1(0).getInt(3) == 1)
    val r2 = run(Seq(("b", "c")), Seq(2L))
    assert(r2(0).getString(4) == "a b_c d")
    val r3 = run(Seq(("a", "b"), ("c", "d")), Seq(3L))
    assert(r3(0).getString(4) == "a_b c_d" && r3(0).getInt(3) == 2)
    // chained island {bc, cd}: b_c wins, cd's left token is consumed
    val r4 = run(Seq(("b", "c"), ("c", "d")), Seq(2L))
    assert(r4(0).getString(4) == "a b_c d")
    val r5 = run(Seq(("a", "b")), Seq(4L, 5L))
    assert(r5(0).getString(4) == "x y z" && r5(0).getInt(3) == 0)
    assert(r5(1).getString(4) == "" && r5(1).getInt(1) == 1 && r5(1).getInt(2) == 1)
    // count algebra: n_tokens_out + n_merges = n_tokens, every row
    run(Seq(("a", "b"), ("b", "c"), ("c", "d")), Seq(1L, 2L, 3L, 4L, 5L))
      .foreach(r => assert(r.getInt(2) + r.getInt(3) == r.getInt(1)))
  }

  test("phraseMerge kernel equals the reference greedy loop (fuzz)") {
    def ref(toks: Seq[String], phr: Set[(String, String)]): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && phr((toks(i), toks(i + 1)))) {
          out += s"${toks(i)}_${toks(i + 1)}"; i += 2
        } else { out += toks(i); i += 1 }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(16)
    val alpha = Seq("a", "b", "c", "d")
    val cases = (0 until 200).map { i =>
      val toks = Seq.fill(rnd.nextInt(13))(alpha(rnd.nextInt(4)))
      val phr = (0 until rnd.nextInt(6))
        .map(_ => (alpha(rnd.nextInt(4)), alpha(rnd.nextInt(4)))).toSet
      (i.toLong, toks, phr)
    }
    // group cases by phrase set (the kernel's table is a plan constant)
    cases.groupBy(_._3).foreach { case (phr, group) =>
      val df = group.map { case (id, toks, _) => (id, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextOps.applyPhrases(df, "doc_id", "text", phr.toSeq.sorted)
        .orderBy("doc_id").collect().map(_.getString(4))
      group.sortBy(_._1).zip(got).foreach { case ((_, toks, _), merged) =>
        val toksNorm = if (toks.isEmpty) Seq("") else toks // empty-doc contract
        assert(merged == ref(toksNorm, phr).mkString(" "),
          s"toks=$toks phrases=$phr")
      }
    }
  }

  test("trainHashNb: exact fixed-point NB weights, full bucket table, infer composition") {
    val docs = Seq(
      (1L, "spark keeps spark fast", "en"),
      (2L, "spark stays fast", "en"),
      (3L, "tren rapido llega", "es"),
      (4L, "tren lento sale", "es"),
    ).toDF("doc_id", "text", "lang")
    val b = 8
    val out = TextOps.trainHashNb(docs, "doc_id", "text",
      col("lang") === "en", buckets = b).orderBy("bkt").collect()
    assert(out.length == b && out.map(_.getLong(0)).toSeq == (0L until b))
    // recompute expected counts + weights with the same published formula
    def feats(t: String): Seq[String] = {
      val w = t.split(" ").toSeq
      w ++ w.zip(w.drop(1)).map { case (a, x) => s"$a $x" }
    }
    val pos = Seq("spark keeps spark fast", "spark stays fast").flatMap(feats)
    val neg = Seq("tren rapido llega", "tren lento sale").flatMap(feats)
    def bkt(f: String) = (graft.functions.Kernels.polyHash(
      org.apache.spark.unsafe.types.UTF8String.fromString(f)) % b).toInt
    val (cp, cn) = (pos.groupBy(bkt).view.mapValues(_.size.toLong).toMap,
      neg.groupBy(bkt).view.mapValues(_.size.toLong).toMap)
    val (np, nn) = (pos.size.toLong, neg.size.toLong)
    val lt = QualityOps.fpLog2Table
    val qs = QualityOps.QuantScale
    out.foreach { r =>
      val k = r.getLong(0).toInt
      assert(r.getLong(1) == cp.getOrElse(k, 0L) && r.getLong(2) == cn.getOrElse(k, 0L))
      val qp = ((cp.getOrElse(k, 0L) + 1) * qs) / (np + b)
      val qn = ((cn.getOrElse(k, 0L) + 1) * qs) / (nn + b)
      assert(r.getLong(3) == lt(qp.toInt) - lt(qn.toInt))
    }
    // learned weights drive the kernel: training docs classify correctly
    val w = TextOps.trainedWeights(
      TextOps.trainHashNb(docs, "doc_id", "text", col("lang") === "en", b), b)
    val inf = TextOps.hashClassify(docs, "doc_id", "text",
      scala.collection.immutable.ArraySeq.unsafeWrapArray(w), threshold = 0L)
      .orderBy("doc_id").collect()
    assert(inf.map(_.getInt(3)).toSeq == Seq(1, 1, 0, 0))
  }

  test("containmentPairs: directional score catches a quoted subset doc") {
    val docs = Seq(
      (1L, "the quick brown fox"), // 2 shingles, both inside doc 2
      (2L, "the quick brown fox jumps over the lazy dog"), // 7 shingles
      (3L, "completely different text content here"),
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // 1 ⊆ 2 at containment 1.0; the reverse direction is 2/7 < tau;
    // jaccard would have scored the pair 2/7 and missed it entirely
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.5)
    assert(jac.count() == 0)
  }

  test("maxShingleDf: ceiling drops boilerplate shingles, default preserves output") {
    val docs = Seq(
      (1L, "alpha beta gamma shared banner text"),
      (2L, "alpha beta gamma shared banner text"), // exact dup of 1
      (3L, "delta epsilon zeta shared banner text"),
      (4L, "eta theta iota shared banner text"),
    ).toDF("doc_id", "text")
    val base = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(base.size == 6) // every pair collides on the df=4 banner shingle
    // a ceiling above every df is a no-op: the windowed path preserves output
    val wide = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.1,
        maxShingleDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(wide == base)
    // banner shingle dropped: only the true duplicate pair survives, scored
    // as the exact Jaccard over the REDUCED shingle space (3/3, not 4/4)
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, tau = 0.1,
        maxShingleDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.toSeq == Seq((1L, 2L, 1.0)))
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, tau = 0.5,
        maxShingleDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cont == Set((1L, 2L, 1.0), (2L, 1L, 1.0)))
    // the reporter names exactly what the ceiling dropped
    val dropped = Dedup.overWideShingles(docs, "doc_id", "text", n = 3,
      maxShingleDf = 3).collect()
    assert(dropped.toSeq == Seq(Row("shared banner text", 4L)))
  }

  test("ngramCounts: occurrences vs document frequency, minCount gate") {
    val docs = Seq(
      (1L, "the cat sat on the cat sat"), // 'the cat sat' twice within one doc
      (2L, "the cat sat quietly"),
      (3L, "too short"),                  // 2 tokens < n → contributes nothing
    ).toDF("doc_id", "text")
    val out = TextOps.ngramCounts(docs, "doc_id", "text", n = 3, minCount = 2L)
      .collect()
    assert(out.toSeq == Seq(Row("the cat sat", 3L, 2L)))
    // minCount 1 keeps the singletons; within-doc repeats counted raw
    val all = TextOps.ngramCounts(docs, "doc_id", "text", n = 3, minCount = 1L)
    assert(all.count() == 5) // the cat sat / cat sat on / sat on the / on the cat / cat sat quietly
    assert(all.filter(col("ngram") === "the cat sat")
      .head().getLong(1) == 3L)
  }
}
