package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins BPE training semantics against hand-computed merges: argmax
  * tie-break, greedy leftmost-non-overlapping application, merged symbols
  * re-entering the pair pool, early stop on exhaustion, and the
  * tokenize(train) composition.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("train learns the hand-computed merge sequence on the classic corpus") {
    // Sennrich's running example shape: {low ×5, lower ×2, newest ×6, widest ×3}
    val docs = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val merges = Bpe.train(df, col("text"), 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (t,</w>)=9 … tie → pair asc: "e s"
    assert(merges(0).pair == "e s" && merges(0).pairCount == 9)
    // "es" now pairs with t (9) — tie with (t,</w>)=9 → "es t" < "t </w>"
    assert(merges(1).pair == "es t" && merges(1).merged == "est")
    assert(merges(2).pair == "est </w>" && merges(2).pairCount == 9)
    // next: l o =7 vs o w =7 vs w </w>=5 … → "l o"
    assert(merges(3).pair == "l o" && merges(3).pairCount == 7)
  }

  test("merge application is greedy leftmost non-overlapping") {
    // word "aaa": symbols a a a </w>; merge (a,a) must give [aa, a, </w>]
    val df = Seq((1L, "aaa")).toDF("id", "text")
    val merges = Seq(Bpe.Merge(0, "a a", "aa", 2))
    val out = Bpe.tokenize(df, "id", col("text"), merges).collect().head
    assert(out.getAs[Long]("n_tokens") == 1)
    assert(out.getAs[Long]("n_subwords") == 3) // aa, a, </w>
  }

  test("train stops early when no pairs remain") {
    val df = Seq((1L, "a b")).toDF("id", "text") // words a,b → "a </w>" each: 1 pair kind each
    val merges = Bpe.train(df, col("text"), 10)
    // "a </w>" and "b </w>" merge (tie → "a </w>" first), then nothing pairs
    assert(merges.length == 2)
    assert(merges.map(_.pair) == Seq("a </w>", "b </w>"))
  }

  test("tokenize composes with train: subword count shrinks, floor at one per word") {
    val docs = (0L until 20L).map(i => (i, "lower newest lowest wide")).toDF("id", "text")
    val none = Bpe.tokenize(docs, "id", col("text"), Nil).collect().head
    // no merges: chars + </w> per word: (5+1)+(6+1)+(6+1)+(4+1)
    assert(none.getAs[Long]("n_subwords") == 25)
    val merges = Bpe.train(docs, col("text"), 6)
    val out = Bpe.tokenize(docs, "id", col("text"), merges).collect()
    assert(out.forall(_.getAs[Long]("n_tokens") == 4))
    assert(out.forall(r => r.getAs[Long]("n_subwords") < 25 &&
      r.getAs[Long]("n_subwords") >= 4))
  }

  test("BpeCount kernel ≡ expression chain on adversarial corpora") {
    // repeats (greedy-overlap), merged-symbol re-pairing, single chars,
    // words untouched by any merge, multi-space docs
    val docs = Seq(
      "aaa aaaa aa a", "abab baba abba", "xyz zyx", "a b c d",
      "lower newest lowest wide widest low", "qqqq qq q").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val merges = Bpe.train(docs, col("text"), 6)
    val kernel = Bpe.tokenize(docs, "id", col("text"), merges)
      .orderBy("id").collect().toSeq
    val expr = Bpe.tokenizeExpr(docs, "id", col("text"), merges)
      .orderBy("id").collect().toSeq
    assert(kernel.map(_.toSeq) == expr.map(_.toSeq))
  }

  test("BpeSegment kernel matches the replace-chain segmentation per word") {
    val words = Seq("aaa", "abab", "newest", "q", "zzzz")
    val merges = Seq(Bpe.Merge(0, "a a", "aa", 9), Bpe.Merge(1, "aa a", "aaa", 5),
      Bpe.Merge(2, "e s", "es", 4), Bpe.Merge(3, "es t", "est", 3))
    val df = words.toDF("word")
    val viaKernel = df.select(col("word"),
      graft.functions.BpeKernels.bpe_segment(col("word"), Bpe.pairsOf(merges))
        .as("subs")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val sym = Bpe.applyMerges(
      concat(regexp_replace(col("word"), "(.)", "($1)"), lit(s"(${Bpe.EndMark})")),
      merges)
    val viaExpr = df.select(col("word"),
      split(sym.substr(lit(2), length(sym) - 2), "[)][(]").as("subs")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaKernel == viaExpr)
    // hand-check the chained merge: aaa → [aa,a,</w>] after merge 0, then
    // merge 1 fuses → [aaa, </w>]
    assert(viaKernel("aaa") == Seq("aaa", "</w>"))
    assert(viaKernel("newest") == Seq("n", "e", "w", "est", "</w>"))
  }

  test("null and empty texts: nulls dropped, empty yields zero counts") {
    val df = Seq((1L, "ab"), (2L, null), (3L, "")).toDF("id", "text")
    val out = Bpe.tokenize(df, "id", col("text"), Nil)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L))
    assert(out(1).getAs[Long]("n_tokens") == 0 && out(1).getAs[Long]("n_subwords") == 0)
  }

  test("training on a non-Latin corpus learns non-ASCII merges (r10 guard fix)") {
    // the old ASCII whitelist threw 'unsafe merge pair' on the first
    // Cyrillic argmax — multilingual BPE must train, merge, and count
    val df = Seq.fill(4)("поезд поезд ночь").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val merges = Bpe.train(df, col("text"), nMerges = 3)
    assert(merges.nonEmpty, "training must produce merges on Cyrillic text")
    assert(merges.exists(m => m.merged.exists(_ > 127)), merges.map(_.pair).mkString("; "))
    // the learned merges drive segmentation: "поезд" fuses below char count
    val toks = Bpe.tokenize(df, "id", col("text"), merges).collect()
    assert(toks.forall(_.getAs[Long]("n_subwords") <
      "поезд поезд ночь".count(_ != ' ') + 3), "merges must fuse symbols")
  }

  test("UnigramSegment kernel ≡ reference Viterbi DP (fuzz, ties + UNK)") {
    import graft.functions.Kernels.{HashP => _}
    import org.apache.spark.unsafe.types.UTF8String
    val L = 3
    def ref(w: String, costs: Map[String, Long]): Seq[String] = {
      val cps = w.codePoints.toArray
      val n = cps.length
      if (n == 0) return Seq.empty
      val best = Array.fill(n + 1)(0L)
      val bp = new Array[Int](n + 1)
      for (j <- 1 to n) {
        var bj = Long.MaxValue; var bi = -1
        for (i <- math.max(0, j - L) until j) {
          costs.get(new String(cps, i, j - i)).foreach { c =>
            if (best(i) + c < bj) { bj = best(i) + c; bi = i }
          }
        }
        if (bi < 0) { bj = best(j - 1) + QualityOps.UnigramUnkCost; bi = j - 1 }
        best(j) = bj; bp(j) = bi
      }
      var out = List.empty[String]; var p = n
      while (p > 0) { out = new String(cps, bp(p), p - bp(p)) :: out; p = bp(p) }
      out
    }
    val rnd = new scala.util.Random(17)
    val alpha = "abc日"
    for (_ <- 0 until 300) {
      val w = Seq.fill(rnd.nextInt(10))(alpha(rnd.nextInt(alpha.length))).mkString
      // random vocab over the alphabet's short strings; equal costs are
      // COMMON by construction so the longest-piece tie-break is exercised
      val vocab = (for {
        len <- 1 to L
        _ <- 1 to 4
      } yield Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString)
        .distinct
        // singles sometimes MISSING so the UNK fallback fires
        .filterNot(p => p.length <= 1 && rnd.nextInt(4) == 0)
        .map(p => (p, (1 + rnd.nextInt(3)) * 1000L))
        .sortBy(_._1)
      val table = new graft.functions.UnigramTable(vocab.toArray, L)
      val got = table.segment(UTF8String.fromString(w))
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      assert(gotSeq == ref(w, vocab.toMap), s"w=$w vocab=$vocab")
      assert(gotSeq.mkString == w, "pieces must reconstruct the word")
    }
  }

  test("trainUnigram matches the cross-validated reference on the toy corpus") {
    // The exact fixture the oracle SQL was prototyped against (banana toy,
    // L=4, seed=12, minCount=2): expected model cross-computed by an
    // independent Python reference AND DuckDB recursive-CTE DP — pinning
    // seed ranking, both hard-EM passes, the prune, and the final M-step.
    val docs = Seq((1L, "banana bandana"), (2L, "ban ban banana"),
      (3L, "nab nana banana"), (4L, "")).toDF("doc_id", "text")
    val model = Bpe.trainUnigram(docs, col("text"),
      maxPieceLen = 4, seedSize = 12, minCount = 2L)
    assert(model == Seq(
      ("a", 1L, 3628956L), ("ana", 5L, 1965647L), ("b", 1L, 3628956L),
      ("ban", 6L, 1732645L), ("d", 1L, 3628956L), ("n", 2L, 3015578L)))
    // deployment composes: pieces reconstruct each token, empty doc → 0
    val tok = Bpe.unigramTokenize(docs, "doc_id", col("text"), model, 4)
      .orderBy("doc_id").collect()
    assert(tok.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 5L), (2L, 4L), (3L, 7L), (4L, 0L)))
  }
}
