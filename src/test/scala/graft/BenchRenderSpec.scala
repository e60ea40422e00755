package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact-line contract (r9 verdict #1): the driver keeps
 * only the LAST 2000 stdout bytes, so the line must (a) ALWAYS fit the
 * 1995-byte budget — even for a deliberately stall-heavy battery where the
 * old fixed elide=0.35 fallback overflowed and front-truncation destroyed
 * the health keys (BENCH_r09 parsed:null) — and (b) order keys so that if a
 * line ever did overflow, truncation eats query detail, not certification:
 * "queries" first, health keys after, "value" last.
 */
class BenchRenderSpec extends AnyFunSuite {

  // strict JSON validation via Spark's bundled jackson
  private def parseable(s: String): Boolean =
    try {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.readTree(s) != null
    } catch { case _: Throwable => false }

  private def mkBattery(n: Int, sec: Double): Seq[(String, Double)] =
    (1 to n).map(i => f"q_synthetic_query_name_$i%03d" -> sec)

  test("clean battery: fits budget, parses, value is the last key") {
    val line = Bench.render(mkBattery(190, 0.1), "sf0.1",
      stallRatio = 1.2, nstall = 0, nretry = 0, priorMax = Some(1.1),
      npx = 0, stalledQ = Nil, failed = Nil,
      idxBuild = Seq("ivf" -> 2.8, "pq" -> 1.9))
    assert(line.length <= 1995, s"len=${line.length}")
    assert(parseable(line))
    assert(line.endsWith("}"))
    // value is the FINAL key — survives any front-truncation
    assert("\"value\":[0-9.]+\\}$".r.findFirstIn(line).isDefined, line.takeRight(60))
    // queries precede the health keys
    assert(line.indexOf("\"queries\":") < line.indexOf("\"stall\":"))
    assert(line.indexOf("\"queries\":") < line.indexOf("\"ib\":"))
  }

  test("stall-heavy battery (every query slow + long stalled list) still fits and keeps health keys") {
    // 200 queries all at 1.7 s — nothing under any fixed elide threshold
    // below 1.7, so the old fixed-0.35 fallback would emit ~200 entries
    // (>4 kB) and overflow; 40 stalled names + priors loaded, the exact
    // regime that destroyed BENCH_r09
    val stalled = (1 to 40).map(i => f"q_synthetic_query_name_$i%03d")
    val line = Bench.render(mkBattery(200, 1.7), "sf0.1",
      stallRatio = 8.3, nstall = 12, nretry = 31, priorMax = Some(4.2),
      npx = 9, stalledQ = stalled, failed = Seq("q_synthetic_query_name_201"),
      idxBuild = (1 to 25).map(i => s"ib$i" -> 9.9))
    assert(line.length <= 1995, s"len=${line.length}")
    assert(parseable(line))
    for (k <- Seq("\"stall\":", "\"nstall\":", "\"nretry\":", "\"pmax\":",
        "\"npx\":", "\"stalled\":", "\"err\":", "\"value\":"))
      assert(line.contains(k), s"missing $k in ${line.takeRight(400)}")
    // the last 120 bytes alone carry the certification keys (tail-window
    // survivability even under a hypothetical overflow)
    val tail = line.takeRight(120)
    assert(tail.contains("\"value\":"))
  }

  test("pathological floor: every query stalled AND failed — counts replace name lists, line still parses") {
    val names = (1 to 300).map(i => f"q_synthetic_query_name_$i%03d")
    val line = Bench.render(mkBattery(300, 2.0), "sf0.1",
      stallRatio = 50.0, nstall = 300, nretry = 300, priorMax = Some(9.9),
      npx = 300, stalledQ = names, failed = names,
      idxBuild = (1 to 25).map(i => s"ib$i" -> 9.9))
    assert(line.length <= 1995, s"len=${line.length}")
    assert(parseable(line))
    assert(line.contains("\"value\":"))
    assert(line.contains("\"stall\":"))
  }

  test("vs-prior filing: converged plateau shift → regressed, unconverged → stalled (r10 verdict #2)") {
    // the exact r10 confusion, as the synthetic case the verdict asked for:
    // one CONVERGED plateau shift (minhash_dedup's shape — three runs agree,
    // all >2× prior) and one true stall (regional_revenue's shape — runs
    // never converge) must carry DISTINCT labels
    assert(Bench.priorVerdict(Seq(1.56, 1.60, 1.62), prior = 0.6).contains("regressed"))
    assert(Bench.priorVerdict(Seq(2.1, 5.0, 7.2), prior = 0.9).contains("stalled"))
    // within 2× prior, or within the 0.3 s noise floor → no filing
    assert(Bench.priorVerdict(Seq(1.7, 1.8), prior = 0.9).isEmpty)
    assert(Bench.priorVerdict(Seq(0.5, 0.52), prior = 0.2).isEmpty)
    assert(Bench.priorVerdict(Nil, prior = 0.9).isEmpty)
    // rendered: distinct out-of-band lists; the regressed entry's value
    // ships in "queries" (a trustworthy measurement of ITS box). Since r12
    // the prior LOADER nevertheless excludes it too (see the parsePriors
    // cases below): single-box convergence is not a real plateau, and the
    // newest-first merge falls back to an older artifact's value instead.
    val line = Bench.render(Seq("q_alpha" -> 1.56, "q_beta" -> 2.1), "sf0.1",
      stallRatio = 1.1, nstall = 1, nretry = 2, priorMax = Some(2.3), npx = 2,
      stalledQ = Seq("q_beta"), failed = Nil, idxBuild = Nil,
      regressedQ = Seq("q_alpha"))
    assert(parseable(line))
    val prefix = if (line.contains("\"qprefix\":\"q_\"")) "q_" else ""
    assert("\"regressed\":\\[\"(q_)?alpha\"\\]".r.findFirstIn(line).isDefined, line)
    assert("\"stalled\":\\[\"(q_)?beta\"\\]".r.findFirstIn(line).isDefined, line)
    // loader regexes: stalled strips beta from priors, alpha survives
    val qs = "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(line).map(_.group(1))
      .map("\"([A-Za-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(_)
        .map(m => (prefix + m.group(1)) -> m.group(2).toDouble).toMap)
      .getOrElse(Map.empty[String, Double])
    val stalledPrior = "\"stalled\":\\[([^\\]]*)\\]".r.findFirstMatchIn(line)
      .map(_.group(1).split(",").map(x => prefix + x.trim.stripPrefix("\"").stripSuffix("\"")).toSet)
      .getOrElse(Set.empty[String])
    assert((qs -- stalledPrior).keySet == Set("q_alpha"))
  }

  test("prior parsing round-trip: next round's regexes read the new key order") {
    // the exact regexes Bench's prior loader uses, applied to a rendered line
    val line = Bench.render(Seq("q_alpha" -> 1.2, "q_beta" -> 0.8), "sf0.1",
      stallRatio = 1.1, nstall = 0, nretry = 0, priorMax = None, npx = 0,
      stalledQ = Seq("q_beta"), failed = Nil, idxBuild = Seq("ivf" -> 2.0))
    val prefix = if (line.contains("\"qprefix\":\"q_\"")) "q_" else ""
    val qs = "\"queries\":\\{([^}]*)\\}".r.findFirstMatchIn(line).map(_.group(1))
      .map("\"([A-Za-z0-9_]+)\":([0-9.]+)".r.findAllMatchIn(_)
        .map(m => (prefix + m.group(1)) -> m.group(2).toDouble).toMap)
      .getOrElse(Map.empty[String, Double])
    assert(qs.keySet == Set("q_alpha", "q_beta"), qs)
    val stalledPrior = "\"stalled\":\\[([^\\]]*)\\]".r.findFirstMatchIn(line)
      .map(_.group(1).split(",").map(x => prefix + x.trim.stripPrefix("\"").stripSuffix("\"")).toSet)
      .getOrElse(Set.empty[String])
    assert(stalledPrior == Set("q_beta"))
    val priorSf = "\"sf\"\\s*:\\s*\"?(?:sf)?([0-9.]+)\"?".r.findFirstMatchIn(line).map(_.group(1))
    assert(priorSf.contains("0.1"))
  }

  test("parsePriors excludes BOTH stalled and regressed entries; ib priors parsed (r11 verdict #1)") {
    // the r11 shape: embed_dedup filed at 6.7 s as regressed (converged on
    // the driver's box; a quiet box read 2.29 s). Its value must NOT load
    // as a prior — otherwise the 2×-prior trip wire moves to 13.4 s, a 2.8×
    // blind spot on exactly the query the flag was about.
    val line = Bench.render(
      Seq("q_embed_dedup" -> 6.7, "q_minhash_dedup" -> 0.7, "q_pagerank" -> 0.9),
      "sf0.1", stallRatio = 2.1, nstall = 0, nretry = 2, priorMax = Some(2.8),
      npx = 1, stalledQ = Seq("q_pagerank"), failed = Nil,
      idxBuild = Seq("jm" -> 28.9, "cdc" -> 11.1), regressedQ = Seq("q_embed_dedup"))
    val (qs, ib) = Bench.parsePriors(line, curSf = Some("0.1"))
    assert(qs == Map("q_minhash_dedup" -> 0.7), qs) // stalled AND regressed both gone
    assert(ib == Map("jm" -> 28.9, "cdc" -> 11.1), ib)
    // a driver-wrapped (escaped) copy of the same line parses identically
    val wrapped = "{\"n\": 11, \"tail\": \"" + line.replace("\"", "\\\"") + "\"}"
    assert(Bench.parsePriors(wrapped, Some("0.1")) == ((qs, ib)))
    // cross-scale gate unchanged: an sf0.1 artifact yields nothing at sf1
    assert(Bench.parsePriors(line, Some("1")) == ((Map.empty, Map.empty)))
  }

  test("mergePriors: excluded/elided queries fall back to the next-newest artifact") {
    val newest = Bench.render(Seq("q_embed_dedup" -> 6.7, "q_tfidf" -> 0.5), "sf0.1",
      stallRatio = 1.1, nstall = 0, nretry = 0, priorMax = None, npx = 1,
      stalledQ = Nil, failed = Nil, idxBuild = Seq("jm" -> 28.9),
      regressedQ = Seq("q_embed_dedup"))
    val older = Bench.render(Seq("q_embed_dedup" -> 2.4, "q_tfidf" -> 1.0,
      "q_retired" -> 3.0), "sf0.1",
      stallRatio = 1.1, nstall = 0, nretry = 0, priorMax = None, npx = 0,
      stalledQ = Nil, failed = Nil, idxBuild = Seq("jm" -> 24.2, "cdc" -> 4.1))
    val parsed = Seq(newest, older).map(Bench.parsePriors(_, Some("0.1")))
    val (qs, ib) = Bench.mergePriors(parsed)
    // the regressed 6.7 does NOT become the prior; the older 2.4 does
    assert(qs("q_embed_dedup") == 2.4, qs)
    // the newest artifact wins where it carries a usable value
    assert(qs("q_tfidf") == 0.5, qs)
    // a query only the older artifact carries still gets a prior
    assert(qs("q_retired") == 3.0, qs)
    assert(ib == Map("jm" -> 28.9, "cdc" -> 4.1), ib)
    // depth cap: an ancient artifact past the cap contributes nothing
    val ancient = Bench.render(Seq("q_fossil" -> 9.0), "sf0.1",
      stallRatio = 1.0, nstall = 0, nretry = 0, priorMax = None, npx = 0,
      stalledQ = Nil, failed = Nil, idxBuild = Nil)
    val five = Seq(newest, older, older, older, ancient).map(Bench.parsePriors(_, Some("0.1")))
    assert(!Bench.mergePriors(five)._1.contains("q_fossil"))
  }
}
