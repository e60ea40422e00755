package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Seeded fuzz over the full Unicode range for the one-pass
  * [[graft.functions.Kernels.normTokens]] kernel.
  *
  * == The case contract this pins (and how the fuzz found it) ==
  * The kernel lowercases PER CODEPOINT (simple mapping) — the same
  * contract as [[Dedup.shingleSet]] and as DuckDB's utf8proc `lower`,
  * i.e. as the ORACLE. Spark's own `lower` is ICU's full contextual
  * lowercase (`UCharacter.toLowerCase`), whose normalization-visible
  * divergences from simple mapping are exactly two characters: the Greek
  * capital sigma (final position: ICU ς, simple σ) and İ U+0130 (ICU's
  * full mapping emits i + combining dot U+0307; the strip turns the dot
  * into a space, so İ becomes a TOKEN BOUNDARY under Spark lower but a
  * plain `i` under simple mapping — both found by this fuzz, not
  * predicted). That means the regex
  * REFERENCE form — which rides Spark `lower` — and the DuckDB oracle
  * already disagree on final-sigma contexts with each other; the kernel
  * sides with the oracle. The fuzz therefore:
  *
  *  - proves kernel ≡ regex-pipeline-with-simple-lower on 4000 arbitrary
  *    mixed-script strings (driver eval, full pools including Σ);
  *  - proves kernel ≡ Spark's own regex chain through codegen on pools
  *    WITHOUT Σ/İ (where contextual == simple);
  *  - pins both divergences explicitly instead of hiding them.
  *
  * The first run of this fuzz also caught U+9FFF (assigned to CJK in
  * Unicode 14): a letter under RE2's newer tables, unassigned under JDK
  * 17's Unicode 13 — which is why [[TextOps.KeptCharClass]] keeps the CJK
  * blocks BY RANGE instead of via `\p{L}`.
  */
class NormTokensFuzzSpec extends SparkSpec {

  // per-codepoint simple lowercase — the kernel/shingleSet/utf8proc contract
  private def simpleLower(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  // the production regex pipeline with the simple-lower case contract
  private def regexTokens(text: String): Seq[String] = {
    val norm = simpleLower(text)
      .replaceAll(TextOps.KeptCharClass, " ")
      .replaceAll("(" + TextOps.CjkCharClass + ")", " $1 ")
      .replaceAll(" +", " ").trim
    norm.split(" ", -1).toSeq
  }

  private def kernelTokens(text: String): Seq[String] = {
    val arr = graft.functions.Kernels.normTokens(UTF8String.fromString(text))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  // codepoint pools: ASCII, accented Latin (incl. İ/ı), Cyrillic capitals,
  // Greek (capital sigma only in the full pools), Arabic, CJK/kana/hangul
  // (incl. U+9FFF, the Unicode-version-skew probe), combining marks, astral
  // letters + emoji, exotic whitespace, punctuation
  private def pools(withSigma: Boolean): Seq[Seq[Int]] = Seq(
    (0x20 to 0x7E).toSeq,
    (if (withSigma) Seq(0xC0, 0xC9, 0xDF, 0xE9, 0xF6, 0x130, 0x131, 0x178)
     else Seq(0xC0, 0xC9, 0xDF, 0xE9, 0xF6, 0x131, 0x178)),
    (0x410 to 0x44F).toSeq,
    (if (withSigma) Seq(0x391, 0x3A3, 0x3B1, 0x3C2, 0x3C3, 0x3A9)
     else Seq(0x391, 0x3B1, 0x3C2, 0x3C3, 0x3A9)),
    (0x620 to 0x64A).toSeq,
    Seq(0x3042, 0x30A2, 0x4E2D, 0x6587, 0x9FFF, 0xAC00, 0xD7A3, 0x3400),
    (0x300 to 0x30F).toSeq,
    Seq(0x10330, 0x10331, 0x1F600, 0x20000),
    Seq(0x09, 0x0A, 0xA0, 0x3000),
    Seq(0x2E, 0x2C, 0x21, 0x3F, 0x3002, 0xFF01),
  )

  private def randomText(rnd: scala.util.Random, ps: Seq[Seq[Int]]): String = {
    val len = rnd.nextInt(41)
    val sb = new java.lang.StringBuilder
    (0 until len).foreach { _ =>
      val pool = ps(rnd.nextInt(ps.size))
      sb.appendCodePoint(pool(rnd.nextInt(pool.size)))
    }
    sb.toString
  }

  test("kernel ≡ simple-lower regex pipeline on 4000 random mixed-script strings (full pools)") {
    val rnd = new scala.util.Random(20260814)
    val ps = pools(withSigma = true)
    for (i <- 0 until 4000) {
      val t = randomText(rnd, ps)
      val (k, r) = (kernelTokens(t), regexTokens(t))
      assert(k == r, s"case $i text=${t.map(c => f"\\u${c.toInt}%04x").mkString} kernel=$k regex=$r")
    }
  }

  test("kernel ≡ Spark's regex chain through codegen (Σ/İ-free pools, where contextual == simple)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val ps = pools(withSigma = false)
    val rows = (0 until 300).map(_ => randomText(rnd, ps))
    val bad = rows.toDF("text")
      .select(col("text"),
        TextOps.tokens(col("text")).as("kernel"),
        split(TextOps.normTextRegex(col("text")), " ").as("regex"))
      .filter(not(col("kernel") === col("regex")))
      .collect()
    val detail = bad.take(3).map { r =>
      val t = r.getString(0)
      s"text=${t.map(c => f"\\u${c.toInt}%04x").mkString} kernel=${r.getSeq[String](1)} regex=${r.getSeq[String](2)}"
    }.mkString("\n")
    assert(bad.isEmpty, detail)
  }

  test("the documented divergences: final Σ and İ — kernel sides with the oracle") {
    val s = spark
    import s.implicits._
    // "ΑΣ" — final-position capital sigma after a cased letter
    assert(kernelTokens("ΑΣ") == Seq("ασ"), "simple mapping: always σ")
    val viaSparkLower = Seq("ΑΣ").toDF("text")
      .select(split(TextOps.normTextRegex(col("text")), " ").as("r"))
      .head().getSeq[String](0)
    assert(viaSparkLower == Seq("ας"),
      "Spark lower is ICU contextual (final ς) — if this ever changes, " +
        "the kernel/regex scoping above can be unified")
    // İ: ICU full mapping splits the token at the injected combining dot;
    // simple mapping (kernel, utf8proc/DuckDB) keeps one token
    assert(kernelTokens("AİB") == Seq("aib"))
    val viaSparkLower2 = Seq("AİB").toDF("text")
      .select(split(TextOps.normTextRegex(col("text")), " ").as("r"))
      .head().getSeq[String](0)
    assert(viaSparkLower2 == Seq("ai", "b"),
      "Spark lower emits i+U+0307 for İ; the strip turns the dot into a boundary")
  }
}
