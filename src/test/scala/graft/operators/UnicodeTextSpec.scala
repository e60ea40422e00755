package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the Unicode text-stack contract (r9 verdict #2): before round 10,
  * `normText` stripped every non-ASCII character, so every non-Latin
  * document normalized to "" and shared fingerprint("") — distinct
  * CJK/Cyrillic/Arabic documents silently collapsed as duplicates. These
  * tests pin the corrected semantics end-to-end: Unicode letter/digit
  * classes, per-character CJK tokenization, codepoint (not UTF-16) hashing,
  * and the ru/zh language profiles.
  */
class UnicodeTextSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(c).collect()(0).get(0)
  }

  test("distinct non-Latin docs get DISTINCT fingerprints; case-folded twin merges") {
    val ruA = "Наш поезд отправился в путь ровно в полночь"
    val ruA2 = "наш поезд отправился в путь ровно в полночь" // lowercased twin
    val ruB = "его письмо не пришло сегодня утром"
    val zhA = "我们的火车在午夜出发"
    val zhB = "他们的飞机在早晨到达"
    def fp(t: String) = one(t, TextOps.fingerprint(col("text"))).asInstanceOf[Long]
    assert(fp(ruA) == fp(ruA2), "Unicode lower must fold the Cyrillic capital")
    assert(fp(ruA) != fp(ruB), "distinct Russian docs must not collapse")
    assert(fp(zhA) != fp(zhB), "distinct Chinese docs must not collapse")
    assert(fp(ruA) != 0L && fp(zhA) != 0L, "non-Latin text must not normalize to empty")
  }

  test("CJK text tokenizes per character; mixed-script boundaries split") {
    def toks(t: String) =
      one(t, TextOps.tokens(col("text"))).asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(toks("我们的火车") == Seq("我", "们", "的", "火", "车"))
    assert(toks("abc中文def 123") == Seq("abc", "中", "文", "def", "123"))
    assert(toks("真夜中に列車が出発した").length == 11) // kana + han, one token each
    assert(toks("القطار غادر في منتصف الليل").length == 5) // Arabic words keep spaces
  }

  test("polyHash folds code POINTS — astral chars hash as one codepoint, matching the DuckDB twin") {
    // Gothic 𐌰 = U+10330 (surrogate pair in UTF-16). The kernel must fold
    // 0x10330, not 0xD800DF30's two units — DuckDB's unicode()/ascii() twin
    // is codepoint-based.
    val h = graft.functions.Kernels.polyHash(UTF8String.fromString("𐌰"))
    assert(h == 0x10330L % 1000000007L)
    val hAb = graft.functions.Kernels.polyHash(UTF8String.fromString("a𐌰b"))
    val expected = ((('a'.toLong * 31 + 0x10330L) % 1000000007L) * 31 + 'b'.toLong) % 1000000007L
    assert(hAb == expected)
  }

  test("langId: ru/zh profiles, and same-script discrimination (pt vs es, ar vs fa)") {
    def lang(t: String) = one(t, TextOps.langId(TextOps.tokens(col("text")))).asInstanceOf[String]
    assert(lang("Наш поезд отправился в путь ровно в полночь") == "ru") // 'в' ×2
    assert(lang("我们的火车在午夜出发") == "zh") // 的/在/我 single-char tokens
    assert(lang("the train left exactly at midnight") == "en")
    assert(lang("") == "und")
    // r11: same-script pairs the script profiler cannot separate — the
    // stopword profiles carry the signal. Portuguese hits o/para/a/em/um
    // (es shares only 'de'/'que'); Spanish keeps winning its own sentences.
    assert(lang("o comboio partiu para a cidade em um minuto") == "pt")
    assert(lang("el tren de la noche se fue") == "es")
    // Arabic vs Persian: same script, nearly disjoint function words
    assert(lang("القطار غادر في منتصف الليل") == "ar") // في/من hit ar
    assert(lang("قطار در نیمه شب از ایستگاه به راه افتاد") == "fa") // در/از/به hit fa
    // r12: the Devanagari triple (hi/mr/ne). Matras are Mn — the tokenizer
    // strips them — so the profiles score consonant SKELETONS (नहीं→नह) and
    // a mid-word matra splits its token (बार→ब+र). The three skeleton sets
    // are pairwise disjoint; each sentence must hit only its own profile.
    assert(lang("और हम इस घर पर अब नहीं कहते") == "hi")   // और/हम/इस/पर/अब/नह
    assert(lang("मला आहे आणि पण तर मग") == "mr")           // मल/आह/आण/पण/तर/मग
    assert(lang("उनले भने छ छन् पनि अनि तथा") == "ne")     // उनल/भन/छ/छन/पन/अन/तथ
    // script-identical confusables stay separated: a Hindi sentence with a
    // Marathi-looking skeleton in it still resolves by majority
    assert(lang("और हम इस घर पर तर") == "hi") // 5 hi hits vs 1 mr hit
    // r13: Urdu — third member of the Arabic-script family. Its function
    // words ride Urdu-specific letterforms (ے ہ ں ک), so کے/سے/کی/ہیں hit
    // only ur; the ar and fa sentences above must keep winning their own
    // profiles with the ur profile present (zero cross-hits)
    assert(lang("رات کی گاڑی اسٹیشن سے چلی اور سب لوگ گھر کے اندر ہیں") == "ur")
    assert(lang("القطار غادر في منتصف الليل من المحطة") == "ar")
    assert(lang("قطار در نیمه شب از ایستگاه به راه افتاد") == "fa")
  }

  test("bpeTokenCount counts non-Latin letter runs as runs, not per-mark noise") {
    def n(t: String) = one(t, TextOps.bpeTokenCount(col("text"))).asInstanceOf[Long]
    assert(n("поезд отправился") == 2L) // letter runs, not 15 single marks
    assert(n("café 123!") == 3L)        // café | 123 | !
    assert(n("我们的") == 1L)            // one \p{L}+ run (raw text, no norm)
    assert(n("the train") == 2L)
  }

  test("NFC composition: NFD twins fingerprint identically after nfc(), differently raw") {
    val nfcLatin = "café résumé"
    val nfdLatin = "café résumé"
    val nfcHangul = "한국어"
    val nfdJamo = "한국어"
    def fp(t: String) =
      one(t, TextOps.fingerprint(TextOps.nfc(col("text")))).asInstanceOf[Long]
    def fpRaw(t: String) =
      one(t, TextOps.fingerprint(col("text"))).asInstanceOf[Long]
    assert(fp(nfcLatin) == fp(nfdLatin))
    assert(fpRaw(nfcLatin) != fpRaw(nfdLatin), "raw forms must differ — else the fixture proves nothing")
    assert(fp(nfcHangul) == fp(nfdJamo))
    assert(fpRaw(nfcHangul) != fpRaw(nfdJamo))
    // identity on already-NFC text (the fast path) and on ASCII
    assert(one(nfcLatin, TextOps.nfc(col("text"))) == nfcLatin)
    assert(one("plain ascii", TextOps.nfc(col("text"))) == "plain ascii")
    // the kernel agrees with java.text.Normalizer directly
    assert(one(nfdJamo, TextOps.nfc(col("text"))) ==
      java.text.Normalizer.normalize(nfdJamo, java.text.Normalizer.Form.NFC))
  }

  test("scriptProfile: dominant script and ratios per text") {
    val s = spark
    import s.implicits._
    def profile(t: String): Map[String, Any] = {
      val cols = TextOps.scriptProfile(col("text"))
      val row = Seq(t).toDF("text").select(cols.map { case (n, c) => c.as(n) }: _*).head()
      cols.map(_._1).zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
    }
    assert(profile("the quick brown fox")("script") == "latin")
    assert(profile("наш поезд отправился")("script") == "cyrillic")
    assert(profile("我们的火车在午夜出发")("script") == "cjk")
    assert(profile("القطار غادر")("script") == "arabic")
    assert(profile("ωμέγα τέλος")("script") == "greek")
    // r13: Devanagari routes as its own script (incl. matras — the class is
    // the whole block, unlike the tokenizer which strips Mn)
    assert(profile("और हम नहीं कहते")("script") == "devanagari")
    // r14 tier-2 classes — each previously profiled "und" (bn/he/th) or
    // disappeared into the tokenizer-shaped cjk class (hangul/kana)
    assert(profile("আমরা এই ঘরে থাকি না")("script") == "bengali")
    assert(profile("우리는 이 집에 살지 않는다")("script") == "hangul")
    // NFD Korean (conjoining Jamo) profiles hangul too — the class spans
    // the Jamo block, not just precomposed syllables
    assert(profile("한국")("script") == "hangul")
    assert(profile("הרכבת יצאה בחצות")("script") == "hebrew")
    assert(profile("รถไฟออกตอนเที่ยงคืน")("script") == "thai")
    assert(profile("ひらがなとカタカナ")("script") == "kana")
    // Japanese Han+kana mix: cjk is now Han-ONLY, so the counts split and
    // the majority-Han sentence stays cjk-dominant with a real kana count
    val ja = profile("真夜中に列車が出発した")
    assert(ja("script") == "cjk" && ja("n_cjk") == 7L && ja("n_kana") == 4L)
    assert(profile("12345 !!!")("script") == "und")
    assert(profile("")("script") == "und")
    // mixed: counts split, ratios sum ≤ 1 (spaces/digits counted by none)
    val m = profile("abc 中文")
    assert(m("n_latin") == 3L && m("n_cjk") == 2L)
    assert(m("latin_ratio").asInstanceOf[Double] == 3.0 / 6.0)
    // tie-break follows ScriptClasses order (latin first)
    assert(profile("ab яж")("script") == "latin")
  }

  test("langRoute: script-unique scripts answer directly, shared scripts fall to profiles") {
    val s = spark
    import s.implicits._
    def route(t: String): String =
      Seq(t).toDF("text").select(TextOps.langRoute(col("text"))).head().getString(0)
    // script-unique: the profile scorer is never consulted
    assert(route("আমরা এই ঘরে থাকি না") == "bn")
    assert(route("우리는 이 집에 살지 않는다") == "ko")
    assert(route("הרכבת יצאה בחצות") == "he")
    assert(route("รถไฟออกตอนเที่ยงคืน") == "th")
    assert(route("ο σιδηρόδρομος έφυγε") == "el")
    // the two Japanese regimes: pure kana (dominant script = kana) and
    // Han-dominant with kana present (the presence override)
    assert(route("ひらがなとカタカナ") == "ja")
    assert(route("真夜中に列車が出発した") == "ja")
    // Han-ONLY text is NOT Japanese-routed — it falls to the zh profile
    assert(route("我们的火车是在午夜出发了就不等人") == "zh")
    // shared scripts route through the stopword profiles
    assert(route("the train and the night of it") == "en")
    assert(route("наш поезд и я не знал что это") == "ru")
    assert(route("القطار غادر في منتصف الليل من المحطة إلى المدينة") == "ar")
    // no script hit, no profile hit
    assert(route("7492 8301") == "und")
  }

  test("langRoute r15: tier-3 script-unique routes and the kana ratio floor") {
    val s = spark
    import s.implicits._
    def route(t: String): String =
      Seq(t).toDF("text").select(TextOps.langRoute(col("text"))).head().getString(0)
    // all 13 tier-3 routes answer from the script profile alone
    assert(route("நாங்கள் இந்த வீட்டில் இல்லை") == "ta")
    assert(route("మేము ఈ ఇంట్లో లేము") == "te")
    assert(route("ನಾವು ಈ ಮನೆಯಲ್ಲಿ ಇಲ್ಲ") == "kn")
    assert(route("ഞങ്ങൾ ഈ വീട്ടിൽ ഇല്ല") == "ml")
    assert(route("અમે આ ઘરમાં નથી") == "gu")
    assert(route("ਅਸੀਂ ਇਸ ਘਰ ਵਿੱਚ ਨਹੀਂ") == "pa")
    assert(route("අපි මේ ගෙදර නැහැ") == "si")
    assert(route("ကျွန်တော်တို့ ဒီအိမ်မှာ မနေပါ") == "my")
    assert(route("យើងមិននៅផ្ទះនេះទេ") == "km")
    assert(route("ພວກເຮົາບໍ່ຢູ່ເຮືອນນີ້") == "lo")
    assert(route("ჩვენ ამ სახლში არ ვართ") == "ka")
    assert(route("մենք այս տանը չենք") == "hy")
    assert(route("እኛ በዚህ ቤት አንኖርም") == "am")
    // kana override needs >= 1/KanaRouteInv kana (ADVICE r14): 28 Han-block
    // chars quoting ONE katakana char fall through to the zh profile...
    assert(route("我们的火车是在午夜出发了就不等人他们有和我一样的行李箱ノ") == "zh")
    // ...while genuinely mixed ja prose (4/11 kana) still routes ja
    assert(route("真夜中に列車が出発した") == "ja")
  }

  test("langRoute kernel ≡ expression formulation (mixed-script fuzz)") {
    val s = spark
    import s.implicits._
    // codepoint blocks spanning routed scripts, shared scripts, digits,
    // space, and an astral block — ties, near-ties and the kana-share
    // boundary all occur across 400 seeded samples
    val blocks = Seq(
      (0x41, 0x5A), (0x430, 0x44F), (0x5D0, 0x5EA), (0x631, 0x64A),
      (0x4E00, 0x4E80), (0x3041, 0x3096), (0xAC00, 0xAC60),
      (0x0B85, 0x0BB5), (0x10D0, 0x10F0), (0x30, 0x39), (0x20, 0x20),
      (0x10330, 0x1034A))
    val rnd = new scala.util.Random(42)
    val texts = (0 until 400).map { _ =>
      val n = rnd.nextInt(40)
      (0 until n).map { _ =>
        val (lo, hi) = blocks(rnd.nextInt(blocks.size))
        new String(Character.toChars(lo + rnd.nextInt(hi - lo + 1)))
      }.mkString
    } :+ "" :+ "7492 8301"
    val rows = texts.toDF("text").select(
      TextOps.langRoute(col("text")).as("k"),
      TextOps.langRouteExpr(col("text")).as("e")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("routedStopwordOk: own-profile gate, script-unique pass, und fails") {
    val s = spark
    import s.implicits._
    def gate(t: String): Boolean =
      Seq(t).toDF("text").select(
        TextOps.routedStopwordOk(TextOps.tokens(col("text")),
          TextOps.langRoute(col("text"))).as("ok")).head().getBoolean(0)
    // profile languages must clear their OWN profile (>= 2 hits)
    assert(gate("the train and the night of it"))          // en, many hits
    assert(!gate("train station platform night"))          // routes en-ish? no:
    // ^ zero stopword hits anywhere -> langId says "und" -> gate false
    assert(gate("我们的火车是在午夜出发了就不等人他们有和我一样的行李箱ノ")) // zh route, 12 zh hits
    // script-unique routes carry no profile and pass
    assert(gate("நாங்கள் இந்த வீட்டில் இல்லை"))
    assert(gate("ひらがなとカタカナ"))
    // und always fails
    assert(!gate("7492 8301"))
  }

  test("ASCII behavior is bit-identical to the old normalizer") {
    // the entire pre-round-10 oracle battery rides on this equivalence
    def old(t: String): String =
      t.toLowerCase.replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    val cases = Seq("The quick, brown FOX!! jumps--over  \t the lazy dog",
      "punct.only,!!", "123 456 789 abc123 9x9", "", "a")
    for (t <- cases)
      assert(one(t, TextOps.normText(col("text"))) == old(t), s"text='$t'")
  }
}
