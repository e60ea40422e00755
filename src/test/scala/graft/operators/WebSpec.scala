package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the web-ingestion contracts the driver corpus cannot exercise:
  * WARC framing edges (multi-record walk, unknown headers, empty body,
  * digest catch, strict-throw vs routed-quarantine split), the HTML
  * elision/entity-order rules, and URL parse structure incl. the
  * public-suffix table.
  */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def warcOf(recs: (String, String)*): Array[Byte] =
    Web.encodeWarcFile(recs.map { case (u, b) => (u, b.getBytes("UTF-8")) })

  // ---------------- WARC strict parse ----------------

  test("parseWarc walks a multi-record file and reproduces identity + body") {
    val bytes = warcOf(
      "https://a/0" -> "hello world",
      "https://a/1" -> "", // empty body is legal
      "https://a/2" -> "third record body")
    val df = Seq((7L, bytes)).toDF("file_id", "content")
    val out = Web.parseWarc(spark, df).orderBy("rec_idx").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("target_uri")).toSeq ==
      Seq("https://a/0", "https://a/1", "https://a/2"))
    assert(out.map(_.getAs[String]("body")).toSeq ==
      Seq("hello world", "", "third record body"))
    assert(out.map(_.getAs[Long]("content_length")).toSeq == Seq(11L, 0L, 17L))
    assert(out.forall(_.getAs[String]("warc_type") == "response"))
  }

  test("parseWarc tolerates unknown headers, multibyte bodies count bytes not chars") {
    // Splice an extra header into a record by rebuilding it manually.
    val body = "café" // 5 bytes UTF-8, 4 chars
    val rec = new String(warcOf("https://a/x" -> body), "ISO-8859-1")
      .replaceFirst("WARC-Type", "X-Custom: v\r\nWARC-Type")
    val df = Seq((1L, rec.getBytes("ISO-8859-1"))).toDF("file_id", "content")
    val out = Web.parseWarc(spark, df).collect()
    assert(out.head.getAs[Long]("content_length") == 5L)
    assert(out.head.getAs[String]("body") == body)
  }

  test("parseWarc throws on bad magic, truncation, and digest mismatch") {
    val good = warcOf("https://a/0" -> "hello world")
    def run(b: Array[Byte]): Unit =
      Web.parseWarc(spark, Seq((1L, b)).toDF("file_id", "content")).collect()
    // bad magic
    val badMagic = good.clone(); badMagic(0) = 'X'
    assertThrows[org.apache.spark.SparkException](run(badMagic))
    // truncated mid-body
    assertThrows[org.apache.spark.SparkException](run(good.dropRight(6)))
    // body flip → digest mismatch (framing still valid)
    val flipped = good.clone(); flipped(good.length - 5) = 'X'
    assertThrows[org.apache.spark.SparkException](run(flipped))
  }

  // ---------------- WARC routed quarantine ----------------

  test("parseWarcRouted: container fault routes the file, digest fault counts the record") {
    val good = warcOf("https://a/0" -> "ab", "https://a/1" -> "cd", "https://a/2" -> "ef")
    val badMagic = good.clone(); badMagic(0) = 'X'
    // flip the LAST body byte ('f' of record 2) — siblings must survive
    val flipped = good.clone(); flipped(good.length - 5) = 'X'
    val df = Seq((0L, good), (1L, badMagic), (2L, flipped), (3L, null))
      .toDF("file_id", "content")
    val out = Web.parseWarcRouted(spark, df).orderBy("file_id").collect()
    val Seq(g, bm, fl, nl) = out.toSeq
    assert(g.getAs[Boolean]("decode_ok") && g.getAs[Int]("n_records") == 3 &&
      g.getAs[Int]("n_bad_records") == 0 &&
      g.getAs[Long]("sum_body_cp") == "abcdef".map(_.toLong).sum)
    assert(!bm.getAs[Boolean]("decode_ok") && bm.isNullAt(bm.fieldIndex("n_records")))
    assert(fl.getAs[Boolean]("decode_ok") && fl.getAs[Int]("n_records") == 3 &&
      fl.getAs[Int]("n_bad_records") == 1 &&
      fl.getAs[Long]("sum_body_cp") == "abcd".map(_.toLong).sum)
    assert(nl.isNullAt(nl.fieldIndex("decode_ok")))
  }

  test("parseWarcRouted quarantines on Content-Length past EOF and malformed header") {
    val lied = new String(warcOf("https://a/0" -> "ab"), "ISO-8859-1")
      .replaceFirst("Content-Length: 2", "Content-Length: 9999")
    val noColon = new String(warcOf("https://a/0" -> "ab"), "ISO-8859-1")
      .replaceFirst("WARC-Type: response", "WARC-Type response XX")
    val df = Seq((0L, lied.getBytes("ISO-8859-1")), (1L, noColon.getBytes("ISO-8859-1")))
      .toDF("file_id", "content")
    val out = Web.parseWarcRouted(spark, df).collect()
    assert(out.forall(r => !r.getAs[Boolean]("decode_ok")))
  }

  // ---------------- gzip-member WARC ----------------

  private def gzFileOf(recs: (String, String)*): Array[Byte] =
    recs.map { case (u, b) =>
      Web.gzipMember(Web.warcRecord(u, b.getBytes("UTF-8")))
    }.reduce(_ ++ _)

  test("parseWarcGz walks concatenated members; records match the plain parse") {
    val bytes = gzFileOf("https://a/0" -> "hello world", "https://a/1" -> "",
      "https://a/2" -> "third record body")
    val df = Seq((7L, bytes)).toDF("file_id", "content")
    val out = Web.parseWarcGz(spark, df).orderBy("rec_idx").collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[String]("body")).toSeq ==
      Seq("hello world", "", "third record body"))
    assert(out.map(_.getAs[Long]("content_length")).toSeq == Seq(11L, 0L, 17L))
  }

  test("parseWarcGz throws on CRC and trailer corruption") {
    val good = gzFileOf("https://a/0" -> "hello world")
    def run(b: Array[Byte]): Unit =
      Web.parseWarcGz(spark, Seq((1L, b)).toDF("file_id", "content")).collect()
    val isize = good.clone(); isize(good.length - 1) = 0xFF.toByte
    assertThrows[org.apache.spark.SparkException](run(isize))
    val crc = good.clone(); crc(good.length - 6) = (crc(good.length - 6) ^ 0x5A).toByte
    assertThrows[org.apache.spark.SparkException](run(crc))
    assertThrows[org.apache.spark.SparkException](run(good.dropRight(3)))
  }

  test("parseWarcGzRouted: resync recovers members behind a corrupt one, one episode each") {
    val m0 = Web.gzipMember(Web.warcRecord("https://a/0", "ab".getBytes("UTF-8")))
    val m1 = Web.gzipMember(Web.warcRecord("https://a/1", "cd".getBytes("UTF-8")))
    val m2 = Web.gzipMember(Web.warcRecord("https://a/2", "ef".getBytes("UTF-8")))
    // corrupt the MIDDLE member's deflate region → m2 must survive resync
    val mid = m1.clone(); mid(14) = (mid(14) ^ 0x55).toByte
    val bytes = m0 ++ mid ++ m2
    val df = Seq((0L, bytes)).toDF("file_id", "content")
    val r = Web.parseWarcGzRouted(spark, df).collect().head
    assert(r.getAs[Boolean]("decode_ok"))
    assert(r.getAs[Int]("n_records") == 3 && r.getAs[Int]("n_bad_records") == 1)
    assert(r.getAs[Long]("sum_body_cp") == "abef".map(_.toLong).sum)
    // corrupt LAST member's trailer: earlier members unaffected, episode at tail
    val tail = (m0 ++ m1 ++ m2).clone(); tail(tail.length - 1) = 0xFF.toByte
    val r2 = Web.parseWarcGzRouted(spark,
      Seq((1L, tail)).toDF("file_id", "content")).collect().head
    assert(r2.getAs[Int]("n_records") == 3 && r2.getAs[Int]("n_bad_records") == 1)
    assert(r2.getAs[Long]("sum_body_cp") == "abcd".map(_.toLong).sum)
    // no leading magic → wholesale quarantine
    val noMagic = (m0 ++ m1).clone(); noMagic(0) = 'X'
    val r3 = Web.parseWarcGzRouted(spark,
      Seq((2L, noMagic)).toDF("file_id", "content")).collect().head
    assert(!r3.getAs[Boolean]("decode_ok"))
  }

  test("gzip member round-trip honors optional header fields") {
    // splice FNAME flag + a name into a member by hand: FLG bit 3, then
    // the zero-terminated name after the 10-byte header
    val m = Web.gzipMember(Web.warcRecord("https://a/0", "payload x".getBytes("UTF-8")))
    val withName = m.take(3) ++ Array[Byte](8) ++ m.slice(4, 10) ++
      "rec.warc".getBytes("US-ASCII") ++ Array[Byte](0) ++ m.drop(10)
    val out = Web.parseWarcGz(spark,
      Seq((1L, withName)).toDF("file_id", "content")).collect()
    assert(out.head.getAs[String]("body") == "payload x")
  }

  // ---------------- HTML extraction ----------------

  private def html(s: String): String = {
    val df = Seq(Tuple1(s)).toDF("h")
    df.select(Web.htmlText(col("h")).as("t")).collect().head.getAs[String]("t")
  }

  test("htmlText strips comments, script/style subtrees, tags; collapses whitespace") {
    assert(html("<p>a</p>\n\t<p>b</p>") == "a b")
    assert(html("x<!-- multi\nline <p>comment</p> -->y") == "x y")
    assert(html("a<script>if (1 < 2) { x = '<p>'; }</script>b") == "a b")
    assert(html("a<style>p > span { color: red }</style>b") == "a b")
    assert(html("<SCRIPT src=\"x\">s</SCRIPT>k") == "k") // case-insensitive + attrs
    assert(html("<div class=\"a\"><span>nested</span></div>") == "nested")
  }

  test("htmlText entity decode: amp last, so double-escapes single-decode") {
    assert(html("a &amp; b") == "a & b")
    assert(html("&lt;tag&gt;") == "<tag>")
    assert(html("&amp;lt;") == "&lt;") // NOT "<" — the serializer order
    assert(html("a&nbsp;&nbsp;b") == "a b")
    assert(html("&quot;q&quot; &#39;s&#39;") == "\"q\" 's'")
  }

  // ---------------- URL parse ----------------

  private def parts(u: String): Map[String, Any] = {
    val df = Seq(Tuple1(u)).toDF("url")
    val r = Web.withUrlParts(df, "url").collect().head
    r.schema.fieldNames.map(n => n -> (if (r.isNullAt(r.fieldIndex(n))) null else r.get(r.fieldIndex(n)))).toMap
  }

  test("urlParts extracts scheme/host/port/path/query") {
    val p = parts("https://data.example.co.uk:8443/a/b?x=1&y=2")
    assert(p("scheme") == "https" && p("host") == "data.example.co.uk")
    assert(p("port") == 8443 && p("path") == "/a/b" && p("query") == "x=1&y=2")
    assert(p("reg_domain") == "example.co.uk") // two-label public suffix → 3 labels
    val q = parts("http://www.example.com/only/path")
    assert(q("port") == null && q("query") == null && q("reg_domain") == "example.com")
  }

  test("urlParts edges: bare 2-label host, single label, empty path, fragment-free query") {
    assert(parts("https://example.org")("reg_domain") == "example.org")
    assert(parts("https://localhost:9000/x")("reg_domain") == "localhost")
    assert(parts("https://example.org")("path") == "")
    assert(parts("https://a.example.com/p?k=v#frag")("query") == "k=v")
  }

  // ---------------- URL canonicalization ----------------

  private def canon(u: String): String = {
    val df = Seq(Tuple1(u)).toDF("url")
    df.select(Web.canonicalizeUrl(col("url")).as("c")).collect().head.getString(0)
  }

  // ---------------- link extraction + robots ----------------

  test("extractLinks: resolution classes, no-anchor pages, bare-origin base") {
    val df = Seq(
      (1L, """<p>no links</p>""", "https://h.example/a/b"),
      (2L, """<a href="x/y">r</a>""", "https://h.example"), // base path '' → dir '/'
      (3L, """<a href="#s">f</a><a href="">e</a>""", "https://h.example/p"),
    ).toDF("id", "page", "base")
    val out = Web.extractLinks(df, "id", "page", "base").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("resolved"))).toSeq
    assert(out == Seq((2L, "https://h.example/x/y"))) // 1: none; 3: both dropped
  }

  test("robotsAllow: allow wins length ties, unmatched and group-less domains pass") {
    val urls = Seq(
      (1L, "a.com", "/p/x"), (2L, "a.com", "/q/x"), (3L, "b.org", "/p/x"))
      .toDF("id", "dom", "path")
    val rules = Seq(
      ("a.com", "disallow", "/p/"), ("a.com", "allow", "/p/")) // same length tie
      .toDF("reg_domain", "rule", "path_prefix")
    val out = Web.robotsAllow(urls, "id", "dom", "path", rules)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("allowed"), Option(r.getAs[String]("matched_prefix")))).toMap
    assert(out(1L) == ((true, Some("/p/")))) // tie → 'allow' < 'disallow'
    assert(out(2L) == ((true, None)))        // group exists, nothing matches
    assert(out(3L) == ((true, None)))        // no group at all
  }

  test("canonicalizeUrl: case, default ports, fragments, empty path") {
    assert(canon("HTTP://WWW.Example.COM:80/A/b#x") == "http://www.example.com/A/b")
    assert(canon("https://Host.Example.org:443") == "https://host.example.org/")
    // :80 is only default for http — https keeps it (and vice versa)
    assert(canon("https://h.example:80/p") == "https://h.example:80/p")
    assert(canon("http://h.example:443/p") == "http://h.example:443/p")
    assert(canon("http://h.example:8080/p?Q=V#frag") == "http://h.example:8080/p?Q=V")
    // path and query case preserved; fragment-only difference collapses
    assert(canon("Http://E.com/Path?K=V#a") == canon("http://e.COM/Path?K=V#b"))
    assert(canon("http://e.com/Path") != canon("http://e.com/path"))
  }
}
