package graft.queries

import graft.operators.{Relational, Web}
import graft.queries.ParityQueries.Q
import org.apache.spark.sql.functions._

/** Web-crawl ingestion queries: WARC container parse (strict + two-layer
  * quarantine), HTML main-text extraction, URL parse + registered domain,
  * and the per-domain curation quota. Fixtures are built in-plan from
  * `documents` with constants shared between the Spark expressions and the
  * DuckDB oracles (the media-table pattern, TextQueries.scala:330) — the
  * oracles restate results from doc_id arithmetic and code points, not by
  * running the operator.
  */
object WebQueries {

  private val RecsPerFile = 5

  // --- HTML fixture fragments (shared verbatim with the oracle SQL) ------
  // Exercises every extraction step: comment, style, script (holding a
  // bare '<'), tags, double-escaped and plain entities, nbsp, whitespace.
  private val H1 = "<html><head><title>Doc "
  private val H2 = "</title><style>p{margin:0;}</style></head><body><!-- doc "
  private val H3 = " --><h1>Report &amp; summary</h1>" +
    "<script type=\"text/javascript\">var x = 1 < 2;</script><p>"
  private val H4 = "</p><div class=\"ft\">footer &lt;"
  private val H5 = "&gt;&nbsp;end</div></body></html>"

  private def htmlFixture = concat(
    lit(H1), col("doc_id"), lit(H2), col("doc_id"), lit(H3), col("text"),
    lit(H4), col("doc_id"), lit(H5))

  private val htmlFixtureSql =
    s"'$H1' || doc_id || '$H2' || doc_id || '$H3' || text || '$H4' || doc_id || '$H5'"

  /** DuckDB mirror of Web.htmlText — same patterns, same order, amp last.
    * Escape-free by construction: the regexes carry backslash classes as
    * literal text (RE2 interprets them), never SQL escapes.
    */
  private[queries] def htmlTextSql(c: String): String = {
    val noBlocks =
      s"regexp_replace(regexp_replace(regexp_replace($c, '(?s)<!--.*?-->', ' ', 'g'), " +
        "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
        "'(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    val noTags = s"regexp_replace($noBlocks, '<[^>]+>', ' ', 'g')"
    val decoded = Web.HtmlEntities.foldLeft(noTags) { case (s, (e, ch)) =>
      val chSql = if (ch == "'") "''" else ch
      s"replace($s, '$e', '$chSql')"
    }
    s"trim(regexp_replace($decoded, '[ \\t\\r\\n]+', ' ', 'g'))"
  }

  // --- URL fixture (shared host table; oracle restates parts from CASE) --
  private val Hosts = Seq(
    "www.example.com", "data.example.co.uk", "cdn.static.example.com",
    "mirror.example.org", "files.example.com.au")
  private val RegDomains = Seq(
    "example.com", "example.co.uk", "example.com", "example.org", "example.com.au")

  private def urlFixture = concat(
    when(col("doc_id") % 4 === 0, lit("http")).otherwise(lit("https")), lit("://"),
    element_at(array(Hosts.map(lit): _*), (col("doc_id") % 5).cast("int") + 1),
    when(col("doc_id") % 3 === 0, lit(":8080")).otherwise(lit("")),
    lit("/docs/"), col("doc_id") % 17, lit("/item"),
    when(col("doc_id") % 2 === 0, concat(lit("?q="), col("doc_id") % 13, lit("&lang=en")))
      .otherwise(lit("")))

  /** Six-anchor page fixture for link extraction: absolute,
    * protocol-relative, root-relative, path-relative, fragment-only,
    * empty — one of each resolution class.
    */
  private def linkHtmlFixture = concat(
    lit("<html><body><a href=\"https://ext.example.net/p/"), col("doc_id") % 23,
    lit("\">x</a><a class=\"m\" href=\"//cdn.example.net/c/"), col("doc_id") % 19,
    lit("\">y</a><a href=\"/local/"), col("doc_id") % 13,
    lit("\">z</a><a href=\"item/"), col("doc_id") % 7,
    lit("\">w</a><a href=\"#frag\">f</a><a href=\"\">e</a></body></html>"))

  /** Four-anchor page for the frontier capstone: shouting-case absolute
    * with a default :443, protocol-relative with a non-default port,
    * root-relative, fragment.
    */
  private def frontierHtmlFixture = concat(
    lit("<html><body><a href=\"HTTPS://Ext.Example.NET:443/p/"), col("doc_id") % 23,
    lit("\">a</a><a href=\"//CDN.example.net:8443/c/"), col("doc_id") % 19,
    lit("\">b</a><a href=\"/Local/"), col("doc_id") % 13,
    lit("\">c</a><a href=\"#frag\">d</a></body></html>"))

  private def caseBy(mod: Int, vals: Seq[String]): String =
    s"CASE CAST(doc_id % $mod AS INT) " +
      vals.zipWithIndex.map { case (v, i) => s"WHEN $i THEN '$v'" }.mkString(" ") + " END"

  private def caseBy5(vals: Seq[String]): String = caseBy(5, vals)

  // --- canonicalization fixture (mixed case/ports/fragments by doc_id) ---
  private val SchemesRaw = Seq("HTTP", "https", "Http") // doc_id%3
  private val CanonSchemes = Seq("http", "https", "http")
  private val HostsRaw = Seq("WWW.Example.COM", "www.example.com",
    "Data.Example.CO.UK", "cdn.example.org") // doc_id%4
  private val PortsRaw = Seq(":80", ":443", ":8080", "", ":80") // doc_id%5

  private def pick(vals: Seq[String], mod: Int) =
    element_at(array(vals.map(lit): _*), (col("doc_id") % mod).cast("int") + 1)

  private def canonFixture = concat(
    pick(SchemesRaw, 3), lit("://"), pick(HostsRaw, 4), pick(PortsRaw, 5),
    when(col("doc_id") % 2 === 1, lit("/A/b")).otherwise(lit("")),
    when(col("doc_id") % 3 === 1, lit("?x=Y")).otherwise(lit("")),
    when(col("doc_id") % 2 === 0, lit("#Sec1")).otherwise(lit("")))

  private def canonFixtureSql: String =
    s"${caseBy(3, SchemesRaw)} || '://' || ${caseBy(4, HostsRaw)} || ${caseBy(5, PortsRaw)} || " +
      "(CASE WHEN doc_id % 2 = 1 THEN '/A/b' ELSE '' END) || " +
      "(CASE WHEN doc_id % 3 = 1 THEN '?x=Y' ELSE '' END) || " +
      "(CASE WHEN doc_id % 2 = 0 THEN '#Sec1' ELSE '' END)"

  /** Expected canonical form, restated from the CASE tables: lowercased
    * scheme/host, default port dropped iff it matches the canonical
    * scheme (:80 survives under https, :443 under http), fragment gone,
    * empty path → "/".
    */
  private def canonExpectedSql: String =
    s"${caseBy(3, CanonSchemes)} || '://' || ${caseBy(4, HostsRaw.map(_.toLowerCase))} || " +
      "(CASE CAST(doc_id % 5 AS INT) WHEN 2 THEN ':8080' WHEN 3 THEN '' " +
      "  WHEN 1 THEN (CASE WHEN doc_id % 3 = 1 THEN '' ELSE ':443' END) " +
      "  ELSE (CASE WHEN doc_id % 3 = 1 THEN ':80' ELSE '' END) END) || " +
      "(CASE WHEN doc_id % 2 = 1 THEN '/A/b' ELSE '/' END) || " +
      "(CASE WHEN doc_id % 3 = 1 THEN '?x=Y' ELSE '' END)"

  val defs: Map[String, Q] = Map(

    // ----- WARC strict parse: container framing under the exact gate -----
    // documents pack 5-per-file into byte-real WARC response records
    // (version magic, typed headers, sha1 block digest, Content-Length
    // body slice, CRLF CRLF terminator); the parser walks every file and
    // must reproduce each record's identity, framing arithmetic and body
    // byte-for-byte. The oracle restates all of it from doc_id arithmetic
    // — a mis-sliced body, off-by-one Content-Length or dropped last
    // record changes rows and hash-fails.
    "q_warc_records" -> Q(
      (s, d) => {
        val files = Web.asWarcTable(s, Td.documents(s, d), "doc_id", "text", RecsPerFile)
        Web.parseWarc(s, files)
      },
      Some(s"""SELECT CAST(doc_id // $RecsPerFile AS BIGINT) AS file_id,
              |  CAST(row_number() OVER (PARTITION BY doc_id // $RecsPerFile
              |    ORDER BY doc_id) - 1 AS INT) AS rec_idx,
              |  'response' AS warc_type,
              |  'https://example.org/doc/' || doc_id AS target_uri,
              |  CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
              |  text AS body
              |FROM documents WHERE text IS NOT NULL""".stripMargin)),

    // ----- WARC two-layer quarantine (container vs record corruption) ----
    // file_id%7 loses its magic's first byte (container layer: the whole
    // file quarantines); otherwise file_id%11 gets the LAST body byte of
    // its LAST record zeroed (position n_bytes-4, just before the CRLF
    // CRLF terminator — framing stays valid, the sha1 block digest
    // catches it, siblings survive). The oracle states all three outcomes
    // per file from doc_id arithmetic + per-doc code-point sums.
    "q_warc_quarantine" -> Q(
      (s, d) => {
        val files = Web.asWarcTable(s, Td.documents(s, d), "doc_id", "text", RecsPerFile)
        val corrupted = files.withColumn("content",
          when(col("file_id") % 7 === 0,
            concat(lit("X".getBytes("US-ASCII")), expr("substring(content, 2)")))
            .when(col("file_id") % 11 === 0,
              expr("overlay(content placing X'00' from n_bytes - 4)"))
            .otherwise(col("content")))
        Web.parseWarcRouted(s, corrupted)
      },
      Some(s"""WITH d AS (SELECT doc_id // $RecsPerFile AS file_id, doc_id,
              |    COALESCE(list_sum([unicode(text[i])
              |      for i in range(1, length(text)+1)]), 0) AS cp
              |  FROM documents WHERE text IS NOT NULL),
              |agg AS (SELECT file_id, CAST(count(*) AS INT) AS nr,
              |    CAST(sum(cp) AS BIGINT) AS s_all,
              |    CAST(max_by(cp, doc_id) AS BIGINT) AS cp_last
              |  FROM d GROUP BY 1)
              |SELECT CAST(file_id AS BIGINT) AS file_id,
              |  CASE WHEN file_id % 7 = 0 THEN CAST(0 AS BOOLEAN)
              |       ELSE CAST(1 AS BOOLEAN) END AS decode_ok,
              |  CASE WHEN file_id % 7 = 0 THEN NULL ELSE nr END AS n_records,
              |  CASE WHEN file_id % 7 = 0 THEN NULL
              |       WHEN file_id % 11 = 0 THEN 1 ELSE 0 END AS n_bad_records,
              |  CASE WHEN file_id % 7 = 0 THEN NULL
              |       WHEN file_id % 11 = 0 THEN s_all - cp_last
              |       ELSE s_all END AS sum_body_cp
              |FROM agg""".stripMargin)),

    // ----- member-gzipped WARC (the production crawl-archive layout) -----
    // Same records, now one gzip member per record concatenated per file
    // (RFC 1952 framing, raw deflate, CRC32 + ISIZE trailers) — the
    // layout that keeps every record independently decompressable. The
    // record surface is identical to q_warc_records BY DESIGN (compression
    // must be transparent), so the oracle is the same restatement; a
    // mis-walked member boundary or header-flag skip shifts a record and
    // hash-fails.
    "q_warc_gz_records" -> Q(
      (s, d) => {
        val files = Web.asWarcGzTable(s, Td.documents(s, d), "doc_id", "text", RecsPerFile)
        Web.parseWarcGz(s, files)
      },
      Some(s"""SELECT CAST(doc_id // $RecsPerFile AS BIGINT) AS file_id,
              |  CAST(row_number() OVER (PARTITION BY doc_id // $RecsPerFile
              |    ORDER BY doc_id) - 1 AS INT) AS rec_idx,
              |  'response' AS warc_type,
              |  'https://example.org/doc/' || doc_id AS target_uri,
              |  CAST(octet_length(encode(text)) AS BIGINT) AS content_length,
              |  text AS body
              |FROM documents WHERE text IS NOT NULL""".stripMargin)),

    // ----- gz quarantine with member resync ------------------------------
    // file_id%7 loses the leading gzip magic (wholesale quarantine);
    // otherwise file_id%11 gets its LAST byte flipped to 0xFF — the final
    // member's ISIZE high byte (always 0x00 for these sizes), so that
    // member fails trailer verification as ONE corruption episode while
    // every earlier member survives the resync walk.
    "q_warc_gz_quarantine" -> Q(
      (s, d) => {
        val files = Web.asWarcGzTable(s, Td.documents(s, d), "doc_id", "text", RecsPerFile)
        val corrupted = files.withColumn("content",
          when(col("file_id") % 7 === 0,
            concat(lit("X".getBytes("US-ASCII")), expr("substring(content, 2)")))
            .when(col("file_id") % 11 === 0,
              expr("overlay(content placing X'FF' from n_bytes)"))
            .otherwise(col("content")))
        Web.parseWarcGzRouted(s, corrupted)
      },
      Some(s"""WITH d AS (SELECT doc_id // $RecsPerFile AS file_id, doc_id,
              |    COALESCE(list_sum([unicode(text[i])
              |      for i in range(1, length(text)+1)]), 0) AS cp
              |  FROM documents WHERE text IS NOT NULL),
              |agg AS (SELECT file_id, CAST(count(*) AS INT) AS nr,
              |    CAST(sum(cp) AS BIGINT) AS s_all,
              |    CAST(max_by(cp, doc_id) AS BIGINT) AS cp_last
              |  FROM d GROUP BY 1)
              |SELECT CAST(file_id AS BIGINT) AS file_id,
              |  CASE WHEN file_id % 7 = 0 THEN CAST(0 AS BOOLEAN)
              |       ELSE CAST(1 AS BOOLEAN) END AS decode_ok,
              |  CASE WHEN file_id % 7 = 0 THEN NULL ELSE nr END AS n_records,
              |  CASE WHEN file_id % 7 = 0 THEN NULL
              |       WHEN file_id % 11 = 0 THEN 1 ELSE 0 END AS n_bad_records,
              |  CASE WHEN file_id % 7 = 0 THEN NULL
              |       WHEN file_id % 11 = 0 THEN s_all - cp_last
              |       ELSE s_all END AS sum_body_cp
              |FROM agg""".stripMargin)),

    // ----- HTML main-text extraction -------------------------------------
    // Each doc wraps into a page exercising every elision step; the
    // extraction is a pure codegen'd regexp/replace chain (zero shuffle —
    // scan speed on 100 TB of pages). Oracle mirrors the chain from the
    // same pattern constants over the same fixture fragments.
    "q_html_extract" -> Q(
      (s, d) => Td.documents(s, d)
        .select(col("doc_id"), Web.htmlText(htmlFixture).as("clean_text"))
        .withColumn("n_chars_clean", length(col("clean_text")).cast("long")),
      Some(s"""SELECT doc_id, ${htmlTextSql(s"($htmlFixtureSql)")} AS clean_text,
              |  CAST(length(${htmlTextSql(s"($htmlFixtureSql)")}) AS BIGINT) AS n_chars_clean
              |FROM documents""".stripMargin)),

    // ----- URL structural parse + registered domain ----------------------
    // URLs generated from doc_id arithmetic cover scheme/port/query
    // presence × 5 hosts including two-label public suffixes; the oracle
    // restates every part directly from the CASE arithmetic (first
    // principles), never touching a regex — an off-by-one capture group
    // or suffix-table miss hash-fails.
    "q_url_parse" -> Q(
      (s, d) => Web.withUrlParts(
        Td.documents(s, d).select(col("doc_id"), urlFixture.as("url")), "url")
        .select("doc_id", "url", "scheme", "host", "port", "path", "query", "reg_domain"),
      Some(s"""SELECT doc_id,
              |  (CASE WHEN doc_id % 4 = 0 THEN 'http' ELSE 'https' END) || '://' ||
              |    ${caseBy5(Hosts)} ||
              |    (CASE WHEN doc_id % 3 = 0 THEN ':8080' ELSE '' END) ||
              |    '/docs/' || (doc_id % 17) || '/item' ||
              |    (CASE WHEN doc_id % 2 = 0
              |          THEN '?q=' || (doc_id % 13) || '&lang=en' ELSE '' END) AS url,
              |  CASE WHEN doc_id % 4 = 0 THEN 'http' ELSE 'https' END AS scheme,
              |  ${caseBy5(Hosts)} AS host,
              |  CAST(CASE WHEN doc_id % 3 = 0 THEN 8080 END AS INT) AS port,
              |  '/docs/' || (doc_id % 17) || '/item' AS path,
              |  CASE WHEN doc_id % 2 = 0
              |       THEN 'q=' || (doc_id % 13) || '&lang=en' END AS query,
              |  ${caseBy5(RegDomains)} AS reg_domain
              |FROM documents""".stripMargin)),

    // ----- crawl-frontier URL canonicalization ---------------------------
    // Mixed-case schemes/hosts, default and non-default ports, fragments
    // and empty paths, generated from doc_id arithmetic; the oracle
    // restates the canonical form from the same CASE table (first
    // principles — no regex on the oracle side), plus a window count of
    // how many corpus URLs collapse onto each canonical form (the
    // frontier-dedup composition — every row must canonicalize exactly
    // for any count to match).
    "q_url_canonical" -> Q(
      (s, d) => {
        val raw = Td.documents(s, d).select(col("doc_id"), canonFixture.as("url"))
        raw.withColumn("canon_url", Web.canonicalizeUrl(col("url")))
          .withColumn("n_same_canon",
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("canon_url"))))
      },
      Some(s"""WITH u AS (SELECT doc_id, $canonFixtureSql AS url,
              |    $canonExpectedSql AS canon_url
              |  FROM documents)
              |SELECT doc_id, url, canon_url,
              |  CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS n_same_canon
              |FROM u""".stripMargin)),

    // ----- per-registered-domain curation quota --------------------------
    // The quota composition a crawl curation pass runs: parse URLs, group
    // by registered domain (3 hosts collapse into example.com — the whole
    // point of the suffix-aware key), keep the 25 longest docs per domain.
    "q_domain_quota" -> Q(
      (s, d) => {
        val parsed = Web.withUrlParts(
          Td.documents(s, d).select(col("doc_id"), col("n_chars"), urlFixture.as("url")),
          "url")
        Relational.capPerGroup(parsed.select("doc_id", "reg_domain", "n_chars"),
          Seq("reg_domain"), Seq(col("n_chars").desc_nulls_last, col("doc_id").asc), n = 25)
      },
      Some(s"""SELECT doc_id, reg_domain, n_chars FROM (
              |  SELECT doc_id, ${caseBy5(RegDomains)} AS reg_domain, n_chars,
              |    row_number() OVER (PARTITION BY ${caseBy5(RegDomains)}
              |      ORDER BY n_chars DESC, doc_id) AS rn
              |  FROM documents) t WHERE rn <= 25""".stripMargin)),

    // ----- anchor extraction + reference resolution ----------------------
    // Six anchors per page cover the RFC 3986 §5 resolution subset:
    // absolute (passes through), protocol-relative (takes the base
    // scheme), root-relative (takes the base origin incl. port),
    // path-relative (resolves against the base directory — the 'item'
    // leaf of the base path must be stripped), fragment-only and empty
    // (dropped). The oracle restates every resolved URL from doc_id
    // arithmetic — a wrong base directory or a kept fragment link
    // changes rows and hash-fails.
    "q_link_extract" -> Q(
      (s, d) => {
        val pages = Td.documents(s, d).select(col("doc_id"),
          linkHtmlFixture.as("page"), urlFixture.as("base_url"))
        Web.extractLinks(pages, "doc_id", "page", "base_url")
      },
      Some(s"""WITH b AS (SELECT doc_id,
              |    (CASE WHEN doc_id % 4 = 0 THEN 'http' ELSE 'https' END) AS sch,
              |    (CASE WHEN doc_id % 4 = 0 THEN 'http' ELSE 'https' END) || '://' ||
              |      ${caseBy5(Hosts)} ||
              |      (CASE WHEN doc_id % 3 = 0 THEN ':8080' ELSE '' END) AS origin
              |  FROM documents)
              |SELECT doc_id, CAST(0 AS INT) AS link_idx,
              |  'https://ext.example.net/p/' || (doc_id % 23) AS href,
              |  'https://ext.example.net/p/' || (doc_id % 23) AS resolved FROM b
              |UNION ALL SELECT doc_id, 1,
              |  '//cdn.example.net/c/' || (doc_id % 19),
              |  sch || '://cdn.example.net/c/' || (doc_id % 19) FROM b
              |UNION ALL SELECT doc_id, 2,
              |  '/local/' || (doc_id % 13),
              |  origin || '/local/' || (doc_id % 13) FROM b
              |UNION ALL SELECT doc_id, 3,
              |  'item/' || (doc_id % 7),
              |  origin || '/docs/' || (doc_id % 17) || '/item/' || (doc_id % 7) FROM b"""
        .stripMargin)),

    // ----- robots.txt allowance (RFC 9309 longest-match) -----------------
    // Four domains, four rule shapes: plain disallow-all-docs with a
    // deeper allow carve-out (longest match flips it), a single narrow
    // disallow (which also catches /docs/1x via prefix semantics — the
    // classic robots gotcha, deliberately pinned), an empty group
    // (allowed by default), and allow+disallow at different depths. The
    // oracle restates allowance and the matched prefix per doc from
    // (domain CASE × path arithmetic).
    "q_robots_filter" -> Q(
      (s, d) => {
        import s.implicits._
        val urls = Web.withUrlParts(
          Td.documents(s, d).select(col("doc_id"), urlFixture.as("url")), "url")
        val rules = Seq(
          ("example.com", "disallow", "/docs/"),
          ("example.com", "allow", "/docs/3/"),
          ("example.co.uk", "disallow", "/docs/7"),
          ("example.com.au", "allow", "/docs/"),
          ("example.com.au", "disallow", "/docs/1"),
        ).toDF("reg_domain", "rule", "path_prefix")
        Web.robotsAllow(urls, "doc_id", "reg_domain", "path", rules)
      },
      Some(s"""SELECT doc_id, ${caseBy5(RegDomains)} AS reg_domain,
              |  '/docs/' || (doc_id % 17) || '/item' AS path,
              |  CASE CAST(doc_id % 5 AS INT)
              |    WHEN 1 THEN (doc_id % 17) != 7
              |    WHEN 3 THEN CAST(1 AS BOOLEAN)
              |    WHEN 4 THEN NOT ((doc_id % 17) = 1 OR (doc_id % 17) >= 10)
              |    ELSE (doc_id % 17) = 3 END AS allowed,
              |  CASE CAST(doc_id % 5 AS INT)
              |    WHEN 1 THEN (CASE WHEN (doc_id % 17) = 7 THEN '/docs/7' END)
              |    WHEN 3 THEN NULL
              |    WHEN 4 THEN (CASE WHEN (doc_id % 17) = 1 OR (doc_id % 17) >= 10
              |                 THEN '/docs/1' ELSE '/docs/' END)
              |    ELSE (CASE WHEN (doc_id % 17) = 3 THEN '/docs/3/' ELSE '/docs/' END)
              |  END AS matched_prefix
              |FROM documents""".stripMargin)),

    // ----- frontier expansion: links → canonicalize → robots → quota -----
    // The crawl-frontier capstone, one Catalyst plan: pages emit three
    // live links each (a SHOUTING-case absolute with a default :443 to
    // strip, a protocol-relative one with a non-default port to keep, a
    // root-relative one against the base origin) plus a dropped
    // fragment; resolved links canonicalize, robots rules kill the /c/
    // namespace and the /Local/1 prefix class, survivors dedup by
    // canonical form and a 10-per-registered-domain quota caps the
    // frontier. The oracle rebuilds the surviving set from doc_id
    // arithmetic and re-derives dedup + quota relationally.
    "q_frontier_expand" -> Q(
      (s, d) => {
        import s.implicits._
        val pages = Td.documents(s, d).select(col("doc_id"),
          frontierHtmlFixture.as("page"), urlFixture.as("base_url"))
        val links = Web.extractLinks(pages, "doc_id", "page", "base_url")
          .withColumn("canon_url", Web.canonicalizeUrl(col("resolved")))
        val parsed = Web.withUrlParts(links.select("doc_id", "canon_url"), "canon_url")
        val rules = Seq(
          ("example.net", "disallow", "/c/"),
          ("example.com", "disallow", "/Local/1"),
        ).toDF("reg_domain", "rule", "path_prefix")
        // the canonical URL is the natural row identity here — robots
        // verdicts are a function of (domain, path), so identical links
        // collapsing inside robotsAllow's per-id window is exactly the
        // dedup the frontier wants anyway
        val judged = Web.robotsAllow(parsed, "canon_url", "reg_domain", "path", rules)
        Relational.capPerGroup(
          judged.filter(col("allowed")).select("reg_domain", "canon_url").distinct(),
          Seq("reg_domain"), Seq(col("canon_url").asc), n = 10)
      },
      Some(s"""WITH base AS (SELECT doc_id,
              |    (CASE WHEN doc_id % 4 = 0 THEN 'http' ELSE 'https' END) AS sch,
              |    ${caseBy5(Hosts)} AS host,
              |    (CASE WHEN doc_id % 3 = 0 THEN ':8080' ELSE '' END) AS prt,
              |    ${caseBy5(RegDomains)} AS bdom
              |  FROM documents),
              |links AS (
              |  SELECT 'example.net' AS reg_domain,
              |    'https://ext.example.net/p/' || (doc_id % 23) AS canon_url,
              |    '/p/' || (doc_id % 23) AS path FROM base
              |  UNION ALL SELECT 'example.net',
              |    sch || '://cdn.example.net:8443/c/' || (doc_id % 19),
              |    '/c/' || (doc_id % 19) FROM base
              |  UNION ALL SELECT bdom,
              |    sch || '://' || host || prt || '/Local/' || (doc_id % 13),
              |    '/Local/' || (doc_id % 13) FROM base),
              |alw AS (SELECT reg_domain, canon_url FROM links
              |  WHERE NOT (reg_domain = 'example.net' AND path LIKE '/c/%')
              |    AND NOT (reg_domain = 'example.com' AND path LIKE '/Local/1%')),
              |ded AS (SELECT DISTINCT reg_domain, canon_url FROM alw)
              |SELECT reg_domain, canon_url FROM (
              |  SELECT reg_domain, canon_url, row_number() OVER (
              |    PARTITION BY reg_domain ORDER BY canon_url) AS rn FROM ded) t
              |WHERE rn <= 10""".stripMargin)),

    // ----- crawl pipeline: WARC → parse → HTML extract → token stats -----
    // The composed ingestion front: HTML pages packed into WARC files,
    // container-parsed, main-text extracted and token-counted — one
    // Catalyst plan from archive bytes to per-record corpus stats. The
    // oracle rebuilds the same three stages from doc_id arithmetic, the
    // mirrored extraction chain and the shared normalizer fragment.
    // ----- search-engine capstone: crawl archive → extracted corpus → BM25 --
    // The web and retrieval families composed end to end in ONE plan: WARC
    // containers parsed, every record's HTML main text extracted, and the
    // resulting corpus BM25-ranked for the battery's shared 4-term query.
    // The oracle rebuilds the whole chain — record restatement from doc_id
    // arithmetic, the mirrored extraction chain, then the full fixed-point
    // BM25 over the EXTRACTED text — so a drifted byte anywhere in the
    // pipeline (a mis-framed record, a swallowed tag, one df off) moves an
    // integer score cell and hash-fails.
    "q_search_capstone" -> Q(
      (s, d) => {
        val pages = Td.documents(s, d).select(col("doc_id"), htmlFixture.as("page"))
        val files = Web.asWarcTable(s, pages, "doc_id", "page", RecsPerFile)
        val corpus = Web.parseWarc(s, files).select(
          regexp_extract(col("target_uri"), "doc/(\\d+)$", 1).cast("long").as("doc_id"),
          Web.htmlText(col("body")).as("clean"))
        graft.operators.Retrieval.bm25TopK(corpus, "doc_id", "clean",
          TextQueries.Bm25Terms, k = 10)
      },
      Some(s"""WITH rec AS (
              |  SELECT doc_id, ${htmlTextSql(s"($htmlFixtureSql)")} AS clean
              |  FROM documents WHERE text IS NOT NULL),
              |${TextQueries.bm25CoreSql(TextQueries.Bm25Terms, from = "rec", textExpr = "clean")}
              |SELECT doc_id, n_terms, score_fp, CAST(rank AS INT) AS rank
              |FROM r WHERE rank <= 10""".stripMargin)),

    "q_warc_pipeline" -> Q(
      (s, d) => {
        val pages = Td.documents(s, d).select(col("doc_id"), htmlFixture.as("page"))
        val files = Web.asWarcTable(s, pages, "doc_id", "page", RecsPerFile)
        val recs = Web.parseWarc(s, files)
        recs.select(col("file_id"), col("rec_idx"), col("target_uri"),
            Web.htmlText(col("body")).as("clean"))
          .select(col("file_id"), col("rec_idx"), col("target_uri"),
            length(col("clean")).cast("long").as("n_chars_clean"),
            size(graft.operators.TextOps.tokens(col("clean"))).cast("long").as("n_tokens"))
      },
      Some(s"""WITH rec AS (
              |  SELECT CAST(doc_id // $RecsPerFile AS BIGINT) AS file_id,
              |    CAST(row_number() OVER (PARTITION BY doc_id // $RecsPerFile
              |      ORDER BY doc_id) - 1 AS INT) AS rec_idx,
              |    'https://example.org/doc/' || doc_id AS target_uri,
              |    ${htmlTextSql(s"($htmlFixtureSql)")} AS clean
              |  FROM documents WHERE text IS NOT NULL)
              |SELECT file_id, rec_idx, target_uri,
              |  CAST(length(clean) AS BIGINT) AS n_chars_clean,
              |  CAST(len(string_split(${TextQueries.normSqlOf("clean")}, ' '))
              |    AS BIGINT) AS n_tokens
              |FROM rec""".stripMargin)),
  )
}
