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

    // ----- crawl pipeline: WARC → parse → HTML extract → token stats -----
    // The composed ingestion front: HTML pages packed into WARC files,
    // container-parsed, main-text extracted and token-counted — one
    // Catalyst plan from archive bytes to per-record corpus stats. The
    // oracle rebuilds the same three stages from doc_id arithmetic, the
    // mirrored extraction chain and the shared normalizer fragment.
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
              |  CAST(len(string_split(trim(regexp_replace(regexp_replace(
              |    lower(clean), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '))
              |    AS BIGINT) AS n_tokens
              |FROM rec""".stripMargin)),
  )
}
