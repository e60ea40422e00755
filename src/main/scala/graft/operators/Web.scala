package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Web-crawl ingestion: the raw-web front of an LLM data pipeline.
  *
  * Reference scope: the reference ingests pre-extracted change feeds
  * (SURVEY §2.1); a training-data engine at 100 TB starts one stage
  * earlier, at the crawl archive. Three operators close that gap:
  *
  *  - WARC container parse (ISO 28500 record framing: version magic,
  *    named headers, Content-Length body slice, block digest) — the
  *    standard archive format crawled corpora arrive in. Follows the
  *    repo's codec contract: strict parse THROWS for direct callers,
  *    `parseWarcRouted` quarantines instead (container-level corruption
  *    routes the whole file, record-level digest mismatches are counted
  *    and excluded while sibling records survive — the AVI two-layer
  *    shape, Multimodal.scala:858).
  *  - HTML main-text extraction (comment/script/style elision, tag
  *    strip, entity decode, whitespace collapse) — pure codegen'd
  *    `regexp_replace`/`replace` chain, zero shuffle, so it runs at
  *    scan speed on 100 TB of pages.
  *  - URL structural parse + registered-domain extraction (two-label
  *    public-suffix table) — the group key for per-domain curation
  *    quotas and crawl politeness rollups.
  *
  * Scale shape: WARC files parse independently (mapPartitions, no
  * shuffle; one output row per record via a lazy iterator — a 1 GB
  * archive member never materializes as a Seq); HTML/URL ops are
  * per-row expressions. Nothing here shuffles at all — the downstream
  * dedup/quality operators decide the partitioning.
  */
object Web {

  // ---------------------------------------------------------------------
  // WARC container
  // ---------------------------------------------------------------------

  val CrLf = "\r\n"
  val WarcMagic = "WARC/1.0"

  val warcFileSchema: StructType = StructType(Seq(
    StructField("file_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("n_bytes", LongType),
  ))

  val warcRecordSchema: StructType = StructType(Seq(
    StructField("file_id", LongType, nullable = false),
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType),
    StructField("target_uri", StringType),
    StructField("content_length", LongType),
    StructField("body", StringType),
  ))

  val warcRoutedSchema: StructType = StructType(Seq(
    StructField("file_id", LongType, nullable = false),
    StructField("decode_ok", BooleanType),
    StructField("n_records", IntegerType),
    StructField("n_bad_records", IntegerType),
    StructField("sum_body_cp", LongType),
  ))

  private def sha1Hex(bytes: Array[Byte], off: Int, len: Int): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
    d.update(bytes, off, len)
    d.digest().map(b => f"${b & 0xFF}%02x").mkString
  }

  /** One WARC record: version line, named headers, blank line, body,
    * blank-line terminator. `WARC-Block-Digest` (labelled sha1, hex
    * payload) is what lets the routed parser catch body corruption —
    * WARC has no other in-band integrity check.
    */
  private[graft] def warcRecord(uri: String, body: Array[Byte]): Array[Byte] = {
    val header =
      s"$WarcMagic$CrLf" +
        s"WARC-Type: response$CrLf" +
        s"WARC-Target-URI: $uri$CrLf" +
        s"WARC-Block-Digest: sha1:${sha1Hex(body, 0, body.length)}$CrLf" +
        s"Content-Length: ${body.length}$CrLf" +
        CrLf
    val h = header.getBytes("US-ASCII")
    val out = new Array[Byte](h.length + body.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(body, 0, out, h.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Concatenate records into one WARC file body. */
  def encodeWarcFile(records: Seq[(String, Array[Byte])]): Array[Byte] = {
    val encoded = records.map { case (uri, body) => warcRecord(uri, body) }
    val out = new Array[Byte](encoded.map(_.length).sum)
    var pos = 0
    encoded.foreach { r => System.arraycopy(r, 0, out, pos, r.length); pos += r.length }
    out
  }

  /** Deterministic URI for fixture records (shared with the oracle). */
  def fixtureUri(docId: Long): String = s"https://example.org/doc/$docId"

  /** Pack an (id, text) frame into REAL WARC files: file_id =
    * id / recordsPerFile, records ordered by id within the file, each
    * body the UTF-8 text bytes under `fixtureUri(id)`. Null-text rows
    * are excluded (a crawl archive has no "null page"). The
    * collect_list is per-FILE (≤ recordsPerFile rows), not per-corpus —
    * at 100 TB this is exactly how archive members are sized.
    */
  def asWarcTable(spark: SparkSession, df: DataFrame, idCol: String,
                  payloadCol: String, recordsPerFile: Int = 5): DataFrame = {
    require(recordsPerFile > 0, "recordsPerFile must be positive")
    val out = df
      .filter(col(payloadCol).isNotNull)
      .select((col(idCol).cast("long") / recordsPerFile).cast("long").as("file_id"),
        col(idCol).cast("long").as("id"),
        encode(col(payloadCol), "UTF-8").as("payload"))
      .groupBy("file_id")
      .agg(sort_array(collect_list(struct(col("id"), col("payload")))).as("recs"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val fileId = r.getAs[Long]("file_id")
          val recs = r.getAs[scala.collection.Seq[Row]]("recs")
          val bytes = encodeWarcFile(recs.toSeq.map { rec =>
            (fixtureUri(rec.getAs[Long]("id")), rec.getAs[Array[Byte]]("payload"))
          })
          Row(fileId, bytes, bytes.length.toLong)
        }
      }
    spark.createDataFrame(out, warcFileSchema)
  }

  /** Internal single-file walk. Returns the parsed records; failures
    * raise `WarcException` carrying whether any record had parsed yet
    * (container-level vs mid-file truncation — both file-level faults).
    * Digest mismatches do NOT throw here; the caller decides (strict
    * parse throws, routed parse counts).
    */
  private final case class WarcRec(warcType: String, uri: String,
                                   contentLength: Long, body: Array[Byte],
                                   digestOk: Boolean)
  private final class WarcException(msg: String) extends RuntimeException(msg)

  private def walkWarc(bytes: Array[Byte]): Vector[WarcRec] = {
    val out = Vector.newBuilder[WarcRec]
    var pos = 0
    def fail(msg: String): Nothing = throw new WarcException(s"$msg at offset $pos")
    def line(): String = {
      var e = pos
      while (e + 1 < bytes.length && !(bytes(e) == '\r' && bytes(e + 1) == '\n')) e += 1
      if (e + 1 >= bytes.length) fail("unterminated header line")
      val s = new String(bytes, pos, e - pos, "US-ASCII")
      pos = e + 2
      s
    }
    while (pos < bytes.length) {
      if (line() != WarcMagic) fail("bad WARC version line")
      var warcType: String = null
      var uri: String = null
      var contentLength = -1L
      var digest: String = null
      var l = line()
      while (l.nonEmpty) {
        val i = l.indexOf(": ")
        if (i < 0) fail(s"malformed header '$l'")
        val (k, v) = (l.substring(0, i), l.substring(i + 2))
        k match {
          case "WARC-Type" => warcType = v
          case "WARC-Target-URI" => uri = v
          case "Content-Length" =>
            contentLength = try v.toLong catch { case _: NumberFormatException => fail(s"bad Content-Length '$v'") }
          case "WARC-Block-Digest" => digest = v
          case _ => () // unknown headers pass through, per the spec
        }
        l = line()
      }
      if (warcType == null || uri == null) fail("missing required WARC header")
      if (contentLength < 0) fail("missing Content-Length")
      if (contentLength > bytes.length - pos - 4) fail("Content-Length past end of file")
      val body = java.util.Arrays.copyOfRange(bytes, pos, pos + contentLength.toInt)
      pos += contentLength.toInt
      if (!(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
            bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n'))
        fail("missing record terminator")
      pos += 4
      val digestOk = digest == null || digest == s"sha1:${sha1Hex(body, 0, body.length)}"
      out += WarcRec(warcType, uri, contentLength, body, digestOk)
    }
    out.result()
  }

  /** Strict WARC parse: one row per record. Framing faults AND digest
    * mismatches throw — the direct-caller contract every codec in this
    * repo keeps (Multimodal.scala:9). Use `parseWarcRouted` on
    * untrusted archives.
    */
  def parseWarc(spark: SparkSession, warcFiles: DataFrame): DataFrame = {
    val out = warcFiles.select(col("file_id").cast("long"), col("content"))
      .rdd.mapPartitions { rows =>
        rows.flatMap { r =>
          val fileId = r.getAs[Long]("file_id")
          val recs = walkWarc(r.getAs[Array[Byte]]("content"))
          recs.iterator.zipWithIndex.map { case (rec, i) =>
            if (!rec.digestOk)
              throw new WarcException(s"block digest mismatch: file $fileId record $i")
            Row(fileId, i, rec.warcType, rec.uri, rec.contentLength,
              new String(rec.body, "UTF-8"))
          }
        }
      }
    spark.createDataFrame(out, warcRecordSchema)
  }

  /** Two-layer quarantine parse, one summary row per FILE:
    * container-level faults (bad magic, broken framing, truncation)
    * quarantine the file (`decode_ok` false, all else null); a
    * digest-mismatched record inside a well-framed file is counted in
    * `n_bad_records` and excluded from `sum_body_cp` (code-point sum of
    * surviving bodies) while its siblings survive. Null content rows
    * pass through all-null, the tri-state the media tables use.
    */
  def parseWarcRouted(spark: SparkSession, warcFiles: DataFrame): DataFrame = {
    val out = warcFiles.select(col("file_id").cast("long"), col("content"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val fileId = r.getAs[Long]("file_id")
          val bytes = r.getAs[Array[Byte]]("content")
          if (bytes == null) Row(fileId, null, null, null, null)
          else try {
            val recs = walkWarc(bytes)
            var bad = 0
            var sum = 0L
            recs.foreach { rec =>
              if (!rec.digestOk) bad += 1
              else {
                val s = new String(rec.body, "UTF-8")
                var i = 0
                while (i < s.length) {
                  val cp = s.codePointAt(i)
                  sum += cp
                  i += Character.charCount(cp)
                }
              }
            }
            Row(fileId, true, recs.length, bad, sum)
          } catch {
            case _: WarcException | _: ArrayIndexOutOfBoundsException =>
              Row(fileId, false, null, null, null)
          }
        }
      }
    spark.createDataFrame(out, warcRoutedSchema)
  }

  // ---------------------------------------------------------------------
  // Gzip-member WARC (the production crawl-archive layout)
  // ---------------------------------------------------------------------

  /** One gzip member (RFC 1952: 10-byte header, raw-deflate body, CRC32 +
    * ISIZE trailer) per payload. MTIME/XFL/OS pinned to zero for
    * byte-determinism across JVMs and retries.
    */
  private[graft] def gzipMember(payload: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, /* nowrap = raw deflate */ true)
    deflater.setInput(payload)
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream(payload.length / 2 + 64)
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0))
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val crc = new java.util.zip.CRC32()
    crc.update(payload)
    val tail = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt((crc.getValue & 0xFFFFFFFFL).toInt)
      .putInt(payload.length)
    out.write(tail.array())
    out.toByteArray
  }

  /** Walk one gzip member starting at `pos`: parse the RFC 1952 header
    * (honoring FEXTRA/FNAME/FCOMMENT/FHCRC), inflate the raw deflate
    * stream, verify CRC32 + ISIZE, and return (payload, bytesConsumed).
    * Member length is discoverable only by inflating — exactly why the
    * member-per-record convention exists: it makes each RECORD an
    * independently decompressable unit.
    */
  private def gunzipMemberAt(bytes: Array[Byte], pos: Int): (Array[Byte], Int) = {
    def fail(msg: String): Nothing = throw new WarcException(s"$msg at offset $pos")
    if (pos + 10 > bytes.length || bytes(pos) != 0x1f || bytes(pos + 1) != 0x8b.toByte)
      fail("bad gzip magic")
    if (bytes(pos + 2) != 8) fail("unsupported gzip compression method")
    val flg = bytes(pos + 3) & 0xFF
    var p = pos + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > bytes.length) fail("truncated FEXTRA")
      p += 2 + ((bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8))
    }
    if ((flg & 8) != 0) { while (p < bytes.length && bytes(p) != 0) p += 1; p += 1 } // FNAME
    if ((flg & 16) != 0) { while (p < bytes.length && bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2 // FHCRC
    if (p >= bytes.length) fail("truncated gzip header")
    val inflater = new java.util.zip.Inflater(/* nowrap */ true)
    inflater.setInput(bytes, p, bytes.length - p)
    val out = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    try {
      while (!inflater.finished()) {
        val n = inflater.inflate(buf)
        if (n == 0 && !inflater.finished()) fail("truncated or stalled deflate stream")
        out.write(buf, 0, n)
      }
      val payload = out.toByteArray
      val trailerAt = p + inflater.getBytesRead.toInt
      if (trailerAt + 8 > bytes.length) fail("truncated gzip trailer")
      def le32(o: Int): Long =
        (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
          ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
      val crc = new java.util.zip.CRC32()
      crc.update(payload)
      if (le32(trailerAt) != crc.getValue) fail("gzip CRC32 mismatch")
      if (le32(trailerAt + 4) != (payload.length & 0xFFFFFFFFL)) fail("gzip ISIZE mismatch")
      (payload, trailerAt + 8 - pos)
    } catch {
      case e: java.util.zip.DataFormatException =>
        fail(s"corrupt deflate stream: ${e.getMessage}")
    } finally inflater.end()
  }

  /** Pack an (id, text) frame into member-gzipped WARC files — ONE gzip
    * member per record, concatenated — the production crawl-archive
    * layout (it keeps every record independently decompressable, which is
    * what makes record-level splitting and random access possible on a
    * multi-GB archive member).
    */
  def asWarcGzTable(spark: SparkSession, df: DataFrame, idCol: String,
                    payloadCol: String, recordsPerFile: Int = 5): DataFrame = {
    require(recordsPerFile > 0, "recordsPerFile must be positive")
    val out = df
      .filter(col(payloadCol).isNotNull)
      .select((col(idCol).cast("long") / recordsPerFile).cast("long").as("file_id"),
        col(idCol).cast("long").as("id"),
        encode(col(payloadCol), "UTF-8").as("payload"))
      .groupBy("file_id")
      .agg(sort_array(collect_list(struct(col("id"), col("payload")))).as("recs"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val fileId = r.getAs[Long]("file_id")
          val recs = r.getAs[scala.collection.Seq[Row]]("recs")
          val members = recs.map { rec =>
            gzipMember(warcRecord(fixtureUri(rec.getAs[Long]("id")),
              rec.getAs[Array[Byte]]("payload")))
          }
          val bytes = new Array[Byte](members.map(_.length).sum)
          var posn = 0
          members.foreach { m => System.arraycopy(m, 0, bytes, posn, m.length); posn += m.length }
          Row(fileId, bytes, bytes.length.toLong)
        }
      }
    spark.createDataFrame(out, warcFileSchema)
  }

  /** Strict parse of a member-gzipped WARC file: walk the concatenated
    * gzip members (header parse → inflate → CRC/ISIZE verify), then parse
    * each member's single WARC record. Output schema matches
    * [[parseWarc]] plus the member index — compression is transparent to
    * the record surface, which is the whole point.
    */
  def parseWarcGz(spark: SparkSession, warcGzFiles: DataFrame): DataFrame = {
    val out = warcGzFiles.select(col("file_id").cast("long"), col("content"))
      .rdd.mapPartitions { rows =>
        rows.flatMap { r =>
          val fileId = r.getAs[Long]("file_id")
          val bytes = r.getAs[Array[Byte]]("content")
          new Iterator[Row] {
            private var pos = 0
            private var idx = 0
            def hasNext: Boolean = pos < bytes.length
            def next(): Row = {
              val (member, consumed) = gunzipMemberAt(bytes, pos)
              pos += consumed
              val recs = walkWarc(member)
              if (recs.length != 1)
                throw new WarcException(
                  s"member $idx of file $fileId holds ${recs.length} records, expected 1")
              val rec = recs.head
              if (!rec.digestOk)
                throw new WarcException(s"block digest mismatch: file $fileId member $idx")
              val row = Row(fileId, idx, rec.warcType, rec.uri, rec.contentLength,
                new String(rec.body, "UTF-8"))
              idx += 1
              row
            }
          }
        }
      }
    spark.createDataFrame(out, warcRecordSchema)
  }

  /** Two-layer quarantine for member-gzipped archives, one row per FILE:
    * a corrupt member (bad gzip framing, CRC/ISIZE mismatch, malformed
    * contained record, digest fail) is counted in `n_bad_records` and the
    * walk RESYNCS — members behind the fault survive, the property the
    * member-per-record layout exists to provide. Only a file that does
    * not START with a gzip magic quarantines wholesale.
    *
    * Resync counts one corruption EPISODE as ONE bad record: after a
    * failure the walk scans forward for the next offset that parses as a
    * fully VALID member (gzip framing + CRC/ISIZE + well-formed record +
    * digest), so 0x1f8b byte pairs that happen to occur inside the
    * corrupted member's deflate stream cannot inflate the bad count —
    * deterministic counts are what lets the oracle state this column.
    */
  def parseWarcGzRouted(spark: SparkSession, warcGzFiles: DataFrame): DataFrame = {
    val out = warcGzFiles.select(col("file_id").cast("long"), col("content"))
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val fileId = r.getAs[Long]("file_id")
          val bytes = r.getAs[Array[Byte]]("content")
          if (bytes == null) Row(fileId, null, null, null, null)
          else if (bytes.length < 2 || bytes(0) != 0x1f || bytes(1) != 0x8b.toByte)
            Row(fileId, false, null, null, null)
          else {
            def nextMagic(from: Int): Int = {
              var i = math.max(from, 0)
              while (i + 1 < bytes.length &&
                !(bytes(i) == 0x1f && bytes(i + 1) == 0x8b.toByte)) i += 1
              if (i + 1 < bytes.length) i else bytes.length
            }
            // full validation of the member at `pos`: (record, consumed)
            def parseAt(pos: Int): (WarcRec, Int) = {
              val (member, consumed) = gunzipMemberAt(bytes, pos)
              val recs = walkWarc(member)
              if (recs.length != 1) throw new WarcException(
                s"member holds ${recs.length} records, expected 1")
              if (!recs.head.digestOk) throw new WarcException("digest mismatch")
              (recs.head, consumed)
            }
            var pos = 0
            var n = 0
            var bad = 0
            var sum = 0L
            while (pos < bytes.length) {
              try {
                val (rec, consumed) = parseAt(pos)
                val s = new String(rec.body, "UTF-8")
                var i = 0
                while (i < s.length) {
                  val cp = s.codePointAt(i); sum += cp; i += Character.charCount(cp)
                }
                n += 1
                pos += consumed
              } catch {
                case _: WarcException | _: ArrayIndexOutOfBoundsException =>
                  bad += 1; n += 1
                  var cand = nextMagic(pos + 2)
                  var found = -1
                  while (found < 0 && cand < bytes.length) {
                    try { parseAt(cand); found = cand }
                    catch {
                      case _: WarcException | _: ArrayIndexOutOfBoundsException =>
                        cand = nextMagic(cand + 2)
                    }
                  }
                  pos = if (found >= 0) found else bytes.length
              }
            }
            Row(fileId, true, n, bad, sum)
          }
        }
      }
    spark.createDataFrame(out, warcRoutedSchema)
  }

  // ---------------------------------------------------------------------
  // HTML main-text extraction
  // ---------------------------------------------------------------------

  /** Regex steps shared (as constants) with the DuckDB oracle mirror.
    * Whitespace is the explicit class [ \t\r\n] — Java's \s and RE2's
    * \s disagree on \x0B, so neither engine gets to use the shorthand.
    */
  val HtmlCommentRe = "(?s)<!--.*?-->"
  val HtmlScriptRe = "(?is)<script[^>]*>.*?</script>"
  val HtmlStyleRe = "(?is)<style[^>]*>.*?</style>"
  val HtmlTagRe = "<[^>]+>"
  val WsRe = "[ \t\r\n]+"

  /** Entity decode table, applied in order. `&amp;` is decoded LAST so
    * double-escaped text ("&amp;lt;") single-decodes to "&lt;", never
    * to "<" — the order every HTML serializer assumes.
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Visible-text extraction from an HTML column: drop comments, then
    * script/style subtrees, strip remaining tags to spaces, decode the
    * common entities, collapse whitespace. Every step is a codegen'd
    * string expression — per-row, zero shuffle, scan-speed at 100 TB.
    * (Heuristic by design: CDATA and conditional comments are out of
    * scope; a crawled-HTML corpus hits them rarely enough that they
    * land in the quality gate instead.)
    */
  def htmlText(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(regexp_replace(html, HtmlCommentRe, " "), HtmlScriptRe, " "),
      HtmlStyleRe, " ")
    val noTags = regexp_replace(noBlocks, HtmlTagRe, " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (e, ch)) =>
      replace(c, lit(e), lit(ch))
    }
    trim(regexp_replace(decoded, WsRe, " "))
  }

  // ---------------------------------------------------------------------
  // URL structural parse + registered domain
  // ---------------------------------------------------------------------

  val SchemeRe = "^([a-z][a-z0-9+.-]*)://"
  val AuthorityRe = "^[a-z][a-z0-9+.-]*://([^/?#]*)"
  val HostRe = "^([^:]*)"
  val PortRe = ":([0-9]+)$"
  val PathRe = "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)"
  val QueryRe = "[?]([^#]*)"

  /** Two-label public suffixes this parser knows (a pinned constant the
    * oracle shares — the real PSL is a data file, same mechanism).
    */
  val TwoLabelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp", "or.jp", "com.br")

  /** Structural parse of an absolute http(s)-style URL into
    * (scheme, host, port, path, query, registered_domain). Pure
    * regexp_extract chain — no UDF, stays inside whole-stage codegen.
    * `registered_domain` takes the last two host labels, or three when
    * the last two form a known public suffix — the key per-domain
    * quotas and politeness budgets group on.
    */
  def urlParts(url: Column): Seq[(String, Column)] = {
    val authority = regexp_extract(url, AuthorityRe, 1)
    val host = regexp_extract(authority, HostRe, 1)
    val portS = regexp_extract(authority, PortRe, 1)
    val labels = split(host, "[.]")
    val lastTwo = array_join(slice(labels, -2, 2), ".")
    val regDomain = when(size(labels) <= 2, host)
      .when(lastTwo.isin(TwoLabelSuffixes: _*), array_join(slice(labels, -3, 3), "."))
      .otherwise(lastTwo)
    Seq(
      "scheme" -> regexp_extract(url, SchemeRe, 1),
      "host" -> host,
      "port" -> when(portS === "", lit(null)).otherwise(portS).cast("int"),
      "path" -> regexp_extract(url, PathRe, 1),
      "query" -> when(regexp_extract(url, QueryRe, 1) === "", lit(null))
        .otherwise(regexp_extract(url, QueryRe, 1)),
      "reg_domain" -> when(host === "", lit(null)).otherwise(regDomain),
    )
  }

  /** Attach the parsed URL columns to a frame. */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame =
    urlParts(col(urlCol)).foldLeft(df) { case (d, (name, c)) => d.withColumn(name, c) }

  /** Crawl-frontier URL canonicalization — the transforms every crawler
    * applies before frontier dedup (RFC 3986 §6 syntax-based
    * normalization, the case+port+fragment subset):
    * lowercase scheme and host (case-insensitive by spec), strip the
    * scheme's default port (:80 http, :443 https), drop the fragment
    * (never sent to the server), empty path → "/". Path and query keep
    * their case — they are server-interpreted. Pure codegen expression
    * chain; dot-segment resolution is out of scope (frontiers resolve
    * relative references before this point).
    */
  /** Anchor-href extraction + reference resolution (the RFC 3986 §5
    * subset a crawl frontier needs): absolute links pass through,
    * protocol-relative (`//h/p`) take the base scheme, root-relative
    * (`/p`) take the base origin, relative paths resolve against the
    * base directory; fragment-only and empty hrefs are dropped (same
    * document). Returns one row per (id, link_idx, href, resolved) —
    * explode-then-CASE keeps the resolution inside whole-stage codegen
    * instead of an interpreted per-link lambda.
    */
  def extractLinks(df: DataFrame, idCol: String, htmlCol: String,
                   baseUrlCol: String): DataFrame = {
    val hrefs = expr(
      s"""regexp_extract_all($htmlCol, '(?i)<a[^>]*href="([^"]*)"', 1)""")
    val base = col(baseUrlCol)
    val scheme = lower(regexp_extract(base, s"(?i)$SchemeRe", 1))
    val origin = concat(scheme, lit("://"), regexp_extract(base, s"(?i)$AuthorityRe", 1))
    val path = regexp_extract(base, s"(?i)$PathRe", 1)
    // base directory: path up to and including the last '/' ('' → '/')
    val dir = when(path === "", lit("/"))
      .otherwise(regexp_replace(path, "[^/]*$", ""))
    val exploded = df.select(col(idCol), posexplode(hrefs).as(Seq("link_idx", "href")),
      scheme.as("__scheme"), origin.as("__origin"), dir.as("__dir"))
    exploded
      .filter(col("href") =!= "" && !col("href").startsWith("#"))
      .withColumn("resolved",
        when(col("href").rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), col("href"))
          .when(col("href").startsWith("//"), concat(col("__scheme"), lit(":"), col("href")))
          .when(col("href").startsWith("/"), concat(col("__origin"), col("href")))
          .otherwise(concat(col("__origin"), col("__dir"), col("href"))))
      .select(idCol, "link_idx", "href", "resolved")
  }

  /** robots.txt allowance (RFC 9309 §2.2.2 longest-match): `rules` is the
    * already-agent-selected group per registered domain —
    * (reg_domain, rule ∈ {allow, disallow}, path_prefix). A URL row is
    * judged by the longest path_prefix that prefix-matches its path;
    * ties prefer allow; no matching rule (or no group) → allowed.
    * Shuffle shape: the rule table is tiny by nature (it is hand-written
    * by site owners) → broadcast join + one per-URL window over the few
    * matching candidates.
    */
  def robotsAllow(urls: DataFrame, idCol: String, domainCol: String,
                  pathCol: String, rules: DataFrame): DataFrame = {
    // Pinned (localCheckpoint): the id/domain/path columns are usually
    // DERIVED (withUrlParts regexp chains over canonicalized links), slim
    // has two consumers (the winner branch and the final left join), and
    // the rules join's pushed-down predicates would otherwise substitute
    // the whole parse tree into a Filter several times over — the r16
    // filter-pushdown blowup law, caught by PlanLint over this very
    // operator. Parse once, judge over the slim (id, domain, path) table —
    // the materialization boundary a crawl pipeline wants here anyway.
    val slim = urls.select(col(idCol), col(domainCol), col(pathCol)).localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
      .orderBy(length(col("path_prefix")).desc, col("rule").asc)
    val winner = slim
      .join(broadcast(rules.withColumnRenamed("reg_domain", domainCol)),
        Seq(domainCol), "inner")
      .filter(col(pathCol).startsWith(col("path_prefix")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("rule"), col("path_prefix"))
    // URLs with no group or no matching prefix keep their row: allowed
    slim.join(winner, Seq(idCol), "left_outer")
      .select(col(idCol), col(domainCol), col(pathCol),
        (col("rule").isNull || col("rule") === "allow").as("allowed"),
        col("path_prefix").as("matched_prefix"))
  }

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, s"(?i)$SchemeRe", 1))
    val authority = regexp_extract(noFrag, s"(?i)$AuthorityRe", 1)
    val host = lower(regexp_extract(authority, HostRe, 1))
    val portS = regexp_extract(authority, PortRe, 1)
    val dropPort = portS === "" ||
      (scheme === "http" && portS === "80") ||
      (scheme === "https" && portS === "443")
    val path = regexp_extract(noFrag, s"(?i)$PathRe", 1)
    val q = regexp_extract(noFrag, QueryRe, 1)
    concat(scheme, lit("://"), host,
      when(dropPort, lit("")).otherwise(concat(lit(":"), portS)),
      when(path === "", lit("/")).otherwise(path),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
}
