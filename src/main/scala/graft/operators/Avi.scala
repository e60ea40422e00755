package graft.operators

import java.io.ByteArrayOutputStream

/** Minimal AVI/MJPEG (RIFF) video container codec — the video member of the
  * multimodal family, composing with [[Jpeg]]: an AVI file whose stream is
  * Motion-JPEG is a RIFF chunk tree holding one baseline-JFIF image per
  * frame, so the existing exactly-gated JPEG decode extends to video with
  * only container plumbing on top. Layout follows the public AVI RIFF
  * registration (RIFF 'AVI ' → LIST hdrl [avih, LIST strl [strh 'vids'
  * 'MJPG', strf BITMAPINFOHEADER]] → LIST movi ['00dc' frames] → idx1).
  *
  * Decode contract matches the repo's other containers: strict validation
  * with Long bounds math (a hostile size field cannot index out or
  * allocate unbounded), throw on structural corruption — callers route
  * through the quarantine wrapper for crawled data.
  */
object Avi {

  final case class AviVideo(width: Int, height: Int, frames: Seq[Array[Byte]])

  // ------------------------------------------------------------- encode ---

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def fcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("US-ASCII")
  }

  /** RIFF chunk: id + little-endian size + data + odd-size pad byte. */
  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(8 + data.length + 1)
    out.write(fcc(id)); out.write(le32(data.length)); out.write(data)
    if ((data.length & 1) == 1) out.write(0) // RIFF word alignment
    out.toByteArray
  }

  private def list(listType: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(12 + payload.length)
    out.write(fcc("LIST")); out.write(le32(4 + payload.length))
    out.write(fcc(listType)); out.write(payload)
    out.toByteArray
  }

  /** Encode JPEG frames as a byte-valid AVI/MJPEG file (nominal frame
    * dimensions in the headers; MJPEG frames are self-describing, so a
    * shorter final frame is legal). Includes the idx1 keyframe index real
    * players expect.
    */
  def encodeMjpeg(frames: Seq[Array[Byte]], width: Int, height: Int,
                  fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "at least one frame")
    require(fps > 0, "fps must be positive")
    val maxFrame = frames.map(_.length).max
    val avih = new ByteArrayOutputStream(56)
    avih.write(le32(1000000 / fps)) // dwMicroSecPerFrame
    avih.write(le32(maxFrame * fps)) // dwMaxBytesPerSec (nominal)
    avih.write(le32(0)) // dwPaddingGranularity
    avih.write(le32(0x10)) // dwFlags: AVIF_HASINDEX
    avih.write(le32(frames.length)) // dwTotalFrames
    avih.write(le32(0)) // dwInitialFrames
    avih.write(le32(1)) // dwStreams
    avih.write(le32(maxFrame)) // dwSuggestedBufferSize
    avih.write(le32(width)); avih.write(le32(height))
    (0 until 4).foreach(_ => avih.write(le32(0))) // dwReserved

    val strh = new ByteArrayOutputStream(56)
    strh.write(fcc("vids")); strh.write(fcc("MJPG"))
    strh.write(le32(0)) // dwFlags
    strh.write(le16(0)); strh.write(le16(0)) // wPriority, wLanguage
    strh.write(le32(0)) // dwInitialFrames
    strh.write(le32(1)); strh.write(le32(fps)) // dwScale, dwRate
    strh.write(le32(0)) // dwStart
    strh.write(le32(frames.length)) // dwLength
    strh.write(le32(maxFrame)) // dwSuggestedBufferSize
    strh.write(le32(-1)) // dwQuality (default)
    strh.write(le32(0)) // dwSampleSize (varies)
    strh.write(le16(0)); strh.write(le16(0)) // rcFrame
    strh.write(le16(width)); strh.write(le16(height))

    val strf = new ByteArrayOutputStream(40) // BITMAPINFOHEADER
    strf.write(le32(40)); strf.write(le32(width)); strf.write(le32(height))
    strf.write(le16(1)); strf.write(le16(24)) // biPlanes, biBitCount
    strf.write(fcc("MJPG")) // biCompression
    strf.write(le32(width * height * 3)) // biSizeImage (nominal)
    strf.write(le32(0)); strf.write(le32(0)) // biXPels, biYPels
    strf.write(le32(0)); strf.write(le32(0)) // biClrUsed, biClrImportant

    val strl = list("strl",
      chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)

    val moviPayload = new ByteArrayOutputStream()
    val offsets = frames.map { f =>
      val off = 4 + moviPayload.size() // relative to the 'movi' fourcc
      moviPayload.write(chunk("00dc", f))
      off
    }
    val movi = list("movi", moviPayload.toByteArray)

    val idx = new ByteArrayOutputStream(16 * frames.length)
    frames.zip(offsets).foreach { case (f, off) =>
      idx.write(fcc("00dc")); idx.write(le32(0x10)) // AVIIF_KEYFRAME
      idx.write(le32(off)); idx.write(le32(f.length))
    }
    val body = hdrl ++ movi ++ chunk("idx1", idx.toByteArray)

    val out = new ByteArrayOutputStream(12 + body.length)
    out.write(fcc("RIFF")); out.write(le32(4 + body.length))
    out.write(fcc("AVI ")); out.write(body)
    out.toByteArray
  }

  // ------------------------------------------------------------- decode ---

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
  private def fccAt(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"AVI: $msg")

  /** Strict MJPEG-AVI decode: RIFF walk with Long bounds math, frame
    * payloads collected from the movi list in stream order. Validates the
    * RIFF magic and size, the avih frame count against the collected
    * frames, and that a video stream exists. Sub-chunk sizes are
    * bounds-checked before any slice — a hostile length field throws, it
    * never indexes out.
    */
  def decodeMjpeg(bytes: Array[Byte]): AviVideo = {
    if (bytes.length < 24) fail(s"too short: ${bytes.length} bytes")
    if (fccAt(bytes, 0) != "RIFF") fail("missing RIFF magic")
    val riffSize = u32(bytes, 4)
    if (riffSize + 8 != bytes.length)
      fail(s"RIFF size $riffSize + 8 != file length ${bytes.length}")
    if (fccAt(bytes, 8) != "AVI ") fail("not an AVI RIFF form")

    var totalFrames = -1L
    var width = 0
    var height = 0
    var sawVids = false
    val frames = Seq.newBuilder[Array[Byte]]
    var nFrames = 0

    // walk(off, end): iterate sibling chunks in [off, end)
    def walk(off0: Long, end: Long, depth: Int): Unit = {
      var off = off0
      if (depth > 8) fail("chunk nesting too deep")
      while (off + 8 <= end) {
        val id = fccAt(bytes, off.toInt)
        val size = u32(bytes, off.toInt + 4)
        val dataStart = off + 8
        if (dataStart + size > end)
          fail(s"chunk $id size $size overruns parent end $end")
        if (id == "LIST") {
          if (size < 4) fail("LIST chunk under 4 bytes")
          val lt = fccAt(bytes, dataStart.toInt)
          walk(dataStart + 4, dataStart + size, depth + 1)
          if (lt == "movi" && totalFrames < 0)
            fail("movi list before avih header")
        } else if (id == "avih") {
          if (size < 40) fail(s"avih chunk too small: $size")
          totalFrames = u32(bytes, dataStart.toInt + 16)
          width = u32(bytes, dataStart.toInt + 32).toInt
          height = u32(bytes, dataStart.toInt + 36).toInt
        } else if (id == "strh") {
          if (size < 8) fail(s"strh chunk too small: $size")
          if (fccAt(bytes, dataStart.toInt) == "vids") {
            sawVids = true
            val handler = fccAt(bytes, dataStart.toInt + 4)
            if (handler != "MJPG") fail(s"unsupported video handler '$handler'")
          }
        } else if (id == "00dc" || id == "00db") {
          val f = new Array[Byte](size.toInt)
          System.arraycopy(bytes, dataStart.toInt, f, 0, size.toInt)
          frames += f
          nFrames += 1
          if (nFrames > 100000) fail("frame count over sanity ceiling")
        }
        off = dataStart + size + (size & 1) // odd sizes padded
      }
    }
    walk(12L, bytes.length.toLong, 0)

    if (totalFrames < 0) fail("no avih header")
    if (!sawVids) fail("no video stream (strh 'vids')")
    val fs = frames.result()
    if (fs.length.toLong != totalFrames)
      fail(s"avih dwTotalFrames $totalFrames != ${fs.length} movi frames")
    if (fs.isEmpty) fail("zero frames")
    AviVideo(width, height, fs)
  }
}
