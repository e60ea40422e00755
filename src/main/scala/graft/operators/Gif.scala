package graft.operators

/** GIF87a/89a decoder (and the deterministic encoder its fixtures use) —
  * the palette-indexed member of the codec family next to BMP (raw), PNG
  * (zlib+filters) and JPEG (lossy DCT): a real variable-width LZW
  * implementation, not a shortcut that only reads this repo's own output.
  *
  * Decode walk: header magic → logical screen descriptor → global color
  * table → any number of extension blocks (skipped by sub-block structure,
  * never by guessed offsets) → first image descriptor (local palette and
  * interlace flags honored) → LZW-compressed index stream → palette-mapped
  * pixel statistics. Animated GIFs decode their FIRST frame — the
  * image-statistics contract matches the other codecs' one-row-per-medium.
  *
  * LZW is the full GIF variant: LSB-first bit packing, code width growing
  * 3..12 bits as the dictionary fills, CLEAR resetting it, the KwKwK
  * self-referencing case, and the deferred-clear plateau at 4096 entries.
  * Corruption — bad magic, truncated sub-blocks, a code beyond the
  * dictionary, an index stream that doesn't cover width×height, a missing
  * palette — throws `IllegalArgumentException`, the contract
  * `Multimodal.decodeFeaturesRouted`'s quarantine routing catches.
  *
  * The encoder emits literal codes with periodic CLEARs (the classic
  * "uncompressed GIF" construction — valid LZW every decoder accepts) over
  * a 256-entry grayscale palette, so a payload byte IS its pixel's
  * channel value and oracle SQL can recompute pixel sums from code points.
  */
object Gif {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"GIF: $msg")

  /** Per-frame decode cap (64 Mpixels ≈ 64 MB of indices + the same again
    * for the deinterlace buffer) — large enough for any real single frame,
    * small enough that a crafted header cannot DoS a scan task.
    */
  private val MaxDecodePixels = 1L << 26

  final case class GifStats(width: Int, height: Int,
                            sumR: Long, sumG: Long, sumB: Long,
                            minPx: Int, maxPx: Int) {
    def nPixels: Long = width.toLong * height
    def sumAll: Long = sumR + sumG + sumB
  }

  /** First frame as indices + palette, for pixel-level consumers (dHash). */
  final case class GifImage(width: Int, height: Int, indices: Array[Byte],
                            palette: Array[Byte]) {
    /** 3-channel luma r+g+b — same scale as the other codecs' dHash input. */
    def luma(y: Int, x: Int): Int = {
      val p = (indices(y * width + x) & 0xFF) * 3
      (palette(p) & 0xFF) + (palette(p + 1) & 0xFF) + (palette(p + 2) & 0xFF)
    }
  }

  // ------------------------------------------------------------- encode ---

  /** Payload bytes as pixel indices into a 256-gray palette, row width
    * `width`, zero-padded to the last row; height = max(1, ceil(len/width)).
    */
  def encode(payload: Array[Byte], width: Int): Array[Byte] = {
    require(width > 0 && width < 0x10000, s"bad width $width")
    val height = math.max(1, (payload.length + width - 1) / width)
    require(height < 0x10000, s"payload needs height $height >= 65536 at width $width")
    val out = new java.io.ByteArrayOutputStream()
    writeHeader(out, width, height)
    writeImageBlock(out, payload, width, height)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Animated GIF89a: `payload` split into `frameBytes`-byte slices, one
    * image block per slice (own geometry — the last slice may be shorter),
    * each preceded by a graphic-control extension as real encoders emit.
    */
  def encodeAnimated(payload: Array[Byte], width: Int, frameBytes: Int): Array[Byte] = {
    require(width > 0 && width < 0x10000, s"bad width $width")
    require(frameBytes > 0, "frameBytes must be positive")
    val nf = math.max(1, (payload.length + frameBytes - 1) / frameBytes)
    val maxH = math.max(1, (math.min(payload.length, frameBytes) + width - 1) / width)
    val out = new java.io.ByteArrayOutputStream()
    writeHeader(out, width, maxH)
    var fi = 0
    while (fi < nf) {
      val slice = java.util.Arrays.copyOfRange(payload,
        fi * frameBytes, math.min(payload.length, (fi + 1) * frameBytes))
      val h = math.max(1, (slice.length + width - 1) / width)
      // graphic control extension: 10/100s delay, no disposal, no transparency
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0); out.write(10); out.write(0); out.write(0); out.write(0)
      writeImageBlock(out, slice, width, h)
      fi += 1
    }
    out.write(0x3B)
    out.toByteArray
  }

  private def writeHeader(out: java.io.ByteArrayOutputStream, width: Int, height: Int): Unit = {
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xF7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0); out.write(0)
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
  }

  /** One image block: descriptor + LZW literal data (pixels = payload bytes
    * zero-padded to width×height), sub-block framing, terminator.
    */
  private def writeImageBlock(out: java.io.ByteArrayOutputStream,
                              payload: Array[Byte], width: Int, height: Int): Unit = {
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write(0x2C) // image descriptor: no LCT, no interlace
    u16(0); u16(0); u16(width); u16(height); out.write(0)
    out.write(8) // LZW minimum code size
    // literal codes at a fixed 9-bit width: CLEAR every 250 literals keeps
    // the decoder's dictionary under 512 so the width never grows
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nBits; nBits += 9
      while (nBits >= 8) { bits.write((acc & 0xFF).toInt); acc >>>= 8; nBits -= 8 }
    }
    put(256)
    // encoder-side geometry is caller-bounded, but keep the same Long rule
    val nPixL = width.toLong * height
    require(nPixL <= Int.MaxValue, s"encode geometry ${width}x$height overflows")
    val nPix = nPixL.toInt
    var p = 0
    while (p < nPix) {
      if (p > 0 && p % 250 == 0) put(256)
      put(if (p < payload.length) payload(p) & 0xFF else 0)
      p += 1
    }
    put(257)
    if (nBits > 0) bits.write((acc & 0xFF).toInt)
    val data = bits.toByteArray
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0) // block terminator
  }

  // ------------------------------------------------------------- decode ---

  def decode(bytes: Array[Byte]): GifStats = {
    val img = decodeImage(bytes)
    var sr = 0L; var sg = 0L; var sb = 0L
    var mn = 256; var mx = -1
    var i = 0
    while (i < img.indices.length) {
      val p = (img.indices(i) & 0xFF) * 3
      val r = img.palette(p) & 0xFF
      val g = img.palette(p + 1) & 0xFF
      val b = img.palette(p + 2) & 0xFF
      sr += r; sg += g; sb += b
      val lo = math.min(r, math.min(g, b)); val hi = math.max(r, math.max(g, b))
      if (lo < mn) mn = lo
      if (hi > mx) mx = hi
      i += 1
    }
    GifStats(img.width, img.height, sr, sg, sb, if (mn == 256) 0 else mn,
      if (mx == -1) 0 else mx)
  }

  /** First frame (the single-image contract shared with the other codecs). */
  def decodeImage(bytes: Array[Byte]): GifImage =
    walk(bytes, firstOnly = true).head

  /** EVERY frame of a (possibly animated) GIF, in stream order — the video
    * counterpart: graphic-control extensions are walked like any other
    * extension, each image block (its own geometry, optional local
    * palette, interlace) decodes independently, and the trailer must
    * close the stream.
    */
  def decodeFrames(bytes: Array[Byte]): Seq[GifImage] =
    walk(bytes, firstOnly = false)

  private def walk(bytes: Array[Byte], firstOnly: Boolean): Seq[GifImage] = {
    if (bytes.length < 13) fail(s"truncated header (${bytes.length} bytes)")
    val magic = new String(bytes, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") fail(s"bad magic '$magic'")
    def u8(off: Int): Int = {
      if (off >= bytes.length) fail(s"truncated at offset $off")
      bytes(off) & 0xFF
    }
    def u16(off: Int): Int = u8(off) | (u8(off + 1) << 8)
    val packed = u8(10)
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 3 * (1 << ((packed & 7) + 1))
      if (pos + n > bytes.length) fail("truncated global color table")
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
    }
    val frames = Seq.newBuilder[GifImage]
    var nFrames = 0
    while (true) {
      u8(pos) match {
        case 0x21 => // extension: label + sub-blocks, walked not guessed
          pos += 2
          var len = u8(pos)
          while (len != 0) { pos += 1 + len; len = u8(pos) }
          pos += 1
        case 0x2C =>
          val iw = u16(pos + 5); val ih = u16(pos + 7)
          if (iw <= 0 || ih <= 0) fail(s"bad image geometry ${iw}x$ih")
          val ipacked = u8(pos + 9)
          pos += 10
          var pal = gct
          if ((ipacked & 0x80) != 0) {
            val n = 3 * (1 << ((ipacked & 7) + 1))
            if (pos + n > bytes.length) fail("truncated local color table")
            pal = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
            pos += n
          }
          if (pal == null) fail("no color table (neither global nor local)")
          val minCodeSize = u8(pos); pos += 1
          if (minCodeSize < 2 || minCodeSize > 8) fail(s"bad LZW min code size $minCodeSize")
          val data = new java.io.ByteArrayOutputStream()
          var len = u8(pos)
          while (len != 0) {
            if (pos + 1 + len > bytes.length) fail("truncated image sub-block")
            data.write(bytes, pos + 1, len); pos += 1 + len; len = u8(pos)
          }
          pos += 1 // sub-block terminator
          // Pixel-count math in Long (the PNG twin's rule): iw/ih are u16s,
          // so a crafted header can push iw*ih past Int range — wrapped
          // negative, `new Array[Byte](nPix)` would throw
          // NegativeArraySizeException and ESCAPE the IAE quarantine
          // contract; non-wrapping values near 2^31 would attempt multi-GB
          // allocations (indices + deinterlace) from a few-hundred-byte
          // container. Both fail here instead, inside the contract.
          val nPixL = iw.toLong * ih
          if (nPixL > MaxDecodePixels)
            fail(s"image geometry ${iw}x$ih exceeds the decode cap ($MaxDecodePixels px)")
          val nPix = nPixL.toInt
          val indices = lzwDecode(data.toByteArray, minCodeSize, nPix, pal.length / 3)
          val deinterlaced =
            if ((ipacked & 0x40) == 0) indices
            else {
              // four-pass row interleave: rows 0,8,16… then 4,12…, 2,6…, 1,3…
              val outRows = new Array[Byte](nPix)
              var src = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var y = start
                while (y < ih) {
                  System.arraycopy(indices, src * iw, outRows, y * iw, iw)
                  src += 1; y += step
                }
              }
              outRows
            }
          frames += GifImage(iw, ih, deinterlaced, pal)
          nFrames += 1
          if (firstOnly) return frames.result()
        case 0x3B =>
          if (nFrames == 0) fail("trailer before any image data")
          return frames.result()
        case b => fail(f"unknown block 0x$b%02x at offset $pos")
      }
    }
    sys.error("unreachable")
  }

  /** Full GIF-variant LZW: returns exactly `nPix` indices or fails. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int, nPix: Int,
                        nColors: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](nPix)
    var outLen = 0
    val stack = new Array[Byte](4097) // longest dict string + the KwKwK repeat
    var codeSize = minCodeSize + 1
    var nextCode = eoi + 1
    var prev = -1
    var acc = 0L; var nBits = 0; var dp = 0
    var done = false
    while (!done) {
      while (nBits < codeSize && dp < data.length) {
        acc |= (data(dp) & 0xFFL) << nBits; nBits += 8; dp += 1
      }
      if (nBits < codeSize) fail("LZW stream ends before EOI")
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize; nBits -= codeSize
      if (code == clear) {
        codeSize = minCodeSize + 1; nextCode = eoi + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else {
        if (code > nextCode || (code == nextCode && prev == -1))
          fail(s"LZW code $code beyond dictionary ($nextCode)")
        // expand: literals are single indices; composites walk the prefix
        // chain. The stack is emitted top-down, so slot 0 holds the LAST
        // index out — the KwKwK case (code == nextCode: prev's string plus
        // a repeat of its first index) reserves slot 0 for that repeat.
        val kwk = code == nextCode
        var sp = if (kwk) 1 else 0
        var c = if (kwk) prev else code
        while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= nColors) fail(s"palette index $c beyond $nColors colors")
        val first = c.toByte
        stack(sp) = first; sp += 1
        if (kwk) stack(0) = first
        if (outLen + sp > nPix) fail(s"LZW yields more than $nPix pixels")
        while (sp > 0) { sp -= 1; out(outLen) = stack(sp); outLen += 1 }
        if (prev != -1 && nextCode < 4096) {
          prefix(nextCode) = prev
          suffix(nextCode) = first
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (outLen != nPix) fail(s"LZW yields $outLen of $nPix pixels")
    out
  }
}
