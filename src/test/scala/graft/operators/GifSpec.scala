package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-codec tests for [[Gif]] — no SparkSession needed. The decoder is
  * exercised well beyond the fixture encoder's literal-only LZW: a
  * hand-packed stream drives dictionary hits, the KwKwK self-reference,
  * and code-width growth; interlace and local-palette paths get their own
  * containers; every corruption class must throw, never mis-decode.
  */
class GifSpec extends AnyFunSuite {

  test("roundtrip: payload bytes come back as palette-mapped pixel sums") {
    val payload = (0 until 997).map(i => ((i * 37) % 256).toByte).toArray
    val stats = Gif.decode(Gif.encode(payload, width = 10))
    assert(stats.width == 10 && stats.height == 100) // ceil(997/10)
    val s = payload.map(_ & 0xFF).map(_.toLong).sum
    assert(stats.sumR == s && stats.sumG == s && stats.sumB == s) // gray palette
    assert(stats.maxPx == payload.map(_ & 0xFF).max)
    assert(stats.minPx == 0) // 3 padding pixels
    // clear-code boundary exactness: multiples of 250 pixels
    val p2 = Array.fill(500)(7.toByte)
    val s2 = Gif.decode(Gif.encode(p2, width = 10))
    assert(s2.nPixels == 500 && s2.sumR == 3500)
  }

  test("empty and null-ish payloads produce the 1-row minimum image") {
    val stats = Gif.decode(Gif.encode(Array.empty[Byte], width = 10))
    assert(stats.width == 10 && stats.height == 1 && stats.sumAll == 0)
  }

  // hand-packed GIF: bit-level writer for arbitrary code streams
  private def handGif(w: Int, h: Int, minCode: Int, palette: Seq[(Int, Int, Int)],
                      codes: Seq[Int], interlace: Boolean = false,
                      localPalette: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII")); u16(w); u16(h)
    val palBits = math.max(1, 32 - Integer.numberOfLeadingZeros(palette.size - 1)) - 1
    if (localPalette) { out.write(0x00); out.write(0); out.write(0) } // no GCT
    else {
      out.write(0x80 | palBits); out.write(0); out.write(0)
      for (i <- 0 until (1 << (palBits + 1))) {
        val (r, g, b) = if (i < palette.size) palette(i) else (0, 0, 0)
        out.write(r); out.write(g); out.write(b)
      }
    }
    // a comment extension the walker must skip by sub-block structure
    out.write(0x21); out.write(0xFE); out.write(3); out.write('h'); out.write('i'); out.write('!'); out.write(0)
    out.write(0x2C); u16(0); u16(0); u16(w); u16(h)
    out.write((if (localPalette) 0x80 | palBits else 0) | (if (interlace) 0x40 else 0))
    if (localPalette) for (i <- 0 until (1 << (palBits + 1))) {
      val (r, g, b) = if (i < palette.size) palette(i) else (0, 0, 0)
      out.write(r); out.write(g); out.write(b)
    }
    out.write(minCode)
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0; var codeSize = minCode + 1
    var nextCode = (1 << minCode) + 2
    var prevSeen = false // decoder adds no entry for the first code after clear
    for (c <- codes) {
      acc |= c.toLong << nBits; nBits += codeSize
      while (nBits >= 8) { bits.write((acc & 0xFF).toInt); acc >>>= 8; nBits -= 8 }
      // mirror the decoder's dictionary growth so multi-width streams pack
      if (c == (1 << minCode)) {
        codeSize = minCode + 1; nextCode = (1 << minCode) + 2; prevSeen = false
      } else if (c != (1 << minCode) + 1) {
        if (prevSeen && nextCode < 4096) {
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prevSeen = true
      }
    }
    if (nBits > 0) bits.write((acc & 0xFF).toInt)
    val data = bits.toByteArray
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0); out.write(0x3B)
    out.toByteArray
  }

  test("real LZW: dictionary hits and the KwKwK case decode correctly") {
    // 4-color palette, minCode 2: clear=4, eoi=5, first dict entry 6.
    // Pixels 1,1,1,1 compress to [clear, 1, 6, 1, eoi] where 6 is KwKwK
    // ("11" referenced while being defined).
    val pal = Seq((0, 0, 0), (10, 20, 30), (50, 50, 50), (200, 100, 0))
    val g = handGif(2, 2, 2, pal, Seq(4, 1, 6, 1, 5))
    val st = Gif.decode(g)
    assert(st.nPixels == 4)
    assert((st.sumR, st.sumG, st.sumB) == (40L, 80L, 120L)) // 4 × (10,20,30)
    assert(st.minPx == 10 && st.maxPx == 30)
    // plain dictionary hit: 1,2,1,2,1,2 → [clear, 1, 2, 6(=="12"), 1, 2, eoi]
    // wait — 6 is "12"; emit it then 1,2 again: pixels 1,2,1,2,1,2
    val g2 = handGif(3, 2, 2, pal, Seq(4, 1, 2, 6, 6, 5))
    val st2 = Gif.decode(g2)
    assert(st2.nPixels == 6)
    assert(st2.sumR == 3 * 10 + 3 * 50 && st2.sumB == 3 * 30 + 3 * 50)
  }

  test("interlaced rows land in four-pass order; local palette wins") {
    // 1-wide, 8-tall image with distinct indices per row, interlaced:
    // stored row order is 0,8?,…: passes give rows 0,4,2,6,1,3,5,7 of the
    // stored stream mapping to display rows 0,8.. — with h=8: pass rows are
    // display 0, 4, 2 6, 1 3 5 7. Sum is row-order-invariant; dHash-style
    // luma(y,0) checks placement.
    val pal = (0 until 8).map(i => (i, i, i))
    val codes = Seq(8) ++ Seq(0, 1, 2, 3, 4, 5, 6, 7).map(identity) ++ Seq(9)
    // minCode 3: clear=8, eoi=9
    val g = handGif(1, 8, 3, pal, codes, interlace = true)
    val img = Gif.decodeImage(g)
    // stored rows 0..7 → display rows 0,4,2,6,1,3,5,7 hold indices 0..7
    val display = (0 until 8).map(y => img.indices(y) & 0xFF)
    assert(display == Seq(0, 4, 2, 6, 1, 3, 5, 7).zipWithIndex
      .sortBy(_._1).map(_._2)) // invert the pass permutation
    val gl = handGif(2, 2, 2, Seq((5, 6, 7), (9, 9, 9)), Seq(4, 0, 1, 0, 1, 5),
      localPalette = true)
    val stl = Gif.decode(gl)
    assert(stl.sumR == 2 * 5 + 2 * 9 && stl.sumB == 2 * 7 + 2 * 9)
  }

  test("corruption classes all throw: magic, truncation, codes, coverage") {
    val good = Gif.encode("hello world of pixels".getBytes("US-ASCII"), 10)
    def corrupt(f: Array[Byte] => Array[Byte]): Unit =
      intercept[IllegalArgumentException](Gif.decode(f(good.clone())))
    corrupt { b => b(0) = 'X'.toByte; b }                    // bad magic
    corrupt { b => java.util.Arrays.copyOf(b, 10) }           // truncated header
    corrupt { b => java.util.Arrays.copyOf(b, b.length - 30) } // truncated stream
    // no image data at all: header + trailer
    intercept[IllegalArgumentException] {
      Gif.decode("GIF89a".getBytes("US-ASCII") ++
        Array[Byte](1, 0, 1, 0, 0, 0, 0, 0x3B.toByte))
    }
    // a code beyond the dictionary: minCode 2 stream starting with code 7
    val pal = Seq((0, 0, 0), (1, 1, 1), (2, 2, 2), (3, 3, 3))
    intercept[IllegalArgumentException](Gif.decode(handGif(2, 2, 2, pal, Seq(4, 7, 5))))
    // pixel shortfall: 2x2 image, one pixel emitted
    intercept[IllegalArgumentException](Gif.decode(handGif(2, 2, 2, pal, Seq(4, 1, 5))))
    // pixel overflow: 5 pixels into 2x2
    intercept[IllegalArgumentException](
      Gif.decode(handGif(2, 2, 2, pal, Seq(4, 1, 1, 1, 1, 1, 5))))
  }

  test("animated: frames round-trip independently, GCEs walked, last frame short") {
    val payload = (0 until 73).map(i => (i % 251).toByte).toArray
    val g = Gif.encodeAnimated(payload, width = 10, frameBytes = 30)
    val frames = Gif.decodeFrames(g)
    assert(frames.length == 3) // 30 + 30 + 13
    assert(frames.map(f => (f.width, f.height)) == Seq((10, 3), (10, 3), (10, 2)))
    def sliceSum(lo: Int, hi: Int) = (lo until hi).map(i => payload(i) & 0xFF).sum.toLong
    def frameSum(f: Gif.GifImage) = f.indices.map(i => (i & 0xFF).toLong).sum
    assert(frameSum(frames(0)) == sliceSum(0, 30))
    assert(frameSum(frames(1)) == sliceSum(30, 60))
    assert(frameSum(frames(2)) == sliceSum(60, 73)) // 7 padding zeros
    // decodeImage = first frame; decode (stats) agrees with it
    assert(Gif.decodeImage(g).indices.toSeq == frames(0).indices.toSeq)
    // empty payload: one all-padding frame
    assert(Gif.decodeFrames(Gif.encodeAnimated(Array.empty, 10, 30)).length == 1)
    // a truncation that loses the trailer (multi-frame walk must notice)
    intercept[IllegalArgumentException](
      Gif.decodeFrames(java.util.Arrays.copyOf(g, g.length - 1)))
  }

  test("crafted geometry fails INSIDE the IAE contract, never via allocation") {
    val good = Gif.encode("payload".getBytes("US-ASCII"), 10)
    // image descriptor sits after header(13) + GCT(768): 0x2C at 781,
    // left/top at 782-785, width at 786-787, height at 788-789
    assert(good(781) == 0x2C.toByte)
    def withGeom(w: Int, h: Int): Array[Byte] = {
      val b = good.clone()
      b(786) = (w & 0xFF).toByte; b(787) = ((w >> 8) & 0xFF).toByte
      b(788) = (h & 0xFF).toByte; b(789) = ((h >> 8) & 0xFF).toByte
      b
    }
    // 65535×65535 wraps Int (≈4.29e9): without Long math this becomes a
    // NegativeArraySizeException that ESCAPES the quarantine contract
    val e1 = intercept[IllegalArgumentException](Gif.decode(withGeom(0xFFFF, 0xFFFF)))
    assert(e1.getMessage.contains("decode cap"))
    // 33000×33000 ≈ 1.09e9 does NOT wrap — the cap must still refuse the
    // multi-GB allocation a few-hundred-byte container is demanding
    val e2 = intercept[IllegalArgumentException](Gif.decodeFrames(withGeom(33000, 33000)))
    assert(e2.getMessage.contains("decode cap"))
  }

  test("code width grows with the dictionary (literal ladder past 2^codeSize)") {
    // minCode 2: after enough literals the decoder must switch 3→4→5-bit
    // reads in lockstep with the packer's mirrored growth
    val pal = Seq((0, 0, 0), (1, 1, 1), (2, 2, 2), (3, 3, 3))
    val pix = Seq.tabulate(40)(i => 1 + (i % 3))
    val g = handGif(8, 5, 2, pal, Seq(4) ++ pix ++ Seq(5))
    val st = Gif.decode(g)
    assert(st.nPixels == 40)
    assert(st.sumR == pix.sum)
  }
}
