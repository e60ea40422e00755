package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JpegSpec extends SparkSpec {

  private val text = "Baseline JFIF sequential decoding exercised end to end!"

  test("DC-only gray blocks round-trip bit-exactly (the oracle construction)") {
    val payload = text.getBytes("US-ASCII")
    val jpeg = Jpeg.encodeGrayBlocks(payload, blocksPerRow = 10)
    val s = Jpeg.decode(jpeg)
    val rows = (payload.length + 9) / 10
    assert(s.width == 80 && s.height == 8 * rows && s.components == 1)
    // every payload byte paints 64 pixels of exactly its value; padding is 0
    assert(s.sumPx == 64L * payload.map(_ & 0xFF).map(_.toLong).sum)
    assert(s.maxPx == payload.map(_ & 0xFF).max)
    assert(s.minPx == 0) // zero-padded grid
  }

  test("empty payload still produces a valid one-row-of-blocks image") {
    val s = Jpeg.decode(Jpeg.encodeGrayBlocks(Array.emptyByteArray, 10))
    assert(s.width == 80 && s.height == 8 && s.sumPx == 0L && s.maxPx == 0)
  }

  /** Independent reference: direct (non-separable) IDCT double formula. */
  private def referenceBlock(zz: Array[Int]): Array[Int] = {
    val coef = new Array[Int](64)
    // same zigzag layout the encoder writes: regenerate independently by
    // diagonal walk (even diagonals descend, odd ascend)
    var k = 0
    for (s <- 0 to 14) {
      val range = if (s % 2 == 0) (math.min(s, 7) to math.max(0, s - 7) by -1)
                  else (math.max(0, s - 7) to math.min(s, 7))
      for (u <- range) { coef(u * 8 + (s - u)) = zz(k); k += 1 }
    }
    def c(i: Int) = if (i == 0) 1.0 / math.sqrt(2.0) else 1.0
    Array.tabulate(64) { p =>
      val x = p / 8; val y = p % 8
      var acc = 0.0
      for (u <- 0 until 8; v <- 0 until 8)
        acc += 0.25 * c(u) * c(v) * coef(u * 8 + v) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      val s0 = math.round(acc).toInt + 128
      if (s0 < 0) 0 else if (s0 > 255) 255 else s0
    }
  }

  test("AC coefficients: entropy + zigzag + dequant + IDCT match an independent reference") {
    // deterministic pseudo-random quantized blocks exercising long zero
    // runs (ZRL), every AC category up to 10, negatives, and dense blocks
    val rnd = new scala.util.Random(0xC0FFEE)
    val blocks = Seq.tabulate(8) { bi =>
      val b = new Array[Int](64)
      b(0) = rnd.nextInt(2048) - 1024
      (1 until 64).foreach { k =>
        b(k) = bi match {
          case 0 => 0                                    // pure DC
          case 1 => if (k == 63) 5 else 0                // ZRL chains to the last slot
          case 2 => if (k % 7 == 0) rnd.nextInt(63) - 31 else 0
          case _ => if (rnd.nextInt(4) == 0) rnd.nextInt(1023) - 511 else 0
        }
      }
      b
    }
    val jpeg = Jpeg.encodeCoeffBlocksGray(blocks, blocksPerRow = 4)
    val s = Jpeg.decode(jpeg)
    assert(s.width == 32 && s.height == 16)
    val want = blocks.map(referenceBlock)
    val wantSum = want.flatten.map(_.toLong).sum
    val wantMin = want.flatten.min
    val wantMax = want.flatten.max
    assert(s.sumPx == wantSum, s"pixel sum ${s.sumPx} != reference $wantSum")
    assert(s.minPx == wantMin && s.maxPx == wantMax)
  }

  test("solid-color YCbCr decodes exactly under 4:4:4, 4:2:2 and 4:2:0") {
    // constant planes make subsampling + upsampling + BT.601 conversion
    // exactly predictable: one conversion of (y, cb, cr) shared by every pixel
    def rgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
      def cl(d: Double) = math.max(0, math.min(255, math.round(d).toInt))
      (cl(y + 1.402 * (cr - 128)),
        cl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        cl(y + 1.772 * (cb - 128)))
    }
    for ((hs, vs) <- Seq((1, 1), (2, 1), (2, 2))) {
      val (y0, cb0, cr0) = (99, 60, 200)
      val (w, h) = (37, 21) // deliberately not MCU-aligned: crop must apply
      val s = Jpeg.decode(Jpeg.encodeSolidColor(w, h, y0, cb0, cr0, hs, vs))
      val (r, g, b) = rgb(y0, cb0, cr0)
      assert(s.width == w && s.height == h && s.components == 3, s"$hs x $vs")
      assert(s.sumPx == w.toLong * h * (r + g + b), s"$hs x $vs: sum ${s.sumPx}")
      assert(s.minPx == math.min(r, math.min(g, b)) &&
        s.maxPx == math.max(r, math.max(g, b)), s"$hs x $vs")
    }
  }

  test("progressive and truncated containers throw routable errors; routed decode quarantines") {
    val good = Jpeg.encodeGrayBlocks(text.getBytes("US-ASCII"), 10)
    // flip SOF0 to SOF2 (progressive)
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1)
      .find(i => (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    val e1 = intercept[IllegalArgumentException] { Jpeg.decode(prog) }
    assert(e1.getMessage.contains("progressive"))
    val e2 = intercept[IllegalArgumentException] {
      Jpeg.decode(good.take(good.length / 2))
    }
    assert(e2.getMessage.startsWith("jpeg:"))

    // routed path: corrupt rows quarantine, good rows decode — same
    // tri-state contract as BMP/PNG
    val st = spark
    import st.implicits._
    val docs = Seq((1L, text), (2L, text + " second")).toDF("id", "text")
    val media = Multimodal.asJpegMediaTable(spark, docs, "id", "text", blocksPerRow = 10)
    val corrupted = media.select(col("media_id"),
      when(col("media_id") === 2L, expr("substring(content, 1, 40)"))
        .otherwise(col("content")).as("content"),
      col("media_type"), col("n_bytes"))
    val routed = Multimodal.decodeFeaturesRouted(spark, corrupted)
      .select("media_id", "decode_ok").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(routed == Map(1L -> true, 2L -> false))
  }

  test("restart markers: DRI honored, RSTn cycle followed, DC predictors reset") {
    val payload = Array.tabulate(100)(i => (i * 37 % 256).toByte)
    val plain = Jpeg.decode(Jpeg.encodeGrayBlocks(payload, 5))
    // interval 3 across 100 blocks exercises the full RST0..RST7 cycle and
    // a mid-interval tail; predictors reset at each marker, so a decoder
    // that misses the reset (or the byte alignment) shifts every block
    // after the first marker and the exact sums diverge
    val restarted = Jpeg.decode(Jpeg.encodeGrayBlocks(payload, 5, restartInterval = 3))
    assert(restarted == plain)
    assert(plain.sumPx == 64L * payload.map(_ & 0xFF).map(_.toLong).sum)
  }
}
