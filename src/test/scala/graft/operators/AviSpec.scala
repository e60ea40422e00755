package graft.operators

import graft.SparkSpec

/** AVI/MJPEG container: round trip, strict-decode corruption contract, and
  * the temporally-aligned video near-dup semantics. */
class AviSpec extends SparkSpec {
  import spark.implicits._

  private def jpeg(bytes: Array[Byte]) = Jpeg.encodeGrayBlocks(bytes, 2)

  test("encode/decode round trip preserves frame payload bytes") {
    val frames = Seq(
      jpeg(Array[Byte](1, 2, 3, 4)),
      jpeg(Array[Byte](9, 8, 7)),
      jpeg((0 until 17).map(_.toByte).toArray))
    val avi = Avi.encodeMjpeg(frames, width = 16, height = 16)
    val v = Avi.decodeMjpeg(avi)
    assert(v.width == 16 && v.height == 16)
    assert(v.frames.length == 3)
    v.frames.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want))
    }
    // every extracted frame decodes through the real JPEG path
    val stats = v.frames.map(Jpeg.decode)
    assert(stats.head.sumPx == 64L * (1 + 2 + 3 + 4))
    assert(stats(1).width == 16)
  }

  test("odd-sized frames get RIFF pad bytes and still walk correctly") {
    // encodeGrayBlocks output length varies; force an odd chunk via a raw
    // odd-length frame payload (decode of THAT frame would fail, but the
    // container walk must still find its sibling)
    val odd = Array[Byte](1, 2, 3) // not a JPEG; container-level only
    val good = jpeg(Array[Byte](5))
    val avi = Avi.encodeMjpeg(Seq(odd, good), 8, 8)
    val v = Avi.decodeMjpeg(avi)
    assert(v.frames.length == 2)
    assert(java.util.Arrays.equals(v.frames(1), good))
  }

  test("strict decode: corruption fails loudly") {
    val avi = Avi.encodeMjpeg(Seq(jpeg(Array[Byte](1))), 8, 8)
    def mut(f: Array[Byte] => Array[Byte]): Array[Byte] = f(avi.clone())
    // wrong magic
    intercept[IllegalArgumentException] {
      Avi.decodeMjpeg(mut { b => b(0) = 'X'.toByte; b })
    }
    // RIFF size disagrees with file length
    intercept[IllegalArgumentException] {
      Avi.decodeMjpeg(avi ++ Array[Byte](0))
    }
    // truncation
    intercept[IllegalArgumentException] {
      Avi.decodeMjpeg(avi.take(avi.length - 6))
    }
    // frame-count cross-check: lie in avih dwTotalFrames (offset: RIFF(12)
    // + LIST hdr(12) + 'avih' chunk hdr(8) + 16 into avih)
    intercept[IllegalArgumentException] {
      Avi.decodeMjpeg(mut { b => b(12 + 12 + 8 + 16) = 9; b })
    }
  }

  test("header layout constant: first frame data starts at byte 232") {
    // q_avi_quarantine's in-plan corruption targets 1-based offset 235 =
    // 0-based 234 = frame byte 2; the layout must stay RIFF(12) +
    // hdrl(200) + movi LIST header(12) + chunk header(8)
    val frame = jpeg(Array[Byte](42))
    val avi = Avi.encodeMjpeg(Seq(frame), 8, 8)
    assert(avi.slice(232, 232 + frame.length).sameElements(frame))
    assert((avi(234) & 0xFF) == 0xFF) // the APP0 marker byte the fixture zeroes
  }

  test("decodeVideoFramesRouted splits container-level from frame-level corruption") {
    import org.apache.spark.sql.functions.{col, concat, expr, lit, when}
    val docs = Seq((1L, "good text here"), (7L, "container dies"),
      (11L, "frame zero dies but later frames survive fine")).toDF("id", "text")
    val media = Multimodal.asAviMediaTable(spark, docs, "id", "text",
      blocksPerRow = 10, frameBytes = 24)
    val corrupted = media.withColumn("content",
      when(col("media_id") % 7 === 0,
        concat(lit("X".getBytes("US-ASCII")), expr("substring(content, 2)")))
        .when(col("media_id") % 11 === 0,
          expr("overlay(content placing X'00' from 235)"))
        .otherwise(col("content")))
    val out = Multimodal.decodeVideoFramesRouted(spark, corrupted)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(1) && out(1L).getInt(3) == 0)
    assert(!out(7L).getBoolean(1) && out(7L).isNullAt(2))
    val r11 = out(11L)
    assert(r11.getBoolean(1) && r11.getInt(2) == 2 && r11.getInt(3) == 1)
    // surviving sum = only frame 1's bytes
    val tail = "frame zero dies but later frames survive fine".substring(24)
    assert(r11.getLong(4) == 64L * tail.map(_.toInt).sum)
  }

  test("videoNearDupPairs: aligned clones pair, shuffled frames do not") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta " * 4 // 4 frames @48
    val t2 = "one two three four five six seven eight nine ten " * 4
    val docs = Seq(
      (1L, t1), (2L, t2),
      (11L, t1), // exact clone of 1
    ).toDF("id", "text")
    val media = Multimodal.asAviMediaTable(spark, docs, "id", "text",
      blocksPerRow = 10, frameBytes = 48)
    val pairs = Multimodal.videoNearDupPairs(spark, media,
        maxHamming = 1, minMatchFrac = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("match_frac")).toMap
    assert(pairs.contains((1L, 11L)) && pairs((1L, 11L)) == 1.0)
    assert(!pairs.contains((1L, 2L)))
  }

  test("videoNearDupPairsTiered: pairs route by the SHORTER side, no double counting") {
    val short = "alpha beta gamma delta epsilon zeta eta theta " * 5 // 5 frames @48
    val long = "one two three four five six seven eight nine ten " * 10 // 11 frames
    val docs = Seq(
      (1L, short), (11L, short), // both-short exact clone pair
      (2L, long), (12L, long),   // both-long exact clone pair
      // tail-REPLACED short near-clone of 1: the whole 5th frame swapped for
      // digit text (a small append wouldn't flip >1 dHash bit — the hash is
      // edit-robust by design); same length class, so nf stays 5 and the
      // match_frac is exactly 4/5 = the 0.8 threshold
      (3L, short.take(192) + "9876543210 " * 4),
      // CROSS-TIER pair (r13 ADVICE): a short video that is a frame-exact
      // PREFIX of the long one — every one of its 5 positions aligns
      (4L, long.take(240)),
    ).toDF("id", "text")
    val media = Multimodal.asAviMediaTable(spark, docs, "id", "text",
      blocksPerRow = 10, frameBytes = 48)
    val rows = Multimodal.videoNearDupPairsTiered(spark, media,
        maxHamming = 1, minMatchFrac = 0.8, frameStride = 2, tierMinFrames = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_comparable"), r.getAs[Double]("match_frac")))
    // the union is duplicate-free: each pair appears exactly once
    assert(rows.map(_._1).distinct.length == rows.length, rows.toSeq)
    val pairs = rows.toMap
    // both-short clone pair: FULL-resolution denominator (5 frames, frac 1)
    assert(pairs((1L, 11L)) == ((5L, 1.0)), pairs)
    // both-long clone pair: SAMPLED denominator (positions 0,2,4,6,8,10 of 11)
    assert(pairs((2L, 12L)) == ((6L, 1.0)), pairs)
    // short near-clone: frames 0-3 of 5 match (tail frame replaced) — full
    // resolution keeps the 4/5 distinction a stride-2 mine would blur to 3/3
    assert(pairs((1L, 3L))._2 == 0.8, pairs)
    // cross-tier pairs take the FULL-resolution branch: the denominator is
    // the short side's 5 frames, not ⌊(5−1)/2⌋+1 = 3 sampled positions —
    // the quantization hazard the shorter-side routing removes (both
    // orientations: id order must not affect the routing)
    assert(pairs((2L, 4L)) == ((5L, 1.0)), pairs)
    assert(pairs((4L, 12L)) == ((5L, 1.0)), pairs)
  }

  test("videoFrameDHash: tail edit changes only the final frame's hash") {
    val t = "alpha beta gamma delta epsilon zeta eta theta " * 4
    val docs = Seq((1L, t), (2L, t + "QQQQ")).toDF("id", "text")
    val media = Multimodal.asAviMediaTable(spark, docs, "id", "text",
      blocksPerRow = 10, frameBytes = 48)
    val h = Multimodal.videoFrameDHash(spark, media)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getAs[Long]("dhash")).toMap
    val n = h.keys.filter(_._1 == 1L).map(_._2).max
    (0 until n).foreach { i => assert(h((1L, i)) == h((2L, i)), s"frame $i") }
  }
}
