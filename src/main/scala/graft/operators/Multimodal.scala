package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video treated as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The Spark-side mechanics — schema, partition-parallel batch iteration,
  * output row shape — are real and tested. The actual media decode is a
  * deterministic STUB ([[stubDecode]]): this container ships no image/audio
  * codecs, so "decoding" derives fake-but-stable features from the bytes.
  * Swapping in a real decoder changes only the function body, not the
  * pipeline shape.
  *
  * Scale notes: binary payloads ride the same columnar parquet files as
  * everything else; `spark.sql.files.maxPartitionBytes` bounds per-task
  * memory since each task holds at most one batch of decoded frames.
  * `mapPartitions` (not per-row UDF) amortizes any per-batch model/codec
  * init — the same shape a vectorized/Arrow-batched UDF gives Python.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
  ))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType)),
  ))

  /** Wrap any (id, text) frame as a media table — the text bytes stand in
    * for an encoded image payload in this codec-less environment.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(payloadCol), "UTF-8").as("content"),
      lit("image/stub").as("media_type"),
      length(encode(col(payloadCol), "UTF-8")).cast("long").as("n_bytes"),
    )

  /** STUB decode: deterministic features from the payload bytes (polynomial
    * byte-fold hash → fake dimensions + an 8-dim float signature). A real
    * implementation would decode pixels/samples here.
    */
  def stubDecode(content: Array[Byte]): (Int, Int, Array[Float]) = {
    var h = 0L
    var i = 0
    while (i < content.length) {
      h = (h * 31 + (content(i) & 0xff)) % 1000000007L
      i += 1
    }
    val width = 64 + (h % 512).toInt
    val height = 64 + ((h / 512) % 512).toInt
    val feat = Array.tabulate(8)(k => (((h >> k) % 997L).toFloat) / 997.0f)
    (width, height, feat)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("feature", ArrayType(FloatType)),
  ))

  /** Frame sampling: the payload is read as consecutive `frameBytes`-sized
    * frames (the last one may be short); every `stride`-th frame is decoded,
    * up to `maxFrames` per media row. One input row fans out to 0..maxFrames
    * frame rows — the generator (flatMap) decode shape a video pipeline
    * needs, with per-frame decode cost bounded by `frameBytes` and per-task
    * memory bounded by one input row's sampled frames. Decode is the same
    * deterministic [[stubDecode]]; a real codec swaps in per frame slice.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int, stride: Int, maxFrames: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0 && maxFrames > 0)
    val out = media.select("media_id", "content")
      .rdd.mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else {
            val nFrames = (bytes.length + frameBytes - 1) / frameBytes
            Iterator.range(0, nFrames, stride).take(maxFrames).map { i =>
              val slice = java.util.Arrays.copyOfRange(bytes,
                i * frameBytes, math.min((i + 1) * frameBytes, bytes.length))
              val (w, h, feat) = stubDecode(slice)
              Row(r.getAs[Long]("media_id"), i, slice.length.toLong, w, h, feat.toSeq)
            }
          }
        }
      }
    spark.createDataFrame(out, frameSchema)
  }

  /** Decode/feature-extract over partition-local batches. Runs fully
    * distributed; the iterator never materializes a whole partition.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val out = media.select("media_id", "content", "media_type", "n_bytes")
      .rdd.mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          // r.get preserves SQL NULL for n_bytes — getAs[Long] would unbox
          // a null slot to 0 and diverge from the oracle's NULL
          val nBytes = r.get(r.fieldIndex("n_bytes"))
          if (bytes == null) // null payload (e.g. null source text) → null features, don't kill the job
            Row(r.getAs[Long]("media_id"), r.getAs[String]("media_type"), nBytes, null, null, null)
          else {
            val (w, h, feat) = stubDecode(bytes)
            Row(r.getAs[Long]("media_id"), r.getAs[String]("media_type"), nBytes, w, h, feat.toSeq)
          }
        }
      }
    spark.createDataFrame(out, featureSchema)
  }
}
