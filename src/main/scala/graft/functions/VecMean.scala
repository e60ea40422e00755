package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed element-wise mean of `array<float>` columns — a custom `Aggregator`
  * (UDAF) with a mutable double[] buffer: per-partition accumulation, one
  * reduced buffer per group crosses the shuffle, merge is element-wise add.
  * The declarative alternative (posexplode → groupBy(key, pos) → avg →
  * re-collect) shuffles rows × dim and re-sorts positions; this shuffles one
  * buffer per (partition, group). Used by IVF k-means centroid updates.
  *
  * Null/empty arrays are skipped; an empty group yields an empty array.
  * Arrays are assumed same-length within a group (enforced by the caller's
  * schema); a longer row grows the buffer, missing tail elements count as
  * absent for their positions (mean over present values per position).
  */
final case class VecMeanBuf(var sums: Array[Double], var counts: Array[Long])

object VecMean extends Aggregator[Seq[Float], VecMeanBuf, Seq[Float]] {
  type Buf = VecMeanBuf

  override def zero: Buf = VecMeanBuf(Array.emptyDoubleArray, Array.emptyLongArray)

  private def grow(b: Buf, n: Int): Unit =
    if (b.sums.length < n) {
      b.sums = java.util.Arrays.copyOf(b.sums, n)
      b.counts = java.util.Arrays.copyOf(b.counts, n)
    }

  override def reduce(b: Buf, v0: Seq[Float]): Buf = {
    if (v0 != null && v0.nonEmpty) {
      // primitive unwrap (r13): Seq[Float].apply is unspecialized — indexing
      // it boxes every element, the same ~10× hot-loop tax the SemDeDup
      // assignment paid; this aggregator runs under every Lloyd mean
      val v = Prim.floatArray(v0)
      grow(b, v.length)
      var i = 0
      while (i < v.length) { b.sums(i) += v(i); b.counts(i) += 1; i += 1 }
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    grow(a, b.sums.length)
    var i = 0
    while (i < b.sums.length) { a.sums(i) += b.sums(i); a.counts(i) += b.counts(i); i += 1 }
    a
  }

  override def finish(b: Buf): Seq[Float] =
    b.sums.indices.map(i =>
      if (b.counts(i) == 0) 0f else (b.sums(i) / b.counts(i)).toFloat)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()

  /** Column form for untyped `agg`. */
  def asCol(colName: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.udaf
    udaf(VecMean).apply(org.apache.spark.sql.functions.col(colName))
  }
}
