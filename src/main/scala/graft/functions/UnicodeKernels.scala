package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression.
  *
  * The text stack's hashing and normalization are CODEPOINT-faithful
  * (Kernels.polyHash, TextOps.normText), which leaves one documented
  * divergence class: canonically-equivalent strings in different forms —
  * precomposed "é" (U+00E9) vs decomposed "e"+U+0301 — hash differently,
  * and normText STRIPS bare combining marks (Mn is not `\p{L}`), so an NFD
  * corpus silently fingerprints as its mark-stripped skeleton. Composing to
  * NFC first (UAX #15 canonical composition) closes it: both engines
  * implement the same standard algorithm — `java.text.Normalizer` (JDK,
  * public API) here, utf8proc's `nfc_normalize` in the DuckDB oracle — so
  * the results are bit-identical by construction, pinned by q_nfc_dedup.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap quick-check scan (ASCII
  * and most real-world NFC text short-circuits without rebuilding the
  * string), so the common case costs one pass and zero allocation.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeKernels.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object UnicodeKernels {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))
}
