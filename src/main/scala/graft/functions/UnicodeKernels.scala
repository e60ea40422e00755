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

/** Precompiled table for [[ScriptRoute]]: the script classes' literal
  * char-class strings parsed into sorted disjoint codepoint ranges, the
  * script→language routes resolved to class indexes, and the kana-override
  * constants. Built from the SAME `TextOps.ScriptClasses` /
  * `ScriptUniqueLangs` / `KanaRouteInv` values the oracle SQL generator
  * embeds — the kernel cannot drift from the regex formulation because its
  * ranges are parsed out of the identical class strings.
  */
final class ScriptRouteTable(classes: Seq[(String, String)],
                             routes: Seq[(String, String)],
                             val kanaInv: Int) extends Serializable {
  val nClasses: Int = classes.size
  val (los, his, cls) = {
    val rs = classes.zipWithIndex.flatMap { case ((_, cc), idx) =>
      ScriptRouteTable.parseRanges(cc).map { case (lo, hi) => (lo, hi, idx) }
    }.sortBy(_._1)
    rs.sliding(2).foreach {
      case Seq((_, hiA, _), (loB, _, _)) =>
        require(hiA < loB, s"script-class ranges overlap: $hiA >= $loB — " +
          "per-codepoint single-class counting would diverge from the " +
          "independent per-class regex counts")
      case _ =>
    }
    (rs.map(_._1).toArray, rs.map(_._2).toArray, rs.map(_._3).toArray)
  }
  val routeOf: Array[UTF8String] = {
    val m = routes.toMap
    classes.map { case (name, _) =>
      m.get(name).map(UTF8String.fromString).orNull
    }.toArray
  }
  val cjkIdx: Int = classes.indexWhere(_._1 == "cjk")
  val kanaIdx: Int = classes.indexWhere(_._1 == "kana")
  val ja: UTF8String = UTF8String.fromString("ja")
}

object ScriptRouteTable {
  /** Parse a LITERAL character class ("[A-Za-zÀ-ɏ]") into inclusive
    * codepoint ranges. Only bare chars and `x-y` ranges — any escape or
    * metachar is a construction-time error, so a class string the regex
    * engines would read differently can never silently reach the kernel.
    */
  private[functions] def parseRanges(cc: String): Seq[(Int, Int)] = {
    require(cc.startsWith("[") && cc.endsWith("]"), s"not a literal class: $cc")
    val body = cc.substring(1, cc.length - 1)
    require(!body.exists(c => c == '\\' || c == '^' || c == '[' ||
        c == ']' || c == '&'),
      s"non-literal class unsupported: $cc") // ']' ends a regex class early;
    // '&' could form Java's [a&&b] intersection — either would make the
    // parsed ranges diverge from what the regex engines match
    val cps = body.codePoints().toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < cps.length) {
      if (i + 2 < cps.length && cps(i + 1) == '-') {
        require(cps(i) <= cps(i + 2), s"inverted range in $cc")
        out += ((cps(i), cps(i + 2))); i += 3
      } else { out += ((cps(i), cps(i))); i += 1 }
    }
    out.toSeq
  }
}

object UnicodeKernels {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** One-pass script routing — bit-identical to the expression formulation
    * `TextOps.langRouteExpr` (24 per-class regex-strip counts → greatest →
    * first-match dominant → kana-share override → script-unique route),
    * which stays the spec-pinned semantics reference and the shape the
    * DuckDB oracle runs. The expression form re-embeds the 24-regex
    * `greatest` tree into every CASE branch (~500 regex nodes after
    * Catalyst's alias substitution — ~2 s of optimizer+codegen per launch,
    * and a full regex rewrite of the text per node wherever runtime CSE
    * can't reach); this is one codepoint loop with a binary search over
    * ~40 sorted ranges. Returns the routed language, or NULL when the
    * document must fall through to the stopword scorer (shared script or
    * no script hit) — null rather than a sentinel so the caller composes
    * with ONE kernel reference (`coalesce(route, langId)`), not a CASE
    * that would duplicate the node and lean on codegen CSE.
    */
  def scriptRoute(s: UTF8String, t: ScriptRouteTable): UTF8String = {
    val str = s.toString
    val counts = new Array[Int](t.nClasses)
    var total = 0
    val los = t.los; val his = t.his; val cls = t.cls
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      total += 1
      var lo = 0
      var hi = los.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (cp < los(mid)) hi = mid - 1
        else if (cp > his(mid)) lo = mid + 1
        else { counts(cls(mid)) += 1; hi = lo - 1 } // found → exit
      }
    }
    var best = 0
    var bi = -1
    var k = 0
    while (k < counts.length) { // strict > keeps the FIRST argmax (tie-break order)
      if (counts(k) > best) { best = counts(k); bi = k }
      k += 1
    }
    if (best == 0) return null // "und" → stopword scorer
    if (bi == t.cjkIdx && t.kanaIdx >= 0 &&
        counts(t.kanaIdx).toLong * t.kanaInv >= total) return t.ja
    t.routeOf(bi) // null for shared scripts → stopword scorer
  }

  def nfc_normalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))

  def script_route(c: Column, classes: Seq[(String, String)],
                   routes: Seq[(String, String)], kanaInv: Int): Column =
    GraftColumnBridge.column(ScriptRoute(
      GraftColumnBridge.expression(c), classes, routes, kanaInv))
}

/** See [[UnicodeKernels.scriptRoute]]. Class/route tables are Seq params so
  * the case class keeps value equality for plan canonicalization; the
  * parsed range table rides the plan as a codegen reference object.
  */
case class ScriptRoute(child: Expression, classes: Seq[(String, String)],
                       routes: Seq[(String, String)], kanaInv: Int)
  extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  // Parse + validate the routing tables AT EXPRESSION CONSTRUCTION (driver,
  // plan-build time): the literal-class parser and the disjoint-range
  // require live in ScriptRouteTable's constructor, and behind a bare lazy
  // val a malformed future ScriptClasses entry would surface as an executor
  // task/codegen failure mid-query instead of an error at registration
  // (ADVICE r15). @transient val: rebuilt-as-null after executor
  // deserialization, where the lazy val re-derives it — validation already
  // happened on the driver by then. MEMOIZED per table (ADVICE r16):
  // Catalyst copies/transforms the expression dozens of times during
  // analysis+optimization, and the tables are engine constants — the
  // regex-class parse + disjointness sweep should run once per distinct
  // table per JVM, not once per plan transform.
  @transient private val validated = ScriptRoute.tableFor(classes, routes, kanaInv)
  @transient private lazy val table =
    if (validated != null) validated else ScriptRoute.tableFor(classes, routes, kanaInv)

  override def nullSafeEval(input: Any): Any =
    UnicodeKernels.scriptRoute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("scriptRouteTable", table,
      classOf[ScriptRouteTable].getName)
    nullSafeCodeGen(ctx, ev, c => { // result may be null (fall-through)
      val r = ctx.freshName("graftRoute")
      s"""
      org.apache.spark.unsafe.types.UTF8String $r =
        graft.functions.UnicodeKernels.scriptRoute($c, $tRef);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r; }"""
    })
  }
  override protected def withNewChildInternal(newChild: Expression): ScriptRoute =
    copy(child = newChild)
}

object ScriptRoute {
  // One parsed+validated table per distinct (classes, routes, kanaInv) per
  // JVM. Unbounded map on purpose: keys are engine constants (ScriptClasses
  // and friends), so the population is a handful of entries for the
  // process's lifetime. First construction with a malformed table still
  // throws at the caller — the fail-early contract is unchanged.
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (Seq[(String, String)], Seq[(String, String)], Int), ScriptRouteTable]()
  private[functions] def tableFor(classes: Seq[(String, String)],
                                  routes: Seq[(String, String)],
                                  kanaInv: Int): ScriptRouteTable =
    memo.computeIfAbsent((classes, routes, kanaInv),
      k => new ScriptRouteTable(k._1, k._2, k._3))
}
