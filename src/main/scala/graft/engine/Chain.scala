package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chained incremental view maintenance with a crash-safe hand-off — the
  * helper that turns [[JoinDelta.maintain]]'s documented MV-log rule into
  * enforced sequencing instead of caller discipline.
  *
  * == The gap this closes ==
  * `JoinDelta.maintain(emitChanges = true)` derives the view's own change
  * feed from PRE-apply view state, so the emission exists only on the epoch
  * that actually applies: once the view commits, a `batchId`-redelivered
  * epoch returns `None`. A caller that chains the emission into a
  * downstream maintainer ([[AggDelta]] over the view, a second
  * [[JoinDelta]] for snowflakes) therefore has a crash window — die between
  * the view commit and the downstream apply and the link is lost FOREVER:
  * the downstream view diverges silently and no replay can heal it.
  *
  * == The protocol ==
  * [[epoch]] threads a durable CHANGE-LOG table through the upstream apply:
  *
  *  1. `JoinDelta.maintain(changeLog = Some(log))` persists the emitted
  *     delta into `log` — keyed `(_epoch, viewKeys…)`, so each epoch's
  *     rows are a pure append committed atomically — BEFORE the view
  *     commits (write-ahead ordering, inside the same maintain call).
  *  2. The downstream applier is then fed FROM THE LOG, never from the
  *     in-memory emission, under the SAME `batchId` it must record on the
  *     downstream table's own tag.
  *
  * Crash anywhere and re-run with the same `batchId`:
  *  - before the log commit → nothing visible anywhere; the full epoch
  *    re-runs (every JoinDelta step is replay-idempotent against tags);
  *  - between log and view commit → base/index applies no-op via their
  *    tags, the emission re-derives bit-identically (pre-apply view state
  *    is untouched), the tagged log write is skipped, the view commits;
  *  - between view commit and downstream apply — THE GAP — maintain
  *    no-ops, but the log still holds the epoch's rows, so the downstream
  *    apply completes the chain;
  *  - after the downstream apply → the downstream tag makes it a no-op.
  *
  * The log is an ordinary [[KeyedTable]]: epochs accumulate (a real MV
  * log) and [[prune]] drops rows of epochs every consumer has applied.
  */
object Chain {
  /** Epoch column prefixing the view keys in the change-log table. */
  val EpochCol = "_epoch"

  /** A change-log table rooted at `root` for a view keyed `viewKeys` —
    * unbucketed: epoch deltas are delta-sized and read back whole by tag.
    */
  def changeLog(spark: org.apache.spark.sql.SparkSession, root: String,
                viewKeys: Seq[String]): KeyedTable =
    KeyedTable(spark, root, EpochCol +: viewKeys)

  /** Run one chained epoch: upstream [[JoinDelta.maintain]] with its
    * emission persisted write-ahead into `log`, then `applyDownstream`
    * fed from the log. `applyDownstream(emitted, batchId)` MUST record
    * `batchId` on the downstream table's own version tag (e.g.
    * [[AggDelta.maintain]]`(…, batchId = Some(batchId))`) — that tag is
    * what makes the hand-off exactly-once; the emitted frame carries the
    * view's columns plus `oldPrefix` images and `opCol`, exactly the
    * convention every maintainer here consumes.
    */
  def epoch(factTable: KeyedTable, dimTable: KeyedTable, view: KeyedTable,
            index: KeyedTable, log: KeyedTable,
            factDelta: Option[DataFrame], dimDelta: Option[DataFrame],
            dimRef: String, dimKey: String, batchId: String,
            joinType: String = "inner", opCol: String = "_op",
            seqCol: String = "_seq", oldPrefix: String = "_old_")(
            applyDownstream: (DataFrame, String) => Unit): Unit = {
    JoinDelta.maintain(factTable, dimTable, view, index, factDelta, dimDelta,
      dimRef, dimKey, batchId, joinType, opCol, seqCol, oldPrefix,
      changeLog = Some(log))
    // feed downstream from the DURABLE log, not the in-memory emission —
    // on the crash-resume path maintain returned without emitting, and the
    // log is the only place the epoch's delta still exists
    applyDownstream(emitted(log, batchId), batchId)
  }

  /** The emitted delta `log` holds for `batchId` (empty if the epoch
    * changed nothing — downstream appliers treat that as a no-op batch).
    */
  def emitted(log: KeyedTable, batchId: String): DataFrame = {
    require(log.exists, s"change log has no committed epochs yet")
    log.current.filter(col(EpochCol) === batchId).drop(EpochCol)
  }

  /** Drop log rows of epochs other than `keepEpochs` — run once every
    * chained consumer has acknowledged them (each consumer's own tag says
    * so). Kept explicit rather than automatic: the log cannot know how
    * many downstream readers exist.
    */
  def prune(log: KeyedTable, keepEpochs: Set[String]): Long = {
    val stale = log.current.filter(!col(EpochCol).isInCollection(keepEpochs.toSeq))
      .select(log.keys.map(col).toIndexedSeq: _*)
    log.replaceKeys(stale, log.current.limit(0))
  }
}
