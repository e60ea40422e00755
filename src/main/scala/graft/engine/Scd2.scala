package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history maintenance over a [[KeyedTable]] — the
  * history-PRESERVING sink for an op-coded CDC feed, where [[KeyedTable
  * .mergeCdc]] is the history-DESTROYING one. The reference's warehouse dims
  * are SCD-1 (`updateable: true` overwrites in place — `dataflow/
  * New_BookingTransformation.json:142-179`); type 2 is the standard
  * warehouse upgrade of that same contract: an update CLOSES the key's open
  * row (`valid_to` = the event's sequence) and opens a new one, a delete
  * closes without opening, an insert opens. Every state a key ever had
  * remains queryable (`AS OF` = `valid_from <= s AND (valid_to IS NULL OR
  * valid_to > s)`), with `is_current` marking the live row.
  *
  * == Shape ==
  * The history table is keyed by the NATURAL key only, so a key's whole
  * history co-locates in one bucket and one maintenance apply touches
  * exactly the buckets the batch's keys route to. Rows are one-per-version
  * — the multi-row-per-key case [[KeyedTable.replaceKeys]] exists for:
  * maintenance recomputes the touched keys' history groups (closed rows
  * pass through untouched; the open row and the batch's events are lined up
  * per key and re-segmented by one `lead` window) and atomically replaces
  * the groups. Cost is ∝ |batch| + |touched keys' history|, never ∝ table.
  *
  * == In-batch chains ==
  * A batch may carry several events for one key (I→U→D …). Each non-`D`
  * event becomes a history row valid from its own sequence to the NEXT
  * event's sequence (whatever its op); `D` contributes only its closing
  * boundary. So U@1,D@2 leaves `[1,2)` closed and no open row; D@2,I@3
  * re-opens at 3 with a `[.,2)` close behind it — tombstone gaps are real
  * intervals in which the key does not exist.
  *
  * == Contracts ==
  *  - Sequences must be strictly monotonic per key ACROSS batches: every
  *    event must be `>` the key's recorded history boundary
  *    (max of `valid_to`/`valid_from` over its rows) — an out-of-order
  *    event would have to rewrite closed history, so it fails in-plan
  *    (`raise_error`) rather than corrupt it. Within a batch, one (key,
  *    seq) must carry at most one event unless EVERY event at it is a
  *    tombstone: any survivor sharing its seq with another event — even a
  *    tombstone — is order-ambiguous (does the D close the U, or lose to
  *    it?) and fails in-plan; all-tombstone duplicates collapse harmlessly
  *    (same boundary, no row, either order). Sequences must be non-null
  *    and long-castable — a null seq fails in-plan, never a NULL
  *    `valid_from`.
  *  - `I` on a key with an open row behaves like `U` (replay-tolerant, the
  *    same rule as [[KeyedTable.mergeCdc]]); `D` on a key with no open row
  *    is a no-op (tombstones outlive their rows in every real feed).
  *  - Because out-of-order events fail loudly, naive re-apply of an old
  *    batch ERRORS rather than no-ops — exactly-once comes from `batchId`
  *    + the table's version tag ([[KeyedTable.lastTag]]), which covers the
  *    foreachBatch-retry window like [[AggDelta.maintain]].
  */
object Scd2 {
  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"
  val IsCurrent = "is_current"
  private val MetaCols = Seq(ValidFrom, ValidTo, IsCurrent)

  /** Open one history row per snapshot row, all valid from `seq0`. */
  def bootstrap(hist: KeyedTable, snapshot: DataFrame, seq0: Long = 0L): Long = {
    require(MetaCols.forall(c => !snapshot.columns.contains(c)),
      s"snapshot must not already carry ${MetaCols.mkString("/")}")
    hist.overwrite(snapshot
      .withColumn(ValidFrom, lit(seq0))
      .withColumn(ValidTo, lit(null).cast("long"))
      .withColumn(IsCurrent, lit(true)))
  }

  /** The table AS OF sequence `s`: each key's row whose validity interval
    * covers `s` — `valid_from <= s < valid_to` (from-inclusive,
    * to-exclusive: an event at `s` is already visible at `s`, and the row
    * it closed is not). Keys inside a tombstone gap at `s` have no row.
    * Kept a pure filter so it composes with any history frame (the stored
    * table's `current`, a bucket-pruned slice, the streaming twin's state).
    */
  def asOf(history: DataFrame, s: Long): DataFrame =
    history.filter(col(ValidFrom) <= s && (col(ValidTo).isNull || col(ValidTo) > s))

  /** POINT-IN-TIME join — each probe row joins the history row that was in
    * force AT the probe's own sequence (`valid_from <= t < valid_to`): the
    * feature-store join that makes training data leakage-free (a fact must
    * see the dim attributes AS THEY WERE, never a later update). `how` is
    * `inner` (probes inside tombstone gaps or before first insert drop) or
    * `left` (they survive with null history payload).
    *
    * Plan shape: equi-join on the key columns plus the interval predicates
    * in the JOIN CONDITION — Spark executes it as a hash/sort-merge join on
    * the keys with the range filter applied as the rows pair up, so cost is
    * ∝ matching key pairs (a key's probes × its history rows), never a
    * cross product; at most one history row survives per probe because a
    * key's intervals are disjoint by construction. History columns that
    * collide with probe columns get `histPrefix` so both sides' values stay
    * visible.
    */
  def temporalJoin(probes: DataFrame, history: DataFrame, keys: Seq[String],
                   tsCol: String, how: String = "inner",
                   histPrefix: String = "hist_"): DataFrame = {
    require(how == "inner" || how == "left", s"how must be inner|left, got $how")
    val collide = history.columns.filter(c => !keys.contains(c) && probes.columns.contains(c))
    val h0 = collide.foldLeft(history)((d, c) => d.withColumnRenamed(c, histPrefix + c))
    require(h0.columns.count(probes.columns.toSet) == keys.size,
      s"histPrefix '$histPrefix' still collides with probe columns")
    val vf = if (collide.contains(ValidFrom)) histPrefix + ValidFrom else ValidFrom
    val vt = if (collide.contains(ValidTo)) histPrefix + ValidTo else ValidTo
    val cond = keys.map(k => probes(k) === h0(k)).reduce(_ && _) &&
      h0(vf) <= probes(tsCol) && (h0(vt).isNull || h0(vt) > probes(tsCol))
    keys.foldLeft(probes.join(h0, cond, how))((d, k) => d.drop(h0(k)))
  }

  /** Apply one op-coded CDC batch (`opCol` ∈ I/U/D, `seqCol` ordering events
    * within and across batches) to the history table. Returns the committed
    * version (the current one when `batchId` was already applied).
    */
  def maintain(hist: KeyedTable, batch: DataFrame, opCol: String = "_op",
               seqCol: String = "_seq", batchId: Option[String] = None): Long = {
    require(hist.exists, "bootstrap the history table before maintaining it")
    if (batchId.isDefined && hist.lastTag == batchId) return hist.currentVersion
    val keys = hist.keys
    val payload = hist.current.columns.filterNot(MetaCols.contains).toSeq
    require(payload.forall(batch.columns.contains),
      s"CDC batch must carry every payload column: ${payload.mkString(", ")}")
    val reserved = Seq("_vseq", "_vop", "_dup", "_hist_max").filter(payload.contains)
    require(reserved.isEmpty,
      s"payload columns collide with Scd2 internals: ${reserved.mkString(", ")}")

    // in-plan op validation BEFORE anything drops rows (shared rule:
    // Ops.checkedOp), and a null-rejecting sequence cast: a null or
    // uncastable seq on a NEW key would sail past the monotonicity guard
    // (null boundary comparisons are conservative the wrong way there) and
    // commit a history row with NULL valid_from — invisible to every asOf
    // and temporal read. Silent corruption, so it fails in-plan instead.
    val seqChecked = {
      val c = col(seqCol).cast("long")
      when(c.isNotNull, c).otherwise(raise_error(concat(
        lit(s"Scd2: sequence column '$seqCol' must cast to a non-null long, got "),
        coalesce(col(seqCol).cast("string"), lit("null")))))
    }
    // same class of trap for the NATURAL KEY: a null-keyed event passes the
    // seq/op checks, but replaceKeys' key equality is null-unsafe, so its
    // "group" never matches prior rows and every batch appends a fresh
    // duplicate history row for the null key — silent, unbounded corruption.
    // Keys are identity here (not payload), so null is a contract violation
    // and fails in-plan like the null seq does.
    def keyChecked(k: String) =
      when(col(k).isNotNull, col(k)).otherwise(raise_error(
        lit(s"Scd2: natural-key column '$k' must be non-null"))).as(k)
    val ev = batch.select(
      (payload.map(c => if (keys.contains(c)) keyChecked(c) else col(c))
        :+ seqChecked.as("_vseq")
        :+ Ops.checkedOp(opCol, "Scd2").as("_vop")).toIndexedSeq: _*)

    // pinned: the touched-key frame feeds the state read, the guard join
    // and the final replace — without the pin each consumer re-scans the
    // batch (the AggDelta lesson, measured there)
    val touched = batch.select(keys.map(col).toIndexedSeq: _*)
      .distinct().localCheckpoint()
    // bucket-pruned history of the touched keys, read once for its three
    // consumers (boundary guard, open rows, closed pass-through)
    val existing = hist.currentForKeys(touched).localCheckpoint()

    // strict-monotonicity guard: every event must land AFTER the key's
    // recorded boundary — rewriting closed history is corruption, not merge
    val maxb = existing.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(max(coalesce(col(ValidTo), col(ValidFrom))).as("_hist_max"))
    val evGuarded = ev.join(broadcast(maxb), keys, "left_outer")
      .withColumn("_vseq",
        when(col("_hist_max").isNull || col("_vseq") > col("_hist_max"), col("_vseq"))
          .otherwise(raise_error(concat(
            lit("Scd2: out-of-order CDC — event at or before the recorded history boundary for key "),
            concat_ws(",", keys.map(col).toIndexedSeq: _*)))))
      .drop("_hist_max")

    // the open row joins the event line as a pseudo-event at its own
    // valid_from (strictly first — the guard above enforces it), so one
    // lead() re-segments old open row + new events uniformly
    val open = existing.filter(col(IsCurrent))
      .select((payload.map(col) :+ col(ValidFrom).as("_vseq")
        :+ lit("O").as("_vop")).toIndexedSeq: _*)
    val closedRows = existing.filter(!col(IsCurrent))
      .select((payload.map(col) :+ col(ValidFrom) :+ col(ValidTo)
        :+ col(IsCurrent)).toIndexedSeq: _*)

    val perKey = Window.partitionBy(keys.map(col).toIndexedSeq: _*).orderBy(col("_vseq"))
    val dupes = count(lit(1))
      .over(Window.partitionBy((keys :+ "_vseq").map(col).toIndexedSeq: _*))
    val segmented = evGuarded.unionByName(open)
      .withColumn("_dup", dupes)
      .withColumn(ValidTo, lead(col("_vseq"), 1).over(perKey))
    // D rows contributed their boundary via lead(); only survivors emit.
    // The dup check rides the survivors' projection: two surviving events
    // at one (key, seq) are ambiguous → fail; duplicate tombstones collapse
    // to the same boundary and no row — deterministic, allowed.
    val rebuilt = segmented.filter(col("_vop") =!= "D")
      .select((payload.map(col) :+
        when(col("_dup") === 1, col("_vseq")).otherwise(raise_error(concat(
          lit("Scd2: duplicate sequence within a key — event order is ambiguous for key "),
          concat_ws(",", keys.map(col).toIndexedSeq: _*)))).as(ValidFrom) :+
        col(ValidTo) :+ col(ValidTo).isNull.as(IsCurrent)).toIndexedSeq: _*)

    hist.replaceKeys(touched, closedRows.unionByName(rebuilt), batchId)
  }
}
