package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally maintained per-group TOP-K — the leaderboard/ranking view
  * shape, completing the maintained-view family ([[AggDelta]] sums,
  * [[DistinctState]] distincts, [[JoinDelta]] joins, [[Scd2]] history).
  * Top-k is not retractable from the answer alone (delete the 2nd-best and
  * the new k-th must come from somewhere the answer never stored), so the
  * state is a BUFFER of the top `bufferFactor × k` rows per group plus two
  * per-group meta fields that bound what the buffer still guarantees:
  *
  *  - `_sat` — the buffer has ever truncated (items beyond it exist);
  *  - `_dret` — buffered-item retractions since the last full derivation.
  *
  * Invariant: a saturated group's buffer still contains the true top
  * `(bufferSize − _dret)`; an UNsaturated buffer IS the whole group. A
  * maintenance batch retracts/adds rows set-algebraically, re-ranks the
  * touched groups' buffers, and only when a saturated group's guarantee
  * drops below k (`bufferCap − _dret < k`, or the buffer itself shrank
  * below k) does it RE-DERIVE that group from the fact table — the rare
  * refill path deletes pay for, amortized by the buffer factor; groups
  * that never saturate (bounded domains) never re-derive at all. The
  * fact table is passed BY NAME and only evaluated on refill.
  *
  * == Refill cost (the cliff, and its structural fix) ==
  * Facts are keyed by ITEM, not group, so a refill against the fact table
  * cannot bucket-prune: ONE hungry group costs a full fact-table scan
  * (left-semi filtered to hungry groups, but every bucket is read), and a
  * delete burst concentrated on few groups re-triggers it batch after
  * batch. Two mitigations, composable:
  *
  *  - Size `bufferFactor` against the observed per-batch retraction rate:
  *    with r buffered retractions per group per batch, a saturated group
  *    refills every ~(bufferFactor−1)·k/r batches — pick the factor so
  *    that interval stays comfortably above your batch cadence (state
  *    cost is only groups × bufferFactor·k rows).
  *  - Pass `factsReplica` — a GROUP-KEYED replica of the facts (keyed
  *    `(groups…, idCols…)`, range-bucketed on the head group column;
  *    [[replicaBootstrap]] builds it, [[maintain]] keeps it current under
  *    the same epoch tag at ∝-batch cost). Refills then open only the
  *    hungry groups' buckets — the refill prunes like every other
  *    maintainer's state read, and the cliff is gone: worst case is the
  *    hungry groups' OWN rows, never the table. Storage cost is one extra
  *    copy of (groups, idCols, score) — the classic index trade.
  *
  * Contracts (the [[JoinDelta]] conventions): one event per item per
  * batch, the OLD GROUP under `oldPrefix` for U/D (retraction matches on
  * (old group, item) — the old score is not needed), groups non-null,
  * exactly-once via `batchId` + version tag. Two drift traps guard the
  * buffer: a retraction that misses its buffered row in an UNSATURATED
  * group means the before-image diverged from applied state, and an `I`
  * for an item the buffer already holds would duplicate it in the answer
  * (feeds replaying old offsets must emit those as `U` with old images,
  * as CDC connectors do) — both fail loudly, the same class as
  * [[AggDelta]]'s below-zero check.
  */
object TopKDelta {
  val SatCol = "_sat"
  val DretCol = "_dret"

  /** Shape contract for the optional GROUP-KEYED fact replica (the refill
    * cliff's structural fix — SCALING.md TopKDelta row, r8/r9 verdicts):
    * keyed `(groups…, idCols…)` and, when bucketed, RANGE-routed on the
    * first group column — so a refill probe carrying only group values can
    * bucket-prune (the same shape contract [[JoinDelta]] pins on its join
    * index). Hash routing over the full key would make the group probe
    * unanswerable without the item ids it exists to find. Multi-column
    * groups route on `groups.head` alone — still correct (all rows of a
    * group share the head value), pruning selectivity just follows the
    * head column's cardinality.
    */
  private def requireReplicaShape(replica: KeyedTable, groups: Seq[String],
                                  idCols: Seq[String]): Unit = {
    require(replica.keys == groups ++ idCols,
      s"fact replica must be keyed (${(groups ++ idCols).mkString(", ")}), " +
        s"got (${replica.keys.mkString(", ")})")
    require(replica.effectiveBuckets == 0 || replica.effectiveRangeCol.contains(groups.head),
      s"a bucketed fact replica must be range-bucketed on '${groups.head}' " +
        s"(rangeCol = Some(${groups.head}))")
  }

  /** Bootstrap the group-keyed fact replica from a full fact scan — the
    * one-time layout cost that buys bucket-pruned refills forever after.
    */
  def replicaBootstrap(replica: KeyedTable, facts: DataFrame, groups: Seq[String],
                       idCols: Seq[String], scoreCol: String): Long = {
    requireReplicaShape(replica, groups, idCols)
    replica.overwrite(facts.select((groups ++ idCols :+ scoreCol).map(col).toIndexedSeq: _*))
  }

  /** Apply one CDC batch to the fact replica — cost ∝ batch (mergeCdc on
    * the touched (group, item) keys; range routing sends each event to its
    * group's buckets). The item-keyed feed becomes (group, item)-keyed
    * events: I lands under the new group, D under the OLD group, and a U
    * that MOVES groups becomes a D(old group) + I(new group) pair — two
    * distinct keys, so the per-key latest-wins collapse never conflates
    * them. Exactly-once via the same `batchId` tag as the state apply.
    */
  def replicaMaintain(replica: KeyedTable, cdc: DataFrame, groups: Seq[String],
                      idCols: Seq[String], scoreCol: String,
                      opCol: String = "_op", oldPrefix: String = "_old_",
                      batchId: Option[String] = None): Long = {
    requireReplicaShape(replica, groups, idCols)
    // exactly-once under redelivery: the caller-side lastTag convention
    // every maintainer applies (a crash between the replica commit and the
    // state commit redelivers the epoch — the replica must no-op it)
    if (batchId.isDefined && replica.lastTag == batchId) return replica.currentVersion
    val newG = groups.map(col)
    val oldG = groups.map(g => col(oldPrefix + g))
    val moved = groups.map(g => !(col(g) <=> col(oldPrefix + g))).reduce(_ || _)
    val ins = cdc.filter(col(opCol) === "I")
      .select((newG ++ idCols.map(col) :+ col(scoreCol)).toIndexedSeq: _*)
      .withColumn(opCol, lit("I")).withColumn("_rseq", lit(1))
    val dels = cdc.filter(col(opCol) === "D")
      .select((groups.map(g => col(oldPrefix + g).as(g)) ++ idCols.map(col)
        :+ lit(null).cast(cdc.schema(scoreCol).dataType).as(scoreCol)).toIndexedSeq: _*)
      .withColumn(opCol, lit("D")).withColumn("_rseq", lit(1))
    val updStay = cdc.filter(col(opCol) === "U" && !moved)
      .select((newG ++ idCols.map(col) :+ col(scoreCol)).toIndexedSeq: _*)
      .withColumn(opCol, lit("U")).withColumn("_rseq", lit(1))
    val updMoveD = cdc.filter(col(opCol) === "U" && moved)
      .select((groups.map(g => col(oldPrefix + g).as(g)) ++ idCols.map(col)
        :+ lit(null).cast(cdc.schema(scoreCol).dataType).as(scoreCol)).toIndexedSeq: _*)
      .withColumn(opCol, lit("D")).withColumn("_rseq", lit(1))
    val updMoveI = cdc.filter(col(opCol) === "U" && moved)
      .select((newG ++ idCols.map(col) :+ col(scoreCol)).toIndexedSeq: _*)
      .withColumn(opCol, lit("I")).withColumn("_rseq", lit(2))
    val events = Seq(ins, dels, updStay, updMoveD, updMoveI).reduce(_ unionByName _)
    replica.mergeCdc(events, opCol = opCol, seqCol = "_rseq", tag = batchId)
  }

  /** The refill source read off the replica: only the hungry groups' BUCKETS
    * are opened (range routing on the head group column), then a broadcast
    * semi-join narrows to exactly the hungry groups — the same probe shape
    * as [[JoinDelta]]'s dim-side index walk. Never a full fact scan.
    */
  private def replicaRows(replica: KeyedTable, hungry: DataFrame,
                          groups: Seq[String], idCols: Seq[String],
                          scoreCol: String): DataFrame = {
    val rows = replica.bucketsOf(hungry) match {
      case Some(bs) => replica.readBuckets(bs)
      case None     => replica.current
    }
    rows.join(broadcast(hungry), groups, "left_semi")
      .select((groups ++ idCols :+ scoreCol).map(col).toIndexedSeq: _*)
  }

  private def rankCols(scoreCol: String, idCols: Seq[String]): Seq[Column] =
    col(scoreCol).desc +: idCols.map(col(_).asc)

  private def topM(df: DataFrame, groups: Seq[String], scoreCol: String,
                   idCols: Seq[String], m: Int): DataFrame = {
    val w = Window.partitionBy(groups.map(col).toIndexedSeq: _*)
      .orderBy(rankCols(scoreCol, idCols).toIndexedSeq: _*)
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_gn", count(lit(1)).over(
        Window.partitionBy(groups.map(col).toIndexedSeq: _*)))
      .filter(col("_rn") <= m)
  }

  /** Build the buffered state from a full fact scan. */
  def bootstrap(state: KeyedTable, facts: DataFrame, groups: Seq[String],
                idCols: Seq[String], scoreCol: String, k: Int,
                bufferFactor: Int = 2): Long = {
    val m = k * bufferFactor
    state.overwrite(topM(facts.select((groups ++ idCols :+ scoreCol).map(col).toIndexedSeq: _*),
        groups, scoreCol, idCols, m)
      .withColumn(SatCol, col("_gn") > m)
      .withColumn(DretCol, lit(0))
      .drop("_rn", "_gn"))
  }

  /** The answer, read off the state: true top-k per group. */
  def topK(state: DataFrame, groups: Seq[String], idCols: Seq[String],
           scoreCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groups.map(col).toIndexedSeq: _*)
      .orderBy(rankCols(scoreCol, idCols).toIndexedSeq: _*)
    state.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .select((groups ++ idCols :+ scoreCol).map(col) :+ col("_rn").as("rank"): _*)
  }

  /** Apply one CDC batch. `facts` is the POST-APPLY fact state, evaluated
    * only if some group needs a refill.
    */
  def maintain(state: KeyedTable, cdc: DataFrame, facts: => DataFrame,
               groups: Seq[String], idCols: Seq[String], scoreCol: String,
               k: Int, bufferFactor: Int = 2, opCol: String = "_op",
               oldPrefix: String = "_old_",
               batchId: Option[String] = None,
               factsReplica: Option[KeyedTable] = None): Long = {
    require(state.exists, "bootstrap the top-k state before maintaining it")
    if (batchId.isDefined && state.lastTag == batchId) return state.currentVersion
    val m = k * bufferFactor

    // one event per item + op validity, woven into the op column; pinned
    // (localCheckpoint is an action) so every check fires before ANY durable
    // write — including the replica's below: committing the replica from the
    // raw batch first would let a malformed batch corrupt it durably, and a
    // corrected redelivery under the same batchId would then no-op via
    // lastTag, silently diverging replica from facts (r10 ADVICE). The batch
    // is also scanned once for its several consumers.
    val dup = count(lit(1)).over(Window.partitionBy(idCols.map(col).toIndexedSeq: _*))
    val checked = cdc.withColumn(opCol,
      when(dup > 1, raise_error(concat(
          lit("TopKDelta: one event per item per batch — collapse chains upstream; item "),
          concat_ws(",", idCols.map(col).toIndexedSeq: _*))))
        .otherwise(Ops.checkedOp(opCol, "TopKDelta")))
      .localCheckpoint()

    // The group-keyed replica is maintained FIRST among the durable writes,
    // under the same batchId tag (its apply is ∝ batch and idempotent on
    // redelivery), so a refill this epoch reads POST-APPLY facts — same
    // contract the `facts` parameter documents. Crash between the two
    // commits → redelivery no-ops the replica and applies the state.
    factsReplica.foreach(r =>
      replicaMaintain(r, checked, groups, idCols, scoreCol, opCol, oldPrefix, batchId))

    // touched groups: new homes of I/U plus old homes of U/D
    val newGroups = checked.filter(col(opCol) =!= "D")
      .select(groups.map(col).toIndexedSeq: _*)
    val oldGroups = checked.filter(col(opCol) =!= "I")
      .select(groups.map(g => col(oldPrefix + g).as(g)).toIndexedSeq: _*)
    val touched = newGroups.unionByName(oldGroups).distinct().localCheckpoint()

    val cur = state.currentForKeys(touched).localCheckpoint()
    // per-group meta BEFORE retraction (a fully-emptied buffer must not
    // forget it was saturated)
    val meta = cur.groupBy(groups.map(col).toIndexedSeq: _*)
      .agg(max(col(SatCol)).as("_sat0"), max(col(DretCol)).as("_dret0"))

    val retract = checked.filter(col(opCol).isin("U", "D"))
      .select((groups.map(g => col(oldPrefix + g).as(g)) ++ idCols.map(col)).toIndexedSeq: _*)
      .localCheckpoint()
    val additions = checked.filter(col(opCol) =!= "D")
      .select((groups ++ idCols :+ scoreCol).map(col).toIndexedSeq: _*)

    // drift trap: a retraction must find its buffered row unless the group
    // is saturated (where items legitimately live outside the buffer)
    val misses = retract.join(cur.select((groups ++ idCols).map(col).toIndexedSeq: _*)
        .withColumn("_hit", lit(1)), (groups ++ idCols).toSeq, "left_outer")
      .join(meta, groups, "left_outer")
      .filter(col("_hit").isNull && !coalesce(col("_sat0"), lit(false)))
    if (!misses.isEmpty)
      throw new IllegalStateException(
        "TopKDelta: retraction missed its row in an unsaturated buffer — " +
          "before-images diverged from applied state: " +
          misses.select(concat_ws(",", (groups ++ idCols).map(col).toIndexedSeq: _*))
            .limit(5).collect().map(_.getString(0)).mkString("; "))
    // the dual drift trap: an I for an item the buffer already holds would
    // leave BOTH rows in the candidate (only U/D retract), so topK would
    // emit the item twice — a feed replaying an old offset must emit such
    // rows as U with old images (exactly what CDC connectors do). Items
    // buffered in UNTOUCHED groups can't be checked without a by-item
    // index; this catches the in-reach class loudly rather than none.
    val dupIns = checked.filter(col(opCol) === "I")
      .select(idCols.map(col).toIndexedSeq: _*)
      .join(cur, idCols.toSeq, "left_semi")
    if (!dupIns.isEmpty)
      throw new IllegalStateException(
        "TopKDelta: I event for an already-buffered item — emit U with old images: " +
          dupIns.select(concat_ws(",", idCols.map(col).toIndexedSeq: _*))
            .limit(5).collect().map(_.getString(0)).mkString("; "))

    // buffered retractions per group erode the guarantee
    val bufRetracts = retract.join(cur, (groups ++ idCols).toSeq, "left_semi")
      .groupBy(groups.map(col).toIndexedSeq: _*).agg(count(lit(1)).as("_bret"))

    val remaining = cur.join(retract, (groups ++ idCols).toSeq, "left_anti")
      .select((groups ++ idCols :+ scoreCol).map(col).toIndexedSeq: _*)
    val candidate = remaining.unionByName(additions).localCheckpoint()

    // per-TOUCHED-group outcome meta, anchored on `touched` rather than the
    // surviving rows — a saturated buffer fully emptied by retractions has
    // NO candidate rows left, and anchoring on rows would silently let it
    // skip the refill it needs
    val counts = candidate.groupBy(groups.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("_cn"))
    val stats = touched
      .join(meta, groups.toSeq, "left_outer")
      .join(bufRetracts, groups.toSeq, "left_outer")
      .join(counts, groups.toSeq, "left_outer")
      .withColumn(SatCol, coalesce(col("_sat0"), lit(false)) || coalesce(col("_cn"), lit(0L)) > m)
      // retraction meter: only groups that ENTERED the batch saturated
      // carry erosion forward — a group unsaturated at entry had its whole
      // membership in the candidate, so its fresh buffer is the exact
      // top-m (even if it truncates into saturation right now) and its
      // guarantee meter restarts at 0; without this reset such groups
      // refill (a fact-table read) batches earlier than necessary
      .withColumn(DretCol, when(coalesce(col("_sat0"), lit(false)),
        coalesce(col("_dret0"), lit(0)) + coalesce(col("_bret"), lit(0L)).cast("int"))
        .otherwise(lit(0)))
      .withColumn("_bufn", least(coalesce(col("_cn"), lit(0L)), lit(m.toLong)))
      .select((groups.map(col) ++ Seq(col(SatCol), col(DretCol), col("_bufn"))).toIndexedSeq: _*)
      .localCheckpoint()

    // refill: saturated groups whose guarantee (or sheer size) fell below k
    val hungry = stats
      .filter(col(SatCol) && (lit(m) - col(DretCol) < k || col("_bufn") < k))
      .select(groups.map(col).toIndexedSeq: _*)
    val kept = topM(candidate, groups, scoreCol, idCols, m)
      .join(broadcast(stats.drop("_bufn")), groups.toSeq, "left_outer")
      .join(broadcast(hungry), groups.toSeq, "left_anti")
      .select((groups ++ idCols ++ Seq(scoreCol, SatCol, DretCol)).map(col).toIndexedSeq: _*)
    val refilled =
      if (hungry.isEmpty) kept
      else {
        // refill source: the group-keyed replica when provided (bucket-
        // pruned read of only the hungry groups' buckets — the cliff fix),
        // else the item-keyed fact table (full scan, left-semi filtered)
        val src = factsReplica match {
          case Some(r) => replicaRows(r, hungry, groups, idCols, scoreCol)
          case None => facts.join(broadcast(hungry), groups, "left_semi")
            .select((groups ++ idCols :+ scoreCol).map(col).toIndexedSeq: _*)
        }
        val re = topM(src,
          groups, scoreCol, idCols, m)
          .withColumn(SatCol, col("_gn") > m)
          .withColumn(DretCol, lit(0))
          .select((groups ++ idCols ++ Seq(scoreCol, SatCol, DretCol)).map(col).toIndexedSeq: _*)
        kept.unionByName(re)
      }

    state.replaceKeys(touched, refilled, batchId)
  }
}
