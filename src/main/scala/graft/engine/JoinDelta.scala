package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally MAINTAINED JOIN VIEW — the denormalized `fact ⋈ dim` table
  * a warehouse serves queries from, kept fresh from op-coded CDC deltas of
  * EITHER side without ever re-running the join over the base tables. This
  * is the join counterpart of [[AggDelta]] (aggregates) and [[Scd2]]
  * (history): together they cover the three classic materialized-view
  * shapes over a CDC feed.
  *
  * == The dim-side fan-out problem, and the join index ==
  * A fact-side delta touches exactly its own view rows — cost ∝ |Δfact|.
  * A dim-side delta touches EVERY fact row referencing the changed dim
  * keys; finding those rows in a fact table bucketed by FACT key would be
  * a full scan. So the view is maintained alongside a JOIN INDEX — a
  * `(dimRef, factKey)` pair table range-bucketed on `dimRef` (dim-ref
  * routing only needs that one column, so a dim delta's key set resolves
  * its buckets without knowing any fact keys) — the materialized-view-log
  * pattern: dim delta → bucket-pruned index probe → affected fact keys,
  * cost ∝ |Δdim| + |referencing facts|, never ∝ |fact table|.
  *
  * == Maintenance algebra ==
  * Affected fact keys = Δfact's keys ∪ index-probe(Δdim's keys). Facts
  * whose dim REFERENCE changed ride the first term (they are fact updates),
  * so the probe never needs the pre-update index specifically — the apply
  * order is crash-safe. The affected keys' view rows are then RECOMPUTED
  * from post-apply base-table state (bucket-pruned reads on both sides)
  * and swapped in atomically via [[KeyedTable.replaceKeys]] — a fact
  * delete, or an inner-join dim delete cascading its facts' rows away,
  * falls out of the replace algebra with no tombstone path. The index
  * itself is maintained from Δfact's before-images (`_old_<dimRef>` for
  * U/D — the [[AggDelta]] image convention): old pair out, new pair in.
  *
  * == Contracts ==
  *  - ONE event per key per delta (fact and dim) — enforced in-plan. Feeds
  *    with in-batch chains collapse upstream ([[Ops.latestPerKey]]); the
  *    restriction exists because a chain's net index transition needs the
  *    FIRST old image and the LAST new one, which a flat row set can't
  *    express unambiguously.
  *  - U/D fact events must carry a non-null `_old_<dimRef>` matching the
  *    applied state (enforced non-null in-plan; a WRONG image strands a
  *    stale index pair — same silent-corruption class as AggDelta's
  *    mis-imaged retraction, and same remedy: transactional CDC images).
  *    Feeds whose dim reference is genuinely NULLABLE (a left-join fact
  *    with no dim) opt in via `nullableRef = true`, which reads a null
  *    image as "the old reference WAS null" — the same trust level the
  *    engine already extends to image VALUES — instead of "image missing".
  *    The opt-in is feed-WIDE, not per-transition (r11 ADVICE): it
  *    disables the missing-image trap for EVERY U/D event, so a buggy feed
  *    that drops a genuinely non-null old image no longer fails loudly —
  *    the stale (old-ref, factKey) pair just stays in the index as dead
  *    weight (never probed for the view, but re-joined on every dim epoch
  *    touching that ref, and ACCUMULATING WITHOUT BOUND under a
  *    chronically image-dropping feed). View results stay correct either
  *    way; the costs are index bloat and recompute. Operators of nullable
  *    feeds should reconcile periodically: rebuild the index from fact
  *    state (`bootstrap` onto a fresh root) or diff
  *    `index.current.count()` against the fact table's non-null-ref count
  *    — a growing gap is the dropped-image signature.
  *  - NULL dim references never enter the index (r10 ADVICE): a NULL ref
  *    matches no dim row, so a (NULL, factKey) pair could never be probed
  *    (the dim-delta semi-join is null-intolerant) — and NULL keys are
  *    unaddressable by [[KeyedTable]]'s anti-join algebra, which now
  *    rejects them loudly. Facts with NULL refs still flow through the
  *    VIEW correctly (they ride the Δfact term; the left join emits their
  *    row with null dim columns).
  *  - `batchId` is REQUIRED: one epoch writes up to four tables (fact,
  *    dim, index, view), and the per-table version tags are what make a
  *    crash-interrupted epoch resumable — redelivery skips the tables that
  *    already carry the tag and re-runs the rest (every step is
  *    replay-idempotent against applied state).
  *  - dim rows are keyed by `dimKey` (immutable — it IS the key), so dim
  *    deltas need no before-images.
  */
object JoinDelta {

  /** The view plan, shared verbatim by bootstrap and maintenance: facts
    * joined to dims on `dimRef = dimKey`, dim's key column dropped (it
    * duplicates the fact's reference column). `joinType` is `inner` or
    * `left` — the reference's lookup shape (T2) is the left-outer one.
    */
  def viewPlan(facts: DataFrame, dims: DataFrame, dimRef: String,
               dimKey: String, joinType: String): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"joinType must be inner|left, got $joinType")
    require(dimRef != dimKey,
      "fact's dim-reference column and dim's key column must be named differently")
    val overlap = facts.columns.toSet.intersect(dims.columns.toSet)
    require(overlap.isEmpty, s"fact/dim column names must be disjoint: ${overlap.mkString(", ")}")
    facts.join(dims, facts(dimRef) === dims(dimKey), joinType).drop(dimKey)
  }

  /** Build view + index from full base scans — the one-time bootstrap. */
  def bootstrap(view: KeyedTable, index: KeyedTable, facts: DataFrame,
                dims: DataFrame, dimRef: String, dimKey: String,
                joinType: String = "inner"): Unit = {
    requireIndexShape(view, index, dimRef)
    view.overwrite(viewPlan(facts, dims, dimRef, dimKey, joinType))
    // NULL refs never enter the index — unprobeable and unaddressable (see
    // the contract above); the maintenance path filters them identically
    index.overwrite(facts.filter(col(dimRef).isNotNull)
      .select((dimRef +: view.keys).map(col).toIndexedSeq: _*))
  }

  private def requireIndexShape(view: KeyedTable, index: KeyedTable, dimRef: String): Unit = {
    require(index.keys == dimRef +: view.keys,
      s"join index must be keyed ($dimRef, ${view.keys.mkString(", ")}), got ${index.keys.mkString(", ")}")
    // a BUCKETED index must route by dimRef alone: hash routing over the
    // full (dimRef, factKey) pair would make the dim probe unanswerable
    // without the fact keys it exists to find (unbucketed stays legal —
    // the probe falls back to a full index read)
    require(index.effectiveBuckets == 0 || index.effectiveRangeCol.contains(dimRef),
      s"a bucketed join index must be range-bucketed on '$dimRef' (rangeCol = Some($dimRef))")
  }

  /** Apply one epoch: `factDelta`/`dimDelta` (either may be absent) to the
    * base tables, the index, and the view — each table exactly once under
    * `batchId` redelivery.
    *
    * With `emitChanges = true`, also returns the VIEW'S OWN op-coded delta
    * (new images under the view's column names, old images under
    * `oldPrefix`, `opCol` ∈ I/U/D; unchanged recomputed rows suppressed) —
    * CDC out of a maintained view, which chains straight into any
    * downstream maintainer ([[AggDelta]] over the view, a second
    * [[JoinDelta]] for snowflakes): the change-propagation graph. The
    * emission is derived from pre-apply view state, so it exists only on
    * the epoch that actually applies — on a `batchId`-redelivered epoch
    * this returns None. A production chain should therefore NOT consume
    * the return value directly: use [[Chain.epoch]], which passes a
    * durable `changeLog` here (the emission commits into it BEFORE the
    * view commits) and feeds the downstream maintainer from that log —
    * closing the crash window between the view commit and the downstream
    * apply that hand-wiring loses the link in (ChainSpec pins the resume).
    */
  def maintain(factTable: KeyedTable, dimTable: KeyedTable, view: KeyedTable,
               index: KeyedTable, factDelta: Option[DataFrame],
               dimDelta: Option[DataFrame], dimRef: String, dimKey: String,
               batchId: String, joinType: String = "inner",
               opCol: String = "_op", seqCol: String = "_seq",
               oldPrefix: String = "_old_",
               emitChanges: Boolean = false,
               changeLog: Option[KeyedTable] = None,
               nullableRef: Boolean = false): Option[DataFrame] = {
    requireIndexShape(view, index, dimRef)
    require(Seq(factTable, dimTable, view, index).forall(_.exists),
      "bootstrap all four tables before maintaining")
    // the base tables must key-align with the view, or the base applies
    // (by factTable/dimTable keys) and the view/index replaces (by
    // view.keys) would silently disagree about what one "row" is
    require(factTable.keys == view.keys,
      s"fact table keys ${factTable.keys.mkString(",")} must equal view keys ${view.keys.mkString(",")}")
    require(dimTable.keys == Seq(dimKey),
      s"dim table must be keyed ($dimKey), got ${dimTable.keys.mkString(",")}")
    val fk = view.keys
    def fresh(t: KeyedTable): Boolean = !t.lastTag.contains(batchId)
    // the view commits LAST, so its tag marks the whole epoch complete —
    // skip before paying the delta pins (the AggDelta early-return shape)
    if (!fresh(view)) return None

    // one-event-per-key + op validity + (fact) old-image presence, woven
    // into the op column so the pin below forces every check before any
    // table is written
    def checked(df: DataFrame, keyCols: Seq[String], needOldImage: Boolean): DataFrame = {
      val dup = count(lit(1)).over(Window.partitionBy(keyCols.map(col).toIndexedSeq: _*))
      val base = Ops.checkedOp(opCol, "JoinDelta")
      val oneEvent = when(dup === 1, base).otherwise(raise_error(concat(
        lit("JoinDelta: one event per key per epoch — collapse chains upstream; key "),
        concat_ws(",", keyCols.map(col).toIndexedSeq: _*))))
      // nullableRef reads a null old image as "old ref WAS null" (legal for
      // a left-join fact) rather than "image missing" — strict mode keeps
      // the forgotten-image trap for schemas whose refs are non-null
      val guarded = if (!needOldImage || nullableRef) oneEvent else
        when(col(opCol).isin("U", "D") && col(oldPrefix + dimRef).isNull,
          raise_error(concat(
            lit(s"JoinDelta: U/D fact event missing before-image '$oldPrefix$dimRef' for key "),
            concat_ws(",", keyCols.map(col).toIndexedSeq: _*))))
          .otherwise(oneEvent)
      df.withColumn(opCol, guarded).localCheckpoint()
    }
    val fd = factDelta.map(checked(_, fk, needOldImage = true))
    val dd = dimDelta.map(checked(_, Seq(dimKey), needOldImage = false))

    // 1+2: base tables (mergeCdc drops the _old_/op/seq columns itself)
    fd.foreach(d => if (fresh(factTable)) factTable.mergeCdc(d, opCol, seqCol, Some(batchId)))
    dd.foreach(d => if (fresh(dimTable)) dimTable.mergeCdc(d, opCol, seqCol, Some(batchId)))

    // 3: join index from the fact delta's image transitions. NULL refs are
    // excluded on BOTH sides (r10 ADVICE): a (NULL, factKey) pair is dead
    // weight the dim probe can never reach, and a NULL key tuple would trip
    // KeyedTable's NULL-key rejection — previously it hit the covered-keys
    // error with a misleading message, hard-failing legal left-join epochs.
    fd.foreach { d =>
      if (fresh(index)) {
        val pairCols = (dimRef +: fk).map(col).toIndexedSeq
        val oldPairs = d.filter(col(opCol).isin("U", "D") && col(oldPrefix + dimRef).isNotNull)
          .select((col(oldPrefix + dimRef).as(dimRef) +: fk.map(col)).toIndexedSeq: _*)
        val newPairs = d.filter(col(opCol) =!= "D" && col(dimRef).isNotNull).select(pairCols: _*)
        index.replaceKeys(oldPairs.unionByName(newPairs), newPairs, Some(batchId))
      }
    }

    // 4: affected fact keys — Δfact's own keys plus the index probe of
    // Δdim's keys (range-bucket-pruned: the probe frame carries only the
    // index's rangeCol, which is all range routing needs)
    val fromFacts = fd.map(_.select(fk.map(col).toIndexedSeq: _*))
    val fromDims = dd.map { d =>
      val dks = d.select(col(dimKey).as(dimRef)).distinct()
      val idxRows = index.bucketsOf(dks) match {
        case Some(bs) => index.readBuckets(bs)
        case None     => index.current
      }
      idxRows.join(broadcast(dks), Seq(dimRef), "left_semi")
        .select(fk.map(col).toIndexedSeq: _*)
    }
    val affected = (fromFacts.toSeq ++ fromDims.toSeq)
      .reduceOption(_ unionByName _)
      .getOrElse(return None)
      .distinct().localCheckpoint()

    // 5: recompute the affected rows from post-apply state (both reads
    // bucket-pruned + broadcast-semi-joined) and swap the groups atomically.
    // The fact frame is pinned: un-pinned it re-reads the touched fact
    // buckets once per consumer (the dim-key collect, the dim semi-join,
    // the post materialization) — the scanned-exactly-once rule every
    // other maintainer here already follows
    val facts = factTable.currentForKeys(affected).localCheckpoint()
    val dims = dimTable.currentForKeys(facts.select(col(dimRef).as(dimKey)))
    val post = viewPlan(facts, dims, dimRef, dimKey, joinType).localCheckpoint()
    // change emission reads PRE-apply view rows — derive before the swap
    val changes = if (!emitChanges && changeLog.isEmpty) None
      else Some(viewChanges(view.currentForKeys(affected).localCheckpoint(),
        post, fk, opCol, oldPrefix))
    // MV log: the emitted delta becomes DURABLE (keyed by epoch, so the
    // write is a pure append) BEFORE the view commits — the write-ahead
    // ordering that closes the crash window [[Chain.epoch]] exists for. A
    // replay after a crash between log and view commit re-derives the
    // identical emission (pre-apply view state is unchanged) and skips the
    // tagged log write.
    changeLog.foreach { log =>
      require(log.keys == Chain.EpochCol +: fk,
        s"change log must be keyed (${Chain.EpochCol}, ${fk.mkString(", ")}), got ${log.keys.mkString(", ")}")
      require(!post.columns.contains(Chain.EpochCol),
        s"view column '${Chain.EpochCol}' collides with the change-log epoch column")
      if (fresh(log)) {
        val tagged = changes.get.withColumn(Chain.EpochCol, lit(batchId))
        log.replaceKeys(tagged.select((Chain.EpochCol +: fk).map(col).toIndexedSeq: _*),
          tagged, Some(batchId))
      }
    }
    view.replaceKeys(affected, post, Some(batchId))
    if (emitChanges) changes else None
  }

  /** The view's op-coded delta between its pre-apply rows and the
    * recomputed ones (both restricted to the affected keys): appeared → I,
    * vanished → D (old images only), changed → U with both images;
    * bit-identical recomputed rows are suppressed (null-safe struct
    * compare). The output is exactly the image convention downstream
    * maintainers consume.
    */
  private def viewChanges(pre: DataFrame, post: DataFrame, keys: Seq[String],
                          opCol: String, oldPrefix: String): DataFrame = {
    val payload = post.columns.filterNot(keys.contains).toSeq
    val o = payload.foldLeft(pre)((d, c) => d.withColumnRenamed(c, oldPrefix + c))
      .withColumn("_had", lit(1))
    val n = post.withColumn("_has", lit(1))
    n.join(o, keys.toSeq, "full_outer")
      .withColumn(opCol,
        when(col("_had").isNull, "I")
          .when(col("_has").isNull, "D")
          .otherwise("U"))
      .filter(col(opCol) =!= "U" ||
        !(struct(payload.map(col).toIndexedSeq: _*) <=>
          struct(payload.map(c => col(oldPrefix + c)).toIndexedSeq: _*)))
      .select((keys.map(col) ++ payload.map(col) ++
        payload.map(c => col(oldPrefix + c)) :+ col(opCol)).toIndexedSeq: _*)
  }
}
