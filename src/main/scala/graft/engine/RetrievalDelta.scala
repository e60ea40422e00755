package graft.engine

import graft.operators.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of the BM25 statistics triple — the retrieval
  * member of the maintained-view family. One op-coded document feed keeps
  * three tables current per epoch:
  *
  *  - `docsT`   — the corpus itself (keyed by `idCol`, via [[KeyedTable.mergeCdc]]);
  *  - `dfT`     — per-term document frequency (`cnt` IS df): [[AggDelta]]
  *                over signed distinct-(doc, term) posting events;
  *  - `corpusT` — the one-row totals (`cnt` = N, `sum_dl` = T).
  *
  * Cost ∝ the changed documents' postings; the stored corpus is never
  * re-scanned. With these maintained, `Retrieval.scoreAndRank` answers
  * queries without either of `bm25TopK`'s corpus passes.
  *
  * == Net-effect derivation ==
  *
  * A batch may chain several events for one document (I→U, U→D, …). The
  * statistics must apply the batch's NET effect against pre-batch state, so
  * per key the FIRST event (min `seqCol`) supplies the pre-image (its old
  * image; absent when it is an `I`) and the LAST event (max `seqCol`)
  * supplies the post-image (absent when it is a `D`). Term events are then
  * the set difference per document — `array_except(post, pre)` inserts,
  * `array_except(pre, post)` retracts; unchanged terms emit nothing.
  *
  * Contracts beyond [[AggDelta]]'s usual image rules: `(key, seq)` unique
  * within a batch (CDC sequence numbers), and an `I` is only valid for a
  * key absent from the store — an insert-shaped event for an existing key
  * would make the pre-image read empty and leak its old postings into df
  * forever. `mergeCdc` tolerates replayed Is; the statistics cannot, so
  * feeds that replay must rely on the epoch tag (below), not per-row
  * tolerance.
  *
  * == Crash-resumable epochs ==
  *
  * All three applies run under ONE `batchId` tag; `docsT` commits LAST, so
  * the epoch-level early return keys off it (the family's rule): a crash
  * after the stats commits but before the corpus commit leaves a
  * redelivered epoch no-opping the stats (their tags match) and completing
  * the corpus — never double-counting.
  */
object RetrievalDelta {

  private def toks(c: Column): Column = TextOps.tokens(c)
  private def postings(df: DataFrame, idCol: String, textCol: Column): DataFrame =
    df.select(col(idCol), explode(array_distinct(toks(textCol))).as("tok"))

  /** Build all three tables from a corpus snapshot. The corpus table keeps
    * `docs`' FULL schema (callers may carry payload columns — URIs,
    * sources — beside the text); df/totals derive from `textCol` alone.
    */
  def bootstrap(docsT: KeyedTable, dfT: KeyedTable, corpusT: KeyedTable,
                docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): Unit = {
    docsT.overwrite(docs)
    AggDelta.bootstrap(dfT, postings(docs, idCol, col(textCol)), Seq("tok"), Nil)
    AggDelta.bootstrap(corpusT,
      docs.select(lit("all").as("scope"), size(toks(col(textCol))).cast("long").as("dl")),
      Seq("scope"), Seq("dl"), valueType = "decimal(18,0)", accType = "decimal(28,0)")
  }

  /** Apply one op-coded epoch to all three tables. Returns the corpus
    * table's committed version (current version when the epoch's tag shows
    * the whole batch already applied).
    */
  def maintain(docsT: KeyedTable, dfT: KeyedTable, corpusT: KeyedTable,
               batch: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", opCol: String = "_op",
               seqCol: String = "_seq", oldPrefix: String = "_old_",
               batchId: Option[String] = None): Long = {
    // docsT commits LAST — its matching tag proves the whole epoch landed
    if (batchId.isDefined && docsT.lastTag == batchId) return docsT.currentVersion
    val oldText = oldPrefix + textCol
    require(batch.columns.contains(oldText),
      s"RetrievalDelta batch must carry the before-image column '$oldText'")
    val checked = batch.withColumn(opCol, Ops.checkedOp(opCol, "RetrievalDelta"))
    // net effect per key: first event's pre-image, last event's post-image.
    // (key, seq) uniqueness is enforced IN-PLAN, not trusted: duplicate
    // seqs make min_by/max_by pick arbitrarily — the stats and the corpus
    // collapse could then disagree forever, the silent-divergence class
    // every maintainer here fails loudly on instead.
    val net0 = checked.groupBy(col(idCol)).agg(
      min_by(struct(col(opCol).as("op"), col(oldText).as("old")), col(seqCol)).as("__f"),
      max_by(struct(col(opCol).as("op"), col(textCol).as("new")), col(seqCol)).as("__l"),
      count(lit(1)).as("__n"), countDistinct(col(seqCol)).as("__nseq"))
      .withColumn("__seq_ok",
        when(col("__n") === col("__nseq"), lit(true)).otherwise(raise_error(concat(
          lit(s"RetrievalDelta: duplicate $seqCol values for key "),
          col(idCol).cast("string"),
          lit(" — net-effect derivation needs unique sequence numbers per batch")))))
      .filter(col("__seq_ok"))
      .select(col(idCol),
        (col("__f.op") === "I").as("__ins"),
        when(col("__f.op") === "I", lit(null).cast("string"))
          .otherwise(col("__f.old")).as("__pre"),
        when(col("__l.op") === "D", lit(null).cast("string"))
          .otherwise(col("__l.new")).as("__post"))
      .withColumn("__preT", coalesce(array_distinct(toks(col("__pre"))), array()))
      .withColumn("__postT", coalesce(array_distinct(toks(col("__post"))), array()))
    // The documented-but-previously-UNCHECKED contract, now enforced
    // in-plan: an `I` for a key already in the store reads an empty
    // pre-image, so the old document's postings would leak into df and the
    // totals FOREVER (silent divergence — and an easy feed mistake, since
    // mergeCdc deliberately tolerates replayed Is). Cost ∝ the batch: the
    // store side is bucket-pruned + semi-joined to the batch's keys
    // (currentForKeys), broadcast back against the one-row-per-key net
    // frame.
    val net = {
      val netWithCheck =
        if (!docsT.exists) net0
        else {
          val existing = docsT.currentForKeys(checked.select(col(idCol)).distinct())
            .select(col(idCol)).withColumn("__ex", lit(true))
          net0.join(broadcast(existing), Seq(idCol), "left_outer")
            .withColumn("__i_ok",
              when(col("__ins") && col("__ex"), raise_error(concat(
                lit("RetrievalDelta: 'I' event for key "), col(idCol).cast("string"),
                lit(" which is already present in the store — its old postings would " +
                  "leak into df/totals; emit a 'U' with the before-image instead"))))
                .otherwise(lit(true)))
            .filter(col("__i_ok")).drop("__ex", "__i_ok")
        }
      netWithCheck.drop("__ins")
        .localCheckpoint() // feeds four event derivations below — one pass over the batch
    }
    val dfEvents =
      net.select(explode(array_except(col("__postT"), col("__preT"))).as("tok"))
        .withColumn("_old_tok", lit(null).cast("string")).withColumn("_op", lit("I"))
        .unionByName(
          net.select(explode(array_except(col("__preT"), col("__postT"))).as("_old_tok"))
            .withColumn("tok", lit(null).cast("string")).withColumn("_op", lit("D")))
    val dlNew = size(toks(col("__post"))).cast("long")
    val dlOld = size(toks(col("__pre"))).cast("long")
    val corpusEvents = net
      .filter(col("__pre").isNotNull || col("__post").isNotNull)
      .select(
        when(col("__post").isNotNull, lit("all")).otherwise(lit(null)).as("scope"),
        when(col("__post").isNotNull, dlNew).otherwise(lit(null)).cast("long").as("dl"),
        when(col("__pre").isNotNull, lit("all")).otherwise(lit(null)).as("_old_scope"),
        when(col("__pre").isNotNull, dlOld).otherwise(lit(null)).cast("long").as("_old_dl"),
        when(col("__pre").isNull, lit("I"))
          .when(col("__post").isNull, lit("D")).otherwise(lit("U")).as("_op"))
    AggDelta.maintain(dfT, dfEvents, Seq("tok"), Nil, batchId = batchId)
    AggDelta.maintain(corpusT, corpusEvents, Seq("scope"), Seq("dl"),
      valueType = "decimal(18,0)", accType = "decimal(28,0)", batchId = batchId)
    docsT.mergeCdc(checked, opCol = opCol, seqCol = seqCol, tag = batchId)
  }
}
