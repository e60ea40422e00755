package graft.operators

import graft.engine.KeyedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge relations — the family beyond the
  * connected components already powering dedup ([[Dedup.dupClusters]] /
  * `dupClustersStar`): PageRank (Brin & Page, WWW 1998) and triangle
  * counting via degree orientation (Chiba & Nishizeki, SIAM J. Comput.
  * 1985; the "compact-forward" join order of Latapy, TCS 2008).
  *
  * Determinism discipline: PageRank runs in FIXED-POINT integer arithmetic
  * (rank mass as scaled longs, floor divisions) — integer sums are
  * order-independent, so stage retries, partition order, and the DuckDB
  * oracle all produce bit-identical ranks, where a double-accumulated
  * PageRank would differ run to run in the last ulps.
  */
object Graph {

  /** Fixed-point scale: total rank mass in the graph. 2^40 leaves room for
    * (85 · Σcontrib) intermediates at any realistic node count without
    * approaching Long range.
    */
  val RankScale: Long = 1L << 40

  /** PageRank with damping 0.85 over a directed edge relation, `iters`
    * synchronous iterations from the uniform start. Rank is an integer
    * number of `RankScale`-ths: r0 = S div N; each step
    * r'(v) = (15·(S div N)) div 100 + (85·Σ_{u→v} (r(u) div outdeg(u))) div 100.
    * Floor-division mass leakage (and dangling-node loss) is the standard
    * price of the integer formulation — ranking order is what the operator
    * promises, and THAT is exact.
    *
    * Plan shape per iteration: one broadcast-joined contribution projection
    * + one shuffle on `dst` for the incoming-mass aggregate (map-side
    * combinable) + the node left-join. The edge and node relations are
    * pinned (re-joined every iteration — same rationale as
    * [[Dedup.dupClusters]]' edge checkpoint); the rank relations are NOT:
    * each rank feeds exactly one downstream iteration, there is no
    * mid-loop action, so the unpinned chain executes as ONE job whose
    * iterations connect by shuffles (measured 3.3 s → 2.x s at sf0.1
    * versus per-iteration localCheckpoint barriers — dupClusters needs
    * its barriers only because its convergence count() makes each round a
    * separate action).
    */
  /** `init`: warm-start ranks `(node, r)` from a previous run. Nodes absent
    * from `init` (newly arrived) start at the uniform `S div n` of the NEW
    * graph; ranks for departed nodes are ignored (the node set always comes
    * from the current edges). The composition is exact, not approximate:
    * `pageRank(e, a+b) == pageRank(e, b, init = pageRank(e, a))` — the
    * synchronous integer recurrence just continues (pinned in GraphSpec),
    * so warm-started results stay oracle-reproducible from base tables.
    *
    * WHAT WARM-START BUYS — measured, not assumed (examples/PrankWarmProbe,
    * sf0.1 supplier⇄part graph, 21k nodes; settles the r8–r12 null result):
    * it does NOT buy wall time at local scales. The cold ladder's marginal
    * iteration is ~free here (cold 2/3/5/10 iters: 1.18/1.03/1.03/1.09 s —
    * fixed per-iteration overhead dominates, not data), while the warm
    * epoch pays an init join + pinning (warm 1/2 iters: 1.69/2.36 s), so
    * the bench pair pr1-vs-prf reads warm ≥ cold at every SF tried (sf0.1
    * and sf1) and will keep doing so until ONE iteration costs far more
    * than the init join — i.e. when the edge shuffle, not the job
    * scheduling, is the bill, which no local[32] SF constructs. What IS
    * real is quality per iteration: against the cold-10 reference ranking,
    * 2 warm iterations after a 25%-edge delta reproduce the top-100 at
    * 98/100 where cold-3 reads 96/100 and warm-1 90/100 — the stored ranks
    * carry usable signal across the delta. Exact integer convergence is
    * NOT a usable target on this fixture: the graph is bipartite, so rank
    * mass oscillates between the sides under damping and every node's
    * integer rank still moves at iteration 10 (21000/21000) even as the
    * top-k ordering stabilizes.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, init: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val s = RankScale
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nRow = nodes.agg(count(lit(1)).as("n"))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val base = nodes.crossJoin(broadcast(nRow)).localCheckpoint()
    var ranks = init match {
      case None => base.select(col("node"), expr(s"$s div n").as("r"))
      case Some(i0) => base
        .join(i0.select(col("node"), col("r").as("__r0")), Seq("node"), "left_outer")
        .select(col("node"),
          coalesce(col("__r0"), expr(s"$s div n")).as("r"))
    }
    // name-keyed joins over renamed projections: the outdeg/edge subtrees
    // recur inside each iteration's lineage, and dataset-attribute join
    // conditions (ranks("node") === outdeg("src")) would be ambiguous
    // self-joins there — usingColumns resolution is dedup-safe
    val od = outdeg.select(col("src").as("u"), col("outdeg"))
    val eu = e.select(col("src").as("u"), col("dst"))
    for (_ <- 1 to iters) {
      val contrib = ranks.withColumnRenamed("node", "u")
        .join(od, Seq("u"))
        .select(col("u"), expr("r div outdeg").as("c"))
      val insum = eu.join(contrib, Seq("u"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
      ranks = base
        .join(insum.withColumnRenamed("dst", "node"), Seq("node"), "left_outer")
        .select(col("node"),
          (expr(s"(15 * ($s div n)) div 100") +
            expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")).as("r"))
    }
    ranks
  }

  /** Per-node triangle counts over an undirected edge relation. Edges are
    * canonicalized (a<b, distinct, no self-loops), then ORIENTED along the
    * total order (degree, node) — every triangle {x≺y≺z} materializes
    * exactly once as the wedge (x→y, x→z) closed by the oriented edge
    * (y→z). Orientation bounds the wedge join by Σ outdeg² where
    * outdeg ≤ O(√m) for every node (the arboricity argument), which is
    * what makes the join survive power-law degree skew: the mega-hub's
    * edges all point INTO it, so it never fans a wedge.
    *
    * The order key packs (degree, node) into one long — degree·2^40 + node
    * — so orientation is a single integer comparison on both engines.
    * Output: (node, n_triangles) for every node in the edge relation,
    * zeros included.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct().localCheckpoint()
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // σ-key: (deg, node) as one long; node ids must stay under 2^40 and
    // degrees under 2^23 for the packing to be collision-free.
    val sk = (col("deg") * lit(1L << 40)) + col("node")
    val keyed = deg.select(col("node"), sk.as("sig"))
    val dir = und
      .join(keyed.select(col("node").as("a"), col("sig").as("sa")), Seq("a"))
      .join(keyed.select(col("node").as("b"), col("sig").as("sb")), Seq("b"))
      .select(
        when(col("sa") < col("sb"), col("a")).otherwise(col("b")).as("u"),
        when(col("sa") < col("sb"), col("sb")).otherwise(col("sa")).as("sv"),
        when(col("sa") < col("sb"), col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint()
    val wedges = dir.as("e1").join(dir.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.sv") < col("e2.sv"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    val tris = wedges.join(dir.select(col("u").as("y"), col("v").as("z")),
      Seq("y", "z"), "left_semi")
    val perNode = tris.select(col("x").as("node"))
      .union(tris.select(col("y").as("node")))
      .union(tris.select(col("z").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    deg.select(col("node"))
      .join(perNode, Seq("node"), "left_outer")
      .select(col("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  // --------------------------------------------- maintained triangle view ---

  /** Canonical undirected edge form: a < b, no self-loops, distinct. */
  private def canonEdges(edges: DataFrame, aCol: String, bCol: String): DataFrame =
    edges.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()

  /** Bootstrap the maintained triangle view: store the canonical edge SET
    * (keyed by (a, b)) and the per-node triangle counts (keyed by node,
    * zeros included for every node of the graph). Edges are a SET here —
    * a support-counted multigraph (e.g. co-purchase edges backed by many
    * orders) carries its multiplicity upstream and feeds this view edge
    * CREATIONS and FINAL deletions only.
    */
  def triangleBootstrap(edgesT: KeyedTable, countsT: KeyedTable,
                        edges: DataFrame, aCol: String, bCol: String): Unit = {
    val e = canonEdges(edges, aCol, bCol)
    edgesT.overwrite(e)
    countsT.overwrite(triangleCounts(e, "a", "b").withColumnRenamed("n_triangles", "cnt"))
  }

  /** Incrementally maintain per-node triangle counts under an edge CDC
    * batch — the graph member of the maintained-view family (AggDelta /
    * JoinDelta / TopKDelta), with the same cost contract: work ∝ changed
    * edges × local degree, the full graph is never recounted.
    *
    * `batch` carries (a, b, _op) with op I (edge created) or D (edge
    * removed). Correctness argument: a triangle GAINED by the batch
    * contains ≥1 inserted edge and no deleted one, so it is enumerable
    * from its inserted edges against POST-state adjacency; a triangle LOST
    * contains ≥1 deleted edge and existed in PRE-state, enumerable from
    * its deleted edges against PRE-state adjacency; the two enumerations
    * are disjoint (a triangle cannot contain both an inserted and a
    * pre-existing-then-deleted edge in the state where it counts). Within
    * each side a triangle holding k changed edges appears k times —
    * deduped by charging it to its MINIMAL changed edge (lexicographic),
    * the same charge-once discipline as the wedge orientation.
    *
    * Image-validity is enforced IN-PLAN like every maintainer here:
    * inserting an existing edge or deleting an absent one `raise_error`s
    * rather than silently corrupting counts.
    *
    * Counts move by a signed per-node delta applied through the keyed
    * upsert (rows may reach 0 — kept, so the view's node set only grows;
    * read with `cnt > 0` for the live triangle population).
    */
  def triangleMaintain(edgesT: KeyedTable, countsT: KeyedTable,
                       batch: DataFrame, aCol: String, bCol: String,
                       opCol: String = "_op", batchId: Option[String] = None): Long = {
    if (batchId.isDefined && edgesT.lastTag == batchId) return edgesT.currentVersion
    val spark0 = batch.sparkSession
    // not-yet-bootstrapped tables read as empty — a stream may boot the
    // view from its own first epoch (all-I batch on an empty graph)
    val e0 =
      (if (edgesT.exists) edgesT.current.select(col("a"), col("b"))
       else spark0.range(0).select(col("id").as("a"), col("id").as("b")))
        .localCheckpoint()
    val ch = batch.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"),
        col(opCol).as("_op"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
    // in-plan image validation: I must be absent from, D present in, E0
    val chk = ch.join(e0.withColumn("__in", lit(1)), Seq("a", "b"), "left_outer")
      .select(col("a"), col("b"), col("_op"),
        when(col("_op") === "I" && col("__in").isNotNull,
          raise_error(concat(lit("triangleMaintain: insert of existing edge ("),
            col("a"), lit(","), col("b"), lit(")"))))
          .when(col("_op") === "D" && col("__in").isNull,
            raise_error(concat(lit("triangleMaintain: delete of absent edge ("),
              col("a"), lit(","), col("b"), lit(")"))))
          .otherwise(lit(1)).as("__ok"))
      .filter(col("__ok") === 1).drop("__ok")
      .localCheckpoint()
    val ins = chk.filter(col("_op") === "I").select("a", "b")
    val del = chk.filter(col("_op") === "D").select("a", "b")
    val e1 = e0.join(del, Seq("a", "b"), "left_anti").unionByName(ins).localCheckpoint()

    // triangles touching `changed` edges in state `ex`, charged once to
    // their minimal changed edge of this side; +/- `sign` per member node
    def sideDelta(changed: DataFrame, ex: DataFrame, sign: Int): DataFrame = {
      val adj = ex.select(col("a").as("x"), col("b").as("y"))
        .unionByName(ex.select(col("b").as("x"), col("a").as("y")))
      // w adjacent to u, then close (v, w) against the canonical edge set
      val cand = changed.select(col("a").as("u"), col("b").as("v"))
        .join(adj, col("u") === col("x"))
        .select(col("u"), col("v"), col("y").as("w"))
        .filter(col("w") =!= col("v"))
        .join(ex.select(col("a").as("__ca"), col("b").as("__cb")),
          least(col("v"), col("w")) === col("__ca") &&
            greatest(col("v"), col("w")) === col("__cb"), "left_semi")
      // charge-once: drop the triangle here unless (u,v) is its minimal
      // changed edge of this side — the other two sides are (u,w), (v,w)
      val chSide = changed.select(col("a").as("__ha"), col("b").as("__hb"))
      def lesserChanged(p: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) = {
        val lo = least(p, q); val hi = greatest(p, q)
        // changed edge (lo,hi) exists AND precedes (u,v) lexicographically
        (lo < col("u")) || (lo === col("u") && hi < col("v"))
      }
      val deduped = cand
        .join(chSide, least(col("u"), col("w")) === col("__ha") &&
          greatest(col("u"), col("w")) === col("__hb") &&
          lesserChanged(col("u"), col("w")), "left_anti")
        .join(chSide, least(col("v"), col("w")) === col("__ha") &&
          greatest(col("v"), col("w")) === col("__hb") &&
          lesserChanged(col("v"), col("w")), "left_anti")
      deduped.select(col("u").as("node"))
        .unionByName(deduped.select(col("v").as("node")))
        .unionByName(deduped.select(col("w").as("node")))
        .groupBy("node").agg((count(lit(1)) * sign).as("d"))
    }
    val delta = sideDelta(ins, e1, +1)
      .unionByName(sideDelta(del, e0, -1))
      .groupBy("node").agg(sum(col("d")).as("d"))
      .localCheckpoint() // delta-sized; feeds the count read AND the upsert
    // touched-node state read is bucket-pruned (currentForKeys), and the
    // per-table tag guards make the two applies crash-resumable under the
    // family's redelivery rule: counts commit first, edges last, so the
    // epoch-level early return keys off the LAST table
    val curCounts =
      if (countsT.exists) countsT.currentForKeys(delta).select(col("node"), col("cnt"))
      else spark0.range(0).select(col("id").as("node"), col("id").as("cnt"))
    val updated = delta
      .join(curCounts, Seq("node"), "left_outer")
      .select(col("node"), (coalesce(col("cnt"), lit(0L)) + col("d")).as("cnt"),
        lit("U").as("_op"), lit(1L).as("_seq"))
    if (batchId.isEmpty || countsT.lastTag != batchId)
      countsT.mergeCdc(updated, tag = batchId)
    // edge set: deletes as tombstones, inserts as rows — one atomic version
    val edgeCdc = ins.select(col("a"), col("b"), lit("I").as("_op"), lit(1L).as("_seq"))
      .unionByName(del.select(col("a"), col("b"), lit("D").as("_op"), lit(1L).as("_seq")))
    edgesT.mergeCdc(edgeCdc, tag = batchId)
  }
}
