package graft.operators

import graft.SparkSpec

/** Pins the graph operators against independent plain-Scala references: the
  * exact fixed-point PageRank recurrence, and triangle counts with
  * canonicalization (duplicate / reversed / self-loop edges).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank matches the plain-Scala fixed-point recurrence") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val out = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // independent reference: same integer recurrence, maps + sorted loops
    val s = Graph.RankScale
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.length.toLong
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> s / n).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      r = nodes.map(v => v -> ((15 * (s / n)) / 100 + (85 * in.getOrElse(v, 0L)) / 100)).toMap
    }
    assert(out == r)
    // node 3 has two in-edges and should outrank the single-in nodes
    assert(out(3L) > out(1L) && out(3L) > out(2L))
  }

  test("triangleCounts canonicalizes edges and counts per node") {
    // triangles {1,2,3} and {2,3,4}; node 5 participates in none.
    // (2,1) duplicates (1,2) reversed; (3,3) is a self-loop — both ignored.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (2L, 1L), (3L, 3L))
    val out = Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("triangleMaintain: mixed insert/delete batch moves counts exactly") {
    val tmp = tmpDir("trimaint")
    val edgesT = graft.engine.KeyedTable(spark, s"$tmp/edges", Seq("a", "b"), numBuckets = 4)
    val countsT = graft.engine.KeyedTable(spark, s"$tmp/counts", Seq("node"), numBuckets = 4)
    // triangle {1,2,3} + pendant 3-4
    Graph.triangleBootstrap(edgesT, countsT,
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b"), "a", "b")
    def counts() = countsT.current.collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("cnt")).toMap
    assert(counts() == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
    // delete (1,2) — kills {1,2,3}; insert (2,4),(1,4) — creates {1,3,4}
    // and {2,3,4}; the would-be {1,2,4} must NOT count (its (1,2) edge is
    // deleted in the same batch)
    Graph.triangleMaintain(edgesT, countsT,
      Seq((2L, 4L, "I"), (1L, 4L, "I"), (1L, 2L, "D")).toDF("a", "b", "_op"),
      "a", "b", batchId = Some("b1"))
    assert(counts() == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
    // redelivered epoch no-ops
    Graph.triangleMaintain(edgesT, countsT,
      Seq((2L, 4L, "I"), (1L, 4L, "I"), (1L, 2L, "D")).toDF("a", "b", "_op"),
      "a", "b", batchId = Some("b1"))
    assert(counts() == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
    // a triangle whose OTHER two edges are both in the same insert batch
    // is charged exactly once
    Graph.triangleMaintain(edgesT, countsT,
      Seq((1L, 5L, "I"), (4L, 5L, "I"), (3L, 5L, "I")).toDF("a", "b", "_op"),
      "a", "b", batchId = Some("b2"))
    // new triangles: {1,4,5} ((1,4),(4,5),(1,5)), {3,4,5}, {1,3,5}
    assert(counts() == Map(1L -> 3L, 2L -> 1L, 3L -> 4L, 4L -> 4L, 5L -> 3L))
    // image violations fail loudly
    intercept[Exception] {
      Graph.triangleMaintain(edgesT, countsT,
        Seq((2L, 3L, "I")).toDF("a", "b", "_op"), "a", "b")
    }
    intercept[Exception] {
      Graph.triangleMaintain(edgesT, countsT,
        Seq((1L, 9L, "D")).toDF("a", "b", "_op"), "a", "b")
    }
    // maintained state ≡ from-scratch recount of the final edge set
    val recount = Graph.triangleCounts(edgesT.current, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val c = counts()
    recount.foreach { case (n, t) => assert(c(n) == t, s"node $n") }
  }

  test("pageRank total mass stays within floor-leakage of the scale") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val out = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters = 2)
      .collect().map(_.getLong(1))
    val total = out.sum
    // no dangling nodes: mass loss is only floor truncation (< 1 unit per
    // division per node per iteration — tiny against 2^40)
    assert(total <= Graph.RankScale && total > Graph.RankScale - 1000L)
  }

  test("pageRank warm start is an exact continuation: (a)+(b) iters ≡ a+b") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val full = Graph.pageRank(edges, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first3 = Graph.pageRank(edges, "src", "dst", iters = 3)
    val resumed = Graph.pageRank(edges, "src", "dst", iters = 2,
        init = Some(first3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(resumed == full)
  }

  test("pageRank warm start: new nodes seed uniform, departed ranks ignored") {
    val oldEdges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val ranks = Graph.pageRank(oldEdges, "src", "dst", iters = 3)
    // node 3 arrives, nothing departs: its r0 must be S div 3, not 0
    val newEdges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = Graph.pageRank(newEdges, "src", "dst", iters = 1,
        init = Some(ranks))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    // node 3's only in-edge is from 2 (outdeg 2, warm rank S/2-ish):
    // a zero-seeded new node would read just the teleport term; uniform
    // seeding gives it incoming mass > teleport alone
    val s = Graph.RankScale
    val teleportOnly = (15L * (s / 3)) / 100
    assert(out(3L) > teleportOnly)
    // a departed node must not appear even though init carries it
    val shrunk = Graph.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
      "src", "dst", iters = 1,
      init = Some(Graph.pageRank(newEdges, "src", "dst", iters = 1)))
      .collect().map(_.getLong(0)).toSet
    assert(shrunk == Set(1L, 2L))
  }
}
