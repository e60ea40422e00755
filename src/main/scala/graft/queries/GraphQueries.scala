package graft.queries

import graft.operators.Graph
import graft.queries.ParityQueries.Q
import org.apache.spark.sql.functions._

/** Graph-analytics extension queries: fixed-point PageRank and
  * degree-oriented triangle counting over graphs derived from the TPC-H-ish
  * tables. Oracle SQL is GENERATED from the same constants and iteration
  * count as the Spark plans (the PageRank CTE chain is unrolled by the same
  * Scala loop driving the operator), so the two engines run the identical
  * integer recurrence.
  */
object GraphQueries {

  private val S = Graph.RankScale // 1L << 40

  /** Unrolled fixed-point PageRank oracle: r0 = S // n;
    * r_i = (15·(S//n))//100 + (85·Σ_{u→v}(r_{i-1}(u)//outdeg(u)))//100.
    * All operands are non-negative, so DuckDB's floor `//` equals Spark's
    * truncating `div` everywhere.
    */
  private def pageRankSql(edgesSql: String, iters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"WITH e AS ($edgesSql),\n"
    sb ++= "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),\n"
    sb ++= "nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),\n"
    sb ++= "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),\n"
    sb ++= s"r0 AS (SELECT node, $S // n AS r FROM nodes CROSS JOIN nd),\n"
    for (i <- 1 to iters) {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      sb ++= s"m$i AS (SELECT e.dst AS node, CAST(sum(p.r // d.outdeg) AS BIGINT) AS m\n"
      sb ++= s"  FROM e JOIN $prev p ON e.src = p.node JOIN deg d ON e.src = d.src GROUP BY 1),\n"
      sb ++= s"r$i AS (SELECT nodes.node,\n"
      sb ++= s"    (15 * ($S // n)) // 100 + (85 * COALESCE(m$i.m, CAST(0 AS BIGINT))) // 100 AS r\n"
      sb ++= s"  FROM nodes CROSS JOIN nd LEFT JOIN m$i ON nodes.node = m$i.node)"
      sb ++= (if (i < iters) ",\n" else "\n")
    }
    sb ++= s"SELECT node, r FROM r$iters"
    sb.toString
  }

  /** Warm-start oracle: `baseIters` over the old edges, then `warmIters`
    * over the new edges with r0 = COALESCE(old final rank, S // n_new) —
    * the same continuation [[Graph.pageRank]]'s `init` computes. Generated
    * by the same loop shape as [[pageRankSql]], different CTE prefixes.
    */
  private def pageRankIncSql(oldEdgesSql: String, newEdgesSql: String,
                             baseIters: Int, warmIters: Int): String = {
    val sb = new StringBuilder
    sb ++= s"WITH eo AS ($oldEdgesSql),\n"
    sb ++= "nodeso AS (SELECT src AS node FROM eo UNION SELECT dst FROM eo),\n"
    sb ++= "ndo AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodeso),\n"
    sb ++= "dego AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM eo GROUP BY 1),\n"
    sb ++= s"o0 AS (SELECT node, $S // n AS r FROM nodeso CROSS JOIN ndo),\n"
    for (i <- 1 to baseIters) {
      val prev = if (i == 1) "o0" else s"o${i - 1}"
      sb ++= s"om$i AS (SELECT eo.dst AS node, CAST(sum(p.r // d.outdeg) AS BIGINT) AS m\n"
      sb ++= s"  FROM eo JOIN $prev p ON eo.src = p.node JOIN dego d ON eo.src = d.src GROUP BY 1),\n"
      sb ++= s"o$i AS (SELECT nodeso.node,\n"
      sb ++= s"    (15 * ($S // n)) // 100 + (85 * COALESCE(om$i.m, CAST(0 AS BIGINT))) // 100 AS r\n"
      sb ++= s"  FROM nodeso CROSS JOIN ndo LEFT JOIN om$i ON nodeso.node = om$i.node),\n"
    }
    sb ++= s"e AS ($newEdgesSql),\n"
    sb ++= "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),\n"
    sb ++= "nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),\n"
    sb ++= "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),\n"
    sb ++= s"r0 AS (SELECT nodes.node, COALESCE(ob.r, $S // n) AS r\n"
    sb ++= s"  FROM nodes CROSS JOIN nd LEFT JOIN o$baseIters ob ON nodes.node = ob.node),\n"
    for (i <- 1 to warmIters) {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      sb ++= s"m$i AS (SELECT e.dst AS node, CAST(sum(p.r // d.outdeg) AS BIGINT) AS m\n"
      sb ++= s"  FROM e JOIN $prev p ON e.src = p.node JOIN deg d ON e.src = d.src GROUP BY 1),\n"
      sb ++= s"r$i AS (SELECT nodes.node,\n"
      sb ++= s"    (15 * ($S // n)) // 100 + (85 * COALESCE(m$i.m, CAST(0 AS BIGINT))) // 100 AS r\n"
      sb ++= s"  FROM nodes CROSS JOIN nd LEFT JOIN m$i ON nodes.node = m$i.node)"
      sb ++= (if (i < warmIters) ",\n" else "\n")
    }
    sb ++= s"SELECT node, r FROM r$warmIters"
    sb.toString
  }

  val defs: Map[String, Q] = Map(

    // ----- fixed-point PageRank over the supplier⇄part fulfillment graph ---
    // Undirected random walk on the bipartite graph (supplier supplies
    // part), node ids disambiguated by parity: supplier s → 2s, part p →
    // 2p+1. Three synchronous iterations of the INTEGER recurrence — rank
    // cells are exact longs, so the oracle hash covers every rank, not a
    // rounding; a single lost contribution or floor in the wrong place
    // shifts a cell.
    "q_pagerank" -> Q(
      (s, d) => {
        val li = Td.lineitem(s, d).select(
          (col("l_suppkey") * 2).as("sn"), (col("l_partkey") * 2 + 1).as("pn"))
        val edges = li.select(col("sn").as("src"), col("pn").as("dst"))
          .union(li.select(col("pn").as("src"), col("sn").as("dst")))
        Graph.pageRank(edges, "src", "dst", iters = 3)
      },
      Some(pageRankSql(
        """SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
          |  UNION SELECT l_partkey * 2 + 1, l_suppkey * 2 FROM lineitem""".stripMargin,
        iters = 3))),

    // ----- warm-start incremental PageRank ---------------------------------
    // The %4=0 orders' edges arrive as a delta: ranks resume from the STORED
    // pre-delta state (Td.pagerankTable, 3 iterations) for 2 warm
    // iterations over the full graph — the practical incremental recipe,
    // re-convergence from stored ranks instead of the full ladder from
    // uniform. New nodes start at the new graph's uniform share. The oracle
    // replays the exact continuation from base tables (old ladder, then
    // warm ladder), so a stale stored rank or a mis-seeded new node shifts
    // integer cells and hash-fails.
    "q_pagerank_inc" -> Q(
      (s, d) => {
        val ranksT = Td.pagerankTable(s, d)
        val li = Td.lineitem(s, d).select(
          (col("l_suppkey") * 2).as("sn"), (col("l_partkey") * 2 + 1).as("pn"))
        val all = li.select(col("sn").as("src"), col("pn").as("dst"))
          .union(li.select(col("pn").as("src"), col("sn").as("dst")))
        Graph.pageRank(all, "src", "dst", iters = 2,
          init = Some(ranksT.current))
      },
      Some(pageRankIncSql(
        """SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
          |  WHERE l_orderkey % 4 <> 0
          |  UNION SELECT l_partkey * 2 + 1, l_suppkey * 2 FROM lineitem
          |  WHERE l_orderkey % 4 <> 0""".stripMargin,
        """SELECT l_suppkey * 2 AS src, l_partkey * 2 + 1 AS dst FROM lineitem
          |  UNION SELECT l_partkey * 2 + 1, l_suppkey * 2 FROM lineitem""".stripMargin,
        baseIters = 3, warmIters = 2))),

    // ----- per-node triangle counts over the co-purchase graph -------------
    // Parts co-occurring in the same URGENT order form an undirected edge;
    // triangles = part triples pairwise co-purchased. Degree orientation
    // bounds the wedge join (measured at sf0.1: max oriented out-degree 23,
    // 3.3M wedges from 241k edges — the arboricity bound doing its job).
    // The σ-key packs (degree, node) into one long on BOTH engines, so a
    // single mis-oriented edge double-counts or drops a triangle and
    // hash-fails.
    "q_triangles" -> Q(
      (s, d) => {
        val ur = Td.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"))
        val li = Td.lineitem(s, d)
          .join(ur, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        val pairs = li.as("x").join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.pk") =!= col("y.pk"))
          .select(col("x.pk").as("pa"), col("y.pk").as("pb"))
        Graph.triangleCounts(pairs, "pa", "pb")
      },
      Some(trianglesSql(
        s"""WITH pr AS (SELECT o_orderkey FROM orders
           |  WHERE o_orderpriority = '1-URGENT'),
           |li AS (SELECT l_orderkey, l_partkey FROM lineitem
           |  JOIN pr ON l_orderkey = o_orderkey),
           |und AS (SELECT DISTINCT
           |    CAST(least(a.l_partkey, b.l_partkey) AS BIGINT) AS a,
           |    CAST(greatest(a.l_partkey, b.l_partkey) AS BIGINT) AS b
           |  FROM li a JOIN li b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)""".stripMargin,
        positiveOnly = false))),

    // ----- MAINTAINED triangle counts (graph × IVM composition) ------------
    // The stored co-purchase edge set + per-node triangle counts maintained
    // through a mixed edge CDC batch: edges created by the %3=0 urgent
    // orders inserted, base edges with (a+b)%17=0 deleted. Maintenance work
    // is ∝ changed edges × local degree (gained triangles enumerated from
    // inserted edges against POST-state adjacency, lost ones from deleted
    // edges against PRE-state, each charged once to its minimal changed
    // edge); the oracle RECOUNTS from the final edge set with the same
    // σ-orientation SQL as q_triangles — one mis-charged or double-counted
    // triangle anywhere shifts a node's count and hash-fails.
    "q_triangle_maintain" -> Q(
      (s, d) => Td.triangleMaintainTables(s, d)._2.current
        .filter(col("cnt") > 0)
        .select(col("node"), col("cnt").as("n_triangles")),
      Some(trianglesSql(
        s"""WITH pr AS (SELECT o_orderkey, o_orderkey % 3 = 0 AS newer FROM orders
           |  WHERE o_orderpriority = '1-URGENT'),
           |li AS (SELECT l_orderkey, l_partkey, newer FROM lineitem
           |  JOIN pr ON l_orderkey = o_orderkey),
           |ed AS (SELECT
           |    CAST(least(a.l_partkey, b.l_partkey) AS BIGINT) AS a,
           |    CAST(greatest(a.l_partkey, b.l_partkey) AS BIGINT) AS b,
           |    a.newer
           |  FROM li a JOIN li b
           |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
           |e0 AS (SELECT DISTINCT a, b FROM ed WHERE NOT newer),
           |ins AS (SELECT DISTINCT a, b FROM ed WHERE newer
           |  AND NOT EXISTS (SELECT 1 FROM e0 WHERE e0.a = ed.a AND e0.b = ed.b)),
           |und AS (SELECT a, b FROM e0 WHERE (a + b) % 17 <> 0
           |  UNION ALL SELECT a, b FROM ins)""".stripMargin,
        positiveOnly = true))),
  )

  /** σ-orientation per-node triangle-count SQL over an `und(a, b)` canonical
    * edge CTE — shared by q_triangles (zeros kept) and q_triangle_maintain
    * (positive counts only), generated once so the two cannot drift.
    */
  private def trianglesSql(undCte: String, positiveOnly: Boolean): String = {
    val base =
      s"""$undCte,
         |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
         |  FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
         |  GROUP BY 1),
         |sig AS (SELECT node, deg * ${1L << 40} + node AS s FROM deg),
         |dir AS (SELECT
         |    CASE WHEN sa.s < sb.s THEN und.a ELSE und.b END AS u,
         |    CASE WHEN sa.s < sb.s THEN und.b ELSE und.a END AS v,
         |    CASE WHEN sa.s < sb.s THEN sb.s ELSE sa.s END AS sv
         |  FROM und JOIN sig sa ON und.a = sa.node
         |           JOIN sig sb ON und.b = sb.node),
         |w AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
         |  FROM dir e1 JOIN dir e2 ON e1.u = e2.u AND e1.sv < e2.sv),
         |t AS (SELECT x, y, z FROM w
         |  WHERE EXISTS (SELECT 1 FROM dir WHERE dir.u = w.y AND dir.v = w.z)),
         |cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM (SELECT x AS node FROM t UNION ALL SELECT y FROM t
         |        UNION ALL SELECT z FROM t) GROUP BY 1)""".stripMargin
    if (positiveOnly)
      s"""$base
         |SELECT node, n_triangles FROM cnt""".stripMargin
    else
      s"""$base
         |SELECT d.node, COALESCE(cnt.n_triangles, CAST(0 AS BIGINT)) AS n_triangles
         |FROM deg d LEFT JOIN cnt USING (node)""".stripMargin
  }
}
