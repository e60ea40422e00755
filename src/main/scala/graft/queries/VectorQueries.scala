package graft.queries

import graft.operators.Similarity
import graft.queries.ParityQueries.Q
import org.apache.spark.sql.functions._

/** Extension queries: similarity search over the `embeddings` table.
  *
  * Arithmetic contract shared with the DuckDB oracle: element products in
  * float32 (storage type), sequential float64 accumulation — Spark's
  * `zip_with`+`aggregate` and DuckDB's list comprehension + `list_sum`
  * produce bit-identical doubles (verified; DuckDB's builtin
  * `list_inner_product` does NOT — it accumulates differently).
  */
object VectorQueries {

  private val dotSql = // dot(qe, e) in DuckDB, float mul + double acc
    "list_sum([qe[i]*e[i] for i in range(1, len(e)+1)])"
  private def normSql(v: String) =
    s"sqrt(list_sum([$v[i]*$v[i] for i in range(1, len($v)+1)]))"
  private val cosineSql = s"$dotSql / (${normSql("qe")} * ${normSql("e")})"

  val defs: Map[String, Q] = Map(

    // ----- brute-force exact cosine top-k (baseline ANN) -------------------
    "q_cosine_topk" -> Q(
      (s, d) => {
        val emb = Td.embeddings(s, d)
        Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 5)
      },
      Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
              |scored AS (
              |  SELECT query_id, vec_id AS neighbor_id, $cosineSql AS sim
              |  FROM q, (SELECT vec_id, embedding AS e FROM embeddings) c
              |  WHERE vec_id <> query_id)
              |SELECT query_id, neighbor_id, rank, sim FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
              |  FROM scored) t WHERE rank <= 5""".stripMargin)),

    // ----- exact embedding near-dup pairs ----------------------------------
    "q_embed_neardup" -> Q(
      (s, d) => Similarity.nearDupPairs(Td.embeddings(s, d), "vec_id", "embedding", tau = 0.45),
      Some(s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |  list_sum([va[i]*vb[i] for i in range(1, len(vb)+1)]) /
              |    (sqrt(list_sum([va[i]*va[i] for i in range(1, len(va)+1)])) *
              |     sqrt(list_sum([vb[i]*vb[i] for i in range(1, len(vb)+1)]))) AS sim
              |FROM (SELECT vec_id, embedding AS va FROM embeddings) a,
              |     (SELECT vec_id, embedding AS vb FROM embeddings) b
              |WHERE a.vec_id < b.vec_id
              |  AND list_sum([va[i]*vb[i] for i in range(1, len(vb)+1)]) /
              |    (sqrt(list_sum([va[i]*va[i] for i in range(1, len(va)+1)])) *
              |     sqrt(list_sum([vb[i]*vb[i] for i in range(1, len(vb)+1)]))) >= 0.45""".stripMargin)),

    // ----- LSH-bucketed approximate top-k (the 100 TB scale path) ----------
    // No portable oracle: the sign-LSH candidate set is engine-internal.
    // Driver records a rows-only check; recall vs q_cosine_topk is asserted
    // in the ScalaTest suite instead.
    "q_ann_lsh_topk" -> Q(
      (s, d) => {
        val emb = Td.embeddings(s, d)
        // 6 bits × 8 tables: ~50% per-table collision at cosine 0.5 — tuned
        // for this corpus's low neighbor similarity (uniform vectors); a
        // clustered corpus would take more bits and fewer tables.
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, dim = 64, bits = 6, tables = 8)
      },
      None),

    // ----- IVF approximate top-k (coarse-quantized scale path) -------------
    // Rows-only: the k-means cell assignment is engine-internal; recall vs
    // the exact top-k is asserted in ScaleOpsSpec.
    "q_ann_ivf_topk" -> Q(
      (s, d) => {
        val emb = Td.embeddings(s, d)
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          k = 5, nlist = 16, nprobe = 4)
      },
      None),

    // ----- PQ/ADC approximate top-k (compressed-domain scale path) ---------
    // Rows-only: codebooks are engine-internal k-means state; recall vs the
    // exact top-k is asserted in ScaleOpsSpec. The wide path scans 8-byte
    // codes (64× smaller than the float vectors) and re-ranks a shortlist
    // exactly.
    "q_ann_pq_topk" -> Q(
      (s, d) => {
        val emb = Td.embeddings(s, d)
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
          dim = 64, topK = 5, m = 8, k = 16, iters = 2, rerank = 50)
      },
      None),
  )
}
