package graft.queries

import graft.operators.Bpe
import graft.queries.ParityQueries.Q
import org.apache.spark.sql.functions._

/** BPE merge-training queries. The oracle does not receive the learned
  * merges — it RE-TRAINS from scratch as one unrolled CTE chain generated
  * by the same Scala loop from the same constants (the PageRank pattern,
  * GraphQueries.scala): word table → per-step (pair counts → argmax with
  * the count-desc/pair-asc tie-break → space-delimited replace). Any
  * divergence — tie-break order, a pair crossing the merged symbol, the
  * greedy-overlap rule — shifts a merge and every later step, and
  * hash-fails.
  */
object BpeQueries {

  private val NMerges = 8

  /** Word table CTE (w0): the same tokenizer fragment every text oracle
    * shares (TextQueries.toksSql), chars space-joined + terminal mark.
    * Every chain CTE is MATERIALIZED: wK and bK are multi-referenced, and
    * DuckDB's default inlining would otherwise expand the 8-step chain
    * exponentially (measured: the inlined form does not finish).
    */
  private def w0Sql: String =
    s"""w0 AS MATERIALIZED (
       |  SELECT regexp_replace(word, '(.)', '\\1 ', 'g') || '${Bpe.EndMark}' AS sym,
       |    CAST(cnt AS BIGINT) AS cnt
       |  FROM (SELECT word, count(*) AS cnt FROM (
       |          SELECT unnest(${TextQueries.toksSql}) AS word
       |          FROM documents WHERE text IS NOT NULL) t
       |        WHERE length(word) > 0 GROUP BY 1))""".stripMargin

  private def stepSql(k: Int): String =
    s"""p$k AS MATERIALIZED (SELECT pair, CAST(sum(cnt) AS BIGINT) AS c FROM (
       |    SELECT unnest([s[i] || ' ' || s[i+1] for i in range(1, len(s))]) AS pair, cnt
       |    FROM (SELECT string_split(sym, ' ') AS s, cnt FROM w$k) q$k) GROUP BY 1),
       |b$k AS MATERIALIZED (SELECT pair, c FROM p$k ORDER BY c DESC, pair ASC LIMIT 1),
       |w${k + 1} AS MATERIALIZED (SELECT ${mergeOnceSql("sym", k)} AS sym, cnt FROM w$k)""".stripMargin

  /** One space-delimited merge application against step k's argmax. */
  private def mergeOnceSql(e: String, k: Int): String =
    s"trim(replace(' ' || $e || ' ', ' ' || (SELECT pair FROM b$k) || ' ', " +
      s"' ' || (SELECT replace(pair, ' ', '') FROM b$k) || ' '))"

  private def chainSql: String =
    (w0Sql +: (0 until NMerges).map(stepSql)).mkString(",\n")

  val defs: Map[String, Q] = Map(

    // ----- BPE merge training (Sennrich ACL'16) --------------------------
    // Learns 8 merges from the corpus: one corpus scan to the word table,
    // then 8 vocabulary-bounded (pair-count → argmax → replace) rounds.
    "q_bpe_train" -> Q(
      (s, d) => Bpe.mergeTable(s,
        Bpe.train(Td.documents(s, d), col("text"), NMerges)),
      Some {
        val steps = (0 until NMerges).map { k =>
          s"SELECT $k AS step, pair, replace(pair, ' ', '') AS merged, c AS pair_count FROM b$k"
        }.mkString("\nUNION ALL ")
        s"""WITH $chainSql
           |SELECT CAST(step AS INT) AS step, pair, merged, pair_count FROM (
           |$steps) u""".stripMargin
      }),

    // ----- tokenize under the learned merges -----------------------------
    // Applies the trained merge list to every document as a per-row
    // array-expression chain (zero shuffle — the corpus pass a tokenizer
    // runs at 100 TB) and reports word/subword counts. The oracle
    // re-trains AND re-segments: the same merge chain nested 8 deep over
    // every word, with per-doc sums rebuilt relationally.
    "q_bpe_tokenize" -> Q(
      (s, d) => {
        val docs = Td.documents(s, d)
        val merges = Bpe.train(docs, col("text"), NMerges)
        Bpe.tokenize(docs, "doc_id", col("text"), merges)
      },
      Some {
        val applied = (0 until NMerges).foldLeft("sym0")(mergeOnceSql)
        s"""WITH $chainSql,
           |tw AS (
           |  SELECT doc_id, regexp_replace(word, '(.)', '\\1 ', 'g') || '${Bpe.EndMark}' AS sym0
           |  FROM (SELECT doc_id, unnest(${TextQueries.toksSql}) AS word
           |        FROM documents WHERE text IS NOT NULL) t
           |  WHERE length(word) > 0),
           |m AS (SELECT doc_id, len(string_split($applied, ' ')) AS ns FROM tw),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           |    CAST(sum(ns) AS BIGINT) AS n_subwords FROM m GROUP BY 1)
           |SELECT d.doc_id,
           |  COALESCE(a.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
           |  COALESCE(a.n_subwords, CAST(0 AS BIGINT)) AS n_subwords
           |FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) d
           |LEFT JOIN agg a USING (doc_id)""".stripMargin
      }),
  )
}
