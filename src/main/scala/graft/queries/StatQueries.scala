package graft.queries

import graft.operators.{Privacy, Relational, Similarity, Stats, TextOps, TimeSeries}
import org.apache.spark.sql.expressions.Window
import graft.queries.ParityQueries.Q
import graft.queries.TextQueries.{normSql, polyHashSql, toksSql}
import org.apache.spark.sql.functions._

/** Round-3 extension queries: time-series alignment, distribution
  * statistics / outlier gating, TF-IDF, text normalization, and vector
  * quantization. Oracle SQL mirrors the Spark expression text exactly
  * (same operand order, same casts) so IEEE double arithmetic agrees
  * bit-for-bit; all order-dependent accumulations go through DECIMAL or
  * exact percentiles per the determinism recipes.
  */
object StatQueries {

  /** Oracle twin of [[Stats.profile]]: one UNION ALL branch per column.
    * `kind` ∈ num/str/other picks which stats are non-NULL, mirroring the
    * type dispatch in the operator.
    */
  private[queries] def profileSql(table: String, cols: Seq[(String, String)]): String =
    cols.map { case (c, kind) =>
      val mn = if (kind == "num") s"CAST(min($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (kind == "num") s"CAST(max($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val al = if (kind == "str") s"CAST(sum(length($c)) AS DOUBLE) / CAST(count($c) AS DOUBLE)"
               else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS col_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct,
         |  $mn AS min_d, $mx AS max_d, $al AS avg_len
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Oracle twin of [[Stats.functionalDeps]]: per determinant, one grouped
    * subquery computing every dependent's max distinct-branch width, then
    * one UNION ALL row per (determinant, dependent) pair.
    */
  private def fdSql(baseSql: String, cols: Seq[String]): String = {
    val dets = cols.map { a =>
      val deps = cols.filterNot(_ == a)
      val cds = deps.zipWithIndex.map { case (b, i) =>
        s"count(DISTINCT $b) AS cd_$i" }.mkString(", ")
      val mxs = deps.indices.map(i => s"max(cd_$i) AS mx_$i").mkString(", ")
      val sub = s"(SELECT count(*) AS n_groups, $mxs FROM " +
        s"(SELECT $a, $cds FROM base GROUP BY 1) gi) go"
      deps.zipWithIndex.map { case (b, i) =>
        s"""SELECT '$a' AS determinant, '$b' AS dependent, n_groups,
           |  mx_$i AS max_branch, CAST(mx_$i <= 1 AS INT) AS holds
           |FROM $sub""".stripMargin
      }.mkString("\nUNION ALL\n")
    }
    s"WITH base AS ($baseSql)\n" + dets.mkString("\nUNION ALL\n")
  }

  val defs: Map[String, Q] = Map(

    // ----- one-pass column profile (ingestion-gate statistics) -------------
    // Every statistic for every column from ONE aggregation over one scan
    // (n_rows/nulls/exact distinct/numeric min-max/mean string length),
    // unstacked to a row per column. The exact countDistincts share the
    // aggregation via Catalyst's Expand (×7 row multiply here, linear in
    // column count); the 100 TB swap is approx_count_distinct (no Expand) —
    // see Stats.profile scaladoc.
    "q_profile" -> Q(
      (s, d) => Stats.profile(Td.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")),
      Some(profileSql("orders", Seq(
        "o_orderkey" -> "num", "o_custkey" -> "num", "o_orderstatus" -> "str",
        "o_totalprice" -> "num", "o_orderdate" -> "other",
        "o_orderpriority" -> "str")))),

    // ----- profile drift across STORED VERSIONS (profiling × time travel) --
    // The ingestion-monitoring composition: the same one-pass profile run
    // at version 1 of the CDC-maintained orders table (via atVersion) and
    // at current, joined per column — the report that catches "this feed's
    // cardinality/domain jumped" between loads. Drift is real by
    // construction (the CDC batch adds two status values and scales
    // prices); the oracle reconstructs BOTH states from base tables, so a
    // manifest-resolution bug reading the wrong version breaks cells here
    // before it corrupts anything downstream.
    "q_profile_drift" -> Q(
      (s, d) => {
        val t = Td.cdcOrdersTable(s, d)
        val cols = Seq("o_orderstatus", "o_totalprice", "o_custkey")
        def slim(p: org.apache.spark.sql.DataFrame, tag: String) =
          p.select(col("col_name"), col("n_rows").as(s"n_rows_$tag"),
            col("n_distinct").as(s"n_distinct_$tag"), col("max_d").as(s"max_$tag"))
        slim(Stats.profile(t.atVersion(1), cols), "v1")
          .join(slim(Stats.profile(t.current, cols), "cur"), Seq("col_name"))
      },
      Some {
        val cols = Seq("o_orderstatus" -> "str", "o_totalprice" -> "num",
          "o_custkey" -> "num")
        s"""WITH v1 AS (SELECT o_orderstatus, o_totalprice, o_custkey
           |  FROM orders WHERE o_orderkey % 3 <> 0),
           |cur AS (
           |  SELECT o_orderstatus, o_totalprice, o_custkey FROM orders
           |  WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
           |  UNION ALL
           |  SELECT 'U', o_totalprice * 1.1, o_custkey FROM orders
           |  WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
           |  UNION ALL
           |  SELECT 'N', o_totalprice, o_custkey FROM orders
           |  WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0),
           |p1 AS (${profileSql("v1", cols)}),
           |p2 AS (${profileSql("cur", cols)})
           |SELECT p1.col_name,
           |  p1.n_rows AS n_rows_v1, p1.n_distinct AS n_distinct_v1, p1.max_d AS max_v1,
           |  p2.n_rows AS n_rows_cur, p2.n_distinct AS n_distinct_cur, p2.max_d AS max_cur
           |FROM p1 JOIN p2 USING (col_name)""".stripMargin
      }),

    // ----- exact functional-dependency discovery ---------------------------
    // Ordered-pair FD check over orders + a derived o_year column: the
    // operator must rediscover o_orderdate → o_year (a true dependency by
    // construction) and reject the rest with their exact violation widths.
    // One groupBy per determinant, all dependents' distinct widths in that
    // single aggregation — n shuffles, not n².
    "q_fd_discover" -> Q(
      (s, d) => Stats.functionalDeps(
        Td.orders(s, d).select(col("o_custkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_orderdate"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate",
          "o_year")),
      Some(fdSql(
        """SELECT o_custkey, o_orderstatus, o_orderpriority, o_orderdate,
          |CAST(year(o_orderdate) AS BIGINT) AS o_year FROM orders""".stripMargin,
        Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate",
          "o_year")))),

    // ----- fixed-grid resample + gap-fill + forward fill -------------------
    "q_resample_ffill" -> Q(
      (s, d) => TimeSeries.resampleFill(Td.events(s, d), "user_id", "ts", "day", "value"),
      Some("""WITH b AS (
             |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
             |         CAST(count(*) AS BIGINT) AS n_obs,
             |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
             |  FROM events GROUP BY 1, 2),
             |spine AS (
             |  SELECT user_id,
             |         unnest(generate_series(min(bucket), max(bucket), INTERVAL 1 DAY)) AS bucket
             |  FROM b GROUP BY user_id)
             |SELECT s.user_id, s.bucket,
             |  CAST(COALESCE(b.n_obs, 0) AS BIGINT) AS n_obs,
             |  b.bucket_value AS bucket_value,
             |  last_value(b.bucket_value IGNORE NULLS) OVER (
             |    PARTITION BY s.user_id ORDER BY s.bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
             |FROM spine s LEFT JOIN b ON s.user_id = b.user_id AND s.bucket = b.bucket""".stripMargin)),

    // ----- robust outlier flags (Tukey fences + MAD rule) ------------------
    "q_outlier_bounds" -> Q(
      (s, d) => Stats.robustOutliers(Td.events(s, d), "event_type", "value")
        .select(col("event_id"), col("event_type"), col("value"),
          col("q1"), col("med"), col("q3"), col("mad"),
          col("iqr_outlier").cast("int").as("iqr_outlier"),
          col("mad_outlier").cast("int").as("mad_outlier")),
      Some("""WITH q AS (
             |  SELECT event_type,
             |    quantile_cont(value, 0.25) AS q1,
             |    quantile_cont(value, 0.5) AS med,
             |    quantile_cont(value, 0.75) AS q3
             |  FROM events GROUP BY 1),
             |m AS (
             |  SELECT e.event_type, quantile_cont(abs(e.value - q.med), 0.5) AS mad
             |  FROM events e JOIN q USING (event_type) GROUP BY 1)
             |SELECT e.event_id, e.event_type, e.value, q.q1, q.med, q.q3, m.mad,
             |  CAST(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
             |              OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
             |            THEN 1 ELSE 0 END AS INT) AS iqr_outlier,
             |  CAST(CASE WHEN m.mad > 0.0 AND abs(e.value - q.med) > 3.0 * 1.4826 * m.mad
             |            THEN 1 ELSE 0 END AS INT) AS mad_outlier
             |FROM events e JOIN q USING (event_type) JOIN m USING (event_type)""".stripMargin)),

    // ----- fixed-width histogram -------------------------------------------
    "q_histogram" -> Q(
      (s, d) => Stats.histogram(Td.lineitem(s, d), "l_extendedprice", 20),
      Some("""WITH r AS (
             |  SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
             |         CAST(max(l_extendedprice) AS DOUBLE) AS hi
             |  FROM lineitem),
             |b AS (
             |  SELECT CAST(CASE WHEN hi = lo THEN 0
             |              ELSE least(19, floor((CAST(l_extendedprice AS DOUBLE) - lo) / ((hi - lo) / 20)))
             |              END AS INT) AS bin,
             |         lo, hi
             |  FROM lineitem, r)
             |SELECT bin,
             |  lo + bin * (hi - lo) / 20 AS bin_lo,
             |  lo + (bin + 1) * (hi - lo) / 20 AS bin_hi,
             |  CAST(count(*) AS BIGINT) AS cnt
             |FROM b GROUP BY bin, lo, hi""".stripMargin)),

    // ----- exact correlation / regression battery --------------------------
    "q_corr_battery" -> Q(
      (s, d) => Stats.corrBattery(Td.lineitem(s, d), "l_returnflag", "l_quantity", "l_extendedprice"),
      Some("""WITH s AS (
             |  SELECT l_returnflag,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy
             |  FROM lineitem GROUP BY 1)
             |SELECT l_returnflag, n,
             |  (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr,
             |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             |  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
             |  (sxy - sx * sy / n) / n AS covar_pop
             |FROM s""".stripMargin)),

    // ----- TF-IDF top terms per document -----------------------------------
    "q_tfidf" -> Q(
      (s, d) => TextOps.tfidf(Td.documents(s, d), "doc_id", "text", 3),
      Some(s"""WITH tf AS (
              |  SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
              |  FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents) x
              |  GROUP BY 1, 2),
              |d AS (
              |  SELECT doc_id, term, tf,
              |    CAST(count(*) OVER (PARTITION BY term) AS BIGINT) AS df,
              |    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs
              |  FROM tf)
              |SELECT doc_id, term, tf, df,
              |  CAST(tf AS DOUBLE) * n_docs / df AS tfidf,
              |  CAST(rank AS INT) AS rank
              |FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY doc_id
              |    ORDER BY CAST(tf AS DOUBLE) / df DESC, term) AS rank
              |  FROM d) t
              |WHERE rank <= 3""".stripMargin)),

    // ----- text normalization (cleaned text + stable dedup key) ------------
    "q_normalize_text" -> Q(
      (s, d) => Td.documents(s, d).select(
        col("doc_id"),
        TextOps.normText(col("text")).as("norm_text"),
        size(TextOps.tokens(col("text"))).as("n_tokens"),
        TextOps.fingerprint(col("text")).as("norm_key")),
      Some(s"""SELECT doc_id, $normSql AS norm_text,
              |  CAST(len($toksSql) AS INT) AS n_tokens,
              |  ${polyHashSql(normSql)} AS norm_key
              |FROM documents""".stripMargin)),

    // ----- rank-function window battery ------------------------------------
    // rank/dense_rank/percent_rank/cume_dist depend only on the ORDER
    // VALUES (ties share a rank), so they are deterministic without a tie
    // column; percent_rank/cume_dist are exact rationals over counts.
    "q_window_ranks" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
        Td.orders(s, d).select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
             |  CAST(rank() OVER w AS INT) AS rnk,
             |  CAST(dense_rank() OVER w AS INT) AS drnk,
             |  percent_rank() OVER w AS prnk,
             |  cume_dist() OVER w AS cdist
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice)""".stripMargin)),

    // ----- schema-drift union (unionByName, missing columns null-filled) ---
    // The reference sources declare allowSchemaDrift:true — batches with
    // diverged schemas must still union. Spark's unionByName with
    // allowMissingColumns matches by NAME and null-fills gaps (positional
    // UNION would misalign or reject); DuckDB's UNION ALL BY NAME mirrors.
    "q_union_by_name" -> Q(
      (s, d) => {
        val o = Td.orders(s, d)
        val v1 = o.filter(col("o_orderkey") % 2 === 0)
          .select("o_orderkey", "o_orderstatus")
        val v2 = o.filter(col("o_orderkey") % 2 === 1)
          .select("o_orderkey", "o_totalprice")
        v1.unionByName(v2, allowMissingColumns = true)
      },
      Some("""SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0
             |UNION ALL BY NAME
             |SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 1""".stripMargin)),

    // ----- sliding event-time windows (1 h length, 15 min slide) -----------
    // Each event lands in exactly length/slide = 4 overlapping windows;
    // Spark's window() generator replicates rows map-side (no shuffle until
    // the aggregate), epoch-aligned starts — mirrored in SQL by explicit
    // bucket-minus-k·slide start generation.
    "q_sliding_windows" -> Q(
      (s, d) => Td.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("total_value")),
      Some("""SELECT ws AS window_start, event_type,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM (
             |  SELECT e.*, time_bucket(INTERVAL '15 minutes', e.ts) - to_minutes(k.k * 15) AS ws
             |  FROM events e, (SELECT unnest(range(0, 4)) AS k) k) t
             |GROUP BY 1, 2""".stripMargin)),

    // ----- data-quality constraint report ----------------------------------
    "q_quality_report" -> Q(
      (s, d) => {
        import graft.operators.Quality
        import graft.operators.Quality._
        Quality.report(Td.orders(s, d), Seq(
          NotNull("o_custkey"),
          Unique("o_orderkey"),
          AcceptedValues("o_orderstatus", Seq("F", "O", "P")),
          ForeignKey("o_custkey", Td.customer(s, d), "c_custkey")))
      },
      Some("""SELECT 'not_null:o_custkey' AS rule,
             |  CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT) AS violations
             |FROM orders
             |UNION ALL
             |SELECT 'unique:o_orderkey',
             |  CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT)
             |FROM orders
             |UNION ALL
             |SELECT 'accepted_values:o_orderstatus',
             |  CAST(count(CASE WHEN o_orderstatus IS NOT NULL
             |                   AND o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 END) AS BIGINT)
             |FROM orders
             |UNION ALL
             |SELECT 'foreign_key:o_custkey', CAST(count(*) AS BIGINT)
             |FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             |  ON o.o_custkey = c.c_custkey
             |WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL""".stripMargin)),

    // ----- composed corpus pipeline (normalize → dedup → gate → split) -----
    // The point of this query is COMPOSITION: four operators chain into one
    // Catalyst plan (fingerprint kernel → min-id exact dedup on the
    // fingerprint → token-count quality gate → deterministic hash split →
    // rollup), and the oracle is composed from the same SQL fragments the
    // individual operators verify against.
    "q_corpus_pipeline" -> Q(
      (s, d) => {
        import graft.operators.{Dedup, Sampling}
        val docs = Td.documents(s, d).select(
          col("doc_id"), col("lang"),
          TextOps.fingerprint(col("text")).as("fp"),
          size(TextOps.tokens(col("text"))).as("n_tokens"))
        val deduped = Dedup.exact(docs, Seq("fp"), keepBy = "doc_id")
        deduped.filter(col("n_tokens") >= 20)
          .withColumn("split",
            Sampling.splitColumn(col("doc_id"), Seq("train" -> 80, "val" -> 10, "test" -> 10)))
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("total_tokens"))
      },
      Some(s"""WITH docs AS (
              |  SELECT doc_id, lang, ${polyHashSql(normSql)} AS fp,
              |         CAST(len($toksSql) AS INT) AS n_tokens
              |  FROM documents),
              |deduped AS (
              |  SELECT * FROM (
              |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
              |    FROM docs) t WHERE rn = 1),
              |gated AS (SELECT * FROM deduped WHERE n_tokens >= 20),
              |split AS (
              |  SELECT *, CASE
              |    WHEN (((doc_id % 1000003) * 2654435761) // 8192) % 100 < 80 THEN 'train'
              |    WHEN (((doc_id % 1000003) * 2654435761) // 8192) % 100 < 90 THEN 'val'
              |    ELSE 'test' END AS split
              |  FROM gated)
              |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
              |FROM split GROUP BY 1, 2""".stripMargin)),

    // ----- first-order event transition matrix -----------------------------
    "q_transitions" -> Q(
      (s, d) => TimeSeries.transitionCounts(Td.events(s, d), "user_id", "event_type", "ts", "event_id"),
      Some("""WITH p AS (
             |  SELECT user_id, event_type AS cur_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |  FROM events)
             |SELECT prev_type, cur_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(count(*) AS DOUBLE) /
             |    CAST(SUM(count(*)) OVER (PARTITION BY prev_type) AS DOUBLE) AS share
             |FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2""".stripMargin)),

    // ----- cohort retention triangle ---------------------------------------
    "q_retention" -> Q(
      (s, d) => TimeSeries.retentionCohorts(Td.events(s, d), "user_id", "ts"),
      Some("""WITH days AS (
             |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS activity_day
             |  FROM events),
             |c AS (SELECT user_id, min(activity_day) AS cohort_day FROM days GROUP BY 1)
             |SELECT c.cohort_day,
             |  CAST(date_diff('day', c.cohort_day, d.activity_day) AS INT) AS day_offset,
             |  CAST(count(*) AS BIGINT) AS n_active
             |FROM days d JOIN c USING (user_id)
             |GROUP BY 1, 2""".stripMargin)),

    // ----- snapshot diff (recover a CDC stream from two table versions) ----
    "q_snapshot_diff" -> Q(
      (s, d) => {
        import graft.operators.Sampling
        val o = Td.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
        val bkt = Sampling.hashBucket(col("o_orderkey"))
        // deterministic synthetic versions: buckets 0-4 deleted, 90-99
        // inserted, 5-19 price-doubled (updates), 20-89 unchanged
        val v1 = o.filter(bkt < 90)
        val v2 = o.filter(bkt >= 5)
          .withColumn("o_totalprice",
            when(bkt < 20, col("o_totalprice") * 2).otherwise(col("o_totalprice")))
        Relational.snapshotDiff(v1, v2, Seq("o_orderkey"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice,
             |         (((o_orderkey % 1000003) * 2654435761) // 8192) % 100 AS bkt
             |  FROM orders),
             |v1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM o WHERE bkt < 90),
             |v2 AS (SELECT o_orderkey, o_orderstatus,
             |         CASE WHEN bkt < 20 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
             |       FROM o WHERE bkt >= 5)
             |SELECT * FROM (
             |  SELECT COALESCE(v2.o_orderkey, v1.o_orderkey) AS o_orderkey,
             |    CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
             |         WHEN v2.o_orderkey IS NULL THEN 'delete'
             |         WHEN (v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus)
             |           OR (v1.o_totalprice IS DISTINCT FROM v2.o_totalprice) THEN 'update'
             |    END AS change,
             |    v1.o_orderstatus AS old_o_orderstatus, v2.o_orderstatus AS new_o_orderstatus,
             |    v1.o_totalprice AS old_o_totalprice, v2.o_totalprice AS new_o_totalprice
             |  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey) t
             |WHERE change IS NOT NULL""".stripMargin)),

    // ----- time travel: diff of STORED table versions ----------------------
    // q_snapshot_diff proves the diff operator on synthetic plan-level
    // versions; this one proves the STORAGE layer's version chain: the
    // stored CDC table's v1 (bootstrap manifest) read via atVersion against
    // its current snapshot must reproduce exactly the CDC batch's effects —
    // inserts for surviving %3=0 keys, deletes for tombstoned base keys,
    // updates (status + price) for %5=0 base survivors. A manifest that
    // leaks post-v1 bucket rewrites into the v1 read, or loses old buckets
    // from the current one, changes the classification and hash-fails.
    "q_time_travel" -> Q(
      (s, d) => {
        val t = Td.cdcOrdersTable(s, d)
        Relational.snapshotDiff(t.atVersion(1), t.current, Seq("o_orderkey"))
      },
      Some("""SELECT o_orderkey, 'update' AS change,
             |  o_custkey AS old_o_custkey, o_custkey AS new_o_custkey,
             |  o_orderstatus AS old_o_orderstatus, 'U' AS new_o_orderstatus,
             |  o_totalprice AS old_o_totalprice, o_totalprice * 1.1 AS new_o_totalprice,
             |  o_orderdate AS old_o_orderdate, o_orderdate AS new_o_orderdate,
             |  o_orderpriority AS old_o_orderpriority, o_orderpriority AS new_o_orderpriority
             |FROM orders
             |WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0 AND o_orderkey % 7 <> 0
             |UNION ALL
             |SELECT o_orderkey, 'insert',
             |  NULL, o_custkey,
             |  NULL, CASE WHEN o_orderkey % 5 = 0 THEN 'U' ELSE 'N' END,
             |  NULL, CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END,
             |  NULL, o_orderdate,
             |  NULL, o_orderpriority
             |FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 <> 0
             |UNION ALL
             |SELECT o_orderkey, 'delete',
             |  o_custkey, NULL, o_orderstatus, NULL, o_totalprice, NULL,
             |  o_orderdate, NULL, o_orderpriority, NULL
             |FROM orders WHERE o_orderkey % 3 <> 0 AND o_orderkey % 7 = 0""".stripMargin)),

    // ----- fuzzy name matching (blocked levenshtein) -----------------------
    "q_fuzzy_match" -> Q(
      (s, d) => Relational.fuzzyMatch(Td.part(s, d), "p_name", 2),
      Some("""WITH names AS (
             |  SELECT DISTINCT p_name AS name,
             |         string_split(p_name, ' ')[-1] AS block
             |  FROM part WHERE p_name IS NOT NULL)
             |SELECT a.name AS name_a, b.name AS name_b,
             |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
             |FROM names a JOIN names b
             |  ON a.block = b.block AND a.name < b.name
             |  AND levenshtein(a.name, b.name) <= 2""".stripMargin)),

    // ----- calendar dimension generator ------------------------------------
    "q_date_dim" -> Q(
      (s, d) => TimeSeries.calendarDim(Td.events(s, d), "ts"),
      Some("""WITH span AS (
             |  SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS d0,
             |         CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS d1
             |  FROM events)
             |SELECT dt,
             |  CAST(date_part('year', dt) AS INT) AS year,
             |  CAST(date_part('quarter', dt) AS INT) AS quarter,
             |  CAST(date_part('month', dt) AS INT) AS month,
             |  CAST(date_part('day', dt) AS INT) AS day,
             |  CAST(isodow(dt) AS INT) AS isodow,
             |  CAST(CASE WHEN isodow(dt) >= 6 THEN 1 ELSE 0 END AS INT) AS is_weekend
             |FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS dt FROM span) t""".stripMargin)),

    // ----- ratio-to-report (share within group, exact decimal sums) --------
    "q_revenue_share" -> Q(
      (s, d) => {
        val g = Td.lineitem(s, d)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev_dec"))
        val wFlag = Window.partitionBy("l_returnflag")
        g.withColumn("total_dec", sum(col("rev_dec")).over(wFlag))
          .select(
            col("l_returnflag"), col("l_linestatus"),
            col("rev_dec").cast("double").as("revenue"),
            (col("rev_dec").cast("double") / col("total_dec").cast("double")).as("share"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(rev_dec AS DOUBLE) AS revenue,
             |  CAST(rev_dec AS DOUBLE) / CAST(SUM(rev_dec) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS share
             |FROM (
             |  SELECT l_returnflag, l_linestatus,
             |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev_dec
             |  FROM lineitem GROUP BY 1, 2) g""".stripMargin)),

    // ----- equi-depth quantile buckets -------------------------------------
    "q_quantile_buckets" -> Q(
      (s, d) => Stats.quantileBuckets(Td.orders(s, d), "o_totalprice", 4)
        .select("o_orderkey", "o_totalprice", "bucket"),
      Some("""WITH c AS (
             |  SELECT quantile_cont(o_totalprice, 0.25) AS c1,
             |         quantile_cont(o_totalprice, 0.5) AS c2,
             |         quantile_cont(o_totalprice, 0.75) AS c3
             |  FROM orders)
             |SELECT o_orderkey, o_totalprice,
             |  CAST(  (CASE WHEN CAST(o_totalprice AS DOUBLE) > c1 THEN 1 ELSE 0 END)
             |       + (CASE WHEN CAST(o_totalprice AS DOUBLE) > c2 THEN 1 ELSE 0 END)
             |       + (CASE WHEN CAST(o_totalprice AS DOUBLE) > c3 THEN 1 ELSE 0 END) AS INT) AS bucket
             |FROM orders, c""".stripMargin)),

    // ----- deterministic per-group mode ------------------------------------
    "q_group_mode" -> Q(
      (s, d) => Stats.groupMode(Td.events(s, d), "user_id", "event_type"),
      Some("""SELECT user_id, event_type AS mode_value, cnt FROM (
             |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt,
             |    row_number() OVER (
             |      PARTITION BY user_id ORDER BY count(*) DESC, event_type) AS rn
             |  FROM events GROUP BY user_id, event_type) t
             |WHERE rn = 1""".stripMargin)),

    // ----- ordered funnel (view → click → purchase) ------------------------
    "q_funnel" -> Q(
      (s, d) => TimeSeries.funnel(Td.events(s, d), "user_id", "event_type", "ts",
        Seq("view", "click", "purchase")),
      Some("""WITH t1 AS (
             |  SELECT user_id, min(ts) AS t_1 FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |t2 AS (
             |  SELECT e.user_id, min(e.ts) AS t_2
             |  FROM events e JOIN t1 USING (user_id)
             |  WHERE e.event_type = 'click' AND e.ts > t1.t_1 GROUP BY 1),
             |t3 AS (
             |  SELECT e.user_id, min(e.ts) AS t_3
             |  FROM events e JOIN t2 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts > t2.t_2 GROUP BY 1)
             |SELECT t1.user_id, t_1, t_2, t_3,
             |  CAST(1 + CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END
             |         + CASE WHEN t_3 IS NULL THEN 0 ELSE 1 END AS INT) AS steps_completed
             |FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)""".stripMargin)),

    // ----- debounce (drop sub-gap repeats per user/type) -------------------
    "q_debounce" -> Q(
      (s, d) => TimeSeries.debounce(Td.events(s, d),
        Seq("user_id", "event_type"), "ts", "event_id", minGapSeconds = 600),
      Some("""SELECT event_id, ts, user_id, event_type, value, props FROM (
             |  SELECT *,
             |    lag(epoch_us(ts)) OVER (
             |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_us
             |  FROM events) t
             |WHERE prev_us IS NULL OR epoch_us(ts) - prev_us >= 600000000""".stripMargin)),

    // ----- per-dimension scalar quantization (SQ8) -------------------------
    "q_vec_quantize" -> Q(
      (s, d) => Similarity.scalarQuantize(Td.embeddings(s, d), "vec_id", "embedding", 256),
      Some("""WITH ex AS (
             |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
             |         CAST(unnest(embedding) AS DOUBLE) AS x
             |  FROM embeddings),
             |s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM ex GROUP BY dim),
             |c AS (
             |  SELECT vec_id, dim, x, mn, mx,
             |    CASE WHEN mx = mn THEN 0
             |         ELSE CAST(least(255, floor((x - mn) * 256 / (mx - mn))) AS INT) END AS code
             |  FROM ex JOIN s USING (dim))
             |SELECT vec_id, dim, x, code,
             |  mn + (code + 0.5) * (mx - mn) / 256 AS x_hat,
             |  x - (mn + (code + 0.5) * (mx - mn) / 256) AS err
             |FROM c""".stripMargin)),

    // ----- rolling z-score anomaly flags ------------------------------------
    // Trailing-10-observation z-score per user; frame moments accumulate in
    // DECIMAL (order-independent — DuckDB's segment-tree sliding windows
    // reassociate freely) with one double closed form at the end.
    "q_rolling_zscore" -> Q(
      (s, d) => TimeSeries.rollingZscore(Td.events(s, d),
        "user_id", "ts", "event_id", "value", window = 10, minObs = 5)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("n_obs"), col("roll_mean"), col("roll_std"), col("zscore"),
          col("anomaly").cast("int").as("anomaly")),
      Some("""WITH f AS (
             |  SELECT event_id, user_id, ts, value,
             |    count(CAST(value AS DECIMAL(18,2))) OVER w AS n_obs,
             |    CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s,
             |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS ss
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
             |g AS (
             |  SELECT event_id, user_id, ts, value, n_obs,
             |    s / CAST(n_obs AS DOUBLE) AS roll_mean,
             |    sqrt(greatest((ss - s * s / CAST(n_obs AS DOUBLE)) / CAST(n_obs AS DOUBLE), 0.0)) AS roll_std,
             |    CAST(value AS DOUBLE) AS v
             |  FROM f),
             |z AS (
             |  SELECT *, CASE WHEN n_obs >= 5 AND roll_std > 0.0
             |                 THEN (v - roll_mean) / roll_std END AS zscore
             |  FROM g)
             |SELECT event_id, user_id, ts, value, n_obs, roll_mean, roll_std, zscore,
             |  CAST(coalesce(abs(zscore) > 3.0, false) AS INT) AS anomaly
             |FROM z""".stripMargin)),

    // ----- per-source quality-score calibration ------------------------------
    // percent_rank of the raw score WITHIN each source — the quantile
    // normalization that makes scores comparable across domains before a
    // cross-source mixing/selection step (a raw length threshold means a
    // different percentile in every source). Exact rational (rank-1)/(n-1),
    // bit-identical across engines; (score, id) gives a total order.
    "q_score_calibrate" -> Q(
      (s, d) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        Td.documents(s, d).select(col("doc_id"), col("source"), col("n_chars"),
          percent_rank().over(w).as("cal_score"))
      },
      Some("""SELECT doc_id, source, n_chars,
             |  percent_rank() OVER (
             |    PARTITION BY source ORDER BY n_chars, doc_id) AS cal_score
             |FROM documents""".stripMargin)),

    // ----- shuffle-key skew diagnostic --------------------------------------
    // Per-key count distribution of a prospective shuffle key, one row out —
    // the measurement that precedes any salting decision (SkewOps).
    "q_skew_report" -> Q(
      (s, d) => Stats.skewReport(Td.events(s, d), Seq("user_id")),
      Some("""WITH c AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY user_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(sum(cnt) AS BIGINT) AS total_rows,
             |  max(cnt) AS max_cnt,
             |  quantile_cont(cnt, 0.5) AS p50,
             |  quantile_cont(cnt, 0.9) AS p90,
             |  quantile_cont(cnt, 0.99) AS p99,
             |  CAST(max(cnt) AS DOUBLE) /
             |    (CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS skew_ratio
             |FROM c""".stripMargin)),

    // ----- k-anonymity risk report (Sweeney, IJUFKS 2002) -------------------
    // Equivalence classes over (nation, segment, balance band): population,
    // at-risk flag at k=4, and the worst-case re-identification probability
    // 1/n (one exactly-rounded division). The balance band is
    // floor(acctbal/5000) — deterministic double division + floor, cast to
    // BIGINT on both engines.
    "q_kanon_report" -> Q(
      (s, d) => Privacy.kAnonymityReport(
        Td.customer(s, d).select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 5000).cast("long").as("balance_band")),
        Seq("c_nationkey", "c_mktsegment", "balance_band"), k = 4),
      Some("""WITH q AS (SELECT c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 5000) AS BIGINT) AS balance_band
             |  FROM customer)
             |SELECT c_nationkey, c_mktsegment, balance_band,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(count(*) < 4 AS INT) AS at_risk,
             |  1.0 / CAST(count(*) AS DOUBLE) AS reid_risk
             |FROM q GROUP BY 1, 2, 3""".stripMargin)),

    // ----- k-anonymity cell suppression ------------------------------------
    // Per-row sanitized relation: rows in equivalence classes smaller than
    // k=4 get their quasi columns NULLed; one count-over-window, no
    // self-join. A leaked quasi value in a small class (or an over-
    // suppressed large class) changes cells and hash-fails.
    "q_kanon_suppress" -> Q(
      (s, d) => Privacy.suppressBelowK(
        Td.customer(s, d).select(col("c_custkey"), col("c_nationkey"),
          col("c_mktsegment"),
          floor(col("c_acctbal") / 5000).cast("long").as("balance_band")),
        Seq("c_nationkey", "c_mktsegment", "balance_band"), k = 4),
      Some("""WITH q AS (SELECT c_custkey, c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 5000) AS BIGINT) AS balance_band
             |  FROM customer),
             |n AS (SELECT *, count(*) OVER (
             |    PARTITION BY c_nationkey, c_mktsegment, balance_band) AS nn
             |  FROM q)
             |SELECT c_custkey,
             |  CASE WHEN nn < 4 THEN NULL ELSE c_nationkey END AS c_nationkey,
             |  CASE WHEN nn < 4 THEN NULL ELSE c_mktsegment END AS c_mktsegment,
             |  CASE WHEN nn < 4 THEN NULL ELSE balance_band END AS balance_band,
             |  CAST(nn < 4 AS INT) AS suppressed
             |FROM n""".stripMargin)),
  )
}
