package graft.queries

import graft.engine.{KeyedTable, Ops}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One `queries` entry (+ DuckDB oracle SQL) per reference operator from
  * SURVEY §2, mapped onto the driver testdata per FIXTURES.md §B.
  *
  * Determinism discipline for the oracle hash-compare:
  *  - money aggregates accumulate in DECIMAL (exact, order-independent) and
  *    only then convert once to DOUBLE — identical bits in Spark and DuckDB
  *    regardless of partitioning/merge order;
  *  - averages are expressed as exact-sum ÷ count, not float `avg()`;
  *  - every window/sort carries an explicit unique tie-break column;
  *  - double→int conversions use `floor`+cast (Spark truncates, DuckDB
  *    rounds — a bare cast would diverge);
  *  - integer CASE-sums are cast to BIGINT (DuckDB SUM(int) is HUGEINT).
  */
object ParityQueries {

  final case class Q(fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  /** Exact decimal accumulation of a double column, surfaced as double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  val defs: Map[String, Q] = Map(

    // ----- T1: conditional disjoint split (null predicate → accepted side) --
    "q_split_accepted" -> Q(
      (s, d) => Ops.split(Td.events(s, d), col("value") < lit(2.0))._2,
      Some("SELECT * FROM events WHERE NOT coalesce(value < 2.0, false)")),

    "q_split_bad" -> Q(
      (s, d) => Ops.split(Td.events(s, d), col("value") < lit(2.0))._1,
      Some("SELECT * FROM events WHERE coalesce(value < 2.0, false)")),

    // ----- S5: parameterized document query (filter + project + limit) -----
    // Reference: `SELECT c.id, c.booking_id FROM c WHERE c.status = @status`
    // with a client-side max_scan cap (`mock_data_in_cosmosdb.py:179-189`).
    // The cap becomes an ordered limit for determinism.
    "q_doc_query" -> Q(
      (s, d) => Td.events(s, d)
        .filter(col("event_type") === lit("purchase"))
        .select("event_id", "user_id")
        .orderBy("event_id")
        .limit(2000),
      Some("""SELECT event_id, user_id FROM events WHERE event_type = 'purchase'
             |ORDER BY event_id LIMIT 2000""".stripMargin)),

    // ----- T2 dedupe: latest row per key (desc, nulls last, tie-broken) -----
    "q_latest_per_key" -> Q(
      (s, d) => Ops.latestPerKey(Td.events(s, d), Seq("user_id"), "ts", Seq("event_id")),
      Some("""SELECT event_id, ts, user_id, event_type, value, props FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC) AS rn
             |  FROM events) t WHERE rn = 1""".stripMargin)),

    // ----- T2+T3: lookup against dim + insert/update flag -------------------
    "q_cdc_lookup_flag" -> Q(
      (s, d) => {
        val latest = Ops.latestPerKey(Td.events(s, d), Seq("user_id"), "ts", Seq("event_id"))
        val looked = Ops.lookupLatest(
          latest, Td.customer(s, d).withColumnRenamed("c_custkey", "user_id"),
          "user_id", "c_acctbal", hintBroadcast = true)
        Ops.flagInsertUpdate(looked, "lookup_user_id")
          .select(latest("user_id"), col("event_id"), col("ts"),
            col("lookup_c_mktsegment").as("segment"), col(Ops.OpCol))
      },
      Some("""SELECT e.user_id, e.event_id, e.ts, c.c_mktsegment AS segment,
             |  CASE WHEN c.c_custkey IS NULL THEN 'insert' ELSE 'update' END AS _op
             |FROM (
             |  SELECT * FROM (
             |    SELECT *, row_number() OVER (
             |      PARTITION BY user_id ORDER BY ts DESC NULLS LAST, event_id DESC) AS rn
             |    FROM events) t WHERE rn = 1) e
             |LEFT JOIN customer c ON e.user_id = c.c_custkey""".stripMargin)),

    // ----- §2.4: the 17-column aggregation battery (country ≙ nation) -------
    // status analog: 'O' ≙ Confirmed, 'F' ≙ Cancelled.
    "q_agg_battery" -> Q(
      (s, d) => {
        val amount = coalesce(col("o_totalprice"), lit(0.0))
        def st(v: String, c: Column): Column = when(col("o_orderstatus") === v, c)
        val cnt = count(lit(1))
        val cancelled = sum(st("F", lit(1)).otherwise(0))
        Td.orders(s, d)
          .join(Td.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Td.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("country"))
          .agg(
            cnt.as("total_bookings"),
            sum(st("O", lit(1)).otherwise(0)).as("confirmed_bookings"),
            cancelled.as("cancelled_bookings"),
            dsum(amount).as("total_amount"),
            dsum(st("O", amount).otherwise(0.0)).as("confirmed_amount"),
            dsum(st("F", amount).otherwise(0.0)).as("cancelled_amount"),
            when(cnt === 0, lit(0.0))
              .otherwise(cancelled.cast("double") / cnt.cast("double")).as("cancellation_rate"),
            max(col("o_orderdate")).as("last_booking_date"),
            min(col("o_orderdate")).as("first_booking_date"),
            (dsum(amount) / cnt).as("avg_amount"),
            (dsum(st("O", amount)) / nullif(sum(st("O", lit(1)).otherwise(0)), lit(0)))
              .as("confirmed_avg_amount"),
            (dsum(st("F", amount)) / nullif(cancelled, lit(0))).as("cancelled_avg_amount"),
            min(amount).as("min_amount"),
            max(amount).as("max_amount"),
            countDistinct(col("o_custkey")).as("distinct_customers"),
            (sum(dayofmonth(col("o_orderdate"))).cast("double") / cnt).as("avg_stay_duration"),
          )
      },
      Some("""SELECT n_name AS country,
             |  count(*) AS total_bookings,
             |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS confirmed_bookings,
             |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS cancelled_bookings,
             |  CAST(SUM(CAST(coalesce(o_totalprice,0) AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
             |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(coalesce(o_totalprice,0) AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS confirmed_amount,
             |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(coalesce(o_totalprice,0) AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS cancelled_amount,
             |  CASE WHEN count(*)=0 THEN 0.0 ELSE
             |    CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS DOUBLE)/CAST(count(*) AS DOUBLE) END AS cancellation_rate,
             |  max(o_orderdate) AS last_booking_date,
             |  min(o_orderdate) AS first_booking_date,
             |  CAST(SUM(CAST(coalesce(o_totalprice,0) AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_amount,
             |  CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(coalesce(o_totalprice,0) AS DECIMAL(18,2)) END) AS DOUBLE)
             |    / NULLIF(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END),0) AS confirmed_avg_amount,
             |  CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(coalesce(o_totalprice,0) AS DECIMAL(18,2)) END) AS DOUBLE)
             |    / NULLIF(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END),0) AS cancelled_avg_amount,
             |  min(coalesce(o_totalprice,0)) AS min_amount,
             |  max(coalesce(o_totalprice,0)) AS max_amount,
             |  count(DISTINCT o_custkey) AS distinct_customers,
             |  CAST(SUM(day(o_orderdate)) AS DOUBLE)/count(*) AS avg_stay_duration
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)),

    // ----- K1/K2: keyed insert/update merge as a plan -----------------------
    "q_merge_upsert" -> Q(
      (s, d) => {
        val orders = Td.orders(s, d)
        val current = orders.filter(col("o_orderkey") % 3 =!= 0)
        val batch = orders.filter(col("o_orderkey") % 5 === 0)
          .withColumn("o_orderstatus", lit("U"))
          .withColumn("o_totalprice", col("o_totalprice") * 1.1)
        KeyedTable.mergePlan(current, batch, Seq("o_orderkey"))
      },
      Some("""SELECT * FROM orders
             |WHERE o_orderkey % 3 <> 0 AND NOT EXISTS (
             |  SELECT 1 FROM orders b WHERE b.o_orderkey % 5 = 0
             |    AND b.o_orderkey = orders.o_orderkey)
             |UNION ALL
             |SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             |       o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
             |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin)),

    // ----- schema-drift merge (the reference's allowSchemaDrift sinks) -----
    // The batch OMITS o_orderpriority (null-filled for batch rows) and ADDS
    // update_src (null for pre-existing rows) — additive evolution by name,
    // same anti-join+union shape as q_merge_upsert at the union schema.
    "q_merge_evolve" -> Q(
      (s, d) => {
        val orders = Td.orders(s, d)
        val current = orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
          .filter(col("o_orderkey") % 3 =!= 0)
        val batch = orders.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_custkey"),
            (col("o_totalprice") * 1.1).as("o_totalprice"),
            lit("cdc_feed").as("update_src"))
        KeyedTable.mergePlanEvolving(current, batch, Seq("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority,
             |       CAST(NULL AS VARCHAR) AS update_src
             |FROM orders
             |WHERE o_orderkey % 3 <> 0 AND NOT EXISTS (
             |  SELECT 1 FROM orders b WHERE b.o_orderkey % 5 = 0
             |    AND b.o_orderkey = orders.o_orderkey)
             |UNION ALL
             |SELECT o_orderkey, o_custkey, o_totalprice * 1.1,
             |       CAST(NULL AS VARCHAR), 'cdc_feed'
             |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin)),

    // ----- op-coded CDC merge with tombstones (mergeCdc) -------------------
    // Reads the STORED table Td.cdcOrdersTable built base→one CDC batch
    // (I/U/D with per-key sequences), so the bytes came from the real
    // bucketed write path: deletes and upserts folded into ONE version
    // (KeyedTable.cdcMergePlan), touched-bucket rewrite only. The oracle
    // recomputes the final snapshot from the op algebra: latest-op-D keys
    // (%7=0) vanish, %5=0 survivors carry the seq-2 update, remaining %3=0
    // keys carry the seq-1 insert, untouched base rows pass through.
    "q_cdc_merge" -> Q(
      (s, d) => Td.cdcOrdersTable(s, d).current,
      Some("""SELECT * FROM orders WHERE o_orderkey % 3 <> 0
             |  AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
             |UNION ALL
             |SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             |       o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
             |FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
             |UNION ALL
             |SELECT o_orderkey, o_custkey, 'N' AS o_orderstatus,
             |       o_totalprice, o_orderdate, o_orderpriority
             |FROM orders
             |WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0""".stripMargin)),

    // ----- merge-on-read CDC apply (delta segments + read-time coalesce) ---
    // Same op algebra as q_cdc_merge, but the epoch landed as PER-BUCKET
    // DELTA SEGMENTS on a `mor = true` table and was deliberately not
    // compacted — the read must mask tombstones, let the latest segment win
    // per key, and anti-join base rows against the broadcast delta key set.
    // `mor_pending = 1` is computed from the table's LIVE delta sidecar, so
    // the row hash fails if the install ever compacts (or never wrote
    // deltas) and the query silently stops exercising the coalesce path.
    "q_mor_read" -> Q(
      (s, d) => {
        val t = Td.morOrdersTable(s, d)
        t.current.withColumn("mor_pending",
          lit(if (t.deltaMap.nonEmpty) 1 else 0))
      },
      Some("""SELECT *, 1 AS mor_pending FROM (
             |SELECT * FROM orders WHERE o_orderkey % 3 <> 0
             |  AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
             |UNION ALL
             |SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             |       o_totalprice * 1.1 AS o_totalprice, o_orderdate, o_orderpriority
             |FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
             |UNION ALL
             |SELECT o_orderkey, o_custkey, 'N' AS o_orderstatus,
             |       o_totalprice, o_orderdate, o_orderpriority
             |FROM orders
             |WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0)""".stripMargin)),

    // ----- SCD-2 history maintenance (Scd2.bootstrap/maintain) -------------
    // Reads the STORED history table Td.scd2OrdersTable built bootstrap →
    // two CDC batches (updates+tombstones, then re-inserts), so the bytes
    // came from the real incremental path: per-key history groups rewritten
    // through KeyedTable.replaceKeys, closed rows passing through untouched.
    // The oracle reconstructs the history from the flat event log with one
    // lead() window — the same algebra from scratch. Every row's
    // (valid_from, valid_to, is_current) must match to the hash: a
    // mis-closed interval anywhere (U→D chains, tombstone-gap re-opens,
    // I-on-open) shifts a boundary and fails.
    "q_scd2_maintain" -> Q(
      (s, d) => Td.scd2OrdersTable(s, d).current,
      Some("""WITH ev AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |         o_orderdate, o_orderpriority, CAST(0 AS BIGINT) AS seq, 'O' AS op
             |  FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, 'U', o_totalprice * 1.1,
             |         o_orderdate, o_orderpriority, 1, 'U'
             |  FROM orders WHERE o_orderkey % 5 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |         o_orderdate, o_orderpriority, 2, 'D'
             |  FROM orders WHERE o_orderkey % 7 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, 'R', o_totalprice,
             |         o_orderdate, o_orderpriority, 3, 'I'
             |  FROM orders WHERE o_orderkey % 11 = 0),
             |h AS (
             |  SELECT *, lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) AS vto
             |  FROM ev)
             |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             |  o_orderpriority, seq AS valid_from, vto AS valid_to,
             |  (vto IS NULL) AS is_current
             |FROM h WHERE op <> 'D'""".stripMargin)),

    // ----- SCD-2 AS-OF read (point-in-time snapshot from the history) ------
    // asOf(2) lands BETWEEN the batches: after the seq-1 updates and the
    // seq-2 tombstones (a delete at s is already invisible AT s — the
    // to-exclusive boundary), before the seq-3 re-inserts. valid_to values
    // still reflect the FULL history (a later re-insert closed some rows),
    // so the oracle filters the same reconstructed-history CTE rather than
    // rebuilding a truncated log — pinning that asOf is a pure filter over
    // final state, not a replay.
    "q_scd2_asof" -> Q(
      (s, d) => graft.engine.Scd2.asOf(Td.scd2OrdersTable(s, d).current, 2L),
      Some("""WITH ev AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |         o_orderdate, o_orderpriority, CAST(0 AS BIGINT) AS seq, 'O' AS op
             |  FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, 'U', o_totalprice * 1.1,
             |         o_orderdate, o_orderpriority, 1, 'U'
             |  FROM orders WHERE o_orderkey % 5 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |         o_orderdate, o_orderpriority, 2, 'D'
             |  FROM orders WHERE o_orderkey % 7 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, 'R', o_totalprice,
             |         o_orderdate, o_orderpriority, 3, 'I'
             |  FROM orders WHERE o_orderkey % 11 = 0),
             |h AS (
             |  SELECT *, lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) AS vto
             |  FROM ev)
             |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             |  o_orderpriority, seq AS valid_from, vto AS valid_to,
             |  (vto IS NULL) AS is_current
             |FROM h WHERE op <> 'D' AND seq <= 2 AND (vto IS NULL OR vto > 2)""".stripMargin)),

    // ----- SCD-2 temporal (point-in-time) join -----------------------------
    // Each probe row (one per order, at its own t = key % 5 ∈ 0..4) joins
    // the history row in force AT t — the leakage-free feature join. The
    // probe times straddle every boundary the build creates (updates at 1,
    // tombstones at 2, re-inserts at 3), so probes inside tombstone gaps
    // drop (inner), pre-update probes see ORIGINAL attribute values, and
    // post-re-insert probes see the re-opened row. Oracle: the same
    // reconstruction CTE with the interval predicate in the join.
    "q_scd2_temporal" -> Q(
      (s, d) => graft.engine.Scd2.temporalJoin(
        Td.orders(s, d).select(col("o_orderkey"), (col("o_orderkey") % 5).as("probe_t")),
        Td.scd2OrdersTable(s, d).current, Seq("o_orderkey"), "probe_t", "inner"),
      Some("""WITH ev AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |         o_orderdate, o_orderpriority, CAST(0 AS BIGINT) AS seq, 'O' AS op
             |  FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, 'U', o_totalprice * 1.1,
             |         o_orderdate, o_orderpriority, 1, 'U'
             |  FROM orders WHERE o_orderkey % 5 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |         o_orderdate, o_orderpriority, 2, 'D'
             |  FROM orders WHERE o_orderkey % 7 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, 'R', o_totalprice,
             |         o_orderdate, o_orderpriority, 3, 'I'
             |  FROM orders WHERE o_orderkey % 11 = 0),
             |h AS (
             |  SELECT *, lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) AS vto
             |  FROM ev),
             |p AS (SELECT o_orderkey, o_orderkey % 5 AS probe_t FROM orders)
             |SELECT p.o_orderkey, p.probe_t, h.o_custkey, h.o_orderstatus,
             |  h.o_totalprice, h.o_orderdate, h.o_orderpriority,
             |  h.seq AS valid_from, h.vto AS valid_to, (h.vto IS NULL) AS is_current
             |FROM p JOIN h ON p.o_orderkey = h.o_orderkey AND h.op <> 'D'
             |  AND h.seq <= p.probe_t AND (h.vto IS NULL OR h.vto > p.probe_t)""".stripMargin)),

    // ----- maintained join view (JoinDelta: delta-join IVM + join index) ---
    // Reads the STORED view Td.joinMaintainTables kept fresh across a
    // fact-side epoch (inserts, dim-reference REMAPS, tombstones) and a
    // dim-side epoch (payload updates + deletes that cascade through the
    // inner join) — the dim epoch resolves its affected facts through the
    // range-bucketed join index, never a fact scan. The oracle joins the
    // two final base states from scratch: a stale index pair, a missed
    // cascade, or an un-recomputed view row shows up as a row/hash diff.
    "q_join_maintain" -> Q(
      (s, d) => Td.joinMaintainTables(s, d)._1.current,
      Some("""WITH f AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |         o_orderdate, o_orderpriority
             |  FROM orders
             |  WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT o_orderkey, (o_custkey % 100) + 1, o_orderstatus,
             |         o_totalprice * 1.1, o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, 'N', o_totalprice, o_orderdate,
             |         o_orderpriority
             |  FROM orders WHERE o_orderkey % 3 = 0),
             |c AS (
             |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 4 <> 0 AND c_custkey % 9 <> 0
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_nationkey, c_acctbal * 2, 'VIP'
             |  FROM customer WHERE c_custkey % 4 = 0 AND c_custkey % 9 <> 0)
             |SELECT f.o_orderkey, f.o_custkey, f.o_orderstatus, f.o_totalprice,
             |  f.o_orderdate, f.o_orderpriority, c.c_name, c.c_nationkey,
             |  c.c_acctbal, c.c_mktsegment
             |FROM f JOIN c ON f.o_custkey = c.c_custkey""".stripMargin)),

    // ----- incremental aggregate maintenance (retraction arithmetic) -------
    // Reads the STORED state table Td.aggMaintainTable: bootstrapped from
    // the %3≠0 base, then maintained with ONE before/after-image delta batch
    // (never re-reading facts — cost ∝ delta, the 100 TB refresh story).
    // The oracle recomputes the aggregate from the FINAL fact state (the
    // q_cdc_merge union), so a single mis-cancelled retraction anywhere in
    // the op algebra (group moves included: updates shift rows into status
    // 'U', inserts into 'N') breaks the hash. Sums accumulate in DECIMAL on
    // both sides — delta-maintained state is bit-equal to recompute.
    "q_agg_maintain" -> Q(
      (s, d) => Td.aggMaintainTable(s, d).current.select(
        col("o_orderstatus"), col("cnt"),
        col("sum_o_totalprice").cast("double").as("sum_price")),
      Some("""WITH final_state AS (
             |  SELECT o_orderstatus,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,3)) AS p
             |  FROM orders
             |  WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT 'U' AS o_orderstatus,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1))
             |         AS DECIMAL(19,3)) AS p
             |  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT 'N' AS o_orderstatus,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,3)) AS p
             |  FROM orders
             |  WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0)
             |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS cnt,
             |  CAST(COALESCE(SUM(p), 0) AS DOUBLE) AS sum_price
             |FROM final_state GROUP BY o_orderstatus""".stripMargin)),

    // ----- maintained join view, LEFT twin ---------------------------------
    // Same stored root, same epochs, same shared index (version tags dedupe
    // the fact/dim/index applies across the two views): only the per-view
    // recompute differs, so the epoch-2 dim deletes NULL this view's
    // payload exactly where they cascade q_join_maintain's rows away.
    "q_join_maintain_left" -> Q(
      (s, d) => Td.joinMaintainLeftView(s, d).current,
      Some("""WITH f AS (
             |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |         o_orderdate, o_orderpriority
             |  FROM orders
             |  WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT o_orderkey, (o_custkey % 100) + 1, o_orderstatus,
             |         o_totalprice * 1.1, o_orderdate, o_orderpriority
             |  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, 'N', o_totalprice, o_orderdate,
             |         o_orderpriority
             |  FROM orders WHERE o_orderkey % 3 = 0),
             |c AS (
             |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
             |  FROM customer WHERE c_custkey % 4 <> 0 AND c_custkey % 9 <> 0
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_nationkey, c_acctbal * 2, 'VIP'
             |  FROM customer WHERE c_custkey % 4 = 0 AND c_custkey % 9 <> 0)
             |SELECT f.o_orderkey, f.o_custkey, f.o_orderstatus, f.o_totalprice,
             |  f.o_orderdate, f.o_orderpriority, c.c_name, c.c_nationkey,
             |  c.c_acctbal, c.c_mktsegment
             |FROM f LEFT JOIN c ON f.o_custkey = c.c_custkey""".stripMargin)),

    // ----- chained IVM: view change-feed → downstream aggregate ------------
    // Two maintenance layers composed: base CDC epochs maintain the join
    // view, the view EMITS its own op-coded delta (JoinDelta emitChanges),
    // and that feed maintains a segment-count AggDelta state — order counts
    // per customer segment kept fresh without EITHER layer re-reading its
    // base. The oracle recomputes from the final base states; any wrong
    // emitted image (missed cascade D, mis-imaged group move, unsuppressed
    // no-op U) double- or under-counts a segment and hash-fails.
    "q_view_agg_chain" -> Q(
      (s, d) => Td.joinMaintainSegAgg(s, d).current.select(
        col("c_mktsegment"), col("cnt")),
      Some("""WITH f AS (
             |  SELECT o_orderkey, o_custkey
             |  FROM orders
             |  WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT o_orderkey, (o_custkey % 100) + 1
             |  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey
             |  FROM orders WHERE o_orderkey % 3 = 0),
             |c AS (
             |  SELECT c_custkey, c_mktsegment
             |  FROM customer WHERE c_custkey % 4 <> 0 AND c_custkey % 9 <> 0
             |  UNION ALL
             |  SELECT c_custkey, 'VIP'
             |  FROM customer WHERE c_custkey % 4 = 0 AND c_custkey % 9 <> 0)
             |SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
             |FROM f JOIN c ON f.o_custkey = c.c_custkey
             |GROUP BY c.c_mktsegment""".stripMargin)),

    // ----- maintained per-group top-k (buffered state + refill valve) ------
    // Reads the STORED TopKDelta state Td.topkMaintainTable: bootstrapped
    // top-10 buffers (k=5, factor 2) per status, then one delta whose
    // updates MOVE groups (old-status retraction + new-status candidacy)
    // and whose deletes erode saturated buffers. The oracle ranks the
    // final fact state from scratch with the same (score DESC, key ASC)
    // tie-break; rank is surfaced INT on both sides (the HUGEINT width
    // lesson). Exactness despite never re-ranking the table is the
    // buffered-coverage invariant the spec pins.
    "q_topk_maintain" -> Q(
      (s, d) => graft.engine.TopKDelta.topK(Td.topkMaintainTable(s, d).current,
        Seq("o_orderstatus"), Seq("o_orderkey"), "o_totalprice", 5),
      Some("""WITH f AS (
             |  SELECT o_orderstatus, o_orderkey, o_totalprice
             |  FROM orders
             |  WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT 'U', o_orderkey, o_totalprice * 1.1
             |  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 <> 0
             |  UNION ALL
             |  SELECT 'N', o_orderkey, o_totalprice
             |  FROM orders WHERE o_orderkey % 3 = 0),
             |r AS (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY o_orderstatus
             |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM f)
             |SELECT o_orderstatus, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rank
             |FROM r WHERE rn <= 5""".stripMargin)),

    // ----- incremental distinct-count maintenance (mergeable HLL state) ----
    // Distinct counts are not retractable (AggDelta can't maintain them), so
    // the state is per-group HLL sketches grown by union — Td's stored table
    // is bootstrapped from the %3≠0 base and maintained with the %3=0 batch,
    // never recounting. The estimate is engine-internal, so the gate follows
    // the ANN pattern: emit the EXACT twin + an in-band error flag the
    // oracle asserts — a sketch-state regression (lost union, wrong group
    // routing, stale buckets) pushes the estimate past the bound and
    // hash-fails, while the exact column pins the group structure.
    "q_distinct_maintain" -> Q(
      (s, d) => {
        val st = Td.distinctStateTable(s, d)
        val est = graft.engine.DistinctState.estimate(st.current, Seq("o_orderstatus"))
        val exact = Td.orders(s, d).groupBy("o_orderstatus")
          .agg(countDistinct(col("o_custkey")).as("distinct_customers"))
        est.join(exact, Seq("o_orderstatus"))
          .select(col("o_orderstatus"), col("distinct_customers"),
            when(abs(col("distinct_est").cast("double") /
              col("distinct_customers").cast("double") - 1) <= 0.05, 1)
              .otherwise(0).as("est_ok"))
      },
      Some("""SELECT o_orderstatus,
             |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS distinct_customers,
             |  1 AS est_ok
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ----- maintained histogram (bin = derived group, moves under updates) -
    // The same retraction engine with the bin as a second group column: a
    // %5=0 price update retracts from floor(p/1e5) and adds to
    // floor(1.1p/1e5) — when those differ, the row MOVES BINS, the case
    // naive in-place histogram updates get wrong. Oracle recomputes the
    // histogram from the final fact state; one mis-binned retraction
    // anywhere shifts two cells and hash-fails.
    "q_hist_maintain" -> Q(
      (s, d) => Td.histMaintainTable(s, d).current.select(
        col("o_orderstatus"), col("price_bin"), col("cnt"),
        col("sum_o_totalprice").cast("double").as("sum_price")),
      Some("""WITH final_state AS (
             |  -- p (double) drives the BIN exactly as Spark bins the double;
             |  -- pd (decimal) drives the SUM exactly as Spark accumulates —
             |  -- casting the double product to decimal instead diverges
             |  -- between engines (see q_agg_maintain)
             |  SELECT o_orderstatus, o_totalprice AS p,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,3)) AS pd
             |  FROM orders
             |  WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT 'U', o_totalprice * 1.1,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(2,1))
             |         AS DECIMAL(19,3))
             |  FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT 'N', o_totalprice,
             |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,3))
             |  FROM orders
             |  WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0)
             |SELECT o_orderstatus, CAST(floor(p / 100000) AS BIGINT) AS price_bin,
             |  CAST(count(*) AS BIGINT) AS cnt,
             |  CAST(COALESCE(SUM(pd), 0) AS DOUBLE) AS sum_price
             |FROM final_state GROUP BY 1, 2""".stripMargin)),

    // ----- quantiles read off the MAINTAINED histogram ---------------------
    // The dashboard payoff of q_hist_maintain's state: per status, the
    // bin-resolution p50/p90 (smallest bin whose cumulative count clears
    // the rank) derived from the maintained bins alone — no fact scan, all
    // integer arithmetic (cum·2 ≥ total, cum·10 ≥ 9·total), so the cells
    // hash exactly. The oracle re-derives the same quantiles from the
    // final fact state: a single mis-binned maintenance retraction moves a
    // cumulative boundary and flips a bin cell.
    "q_quantile_maintain" -> Q(
      (s, d) => {
        val h = Td.histMaintainTable(s, d).current
          .select(col("o_orderstatus"), col("price_bin"), col("cnt"))
        val w = Window.partitionBy("o_orderstatus").orderBy("price_bin")
        val cum = h.withColumn("cum", sum(col("cnt")).over(w))
        val tot = h.groupBy("o_orderstatus").agg(sum(col("cnt")).as("total"))
        cum.join(tot, Seq("o_orderstatus"))
          .groupBy(col("o_orderstatus"))
          .agg(max(col("total")).as("total"),
            min(when(col("cum") * 2 >= col("total"), col("price_bin"))).as("p50_bin"),
            min(when(col("cum") * 10 >= col("total") * 9, col("price_bin"))).as("p90_bin"))
      },
      Some("""WITH final_state AS (
             |  SELECT o_orderstatus, o_totalprice AS p FROM orders
             |  WHERE o_orderkey % 3 <> 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT 'U', o_totalprice * 1.1 FROM orders
             |  WHERE o_orderkey % 5 = 0 AND o_orderkey % 7 <> 0
             |  UNION ALL
             |  SELECT 'N', o_totalprice FROM orders
             |  WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0 AND o_orderkey % 7 <> 0),
             |bins AS (
             |  SELECT o_orderstatus, CAST(floor(p / 100000) AS BIGINT) AS price_bin,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM final_state GROUP BY 1, 2),
             |c AS (
             |  SELECT *, CAST(sum(cnt) OVER (PARTITION BY o_orderstatus
             |      ORDER BY price_bin) AS BIGINT) AS cum,
             |    CAST(sum(cnt) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS total
             |  FROM bins)
             |SELECT o_orderstatus, max(total) AS total,
             |  min(CASE WHEN cum * 2 >= total THEN price_bin END) AS p50_bin,
             |  min(CASE WHEN cum * 10 >= total * 9 THEN price_bin END) AS p90_bin
             |FROM c GROUP BY 1""".stripMargin)),

    // ----- T5: schema-align casts ------------------------------------------
    // The decimal / date casts still run, but the *output* columns surface
    // as double / timestamp: DATE and DECIMAL physical output types hash
    // differently between the Spark-parquet and DuckDB result paths
    // (Decimal('12.10') vs 12.1, date vs midnight timestamp) even when the
    // values are identical — every hash-proven query emits only
    // string/int/long/double/timestamp, so q_align_cast does too.
    "q_align_cast" -> Q(
      (s, d) => Td.lineitem(s, d).select(
        col("l_orderkey").cast("string").as("order_key"),
        col("l_linenumber").as("line_no"),
        col("l_quantity").cast("decimal(12,2)").cast("double").as("qty_dec"),
        col("l_shipdate").cast("date").cast("timestamp").as("ship_date"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        concat(col("l_returnflag"), lit("-"), col("l_linestatus")).as("flag_status"),
      ),
      Some("""SELECT CAST(l_orderkey AS VARCHAR) AS order_key,
             |  l_linenumber AS line_no,
             |  CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_dec,
             |  CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date,
             |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             |  l_returnflag || '-' || l_linestatus AS flag_status
             |FROM lineitem""".stripMargin)),

    // ----- sort / top-k -----------------------------------------------------
    "q_topk_orders" -> Q(
      (s, d) => Td.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin)),

    // ----- window functions: running sum + rank -----------------------------
    "q_window_running" -> Q(
      (s, d) => {
        val wRun = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wRank = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Td.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          sum(col("o_totalprice").cast("decimal(18,2)")).over(wRun)
            .cast("double").as("running_spend"),
          rank().over(wRank).as("spend_rank"),
        )
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
             |  rank() OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice DESC, o_orderkey) AS spend_rank
             |FROM orders""".stripMargin)),

    // ----- window: RANGE frame (1-hour sliding sum per user) ---------------
    // Range frames bound by VALUE distance, not row count — ties on the
    // ordering key share a frame, so no tie-break column is needed for
    // determinism (unlike every ROWS frame here).
    "q_window_range" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, 0) // 1 hour in µs
        Td.events(s, d).select(
          col("event_id"), col("user_id"), col("ts"),
          sum(col("value").cast("decimal(18,2)")).over(w)
            .cast("double").as("hour_sum"),
          count(lit(1)).over(w).as("hour_n"),
        )
      },
      Some("""SELECT event_id, user_id, ts,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             |    PARTITION BY user_id ORDER BY epoch_us(ts)
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum,
             |  COUNT(*) OVER (
             |    PARTITION BY user_id ORDER BY epoch_us(ts)
             |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS hour_n
             |FROM events""".stripMargin)),

    // ----- join shapes: semi / anti ----------------------------------------
    "q_semi_join" -> Q(
      (s, d) => Td.customer(s, d)
        .join(Td.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // ----- full outer join: both null sides populated ----------------------
    // High-value customers vs large open orders — each side keeps rows the
    // other lacks, exercising null-completion on BOTH sides of the join.
    "q_full_outer" -> Q(
      (s, d) => Td.customer(s, d).filter(col("c_acctbal") > 9000)
        .select("c_custkey", "c_name")
        .join(Td.orders(s, d).filter(col("o_totalprice") > 300000)
            .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice")),
          Seq("c_custkey"), "full_outer"),
      Some("""SELECT coalesce(c.c_custkey, o.o_custkey) AS c_custkey, c.c_name,
             |  o.o_orderkey, o.o_totalprice
             |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000) c
             |FULL OUTER JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
             |                 WHERE o_totalprice > 300000) o
             |  ON c.c_custkey = o.o_custkey""".stripMargin)),

    "q_anti_join" -> Q(
      // customers with no currently-open ('O') order — non-empty anti result
      (s, d) => Td.customer(s, d)
        .join(Td.orders(s, d).filter(col("o_orderstatus") === "O"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal"),
      Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_orderstatus = 'O' AND o_custkey = c_custkey)""".stripMargin)),

    // ----- multi-level aggregation: rollup ---------------------------------
    "q_rollup_region" -> Q(
      (s, d) => Td.customer(s, d)
        .join(broadcast(Td.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Td.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("customers"), dsum(col("c_acctbal")).as("balance")),
      Some("""SELECT r_name, n_name, count(*) AS customers,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS balance
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP(r_name, n_name)""".stripMargin)),

    // ----- TPC-H Q1-like pricing summary -----------------------------------
    "q_pricing_summary" -> Q(
      (s, d) => {
        val disc = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")
        val charge = (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax"))).cast("decimal(18,6)")
        Td.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1997-09-01").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(disc).cast("double").as("sum_disc_price"),
            sum(charge).cast("double").as("sum_charge"),
            (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
            (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
            (sum(col("l_discount").cast("decimal(18,6)")).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"),
          )
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_price,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/count(*) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1997-09-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ----- TPC-H Q3-like: filtered 3-way join + group + top-k --------------
    "q_top_revenue_orders" -> Q(
      (s, d) => {
        val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")
        Td.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .join(Td.orders(s, d), col("c_custkey") === col("o_custkey"))
          .join(Td.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate"))
          .groupBy("o_orderkey", "o_orderdate")
          .agg(sum(rev).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_orderdate,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ----- event-time sessionization (gap > 30 min) ------------------------
    "q_sessionize" -> Q(
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Td.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("is_new",
            when(col("prev_us").isNull ||
              (unix_micros(col("ts")) - col("prev_us")) > 1800000000L, 1).otherwise(0))
          .groupBy("user_id")
          .agg(sum(col("is_new")).as("sessions"), count(lit(1)).as("events"))
      },
      Some("""SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS sessions, count(*) AS events
             |FROM (
             |  SELECT user_id,
             |    CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
             |      THEN 1 ELSE 0 END AS is_new
             |  FROM events) t
             |GROUP BY user_id""".stripMargin)),
  )
}
