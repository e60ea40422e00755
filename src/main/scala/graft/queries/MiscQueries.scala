package graft.queries

import graft.queries.ParityQueries.Q
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Breadth queries beyond the reference's own surface: set operations, JSON
  * extraction, scalar string/date/math batteries, cube, SQL-front-end
  * correlated subqueries, a 6-way join, and an event-time tumbling window
  * (the batch twin of the streaming windowed aggregation).
  */
object MiscQueries {

  val defs: Map[String, Q] = Map(

    // ----- set operations ---------------------------------------------------
    "q_union_except_intersect" -> Q(
      (s, d) => {
        val c = Td.customer(s, d)
        val big = c.filter(col("c_acctbal") > 5000).select("c_custkey")
        val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val u = big.union(building).distinct().withColumn("op", lit("union"))
        val i = big.intersect(building).withColumn("op", lit("intersect"))
        val e = big.except(building).withColumn("op", lit("except"))
        u.unionByName(i).unionByName(e)
      },
      Some("""WITH big AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
             |     building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
             |SELECT c_custkey, 'union' AS op FROM (SELECT DISTINCT c_custkey FROM (SELECT * FROM big UNION ALL SELECT * FROM building) t) t2
             |UNION ALL SELECT c_custkey, 'intersect' AS op FROM (SELECT c_custkey FROM big INTERSECT SELECT c_custkey FROM building) t3
             |UNION ALL SELECT c_custkey, 'except' AS op FROM (SELECT c_custkey FROM big EXCEPT SELECT c_custkey FROM building) t4""".stripMargin)),

    // ----- JSON scalar extraction ------------------------------------------
    "q_json_extract" -> Q(
      (s, d) => Td.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        get_json_object(col("props"), "$.missing").as("absent"),
      ),
      Some("""SELECT event_id,
             |  json_extract_string(props, '$.k') AS k_str,
             |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
             |  json_extract_string(props, '$.missing') AS absent
             |FROM events""".stripMargin)),

    // ----- scalar string functions -----------------------------------------
    "q_string_funcs" -> Q(
      (s, d) => Td.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).as("name_len"),
        regexp_replace(col("p_type"), "[aeiou]", "_").as("type_novowel"),
        element_at(split(col("p_type"), " "), 1).as("type_first"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        levenshtein(col("p_brand"), lit("Brand#00")).as("lev"),
        instr(col("p_name"), "a").as("first_a"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
      ),
      Some("""SELECT p_partkey,
             |  upper(p_brand) AS brand_up,
             |  substring(p_name, 1, 8) AS name8,
             |  length(p_name) AS name_len,
             |  regexp_replace(p_type, '[aeiou]', '_', 'g') AS type_novowel,
             |  split_part(p_type, ' ', 1) AS type_first,
             |  concat_ws('|', p_brand, p_type) AS joined,
             |  levenshtein(p_brand, 'Brand#00') AS lev,
             |  instr(p_name, 'a') AS first_a,
             |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad
             |FROM part""".stripMargin)),

    // ----- scalar date/math functions --------------------------------------
    "q_date_math_funcs" -> Q(
      (s, d) => Td.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
        abs(col("o_totalprice") - 100000).as("abs_diff"),
        floor(col("o_totalprice") / 1000).cast("long").as("price_k"),
        sqrt(col("o_totalprice")).as("price_sqrt"),
        (col("o_orderkey") % 7).as("key_mod"),
        round(col("o_totalprice"), 1).as("price_round1"),
      ),
      Some("""SELECT o_orderkey,
             |  year(o_orderdate) AS y,
             |  month(o_orderdate) AS m,
             |  day(o_orderdate) AS dom,
             |  date_trunc('month', o_orderdate) AS month_start,
             |  o_orderdate + INTERVAL 30 DAY AS plus30,
             |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
             |  abs(o_totalprice - 100000) AS abs_diff,
             |  CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
             |  sqrt(o_totalprice) AS price_sqrt,
             |  o_orderkey % 7 AS key_mod,
             |  round(o_totalprice, 1) AS price_round1
             |FROM orders""".stripMargin)),

    // ----- cube -------------------------------------------------------------
    "q_cube_status_priority" -> Q(
      (s, d) => Td.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("amount")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),

    // ----- SQL front-end: correlated EXISTS + scalar subquery --------------
    "q_sql_subqueries" -> Q(
      (s, d) => {
        Td.customer(s, d).createOrReplaceTempView("customer_v")
        Td.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""
          SELECT c_custkey, c_name,
            (SELECT count(*) FROM orders_v o WHERE o.o_custkey = c.c_custkey) AS n_orders
          FROM customer_v c
          WHERE EXISTS (SELECT 1 FROM orders_v o
                        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        """)
      },
      Some("""SELECT c_custkey, c_name,
             |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
             |FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin)),

    // ----- TPC-H Q5-like 6-way join ----------------------------------------
    "q_regional_revenue" -> Q(
      (s, d) => {
        val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)")
        // Star-join reduction: the ASIA filter lives on the supplier side,
        // and Catalyst won't push a dimension filter across a join on its
        // own (that's dynamic partition pruning, which needs partitioned
        // sources). Build the filtered supplier dim first and broadcast it
        // into lineitem BEFORE the orderkey shuffle — the fact table shrinks
        // to the matching ~1/5 of rows before anything expensive happens.
        // Inner joins commute, so the result is pinned unchanged.
        val asiaSuppliers = Td.supplier(s, d)
          .join(broadcast(Td.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Td.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select("s_suppkey", "n_name")
        Td.lineitem(s, d)
          .join(broadcast(asiaSuppliers), col("l_suppkey") === col("s_suppkey"))
          .join(Td.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Td.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("n_name")
          .agg(sum(rev).cast("double").as("revenue"), count(lit(1)).as("n_items"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
             |  count(*) AS n_items
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin)),

    // ----- window-function breadth: lag/lead/first_value/ntile -------------
    "q_window_shapes" -> Q(
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        Td.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          lag("o_totalprice", 1).over(w).as("prev_price"),
          lead("o_totalprice", 1).over(w).as("next_price"),
          first("o_orderdate").over(w).as("first_order_date"),
          ntile(4).over(w).as("quartile"),
        )
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  lead(o_totalprice, 1) OVER w AS next_price,
             |  first_value(o_orderdate) OVER w AS first_order_date,
             |  ntile(4) OVER w AS quartile
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)),

    // ----- exact percentiles (interpolated; bit-equal to quantile_cont) ----
    "q_percentiles" -> Q(
      (s, d) => Td.orders(s, d).groupBy("o_orderstatus").agg(
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"),
        min(col("o_totalprice")).as("p0"),
        max(col("o_totalprice")).as("p100"),
      ),
      Some("""SELECT o_orderstatus,
             |  quantile_cont(o_totalprice, 0.5) AS p50,
             |  quantile_cont(o_totalprice, 0.9) AS p90,
             |  quantile_cont(o_totalprice, 0.99) AS p99,
             |  min(o_totalprice) AS p0,
             |  max(o_totalprice) AS p100
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ----- event-time tumbling window (batch twin of streaming agg) --------
    "q_event_windows" -> Q(
      (s, d) => Td.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value")),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
             |  count(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ----- conditional aggregates (FILTER-style) + boolean aggs ------------
    // Predicate-gated count/sum and bool_or/bool_and, expressed as
    // count(when)/sum(when)/max(bool)/min(bool) on the Spark side. The
    // gated sum accumulates in DECIMAL (exact, order-independent) and
    // converts to double once.
    "q_cond_agg" -> Q(
      (s, d) => Td.customer(s, d).groupBy("c_mktsegment").agg(
        count(lit(1)).as("n"),
        count(when(col("c_acctbal") > 5000, 1)).as("n_rich"),
        sum(when(col("c_acctbal") > 5000, col("c_acctbal").cast("decimal(18,2)")))
          .cast("double").as("rich_bal"),
        max(col("c_acctbal") < 0).as("any_negative"),
        min(col("c_acctbal") < 0).as("all_negative"),
      ),
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  CAST(count(*) FILTER (c_acctbal > 5000) AS BIGINT) AS n_rich,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) FILTER (c_acctbal > 5000) AS DOUBLE) AS rich_bal,
             |  bool_or(c_acctbal < 0) AS any_negative,
             |  bool_and(c_acctbal < 0) AS all_negative
             |FROM customer GROUP BY c_mktsegment""".stripMargin)),

    // ----- ordered string aggregation (listagg / string_agg) ---------------
    // WITHIN GROUP ordering makes the concatenation deterministic — the only
    // way a string agg can be oracle-checked (or reproduced run-to-run on a
    // cluster at all).
    "q_listagg" -> Q(
      (s, d) => {
        Td.nation(s, d).createOrReplaceTempView("nation_la")
        s.sql("""SELECT n_regionkey,
                |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names,
                |  count(*) AS n
                |FROM nation_la GROUP BY n_regionkey""".stripMargin)
      },
      Some("""SELECT n_regionkey,
             |  string_agg(n_name, ',' ORDER BY n_name) AS names,
             |  count(*) AS n
             |FROM nation GROUP BY n_regionkey""".stripMargin)),

    // ----- exact grouped moments: variance / stddev / correlation ----------
    // Spark's stddev/corr built-ins accumulate doubles in partition order —
    // non-reproducible across partitionings and engines. Algebraic moments
    // as DECIMAL sums (exact, order-independent) converted to double once,
    // with the identical closed-form expression on both sides, are
    // bit-reproducible: population variance = sxx/n − (sx/n)², corr from
    // the covariance/variance moments, sqrt being IEEE-exact.
    "q_grouped_stats" -> Q(
      (s, d) => {
        val q = col("l_quantity").cast("decimal(9,2)")
        val p = col("l_extendedprice").cast("decimal(9,2)")
        val nD = col("n").cast("double")
        def m(sc: String) = col(sc).cast("double")
        Td.lineitem(s, d).groupBy("l_returnflag").agg(
            count(lit(1)).as("n"),
            sum(q).as("sq"), sum(p).as("sp"),
            sum(q * q).as("sqq"), sum(p * p).as("spp"), sum(q * p).as("sqp"))
          .select(
            col("l_returnflag"), col("n"),
            (m("sq") / nD).as("mean_qty"),
            (m("sqq") / nD - (m("sq") / nD) * (m("sq") / nD)).as("var_qty"),
            sqrt(m("sqq") / nD - (m("sq") / nD) * (m("sq") / nD)).as("stddev_qty"),
            (m("sp") / nD).as("mean_price"),
            ((m("sqp") / nD - (m("sq") / nD) * (m("sp") / nD)) /
              (sqrt(m("sqq") / nD - (m("sq") / nD) * (m("sq") / nD)) *
                sqrt(m("spp") / nD - (m("sp") / nD) * (m("sp") / nD)))).as("corr_qty_price"),
          )
      },
      Some("""WITH mo AS (SELECT l_returnflag, count(*) AS n,
             |    sum(CAST(l_quantity AS DECIMAL(9,2))) AS sq,
             |    sum(CAST(l_extendedprice AS DECIMAL(9,2))) AS sp,
             |    sum(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS sqq,
             |    sum(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS spp,
             |    sum(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS sqp
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, n,
             |  CAST(sq AS DOUBLE)/CAST(n AS DOUBLE) AS mean_qty,
             |  CAST(sqq AS DOUBLE)/CAST(n AS DOUBLE)
             |    - (CAST(sq AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sq AS DOUBLE)/CAST(n AS DOUBLE)) AS var_qty,
             |  sqrt(CAST(sqq AS DOUBLE)/CAST(n AS DOUBLE)
             |    - (CAST(sq AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sq AS DOUBLE)/CAST(n AS DOUBLE))) AS stddev_qty,
             |  CAST(sp AS DOUBLE)/CAST(n AS DOUBLE) AS mean_price,
             |  (CAST(sqp AS DOUBLE)/CAST(n AS DOUBLE)
             |    - (CAST(sq AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sp AS DOUBLE)/CAST(n AS DOUBLE)))
             |  / (sqrt(CAST(sqq AS DOUBLE)/CAST(n AS DOUBLE)
             |      - (CAST(sq AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sq AS DOUBLE)/CAST(n AS DOUBLE)))
             |    * sqrt(CAST(spp AS DOUBLE)/CAST(n AS DOUBLE)
             |      - (CAST(sp AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sp AS DOUBLE)/CAST(n AS DOUBLE)))) AS corr_qty_price
             |FROM mo""".stripMargin)),
  )
}
