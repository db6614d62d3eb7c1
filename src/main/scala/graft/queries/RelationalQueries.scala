package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * The relational capability surface (SURVEY.md §2 Table B): everything the
 * reference gets "for free" once its log is a DataFrame — filters,
 * projections, joins of every flavor, aggregations, windows, sorts/limits,
 * set ops, grouping sets, scalar functions, JSON extraction.
 *
 * All plans are declared via the DataFrame API so Catalyst handles pushdown,
 * pruning, join strategy and AQE; broadcast hints are placed only where a
 * dimension table is provably small (nation/region/customer-scale), which is
 * exactly what survives a 1000-executor 100 TB deployment.
 */
object RelationalQueries extends QueryRegistry {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  override def all: Seq[QueryDef] = Seq(
    QueryDef(
      "q1_agg",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
              * (lit(1) + dec(col("l_tax")))).cast("double").as("sum_charge"),
            (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
            (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
            (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")),

    QueryDef(
      "q6_agg_filter",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01") &&
            col("l_discount").between(0.03, 0.07) &&
            col("l_quantity") < 24)
          .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_rows"))
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24""")),

    QueryDef(
      "q2_filter_project",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
      },
      Some("""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1.0 - l_discount) AS net_price,
               strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        FROM lineitem
        WHERE l_quantity >= 45 AND l_returnflag = 'R'""")),

    // ---- joins ------------------------------------------------------------

    QueryDef(
      "q3_join_topk",
      (s, dir) => {
        val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, dir)
        val li = Tables.lineitem(s, dir)
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS order_day,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, order_day
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")),

    QueryDef(
      "q5_multi_join",
      (s, dir) => {
        val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        val nation = Tables.nation(s, dir)
        val cust = Tables.customer(s, dir)
        val ord = Tables.orders(s, dir)
        val li = Tables.lineitem(s, dir)
        val sup = Tables.supplier(s, dir)
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(sup, li("l_suppkey") === sup("s_suppkey"))
          .join(cust, ord("o_custkey") === cust("c_custkey") &&
            sup("s_nationkey") === cust("c_nationkey"))
          .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
            .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name""")),

    QueryDef(
      "q_semi_join",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val ord = Tables.orders(s, dir).filter(col("o_totalprice") > 100000)
        cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        GROUP BY c_mktsegment""")),

    QueryDef(
      "q_anti_join",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val bigOrd = Tables.orders(s, dir).filter(col("o_totalprice") > 250000)
        cust.join(bigOrd, cust("c_custkey") === bigOrd("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
      },
      Some("""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 250000)""")),

    QueryDef(
      "q_outer_join",
      (s, dir) => {
        val nation = Tables.nation(s, dir)
        val sup = Tables.supplier(s, dir)
        nation.join(sup, nation("n_nationkey") === sup("s_nationkey"), "left_outer")
          .groupBy(col("n_name"))
          .agg(count(col("s_suppkey")).as("n_suppliers"),
            coalesce(sum(dec(col("s_acctbal"))).cast("double"), lit(0.0)).as("total_bal"))
      },
      Some("""
        SELECT n_name, COUNT(s_suppkey) AS n_suppliers,
               COALESCE(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_bal
        FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
        GROUP BY n_name""")),

    QueryDef(
      "q_cross_join",
      (s, dir) => {
        val region = Tables.region(s, dir)
        val nation = Tables.nation(s, dir)
        region.crossJoin(nation)
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("""
        SELECT r_name, COUNT(*) AS n_pairs
        FROM region CROSS JOIN nation
        GROUP BY r_name""")),

    // ---- windows ----------------------------------------------------------

    QueryDef(
      "q_window_rank",
      (s, dir) => {
        val ord = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        ord.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rk
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders) t
        WHERE rk <= 3""")),

    QueryDef(
      "q_window_running",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).filter(col("l_suppkey") <= 10)
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li.select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(dec(col("l_quantity"))).over(w).cast("double").as("running_qty"))
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                    OVER (PARTITION BY l_suppkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_qty
        FROM lineitem WHERE l_suppkey <= 10""")),

    QueryDef(
      "q_window_lag",
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("user_id") <= 5)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        ev.select(col("user_id"), col("event_id"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"))
      },
      Some("""
        SELECT user_id, event_id,
               value - LAG(value, 1) OVER (PARTITION BY user_id
                                           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS delta
        FROM events WHERE user_id <= 5""")),

    // ---- sorts / limits / distinct / set ops ------------------------------

    QueryDef(
      "q_sort_limit",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .limit(20)
      },
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 20""")),

    QueryDef(
      "q_distinct",
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    QueryDef(
      "q_intersect",
      (s, dir) => {
        val a = Tables.customer(s, dir).filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey").as("custkey"))
        val b = Tables.orders(s, dir).select(col("o_custkey").as("custkey"))
        a.intersect(b)
      },
      Some("""
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders""")),

    QueryDef(
      "q_except",
      (s, dir) => {
        val a = Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
        val b = Tables.orders(s, dir).filter(col("o_totalprice") > 250000)
          .select(col("o_custkey").as("custkey"))
        a.except(b)
      },
      Some("""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000""")),

    QueryDef(
      "q_union_agg",
      (s, dir) => {
        val ord = Tables.orders(s, dir)
        val hi = ord.filter(col("o_totalprice") > 200000)
          .select(col("o_custkey"), lit("high").as("bucket"))
        val lo = ord.filter(col("o_totalprice") < 10000)
          .select(col("o_custkey"), lit("low").as("bucket"))
        hi.unionAll(lo).groupBy(col("bucket")).agg(
          count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"))
      },
      Some("""
        SELECT bucket, COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_cust
        FROM (
          SELECT o_custkey, 'high' AS bucket FROM orders WHERE o_totalprice > 200000
          UNION ALL
          SELECT o_custkey, 'low' AS bucket FROM orders WHERE o_totalprice < 10000
        ) t GROUP BY bucket""")),

    // ---- grouping sets / having / conditional agg -------------------------

    QueryDef(
      "q_rollup",
      (s, dir) => Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("qty")),
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    QueryDef(
      "q_cube",
      (s, dir) => Tables.orders(s, dir)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n")),
      Some("""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)""")),

    QueryDef(
      "q_grouping_sets",
      (s, dir) => Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"))).cast("double").as("qty")),
      Some("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""")),

    QueryDef(
      "q_pivot",
      // pivot with explicit value list: one aggregate pass, no per-value
      // scans — Catalyst rewrites it to conditional aggregation, exactly
      // the oracle's formulation
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(dec(col("l_quantity"))).cast("double")),
      Some("""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS A,
               CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS N,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS R
        FROM lineitem
        GROUP BY l_linestatus""")),

    QueryDef(
      "q_having",
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("spend"))
        .filter(col("n_orders") >= 3),
      Some("""
        SELECT o_custkey, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) >= 3""")),

    QueryDef(
      "q_case_agg",
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("value") > 50, 1).otherwise(0)).as("n_big"),
          sum(when(col("user_id") % 2 === 0, dec(col("value"))).otherwise(lit(0)))
            .cast("double").as("even_user_value")),
      Some("""
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
               CAST(SUM(CASE WHEN user_id % 2 = 0 THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS even_user_value
        FROM events
        GROUP BY event_type""")),

    QueryDef(
      "q_count_distinct",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows")),
      Some("""
        SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT l_partkey) AS n_parts, COUNT(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag""")),

    // ---- scalar functions / json / subqueries -----------------------------

    QueryDef(
      "q_salted_join",
      (s, dir) => {
        // manual skew salting: exact same rows as the plain join the oracle
        // computes, but each hot key spread over 8 tasks
        val li = Tables.lineitem(s, dir)
        val p = Tables.part(s, dir).withColumnRenamed("p_partkey", "l_partkey")
        graft.operators.SkewJoin.saltedInnerJoin(li, p, "l_partkey", saltFactor = 8)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("l_quantity"))).cast("double").as("qty"))
      },
      Some("""
        SELECT p_brand, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""")),

    QueryDef(
      "q_percentile",
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("median_price"),
          expr("percentile(l_extendedprice, 0.25)").as("p25"),
          expr("percentile(l_extendedprice, 0.75)").as("p75")),
      Some("""
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS median_price,
               quantile_cont(l_extendedprice, 0.25) AS p25,
               quantile_cont(l_extendedprice, 0.75) AS p75
        FROM lineitem GROUP BY l_returnflag""")),

    QueryDef(
      "q_asof_join",
      // AS-OF: each click enriched with the user's most recent purchase
      // value at click time — the scalable union+window formulation
      // (operators/TemporalJoins.asof), vs the quadratic theta-join the
      // naive t_r <= t_l predicate would plan
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"),
            col("event_id").as("p_event_id"))
        graft.operators.TemporalJoins.asof(
            clicks, purchases, keys = Seq("user_id"), timeCol = "ts",
            payloadCols = Seq("value"), tiebreak = "p_event_id")
          .select(col("event_id"), col("user_id"),
            col("asof_value").as("last_purchase"))
      },
      Some("""
        SELECT l.event_id, l.user_id,
               (SELECT r.value FROM events r
                WHERE r.user_id = l.user_id AND r.event_type = 'purchase'
                  AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP)
                ORDER BY CAST(r.ts AS TIMESTAMP) DESC, r.event_id DESC
                LIMIT 1) AS last_purchase
        FROM events l WHERE l.event_type = 'click'""")),

    QueryDef(
      "q_asof_tolerance",
      // AS-OF with tolerance (pandas merge_asof semantics): the match only
      // counts if the purchase is within 2 hours of the click — staler
      // matches surface as NULL. Same one-shuffle union+window plan.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("value"),
            col("event_id").as("p_event_id"))
        graft.operators.TemporalJoins.asofWithin(
            clicks, purchases, keys = Seq("user_id"), timeCol = "ts",
            payloadCols = Seq("value"), tiebreak = "p_event_id",
            toleranceMicros = 2L * 3600 * 1000000)
          .select(col("event_id"), col("user_id"),
            col("asof_value").as("recent_purchase"))
      },
      Some("""
        SELECT l.event_id, l.user_id,
               (SELECT r.value FROM events r
                WHERE r.user_id = l.user_id AND r.event_type = 'purchase'
                  AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP)
                  AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP) - INTERVAL 2 HOUR
                ORDER BY CAST(r.ts AS TIMESTAMP) DESC, r.event_id DESC
                LIMIT 1) AS recent_purchase
        FROM events l WHERE l.event_type = 'click'""")),

    QueryDef(
      "q_range_join",
      // RANGE: purchases of the same user in the hour before each click,
      // via the binned equi-join (operators/TemporalJoins.rangeJoinBinned)
      // — bins keep the range predicate out of broadcast-nested-loop
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val hourMicros = 3600L * 1000000L
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"))
        graft.operators.TemporalJoins.rangeJoinBinned(
            clicks, purchases, keys = Seq("user_id"), timeCol = "ts",
            beforeMicros = hourMicros, afterMicros = 0L, binMicros = hourMicros)
          .groupBy(col("l.event_id").as("event_id"))
          .agg(count(lit(1)).as("n_recent"))
      },
      Some("""
        SELECT l.event_id, COUNT(*) AS n_recent
        FROM events l JOIN events r
          ON r.user_id = l.user_id AND r.event_type = 'purchase'
         AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP) - INTERVAL 1 HOUR
         AND CAST(r.ts AS TIMESTAMP) < CAST(l.ts AS TIMESTAMP)
        WHERE l.event_type = 'click'
        GROUP BY l.event_id""")),

    QueryDef(
      "q_approx_distinct",
      // graft's own HLL aggregate (graft.functions.Hll60): mergeable
      // 4096-register sketch over the engine-neutral md5 hash with an
      // integer-only estimator, so the oracle replays it register-for-
      // register in HUGEINT arithmetic (built-in approx_count_distinct
      // stays available but its HLL++ state is engine-private)
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          graft.functions.GraftFunctions.hll60(
            graft.operators.Dedup.md5Hash60(col("l_orderkey").cast("string")))
            .as("approx_orders"),
          graft.functions.GraftFunctions.hll60(
            graft.operators.Dedup.md5Hash60(col("l_partkey").cast("string")))
            .as("approx_parts")),
      Some(s"""
        WITH h AS (
          SELECT l_returnflag,
                 ${OracleSql.md5Hash60("l_orderkey")} AS ho,
                 ${OracleSql.md5Hash60("l_partkey")} AS hp
          FROM lineitem),
        ro AS (
          SELECT l_returnflag, CAST(ho & 4095 AS INT) AS bucket,
                 COALESCE(1 + list_min(list_filter(generate_series(0, 47),
                   j -> ((ho >> 12) >> j) & 1 = 1)), 49) AS rho
          FROM h),
        rp AS (
          SELECT l_returnflag, CAST(hp & 4095 AS INT) AS bucket,
                 COALESCE(1 + list_min(list_filter(generate_series(0, 47),
                   j -> ((hp >> 12) >> j) & 1 = 1)), 49) AS rho
          FROM h),
        so AS (
          SELECT l_returnflag,
                 SUM(1::HUGEINT << (49 - mj)) + (4096 - COUNT(*)) * (1::HUGEINT << 49) AS s
          FROM (SELECT l_returnflag, bucket, MAX(rho) AS mj FROM ro GROUP BY 1, 2)
          GROUP BY 1),
        sp AS (
          SELECT l_returnflag,
                 SUM(1::HUGEINT << (49 - mj)) + (4096 - COUNT(*)) * (1::HUGEINT << 49) AS s
          FROM (SELECT l_returnflag, bucket, MAX(rho) AS mj FROM rp GROUP BY 1, 2)
          GROUP BY 1)
        SELECT so.l_returnflag,
               CAST((7213 * (1::HUGEINT << 85)) // (40970790::HUGEINT * so.s) AS BIGINT) AS approx_orders,
               CAST((7213 * (1::HUGEINT << 85)) // (40970790::HUGEINT * sp.s) AS BIGINT) AS approx_parts
        FROM so JOIN sp ON so.l_returnflag = sp.l_returnflag""")),

    QueryDef(
      "q_scalar_funcs",
      (s, dir) => Tables.part(s, dir)
        .filter(col("p_partkey") <= 200)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("name_upper"),
          length(col("p_name")).as("name_len"),
          substring(col("p_type"), 1, 5).as("type_prefix"),
          concat_ws("#", col("p_brand"), col("p_type")).as("brand_type"),
          abs(col("p_size") - lit(25)).as("size_dist"),
          round(col("p_retailprice") * 1.1, 2).as("marked_up"),
          (col("p_partkey") % 7).as("pk_mod")),
      Some("""
        SELECT p_partkey,
               UPPER(p_name) AS name_upper,
               LENGTH(p_name) AS name_len,
               SUBSTRING(p_type, 1, 5) AS type_prefix,
               CONCAT_WS('#', p_brand, p_type) AS brand_type,
               ABS(p_size - 25) AS size_dist,
               ROUND(p_retailprice * 1.1, 2) AS marked_up,
               p_partkey % 7 AS pk_mod
        FROM part WHERE p_partkey <= 200""")),

    QueryDef(
      "q_date_funcs",
      (s, dir) => Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("total")),
      Some("""
        SELECT EXTRACT(year FROM o_orderdate) AS order_year,
               EXTRACT(month FROM o_orderdate) AS order_month,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY order_year, order_month""")),

    QueryDef(
      "q_json_extract",
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") > 90),
      Some("""
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 90""")),

    QueryDef(
      "q_scalar_subquery",
      (s, dir) => {
        val ord = Tables.orders(s, dir)
        val stats = ord.agg(
          (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("avg_price"))
        ord.crossJoin(broadcast(stats))
          .filter(col("o_totalprice") > col("avg_price") * 1.8)
          .select(col("o_orderkey"), col("o_totalprice"))
      },
      Some("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.8 * (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
          FROM orders)""")),

    QueryDef(
      "q_in_subquery",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val bigParts = Tables.part(s, dir).filter(col("p_size") >= 40)
          .select(col("p_partkey"))
        li.join(broadcast(bigParts), li("l_partkey") === bigParts("p_partkey"), "left_semi")
          .agg(count(lit(1)).as("n"),
            sum(dec(col("l_quantity"))).cast("double").as("qty"))
      },
      Some("""
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)""")),

    QueryDef(
      "q_exists_subquery",
      // correlated EXISTS with a NON-equi correlated predicate (shipdate
      // vs the outer row's orderdate) — beyond q_semi_join's key-only
      // shape. Plans as one left-semi hash join on the key with the
      // inequality as join condition: the fact side shuffles once, no
      // nested-loop, which is the shape that survives 100 TB.
      (s, dir) => {
        val ord = Tables.orders(s, dir)
        val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate"))
        ord.join(li,
            ord("o_orderkey") === li("l_orderkey") &&
              li("l_shipdate") > date_add(ord("o_orderdate"), 80), "left_semi")
          .agg(count(lit(1)).as("n_late"),
            sum(dec(col("o_totalprice"))).cast("double").as("value_late"))
      },
      Some("""
        SELECT COUNT(*) AS n_late,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS value_late
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY)""")),

    QueryDef(
      "q_array_funcs",
      // array kernel surface over tokenized text: size/distinct/min/max/
      // intersect — all codegen'd collection expressions, one scan, no
      // shuffle before the final projection's filter
      (s, dir) => {
        val toks = graft.operators.TextAnalysis.tokens(col("text"))
        Tables.documents(s, dir)
          .select(col("doc_id"), toks.as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_toks"),
            size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
            array_min(col("toks")).as("tok_min"),
            array_max(col("toks")).as("tok_max"),
            size(array_intersect(array_distinct(col("toks")),
              array(lit("the"), lit("and"), lit("of")))).cast("long").as("n_stop"))
          .filter(col("n_toks") >= 5)
      },
      Some("""
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_toks,
               CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
               list_sort(toks)[1] AS tok_min,
               list_reverse_sort(toks)[1] AS tok_max,
               CAST(len(list_intersect(list_distinct(toks), ['the','and','of'])) AS BIGINT) AS n_stop
        FROM (SELECT doc_id, regexp_extract_all(text, '[^ ]+') AS toks FROM documents)
        WHERE len(toks) >= 5""")),

    QueryDef(
      "q_window_analytics",
      // the remaining analytic-function surface in one entry: ntile
      // deciles, percent_rank, and first/last value over a frame — all on
      // the same single-shuffle window as q_window_rank
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir)
          .filter(col("o_custkey") % 50 === 0)
          .select(col("o_custkey"), col("o_orderkey"),
            ntile(10).over(w).cast("long").as("decile"),
            round(percent_rank().over(w), 6).as("pr"),
            first(col("o_orderkey")).over(wf).as("top_order"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(ntile(10) OVER w AS BIGINT) AS decile,
               round(percent_rank() OVER w, 6) AS pr,
               first_value(o_orderkey) OVER
                 (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_order
        FROM orders WHERE o_custkey % 50 = 0
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)""")),

    QueryDef(
      "q_histogram",
      // fixed-width value histogram: bin assignment is a pure projection
      // (no shuffle), counts collapse behind one partial-agg exchange —
      // the OLAP binning primitive at any scale
      (s, dir) => Tables.events(s, dir)
        .select((floor(col("value") / lit(50.0)) * lit(50)).cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n")),
      Some("""
        SELECT CAST(floor(value / 50.0) * 50 AS BIGINT) AS bin, COUNT(*) AS n
        FROM events GROUP BY 1""")),

    QueryDef(
      "q_string_agg",
      // ordered string aggregation (LISTAGG): collect_list is
      // order-nondeterministic in a distributed engine, so the gate shape
      // is sort_array THEN join — the deterministic form of the op
      (s, dir) => Tables.nation(s, dir)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n_nations"),
          concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations")),
      Some("""
        SELECT n_regionkey, COUNT(*) AS n_nations,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey""")),

    QueryDef(
      "q_unpivot",
      // UNPIVOT/melt (the inverse of q_pivot): wide numeric columns to
      // (metric, value) rows, then aggregated per metric — the reshaping
      // op long-format pipelines need; exact DECIMAL sums so the melt is
      // verifiable
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"), col("value"),
          col("user_id").cast("double").as("uid"))
        .unpivot(Array(col("event_id")), Array(col("value"), col("uid")),
          "metric", "v")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"), sum(dec(col("v"))).cast("double").as("total")),
      Some("""
        SELECT 'value' AS metric, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events
        UNION ALL
        SELECT 'uid', COUNT(*),
               CAST(SUM(CAST(CAST(user_id AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE)
        FROM events""")),

    QueryDef(
      "q_window_range_frame",
      // value-based (RANGE) window frame: each order's trailing-30-day
      // customer spend — the window family rows-frames can't express;
      // ordering key is an integer day number so the frame bound is exact
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(datediff(col("o_orderdate"), lit("1992-01-01").cast("date")))
          .rangeBetween(-30, Window.currentRow)
        Tables.orders(s, dir).select(col("o_orderkey"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("spend_30d"))
      },
      Some("""
        SELECT o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
        FROM orders""")),

    QueryDef(
      "q_funnel",
      // event-funnel conversion: of the users who clicked, how many made a
      // purchase within 30 minutes AFTER a click — composed from the
      // binned range join (no theta-join), distinct-user collapse on each
      // side, one row out
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"))
        val converted = graft.operators.TemporalJoins.rangeJoinBinned(
            clicks, purchases, keys = Seq("user_id"), timeCol = "ts",
            beforeMicros = 0L, afterMicros = 30L * 60 * 1000000,
            binMicros = 30L * 60 * 1000000)
          .select(col("l.user_id")).distinct()
        clicks.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n_users_clicked"))
          .crossJoin(converted.agg(count(lit(1)).as("n_users_converted")))
      },
      Some("""
        SELECT
          (SELECT COUNT(DISTINCT user_id) FROM events
           WHERE event_type = 'click') AS n_users_clicked,
          (SELECT COUNT(DISTINCT a.user_id) FROM events a
           WHERE a.event_type = 'click' AND EXISTS (
             SELECT 1 FROM events b
             WHERE b.user_id = a.user_id AND b.event_type = 'purchase'
               AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP)
               AND CAST(b.ts AS TIMESTAMP) < CAST(a.ts AS TIMESTAMP) + INTERVAL 30 MINUTE))
            AS n_users_converted""")),

    QueryDef(
      "q_sessionize_batch",
      // batch gaps-and-islands sessionization (the offline mirror of
      // stream_sessionize): 30-min-gap flags via lag, session ids via a
      // running sum, then one per-session aggregate. Both windows and the
      // aggregate share the user_id hash partitioning — ONE shuffle total.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
          .withColumn("__new", when(lag(col("ts"), 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
              > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("__new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("start_ts"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("end_ts"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),
        f AS (
          SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                         THEN 1 ELSE 0 END AS ns
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        g AS (
          SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM f)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM g GROUP BY user_id, session_id""")),

    QueryDef(
      "q_zorder_key",
      // the Morton interleave kernel behind Bucketing.zorderLayout,
      // verified bit-for-bit: 16-bit (user_id, floor(value*10)) pairs ->
      // space-filling-curve keys (the multi-dimensional layout that lets
      // per-file min/max stats prune on EITHER predicate at 100 TB)
      (s, dir) => Tables.events(s, dir)
        .select(col("event_id"),
          graft.functions.GraftFunctions.morton2(
            col("user_id") % 65536,
            floor(col("value") * 10).cast("long") % 65536).as("zkey"))
        .orderBy(col("zkey"), col("event_id")).limit(500),
      Some("""
        WITH k AS (
          SELECT event_id,
                 user_id % 65536 AS a,
                 CAST(floor(value * 10) AS BIGINT) % 65536 AS b
          FROM events)
        SELECT event_id,
               CAST(list_sum(list_transform(generate_series(0, 15), i ->
                 ((a // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i)) +
                 ((b // (1::BIGINT << i)) % 2) * (1::BIGINT << (2*i+1))))
                 AS BIGINT) AS zkey
        FROM k ORDER BY zkey, event_id LIMIT 500""")),

    QueryDef(
      "q_bucketed_join",
      // co-located join: both sides written bucketed by the join key, so
      // the sort-merge join plans with ZERO exchanges (the shuffle is paid
      // once at layout time and amortized over every join — the fact-table
      // layout at 100 TB). BucketingSpec asserts the no-Exchange plan; this
      // entry proves result parity against the plain join.
      (s, dir) => {
        val ord = Tables.orders(s, dir)
          .select(col("o_custkey").as("custkey"), col("o_totalprice"))
        val cust = Tables.customer(s, dir)
          .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
        val root = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
        graft.operators.Bucketing.writeBucketed(ord, "gate_b_orders", "custkey", 8,
          Some(s"$root/orders"))
        graft.operators.Bucketing.writeBucketed(cust, "gate_b_customer", "custkey", 8,
          Some(s"$root/customer"))
        graft.operators.Bucketing.bucketedJoin(s, "gate_b_orders", "gate_b_customer", "custkey")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment""")),

    QueryDef(
      "q_recursive_cte",
      // WITH RECURSIVE over the supplier heap-tree (parent = key DIV 2):
      // Spark 4.1's UnionLoop executes O(depth) = O(log n) join steps, each
      // a hash join of the (small) frontier against the supplier table —
      // the iterative-closure shape that needs no driver loop at 100 TB.
      // The path column makes the output genuinely recursive (not
      // derivable from the key alone).
      (s, dir) => {
        Tables.supplier(s, dir).createOrReplaceTempView("gate_supplier_rec")
        s.sql("""
          WITH RECURSIVE walk(s_suppkey, depth, path) AS (
            SELECT s_suppkey, 0, CAST(s_suppkey AS STRING)
            FROM gate_supplier_rec WHERE s_suppkey = 1
            UNION ALL
            SELECT s.s_suppkey, w.depth + 1,
                   CONCAT(w.path, '/', CAST(s.s_suppkey AS STRING))
            FROM gate_supplier_rec s JOIN walk w ON s.s_suppkey DIV 2 = w.s_suppkey
            WHERE s.s_suppkey > 1)
          SELECT s_suppkey, depth, path FROM walk""")
      },
      Some("""
        WITH RECURSIVE walk(s_suppkey, depth, path) AS (
          SELECT s_suppkey, 0, CAST(s_suppkey AS VARCHAR)
          FROM supplier WHERE s_suppkey = 1
          UNION ALL
          SELECT s.s_suppkey, w.depth + 1,
                 w.path || '/' || CAST(s.s_suppkey AS VARCHAR)
          FROM supplier s JOIN walk w ON s.s_suppkey // 2 = w.s_suppkey
          WHERE s.s_suppkey > 1)
        SELECT s_suppkey, depth, path FROM walk""")),

    QueryDef(
      "events_cohort_retention",
      // weekly cohort retention matrix: ONE user-keyed shuffle collects
      // each user's distinct active weeks (bounded by the calendar), then
      // a tiny (cohort, offset) aggregate — see Analytics.cohortRetention
      (s, dir) => graft.operators.Analytics.cohortRetention(
        Tables.events(s, dir), "user_id", "ts"),
      Some("""
        WITH pu AS (
          SELECT user_id AS u, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk
          FROM events GROUP BY 1, 2),
        f AS (
          SELECT u, MIN(wk) AS cohort FROM pu GROUP BY 1)
        SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', CAST(f.cohort AS DATE), CAST(pu.wk AS DATE)) // 7
                 AS INTEGER) AS week_offset,
               COUNT(*) AS n_users
        FROM pu JOIN f USING (u)
        GROUP BY 1, 2""")),

    QueryDef(
      "events_resample",
      // 15-minute resample of event values per type with LOCF gap-fill:
      // one map-side-combined aggregation reduces 100k events to the
      // ~2880-bucket grid, and the fill window runs over the GRID (time
      // range / bucket width), never the event volume. Bucket means are
      // 1e-6-grid BIGINT sums — order-independent, oracle-replayable.
      (s, dir) => graft.operators.Analytics.resampleLocf(
          Tables.events(s, dir), "ts", "event_type", "value",
          bucketMicros = 900000000L)
        .select(col("series").as("event_type"), col("bucket"),
          col("n_events"), col("vavg_q"), col("filled_q")),
      Some("""
        WITH ag AS (
          SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 900000000 AS bucket,
                 COUNT(*) AS n_events,
                 SUM(CAST(floor(value * 1000000) AS BIGINT)) AS qs
          FROM events GROUP BY 1, 2),
        sp AS (SELECT event_type, MIN(bucket) AS mn, MAX(bucket) AS mx
               FROM ag GROUP BY 1),
        grid AS (SELECT event_type, unnest(generate_series(mn, mx)) AS bucket
                 FROM sp),
        j AS (SELECT g.event_type, g.bucket,
                     coalesce(a.n_events, 0) AS n_events,
                     CAST(floor(CAST(a.qs AS DOUBLE) / a.n_events) AS BIGINT) AS vavg_q
              FROM grid g LEFT JOIN ag a
                ON g.event_type = a.event_type AND g.bucket = a.bucket)
        SELECT event_type, bucket, n_events, vavg_q,
               last_value(vavg_q IGNORE NULLS) OVER (
                 PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_q
        FROM j""")),

    QueryDef(
      "events_anomaly",
      // robust outlier flags on the resampled grid: |value − median| >
      // k·MAD per series. Median/MAD, not mean/stddev — one anomaly in the
      // window inflates a stddev enough to mask the next (the robust-stats
      // argument every telemetry pipeline makes). Both medians are the
      // LOWER median (rank (n+1) div 2 in (value, bucket) order) on the
      // 1e-6 integer grid, so the entire decision — ranks, deviations,
      // flags — replays exactly in SQL. k=3 flags ~10% of this corpus's
      // heavy-tailed bucket means (measured max dev/MAD 10–19 per series).
      (s, dir) => graft.operators.Analytics.anomaliesMad(
          Tables.events(s, dir), "ts", "event_type", "value",
          bucketMicros = 900000000L, k = 3)
        .select(col("series").as("event_type"), col("bucket"),
          col("vavg_q"), col("med"), col("dev"), col("mad"), col("is_anomaly")),
      Some("""
        WITH ag AS (
          SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 900000000 AS bucket,
                 COUNT(*) AS n_events,
                 SUM(CAST(floor(value * 1000000) AS BIGINT)) AS qs
          FROM events GROUP BY 1, 2),
        cells AS (SELECT event_type AS series, bucket,
                         CAST(floor(CAST(qs AS DOUBLE) / n_events) AS BIGINT) AS vavg_q
                  FROM ag),
        r1 AS (SELECT series, bucket, vavg_q,
                      row_number() OVER (PARTITION BY series ORDER BY vavg_q, bucket) AS rn,
                      COUNT(*) OVER (PARTITION BY series) AS cnt
               FROM cells),
        med AS (SELECT series, vavg_q AS med FROM r1 WHERE rn = (cnt + 1) // 2),
        d AS (SELECT c.series, c.bucket, c.vavg_q, m.med,
                     abs(c.vavg_q - m.med) AS dev
              FROM cells c JOIN med m USING (series)),
        r2 AS (SELECT series, bucket, vavg_q, med, dev,
                      row_number() OVER (PARTITION BY series ORDER BY dev, bucket) AS rn,
                      COUNT(*) OVER (PARTITION BY series) AS cnt
               FROM d),
        mad AS (SELECT series, dev AS mad FROM r2 WHERE rn = (cnt + 1) // 2)
        SELECT d.series AS event_type, d.bucket, d.vavg_q, d.med, d.dev, m2.mad,
               d.dev > 3 * m2.mad AS is_anomaly
        FROM d JOIN mad m2 USING (series)""")),

    QueryDef(
      "q_rfm",
      // RFM segmentation over orders; quartile scores via exact-rank ntile
      // with key tiebreakers (the gate shape); the operator documents the
      // broadcast cut-point variant used at scale
      (s, dir) => graft.operators.Analytics.rfm(
        Tables.orders(s, dir), "o_custkey", "o_orderdate", "o_totalprice"),
      Some("""
        WITH base AS (
          SELECT o_custkey,
                 MAX(o_orderdate) AS last_order,
                 COUNT(*) AS frequency,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
          FROM orders GROUP BY 1),
        m AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
        r AS (
          SELECT o_custkey, frequency, monetary,
                 CAST(date_diff('day', CAST(last_order AS DATE), CAST(max_date AS DATE))
                   AS INTEGER) AS recency_days
          FROM base, m),
        sc AS (
          SELECT o_custkey, recency_days, frequency, monetary,
                 ntile(4) OVER (ORDER BY recency_days DESC, o_custkey) AS r_score,
                 ntile(4) OVER (ORDER BY frequency ASC, o_custkey) AS f_score,
                 ntile(4) OVER (ORDER BY monetary ASC, o_custkey) AS m_score
          FROM r)
        SELECT o_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
                 CAST(m_score AS VARCHAR) AS segment
        FROM sc""")),

    QueryDef(
      "q_rfm_scale",
      // the 100 TB RFM plan: quartile cut-points from ONE bounded
      // percentile aggregate broadcast back as a single row, scores via a
      // codegen'd CASE — no global window, no single-partition sort. The
      // gate pins accuracy above the sf's customer count so the summary is
      // exact and DuckDB's quantile_disc mirrors the cut-points
      // bit-for-bit; at production scale the default accuracy trades that
      // exactness for bounded memory, same operator.
      (s, dir) => graft.operators.Analytics.rfmAtScale(
        Tables.orders(s, dir), "o_custkey", "o_orderdate", "o_totalprice",
        accuracy = 100000),
      Some("""
        WITH base AS (
          SELECT o_custkey,
                 MAX(o_orderdate) AS last_order,
                 COUNT(*) AS frequency,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
          FROM orders GROUP BY 1),
        m AS (SELECT MAX(o_orderdate) AS max_date FROM orders),
        r AS (
          SELECT o_custkey, frequency, monetary,
                 CAST(date_diff('day', CAST(last_order AS DATE), CAST(max_date AS DATE))
                   AS INTEGER) AS recency_days
          FROM base, m),
        c AS (
          SELECT quantile_disc(recency_days, [0.25, 0.5, 0.75]) AS rq,
                 quantile_disc(frequency, [0.25, 0.5, 0.75]) AS fq,
                 quantile_disc(monetary, [0.25, 0.5, 0.75]) AS mq
          FROM r),
        sc AS (
          SELECT o_custkey, recency_days, frequency, monetary,
                 5 - (1 + CASE WHEN recency_days > rq[1] THEN 1 ELSE 0 END
                        + CASE WHEN recency_days > rq[2] THEN 1 ELSE 0 END
                        + CASE WHEN recency_days > rq[3] THEN 1 ELSE 0 END) AS r_score,
                 1 + CASE WHEN frequency > fq[1] THEN 1 ELSE 0 END
                   + CASE WHEN frequency > fq[2] THEN 1 ELSE 0 END
                   + CASE WHEN frequency > fq[3] THEN 1 ELSE 0 END AS f_score,
                 1 + CASE WHEN monetary > mq[1] THEN 1 ELSE 0 END
                   + CASE WHEN monetary > mq[2] THEN 1 ELSE 0 END
                   + CASE WHEN monetary > mq[3] THEN 1 ELSE 0 END AS m_score
          FROM r, c)
        SELECT o_custkey, recency_days, frequency, monetary, r_score, f_score, m_score,
               CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) ||
                 CAST(m_score AS VARCHAR) AS segment
        FROM sc""")),

    QueryDef(
      "events_scd2",
      // SCD2 validity intervals from the event stream: collapse consecutive
      // equal event_types per user into [valid_from, valid_to) rows; both
      // windows and the change filter share ONE user-hash shuffle
      (s, dir) => graft.operators.Analytics.scd2Intervals(
        Tables.events(s, dir), "user_id", "ts", "event_type", "event_id"),
      Some("""
        WITH e AS (
          SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
        c AS (
          SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM e),
        ch AS (SELECT * FROM c WHERE prev IS NULL OR prev <> event_type),
        iv AS (
          SELECT user_id, event_type, ts,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_ts
          FROM ch)
        SELECT user_id, event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
               COALESCE(strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S.%f'),
                 '9999-12-31 00:00:00.000000') AS valid_to,
               valid_to_ts IS NULL AS is_current
        FROM iv""")),

    QueryDef(
      "profile_columns",
      // data-quality column profiler: every lineitem column's (rows,
      // non-nulls, exact distinct, canonical min/max) in ONE aggregation
      // job (Expand + two-stage agg); hll60 replaces the exact distinct at
      // 100 TB — see Analytics.profileColumns
      (s, dir) => graft.operators.Analytics.profileColumns(
        Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
          "l_shipdate")),
      Some {
        val longCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
        val dblCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        val strCols = Seq("l_returnflag", "l_linestatus")
        def sel(name: String, minMax: String => String) =
          s"""SELECT '$name' AS col_name, COUNT(*) AS n_rows,
              COUNT($name) AS n_nonnull, COUNT(DISTINCT $name) AS n_distinct,
              ${minMax(s"MIN($name)")} AS min_value,
              ${minMax(s"MAX($name)")} AS max_value FROM lineitem"""
        val parts =
          longCols.map(c => sel(c, e => s"CAST($e AS VARCHAR)")) ++
          dblCols.map(c => sel(c, e => s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)")) ++
          strCols.map(c => sel(c, e => s"CAST($e AS VARCHAR)")) ++
          Seq(sel("l_shipdate", e => s"strftime($e, '%Y-%m-%d %H:%M:%S')"))
        parts.mkString(" UNION ALL ")
      }),

    QueryDef(
      "q_lateral_topk",
      // correlated LATERAL subquery with per-row LIMIT — "top-N per group"
      // expressed as the dependent join Spark 4 plans as a
      // DomainJoin/rewritten window; identical SQL text runs in DuckDB
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("gate_lat_nation")
        Tables.customer(s, dir).createOrReplaceTempView("gate_lat_customer")
        s.sql("""
          SELECT n.n_name, t.c_name, t.c_acctbal
          FROM gate_lat_nation n JOIN LATERAL (
            SELECT c_name, c_acctbal FROM gate_lat_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_name LIMIT 2) t""")
      },
      Some("""
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation n JOIN LATERAL (
          SELECT c_name, c_acctbal FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2) t ON TRUE""")),

    QueryDef(
      "graph_pagerank",
      // 3-iteration damped PageRank over the supplier heap-tree (child →
      // parent edges). Contributions are quantized to a 2^-30 BIGINT grid
      // before each SUM so the ranks are independent of aggregation order
      // — the oracle replays the identical double arithmetic as chained
      // CTEs. Each iteration = one frontier join + one dst-keyed aggregate.
      (s, dir) => {
        val edges = Tables.supplier(s, dir)
          .filter(col("s_suppkey") > 1)
          .select(col("s_suppkey").cast("long").as("src"),
            expr("CAST(s_suppkey DIV 2 AS BIGINT)").as("dst"))
        graft.operators.Analytics.pageRank(edges, iterations = 3, damping = 0.85)
      },
      Some("""
        WITH e AS (
          SELECT CAST(s_suppkey AS BIGINT) AS src, CAST(s_suppkey // 2 AS BIGINT) AS dst
          FROM supplier WHERE s_suppkey > 1),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
        nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
        n AS (SELECT COUNT(*) AS cnt FROM nodes),
        r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT cnt FROM n) AS rank FROM nodes),
        c1 AS (SELECT e.dst AS node,
                      SUM(CAST(floor((r.rank / deg.deg) * CAST(1073741824 AS DOUBLE)) AS BIGINT)) AS qsum
               FROM e JOIN deg USING (src) JOIN r0 r ON e.src = r.node GROUP BY 1),
        d1 AS (SELECT COALESCE(SUM(CAST(floor(rank * CAST(1073741824 AS DOUBLE)) AS BIGINT)), 0) AS qdang
               FROM r0 WHERE node NOT IN (SELECT src FROM e)),
        r1 AS (SELECT nodes.node,
                      ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT cnt FROM n)) +
                      CAST(0.85 AS DOUBLE) * ((CAST(COALESCE(qsum, 0) AS DOUBLE) / CAST(1073741824 AS DOUBLE)) +
                        (CAST(qdang AS DOUBLE) / CAST(1073741824 AS DOUBLE)) / (SELECT cnt FROM n)) AS rank
               FROM nodes LEFT JOIN c1 USING (node), d1),
        c2 AS (SELECT e.dst AS node,
                      SUM(CAST(floor((r.rank / deg.deg) * CAST(1073741824 AS DOUBLE)) AS BIGINT)) AS qsum
               FROM e JOIN deg USING (src) JOIN r1 r ON e.src = r.node GROUP BY 1),
        d2 AS (SELECT COALESCE(SUM(CAST(floor(rank * CAST(1073741824 AS DOUBLE)) AS BIGINT)), 0) AS qdang
               FROM r1 WHERE node NOT IN (SELECT src FROM e)),
        r2 AS (SELECT nodes.node,
                      ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT cnt FROM n)) +
                      CAST(0.85 AS DOUBLE) * ((CAST(COALESCE(qsum, 0) AS DOUBLE) / CAST(1073741824 AS DOUBLE)) +
                        (CAST(qdang AS DOUBLE) / CAST(1073741824 AS DOUBLE)) / (SELECT cnt FROM n)) AS rank
               FROM nodes LEFT JOIN c2 USING (node), d2),
        c3 AS (SELECT e.dst AS node,
                      SUM(CAST(floor((r.rank / deg.deg) * CAST(1073741824 AS DOUBLE)) AS BIGINT)) AS qsum
               FROM e JOIN deg USING (src) JOIN r2 r ON e.src = r.node GROUP BY 1),
        d3 AS (SELECT COALESCE(SUM(CAST(floor(rank * CAST(1073741824 AS DOUBLE)) AS BIGINT)), 0) AS qdang
               FROM r2 WHERE node NOT IN (SELECT src FROM e)),
        r3 AS (SELECT nodes.node,
                      ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT cnt FROM n)) +
                      CAST(0.85 AS DOUBLE) * ((CAST(COALESCE(qsum, 0) AS DOUBLE) / CAST(1073741824 AS DOUBLE)) +
                        (CAST(qdang AS DOUBLE) / CAST(1073741824 AS DOUBLE)) / (SELECT cnt FROM n)) AS rank
               FROM nodes LEFT JOIN c3 USING (node), d3)
        SELECT node, round(rank, 9) AS rank FROM r3""")),

    QueryDef(
      "graph_triangles",
      // per-node triangle counts on the part co-purchase graph: parts
      // ADJACENT in an order's line sequence (consecutive l_linenumber),
      // over the full unprojected part-key space. Two deliberate choices
      // after round 5 measured the old %500 projection yielding a
      // near-complete 500-node graph (~2.1e7 triangles exploding from
      // 1.5 MB of input): the full key space keeps density ~0.6% so the
      // gate measures the oriented enumeration, and consecutive-line
      // adjacency builds the edge list with ONE equi-join instead of the
      // O(k²)-per-order self-join (the all-pairs build alone cost 8s at
      // sf0.1 — more than the operator). The Spark side runs the degree-
      // ORIENTED wedge enumeration (skew-proof at scale: a hub's edges all
      // point into it, so it pivots no wedges); the oracle counts each
      // triangle once from its canonical u<v<w form — identical per-node
      // counts by symmetry.
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey").as("pk"))
        val edges = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("y.l_linenumber") === col("x.l_linenumber") + 1)
          .select(col("x.pk").as("src"), col("y.pk").as("dst"))
          .filter(col("src") =!= col("dst"))
        graft.operators.Analytics.triangleCounts(edges)
      },
      Some("""
        WITH pr AS (
          SELECT x.l_partkey AS a, y.l_partkey AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey
           AND y.l_linenumber = x.l_linenumber + 1),
        e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
              FROM pr WHERE a <> b),
        tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM e e1
                JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        n AS (SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        SELECT node, COUNT(*) AS triangles FROM n GROUP BY node""")),

    QueryDef(
      "graph_kcore",
      // k-core of the co-purchase graph (k=18, the measured median-degree
      // band where peeling actually cascades: rounds remove nodes whose
      // survivors' degree drops below k in turn — 6 rounds to fixpoint at
      // sf0.01, 7 at sf0.1, both inside the 8-round bound, so the gate IS
      // the true core). The oracle replays all 8 peel rounds mechanically;
      // the operator early-exits at the fixpoint, where the remaining
      // rounds are provable no-ops.
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey").as("pk"))
        val raw = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("y.l_linenumber") === col("x.l_linenumber") + 1)
          .filter(col("x.pk") =!= col("y.pk"))
          .select(least(col("x.pk"), col("y.pk")).as("a"),
            greatest(col("x.pk"), col("y.pk")).as("b"))
          .distinct()
        val edges = raw.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(raw.select(col("b").as("src"), col("a").as("dst")))
        graft.operators.Analytics.kCore(edges, k = 18, maxRounds = 8)
      },
      Some {
        // every eN/nN is referenced twice downstream — MATERIALIZED stops
        // DuckDB's CTE inlining from expanding the plan 2^rounds-fold
        // (measured: the inlined form exhausts file handles re-scanning
        // lineitem hundreds of times)
        val peel = (1 to 8).map { i =>
          val p = i - 1
          s"""n$i AS MATERIALIZED (SELECT src AS node FROM e$p GROUP BY src HAVING COUNT(*) >= 18),
             |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e$p e
             |        JOIN n$i a ON e.src = a.node JOIN n$i b ON e.dst = b.node)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH raw AS MATERIALIZED (
          SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
                          greatest(x.l_partkey, y.l_partkey) AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey
           AND y.l_linenumber = x.l_linenumber + 1
          WHERE x.l_partkey <> y.l_partkey),
        e0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM raw UNION ALL SELECT b, a FROM raw),
        $peel
        SELECT src AS node, COUNT(*) AS deg FROM e8 GROUP BY src"""
      }),

    QueryDef(
      "q_window_distribution",
      // distribution window functions (ntile / percent_rank / cume_dist)
      // over one shared single-shuffle window. All three are exact
      // rationals of (rank, n) computed identically in IEEE double by both
      // engines; the ORDER BY carries o_orderkey so ranks are total.
      (s, dir) => {
        val ord = Tables.orders(s, dir).filter(col("o_custkey") <= 200)
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        ord.select(col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 9).as("pct_rank"),
          round(cume_dist().over(w), 9).as("cume"))
      },
      Some("""
        SELECT o_orderpriority, o_orderkey,
               NTILE(4) OVER w AS quartile,
               round(PERCENT_RANK() OVER w, 9) AS pct_rank,
               round(CUME_DIST() OVER w, 9) AS cume
        FROM orders
        WHERE o_custkey <= 200
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)""")),

    QueryDef(
      "q_approx_percentile",
      // MERGEABLE histogram-sketch percentiles — the 100 TB path where
      // q_percentile's exact form needs a global sort: ONE map-side-
      // combined bucket aggregate (the sketch, bounded-size and mergeable
      // across partitions/days), then the quantile walk runs on the
      // bucket frame only. The windows below iterate the ~1000-row sketch,
      // never the data — that bounded frame is the point of the sketch.
      // Deterministic: integer buckets, estimates are exact bucket bounds.
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val hist = li
          .groupBy(floor(col("l_extendedprice") / 100).cast("long").as("b"))
          .agg(count(lit(1)).as("c"))
        val w = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val t = hist.select(col("b"), col("c"),
          sum(col("c")).over(w).as("cum"),
          sum(col("c")).over(Window.partitionBy()).as("n"))
        def est(p: Double) =
          min(when(col("cum") >= ceil(lit(p) * col("n")), (col("b") + 1) * 100))
            .cast("long")
        t.agg(max(col("n")).as("n"),
          est(0.5).as("p50_ub"), est(0.95).as("p95_ub"), est(0.99).as("p99_ub"))
      },
      Some("""
        WITH h AS (
          SELECT CAST(floor(l_extendedprice / 100) AS BIGINT) AS b, COUNT(*) AS c
          FROM lineitem GROUP BY 1),
        t AS (SELECT b, c,
                     SUM(c) OVER (ORDER BY b) AS cum,
                     SUM(c) OVER () AS n
              FROM h)
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN cum >= ceil(0.5  * n) THEN (b + 1) * 100 END) AS BIGINT) AS p50_ub,
               CAST(MIN(CASE WHEN cum >= ceil(0.95 * n) THEN (b + 1) * 100 END) AS BIGINT) AS p95_ub,
               CAST(MIN(CASE WHEN cum >= ceil(0.99 * n) THEN (b + 1) * 100 END) AS BIGINT) AS p99_ub
        FROM t""")),

    QueryDef(
      "q_merge_upsert",
      // MERGE INTO semantics (lakehouse table maintenance) expressed as one
      // full-outer join: base = orders, changes = a derived CDC batch
      // (updates reprice 'F'-status orders, deletes every 97th key, inserts
      // shifted keys). Plan shape at 100 TB: ONE shuffle of each side on
      // the merge key — no driver loop, no per-row lookups; with a bucketed
      // base table the shuffle drops entirely (same layout contract as
      // q_bucketed_join). Decimal reprice keeps arithmetic exact.
      (s, dir) => {
        val base = Tables.orders(s, dir)
        val changes = base
          .filter(col("o_custkey") <= 300)
          .select(
            when(col("o_orderkey") % 97 === 0, lit("D"))
              .when(col("o_orderstatus") === "F", lit("U"))
              .otherwise(lit("I")).as("op"),
            when(col("o_orderstatus") === "F" && col("o_orderkey") % 97 =!= 0,
              col("o_orderkey"))
              .otherwise(col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
            col("o_custkey"),
            (dec(col("o_totalprice")) * dec(lit(1.10))).cast("double")
              .as("o_totalprice"))
        val merged = base.as("b").join(changes.as("c"), Seq("o_orderkey"), "full_outer")
          .filter(coalesce(col("c.op"), lit("K")) =!= "D")
          .select(col("o_orderkey"),
            coalesce(col("c.o_custkey"), col("b.o_custkey")).as("o_custkey"),
            coalesce(col("c.o_totalprice"), col("b.o_totalprice")).as("o_totalprice"))
        // scale-4 operands: the reprice is exact at 4 decimals; a scale-2
        // re-round would hit half-even vs half-up tie divergence at .005
        merged.agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).cast("long").as("key_sum"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("price_sum"))
      },
      Some("""
        WITH changes AS (
          SELECT CASE WHEN o_orderkey % 97 = 0 THEN 'D'
                      WHEN o_orderstatus = 'F' THEN 'U'
                      ELSE 'I' END AS op,
                 CASE WHEN o_orderstatus = 'F' AND o_orderkey % 97 <> 0
                      THEN o_orderkey ELSE o_orderkey + 10000000 END AS o_orderkey,
                 o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) *
                      CAST(1.10 AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
          FROM orders WHERE o_custkey <= 300),
        merged AS (
          SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
                 COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
                 COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice
          FROM orders b FULL OUTER JOIN changes c USING (o_orderkey)
          WHERE COALESCE(c.op, 'K') <> 'D')
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS price_sum
        FROM merged""")),

    QueryDef(
      "q_partitioned_prune",
      // partition-pruned layout: events written PARTITIONED BY day (the
      // third leg of the layout family beside bucketing and z-order), read
      // back with a partition-key predicate. The filter resolves at
      // PLANNING time against directory names — PartitionFilters in the
      // scan, zero data files of other days opened — which at 100 TB is
      // the difference between scanning one day and scanning three years.
      // Oracle computes the same day's aggregate from the raw table.
      (s, dir) => {
        val root = java.nio.file.Files
          .createTempDirectory("graft_part_prune").toString
        val ev = Tables.events(s, dir)
        // repartition on the partition column first: ONE writer (and one
        // file) per day instead of tasks × days small files — the layout
        // shape that keeps a 100 TB partitioned write from minting
        // millions of tiny objects
        ev.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
          .repartition(col("day"))
          .write.mode("overwrite").partitionBy("day").parquet(root)
        val day0 = ev.agg(date_format(min(to_date(col("ts"))), "yyyy-MM-dd"))
          .head().getString(0)
        s.read.parquet(root)
          .filter(col("day") === day0)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("value"))).cast("double").as("sum_value"))
      },
      Some("""
        WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d FROM events)
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events, d0
        WHERE CAST(ts AS DATE) = d
        GROUP BY event_type""")),

    QueryDef(
      "events_changepoint",
      // CUSUM level-shift detection per series (Page 1954): cumulative sum
      // of deviations from the series mean, flagged where |S| crosses the
      // band — the changepoint complement to events_anomaly's point
      // outliers. Exact integers end to end: values on the 1e-3 grid,
      // floor'd mean, BIGINT running sums — no float trajectory to
      // diverge. ONE keyed shuffle shared by the mean aggregate (broadcast
      // back) and the prefix window.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            floor(col("value") * 1000 + 0.5).cast("long").as("x3"))
        val means = ev.groupBy(col("user_id"))
          .agg(floor(sum(col("x3")).cast("double") / count(lit(1)))
            .cast("long").as("mq"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev.join(broadcast(means), "user_id")
          .select(col("user_id"), col("event_id"),
            sum(col("x3") - col("mq")).over(w).as("cusum"))
          .filter(abs(col("cusum")) > 400000L)
      },
      Some("""
        WITH e AS (
          SELECT user_id, event_id, ts,
                 CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x3
          FROM events),
        m AS (SELECT user_id,
                     CAST(floor(SUM(x3) / COUNT(*)) AS BIGINT) AS mq
              FROM e GROUP BY 1),
        c AS (SELECT e.user_id, e.event_id,
                     SUM(e.x3 - m.mq) OVER (PARTITION BY e.user_id
                       ORDER BY e.ts, e.event_id) AS cusum
              FROM e JOIN m USING (user_id))
        SELECT user_id, event_id, CAST(cusum AS BIGINT) AS cusum
        FROM c WHERE ABS(cusum) > 400000""")),

    QueryDef(
      "q_constraint_check",
      // data-CONTRACT validation (the dbt-test / CHECK-constraint sweep a
      // pipeline runs before publishing a table): key uniqueness,
      // referential integrity, and value-range rules, each as ONE
      // scan-plus-aggregate (FKs as anti joins — broadcast when the
      // parent side is dimension-sized), unioned into a constraint ×
      // violation-count report. At 100 TB each rule stays a single pass
      // and the report is metadata-sized.
      (s, dir) => {
        val ord = Tables.orders(s, dir)
        val cust = Tables.customer(s, dir)
        val li = Tables.lineitem(s, dir)
        def row(name: String, c: org.apache.spark.sql.DataFrame) =
          c.select(lit(name).as("constraint_name"),
            col("n_violations").cast("long").as("n_violations"))
        row("lineitem_fk_orders",
          li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti")
            .agg(count(lit(1)).as("n_violations")))
          .unionAll(row("lineitem_qty_range",
            li.filter(col("l_quantity") < 1 || col("l_quantity") > 50)
              .agg(count(lit(1)).as("n_violations"))))
          .unionAll(row("orders_fk_customer",
            ord.join(cust, ord("o_custkey") === cust("c_custkey"), "left_anti")
              .agg(count(lit(1)).as("n_violations"))))
          .unionAll(row("orders_pk_unique",
            ord.agg((count(lit(1)) - countDistinct(col("o_orderkey")))
              .as("n_violations"))))
          .unionAll(row("orders_price_positive",
            ord.filter(col("o_totalprice") <= 0)
              .agg(count(lit(1)).as("n_violations"))))
      },
      Some("""
        SELECT 'lineitem_fk_orders' AS constraint_name,
               CAST(COUNT(*) AS BIGINT) AS n_violations
        FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        UNION ALL
        SELECT 'lineitem_qty_range', CAST(COUNT(*) AS BIGINT)
        FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50
        UNION ALL
        SELECT 'orders_fk_customer', CAST(COUNT(*) AS BIGINT)
        FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        UNION ALL
        SELECT 'orders_pk_unique',
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'orders_price_positive', CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE o_totalprice <= 0""")),

    QueryDef(
      "q_table_checksum",
      // order/partition-independent table content fingerprint — the
      // migration-verification primitive (exactly what this engine's own
      // correctness gate hashes, exposed as an operator): every row folds
      // to one md5-family hash, reduced modulo a prime and SUMMED, so any
      // two copies of the table agree regardless of layout, partitioning,
      // or read order. ONE map-side-combined aggregate, no shuffle beyond
      // the 1-row combine — the cheapest possible full-table verify at
      // 100 TB, and mergeable across table shards/days by addition.
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val rowHash = graft.operators.Dedup.md5Hash60(
          concat_ws("|", col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_linenumber"), col("l_returnflag"), col("l_linestatus")))
        li.agg(count(lit(1)).as("n_rows"),
          sum(rowHash % 1000000007L).as("checksum"))
      },
      Some(s"""
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(${OracleSql.md5Hash60(
                 "l_orderkey || '|' || l_partkey || '|' || l_suppkey || '|' || " +
                 "l_linenumber || '|' || l_returnflag || '|' || l_linestatus")}
                 % 1000000007) AS BIGINT) AS checksum
        FROM lineitem""")),

    QueryDef(
      "events_seasonality",
      // seasonality profile: activity by hour-of-day × event type, with
      // each cell's share of its type's total — the daily-rhythm heatmap
      // every events dashboard opens with. One aggregate; the share
      // derives from a type-total window over the 24×|types| cell frame,
      // never the data.
      (s, dir) => {
        val cells = Tables.events(s, dir)
          .groupBy(hour(col("ts")).as("hod"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type"))
        cells.withColumn("share",
          round(col("n").cast("double") / sum(col("n")).over(w), 6))
      },
      Some("""
        WITH cells AS (
          SELECT EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hod,
                 event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2)
        SELECT hod, event_type, n,
               round(CAST(n AS DOUBLE) /
                     SUM(n) OVER (PARTITION BY event_type), 6) AS share
        FROM cells""")),

    QueryDef(
      "events_markov",
      // user-journey TRANSITION MATRIX (first-order Markov counts — the
      // attribution/flow-analysis primitive): per user, consecutive
      // event-type pairs in event-time order, aggregated corpus-wide.
      // One keyed shuffle for the lag window; the matrix aggregate is
      // |types|²-sized — metadata, not data.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        ev.select(col("user_id"), col("event_type"),
            lag(col("event_type"), 1).over(w).as("prev_type"))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        WITH t AS (
          SELECT event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events)
        SELECT prev_type, event_type AS next_type, COUNT(*) AS n
        FROM t WHERE prev_type IS NOT NULL
        GROUP BY 1, 2""")),

    QueryDef(
      "events_ewma",
      // exponentially-decayed engagement score per user: a 16-tap EWMA
      // kernel over the last events, weights 2^-(k+1). Every term is an
      // exact dyadic rational (integer·2^-16 after the 1e-3 value grid),
      // so the sum is EXACT and order-independent — no float trajectory,
      // both engines agree bit for bit, unlike a recursive α-fold which
      // has no closed form under rounding. One keyed shuffle shared by
      // the lag window and the per-user last-row rank.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            floor(col("value") * 1000 + 0.5).cast("long").as("x3"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val taps = (0 until 16).map { k =>
          coalesce(lag(col("x3"), k).over(w), lit(0L)).cast("double") /
            math.pow(2.0, k + 1)
        }.reduce(_ + _)
        val scored = ev.withColumn("ewma", taps)
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts").desc, col("event_id").desc)))
        scored.filter(col("rk") === 1)
          .select(col("user_id"), col("event_id"), col("ewma"))
      },
      Some {
        val taps = (0 until 16).map { k =>
          s"COALESCE(lag(x3, $k) OVER win, 0) / ${math.pow(2.0, k + 1)}"
        }.mkString(" + ")
        s"""
        WITH e AS (
          SELECT user_id, event_id, ts,
                 CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x3
          FROM events),
        s AS (
          SELECT user_id, event_id, $taps AS ewma,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rk
          FROM e
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT user_id, event_id, ewma FROM s WHERE rk = 1"""
      }),

    QueryDef(
      "q_snapshot_diff",
      // snapshot DIFF — the reconciliation partner of q_table_checksum:
      // when two table versions' checksums disagree, this says WHAT moved
      // (added / removed / changed / same), as one full-outer join on the
      // key with column comparison — one shuffle per side, counts only in
      // the output. v2 is derived from v1 by the same CDC rules as
      // q_merge_upsert, so the expected deltas are known quantities.
      (s, dir) => {
        val v1 = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val changes = Tables.orders(s, dir)
          .filter(col("o_custkey") <= 300)
          .select(
            when(col("o_orderkey") % 97 === 0, lit("D"))
              .when(col("o_orderstatus") === "F", lit("U"))
              .otherwise(lit("I")).as("op"),
            when(col("o_orderstatus") === "F" && col("o_orderkey") % 97 =!= 0,
              col("o_orderkey"))
              .otherwise(col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
            col("o_custkey"),
            (dec(col("o_totalprice")) * dec(lit(1.10))).cast("double")
              .as("o_totalprice"))
        val v2 = v1.as("b").join(changes.as("c"), Seq("o_orderkey"), "full_outer")
          .filter(coalesce(col("c.op"), lit("K")) =!= "D")
          .select(col("o_orderkey"),
            coalesce(col("c.o_custkey"), col("b.o_custkey")).as("o_custkey"),
            coalesce(col("c.o_totalprice"), col("b.o_totalprice")).as("o_totalprice"))
        v1.as("x").join(v2.as("y"), Seq("o_orderkey"), "full_outer")
          .agg(
            sum(when(col("x.o_custkey").isNull, 1L).otherwise(0L)).as("n_added"),
            sum(when(col("y.o_custkey").isNull, 1L).otherwise(0L)).as("n_removed"),
            sum(when(col("x.o_custkey").isNotNull && col("y.o_custkey").isNotNull &&
              (col("x.o_custkey") =!= col("y.o_custkey") ||
                col("x.o_totalprice") =!= col("y.o_totalprice")), 1L)
              .otherwise(0L)).as("n_changed"),
            sum(when(col("x.o_custkey").isNotNull && col("y.o_custkey").isNotNull &&
              col("x.o_custkey") === col("y.o_custkey") &&
              col("x.o_totalprice") === col("y.o_totalprice"), 1L)
              .otherwise(0L)).as("n_same"))
      },
      Some("""
        WITH changes AS (
          SELECT CASE WHEN o_orderkey % 97 = 0 THEN 'D'
                      WHEN o_orderstatus = 'F' THEN 'U'
                      ELSE 'I' END AS op,
                 CASE WHEN o_orderstatus = 'F' AND o_orderkey % 97 <> 0
                      THEN o_orderkey ELSE o_orderkey + 10000000 END AS o_orderkey,
                 o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) *
                      CAST(1.10 AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
          FROM orders WHERE o_custkey <= 300),
        v2 AS (
          SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
                 COALESCE(c.o_custkey, b.o_custkey) AS o_custkey,
                 COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice
          FROM orders b FULL OUTER JOIN changes c USING (o_orderkey)
          WHERE COALESCE(c.op, 'K') <> 'D')
        SELECT
          CAST(SUM(CASE WHEN x.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
          CAST(SUM(CASE WHEN y.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
          CAST(SUM(CASE WHEN x.o_custkey IS NOT NULL AND y.o_custkey IS NOT NULL
                    AND (x.o_custkey <> y.o_custkey OR x.o_totalprice <> y.o_totalprice)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
          CAST(SUM(CASE WHEN x.o_custkey IS NOT NULL AND y.o_custkey IS NOT NULL
                    AND x.o_custkey = y.o_custkey AND x.o_totalprice = y.o_totalprice
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_same
        FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders) x
        FULL OUTER JOIN v2 y USING (o_orderkey)""")),

    QueryDef(
      "events_twa",
      // time-weighted average of a gauge per user — the metrics-pipeline
      // aggregate where each reading holds until the next one (Δt-weighted
      // mean). ONE keyed shuffle shared by the lead() window and the
      // aggregate; weights are exact micros BIGINTs, products held in
      // DECIMAL so the sum is order-independent, ratio surfaced as a
      // rounded double. Last reading of a user carries no interval.
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        ev.select(col("user_id"), col("value"),
            unix_micros(col("ts")).as("tus"),
            lead(unix_micros(col("ts")), 1).over(w).as("nxt"))
          .filter(col("nxt").isNotNull)
          .select(col("user_id"),
            (round(col("value"), 6).cast("decimal(18,6)") *
              (col("nxt") - col("tus")).cast("decimal(20,0)")).as("wv"),
            (col("nxt") - col("tus")).as("dt"))
          .groupBy(col("user_id"))
          .agg(round(sum(col("wv")).cast("double") /
            sum(col("dt")).cast("double"), 6).as("twa"),
            count(lit(1)).as("n_intervals"))
      },
      Some("""
        WITH e AS (
          SELECT user_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
                 lead(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
          FROM events),
        d AS (
          SELECT user_id,
                 CAST(round(value, 6) AS DECIMAL(18,6)) *
                   CAST(nxt - tus AS DECIMAL(20,0)) AS wv,
                 nxt - tus AS dt
          FROM e WHERE nxt IS NOT NULL)
        SELECT user_id,
               round(CAST(SUM(wv) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE), 6) AS twa,
               COUNT(*) AS n_intervals
        FROM d GROUP BY user_id""")),

    QueryDef(
      "graph_link_pred",
      // link prediction by common-neighbor Jaccard (Liben-Nowell–Kleinberg):
      // for non-adjacent low-degree pairs, |N(a)∩N(b)| / |N(a)∪N(b)|,
      // top-20. Hubs are pruned FIRST (deg ≤ 30) — the production trick
      // that bounds the wedge join at cap²·|V| instead of Σdeg² (a single
      // hub otherwise mints millions of candidate pairs); the union size
      // folds from capped degrees without a second neighborhood pass.
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey").as("pk"))
        // raw feeds 3 consumers and e feeds 3 (both wedge sides + degrees):
        // checkpointed so the lineitem self-join runs ONCE, not per subtree
        // (unchecked, the visible plan replicates it ~6x — measured 693
        // plan nodes vs 60)
        val raw = graft.Materialize.localCheckpoint(
          li.as("x").join(li.as("y"),
              col("x.l_orderkey") === col("y.l_orderkey") &&
                col("y.l_linenumber") === col("x.l_linenumber") + 1)
            .filter(col("x.pk") =!= col("y.pk"))
            .select(least(col("x.pk"), col("y.pk")).as("a"),
              greatest(col("x.pk"), col("y.pk")).as("b"))
            .distinct())
        val edges = raw.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(raw.select(col("b").as("src"), col("a").as("dst")))
        val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val small = deg.filter(col("deg") <= 30)
        val e = graft.Materialize.localCheckpoint(edges
          .join(small.select(col("src")), Seq("src"), "left_semi")
          .join(small.select(col("src").as("dst")), Seq("dst"), "left_semi"))
        val wedges = e.as("p").join(e.as("q"), col("p.src") === col("q.src"))
          .filter(col("p.dst") < col("q.dst"))
          .groupBy(col("p.dst").as("a"), col("q.dst").as("b"))
          .agg(count(lit(1)).as("common"))
        val degS = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        wedges
          .join(raw.withColumn("adj", lit(1)), Seq("a", "b"), "left_anti")
          .join(degS.select(col("src").as("a"), col("d").as("da")), Seq("a"))
          .join(degS.select(col("src").as("b"), col("d").as("db")), Seq("b"))
          .select(col("a"), col("b"), col("common"),
            round(col("common").cast("double") /
              (col("da") + col("db") - col("common")), 6).as("jac"))
          .orderBy(col("jac").desc, col("a"), col("b"))
          .limit(20)
      },
      Some("""
        WITH raw AS MATERIALIZED (
          SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
                          greatest(x.l_partkey, y.l_partkey) AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey
           AND y.l_linenumber = x.l_linenumber + 1
          WHERE x.l_partkey <> y.l_partkey),
        ed AS MATERIALIZED (SELECT a AS src, b AS dst FROM raw UNION ALL SELECT b, a FROM raw),
        dg AS (SELECT src, COUNT(*) AS deg FROM ed GROUP BY src),
        sm AS (SELECT src FROM dg WHERE deg <= 30),
        e AS MATERIALIZED (
          SELECT ed.src, ed.dst FROM ed
          JOIN sm s1 ON ed.src = s1.src JOIN sm s2 ON ed.dst = s2.src),
        w AS (
          SELECT p.dst AS a, q.dst AS b, COUNT(*) AS common
          FROM e p JOIN e q ON p.src = q.src AND p.dst < q.dst
          GROUP BY 1, 2),
        ds AS (SELECT src, COUNT(*) AS d FROM e GROUP BY src)
        SELECT w.a, w.b, w.common,
               round(CAST(w.common AS DOUBLE) / (da.d + db.d - w.common), 6) AS jac
        FROM w
        JOIN ds da ON w.a = da.src JOIN ds db ON w.b = db.src
        WHERE NOT EXISTS (SELECT 1 FROM raw r WHERE r.a = w.a AND r.b = w.b)
        ORDER BY jac DESC, w.a, w.b LIMIT 20""")),

    QueryDef(
      "graph_label_prop",
      // community detection: synchronous label propagation (Raghavan et al.
      // 2007) made deterministic — each round every node adopts its
      // neighborhood's most frequent label, ties to the SMALLEST label, so
      // the result is replayable by the oracle round for round. 4 rounds on
      // the co-purchase graph. Scale shape per round: one (node,label)
      // count aggregate over the edge join (map-side combined) + one
      // argmax — labels re-enter each round as a bounded materialized
      // frame, so the visible plan stays one round deep, like graph_kcore.
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey").as("pk"))
        val raw = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("y.l_linenumber") === col("x.l_linenumber") + 1)
          .filter(col("x.pk") =!= col("y.pk"))
          .select(least(col("x.pk"), col("y.pk")).as("a"),
            greatest(col("x.pk"), col("y.pk")).as("b"))
          .distinct()
        val edges = raw.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(raw.select(col("b").as("src"), col("a").as("dst")))
        graft.operators.Analytics.labelPropagation(edges, rounds = 4)
      },
      Some {
        val rounds = (1 to 4).map { i =>
          val p = i - 1
          s"""c$i AS MATERIALIZED (
             |  SELECT e.src AS node, l.lbl, COUNT(*) AS c
             |  FROM e0 e JOIN l$p l ON e.dst = l.node GROUP BY e.src, l.lbl),
             |l$i AS MATERIALIZED (
             |  SELECT node, lbl FROM (
             |    SELECT node, lbl,
             |           row_number() OVER (PARTITION BY node
             |                              ORDER BY c DESC, lbl) AS rk
             |    FROM c$i) WHERE rk = 1)""".stripMargin
        }.mkString(",\n")
        s"""
        WITH raw AS MATERIALIZED (
          SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
                          greatest(x.l_partkey, y.l_partkey) AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey
           AND y.l_linenumber = x.l_linenumber + 1
          WHERE x.l_partkey <> y.l_partkey),
        e0 AS MATERIALIZED (SELECT a AS src, b AS dst FROM raw UNION ALL SELECT b, a FROM raw),
        l0 AS MATERIALIZED (SELECT src AS node, src AS lbl FROM e0 GROUP BY src),
        $rounds
        SELECT lbl AS community, COUNT(*) AS sz, CAST(MIN(node) AS BIGINT) AS min_node
        FROM l4 GROUP BY lbl"""
      }),

    QueryDef(
      "graph_bfs",
      // multi-source BFS distances over the co-purchase graph: hop count
      // from the seed set (part keys ≡ 0 mod 500) within 3 hops.
      // Frontier-only relaxation — each round expands only the nodes first
      // reached last round, so total work is O(|E|) across all rounds (the
      // re-relax-everything form pays rounds×|E| — the shape that drowns
      // at 100 TB). Oracle replays the rounds as chained frontier CTEs.
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey").as("pk"))
        val raw = li.as("x").join(li.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey") &&
              col("y.l_linenumber") === col("x.l_linenumber") + 1)
          .filter(col("x.pk") =!= col("y.pk"))
          .select(least(col("x.pk"), col("y.pk")).as("a"),
            greatest(col("x.pk"), col("y.pk")).as("b"))
          .distinct()
        val edges = raw.select(col("a").as("src"), col("b").as("dst"))
          .unionAll(raw.select(col("b").as("src"), col("a").as("dst")))
        val seeds = edges.select(col("src").as("node"))
          .filter(col("node") % 500 === 0).distinct()
        graft.operators.Analytics.bfsDistances(edges, seeds, maxHops = 3)
      },
      Some("""
        WITH raw AS MATERIALIZED (
          SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a,
                          greatest(x.l_partkey, y.l_partkey) AS b
          FROM lineitem x JOIN lineitem y
            ON x.l_orderkey = y.l_orderkey
           AND y.l_linenumber = x.l_linenumber + 1
          WHERE x.l_partkey <> y.l_partkey),
        e AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM raw UNION ALL SELECT b, a FROM raw),
        d0 AS MATERIALIZED (
          SELECT DISTINCT src AS node, 0 AS dist FROM e WHERE src % 500 = 0),
        f1 AS MATERIALIZED (
          SELECT DISTINCT e.dst AS node FROM e JOIN d0 ON e.src = d0.node
          WHERE e.dst NOT IN (SELECT node FROM d0)),
        d1 AS MATERIALIZED (
          SELECT node, dist FROM d0 UNION ALL SELECT node, 1 FROM f1),
        f2 AS MATERIALIZED (
          SELECT DISTINCT e.dst AS node FROM e JOIN f1 ON e.src = f1.node
          WHERE e.dst NOT IN (SELECT node FROM d1)),
        d2 AS MATERIALIZED (
          SELECT node, dist FROM d1 UNION ALL SELECT node, 2 FROM f2),
        f3 AS MATERIALIZED (
          SELECT DISTINCT e.dst AS node FROM e JOIN f2 ON e.src = f2.node
          WHERE e.dst NOT IN (SELECT node FROM d2)),
        d3 AS (SELECT node, dist FROM d2 UNION ALL SELECT node, 3 FROM f3)
        SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
        FROM d3""")),

    QueryDef(
      "events_acf",
      // autocorrelation of the hourly event-count series at lags 1..12 —
      // the periodicity detector behind seasonality-aware anomaly
      // thresholds. The series is ONE aggregate (≤ |hours| rows —
      // metadata, not data); mean-centering is exact in integers by
      // scaling through N (c_t = N·x_t − S), so num/den are BIGINT sums
      // independent of aggregation order, and only the final ratio is a
      // double. Lag pairing self-joins the tiny centered frame.
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("x"))
        val stats = hourly.agg(count(lit(1)).as("nn"), sum(col("x")).as("ss"))
        val c = hourly.crossJoin(broadcast(stats))
          .select(col("h"), (col("nn") * col("x") - col("ss")).as("c0"))
          .withColumn("t", row_number().over(Window.orderBy(col("h"))))
        val den = c.agg(sum(col("c0") * col("c0")).as("den"))
        val lagFrame = c.sparkSession.range(1, 13).select(col("id").as("lag"))
        val a = c.select(col("t").as("ta"), col("c0").as("ca"))
        val b = c.select(col("t").as("tb"), col("c0").as("cb"))
        a.crossJoin(broadcast(lagFrame))
          .join(b, col("tb") === col("ta") + col("lag"))
          .groupBy(col("lag"))
          .agg(sum(col("ca") * col("cb")).as("num"))
          .crossJoin(broadcast(den))
          .select(col("lag"), col("num"), col("den"),
            round(col("num").cast("double") / col("den").cast("double"), 6).as("acf"))
      },
      Some("""
        WITH hourly AS (
          SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, COUNT(*) AS x
          FROM events GROUP BY 1),
        st AS (SELECT COUNT(*) AS nn, CAST(SUM(x) AS BIGINT) AS ss FROM hourly),
        c AS (SELECT nn * x - ss AS c0,
                     row_number() OVER (ORDER BY h) AS t
              FROM hourly, st),
        d AS (SELECT CAST(SUM(c0 * c0) AS BIGINT) AS den FROM c),
        l AS (SELECT CAST(range AS BIGINT) AS lag FROM range(1, 13)),
        n AS (SELECT l.lag, CAST(SUM(a.c0 * b.c0) AS BIGINT) AS num
              FROM l, c a, c b WHERE b.t = a.t + l.lag GROUP BY 1)
        SELECT n.lag, n.num, d.den,
               round(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE), 6) AS acf
        FROM n, d""")),

    QueryDef(
      "events_forecast_snaive",
      // seasonal-naive backtest — the forecasting floor every model must
      // beat: predict each hour of the LAST day with the same hour of the
      // previous day, score per-hour absolute error. All-integer; the
      // day×hour count frame is ONE aggregate (metadata-sized), the
      // actual/forecast split is two filters of it joined over the
      // broadcast 24-hour grid.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(to_date(col("ts")).as("d"), hour(col("ts")).cast("long").as("hod"))
        val cnt = ev.groupBy(col("d"), col("hod")).agg(count(lit(1)).as("n"))
        val last = cnt.agg(max(col("d")).as("dl"))
          .select(col("dl"), date_sub(col("dl"), 1).as("dp"))
        val a = cnt.crossJoin(broadcast(last)).filter(col("d") === col("dl"))
          .select(col("hod"), col("n").as("actual"))
        val f = cnt.crossJoin(broadcast(last)).filter(col("d") === col("dp"))
          .select(col("hod"), col("n").as("forecast"))
        s.range(0, 24).select(col("id").as("hod"))
          .join(a, Seq("hod"), "left").join(f, Seq("hod"), "left")
          .select(col("hod"),
            coalesce(col("actual"), lit(0L)).as("actual"),
            coalesce(col("forecast"), lit(0L)).as("forecast"),
            abs(coalesce(col("actual"), lit(0L)) -
              coalesce(col("forecast"), lit(0L))).as("abs_err"))
      },
      Some("""
        WITH e AS (
          SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
                 EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hod
          FROM events),
        c AS (SELECT d, hod, COUNT(*) AS n FROM e GROUP BY 1, 2),
        l AS (SELECT MAX(d) AS dl, MAX(d) - 1 AS dp FROM c),
        a AS (SELECT hod, n FROM c, l WHERE d = dl),
        f AS (SELECT hod, n FROM c, l WHERE d = dp),
        g AS (SELECT CAST(range AS BIGINT) AS hod FROM range(0, 24))
        SELECT g.hod,
               COALESCE(a.n, 0) AS actual,
               COALESCE(f.n, 0) AS forecast,
               abs(COALESCE(a.n, 0) - COALESCE(f.n, 0)) AS abs_err
        FROM g LEFT JOIN a USING (hod) LEFT JOIN f USING (hod)""")),

    QueryDef(
      "events_attribution",
      // multi-touch attribution — credit each purchase's preceding touch
      // events (everything since the prior purchase) under three models at
      // once: first-touch, last-touch, linear. The journey key is a single
      // backward-looking window over the per-user timeline (count of
      // purchases at-or-after each event), so the whole assignment costs
      // ONE shuffle by user. Linear credit is held in exact integers as
      // 1000000 div n (ppm of a journey, truncating division — identical
      // in Spark `div` and DuckDB `//` for positive operands), so the
      // per-type sums are order-independent BIGINTs, never floats.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        val wAfter = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val tagged = ev.withColumn("j",
          count(when(col("event_type") === "purchase", lit(1))).over(wAfter))
        val touches = tagged
          .filter(col("event_type") =!= "purchase" && col("j") > 0)
        val wj = Window.partitionBy(col("user_id"), col("j"))
          .orderBy(col("ts"), col("event_id"))
        val wjd = Window.partitionBy(col("user_id"), col("j"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val marked = touches
          .withColumn("rna", row_number().over(wj))
          .withColumn("rnd", row_number().over(wjd))
        val sizes = touches.groupBy(col("user_id"), col("j"))
          .agg(count(lit(1)).as("n"))
        val perType = touches.groupBy(col("user_id"), col("j"), col("event_type"))
          .agg(count(lit(1)).as("k"))
        val lin = perType.join(sizes, Seq("user_id", "j"))
          .groupBy(col("event_type"))
          .agg(sum(col("k") * expr("1000000 div n")).as("linear_ppm"))
        val ft = marked.filter(col("rna") === 1)
          .groupBy(col("event_type")).agg(count(lit(1)).as("first_touch"))
        val lt = marked.filter(col("rnd") === 1)
          .groupBy(col("event_type")).agg(count(lit(1)).as("last_touch"))
        touches.select(col("event_type")).distinct()
          .join(ft, Seq("event_type"), "left")
          .join(lt, Seq("event_type"), "left")
          .join(lin, Seq("event_type"), "left")
          .select(col("event_type"),
            coalesce(col("first_touch"), lit(0L)).as("first_touch"),
            coalesce(col("last_touch"), lit(0L)).as("last_touch"),
            coalesce(col("linear_ppm"), lit(0L)).as("linear_ppm"))
      },
      Some("""
        WITH ev AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
          FROM events),
        t AS (
          SELECT *, COUNT(*) FILTER (WHERE event_type = 'purchase')
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS j
          FROM ev),
        tou AS (SELECT * FROM t WHERE event_type <> 'purchase' AND j > 0),
        m AS (
          SELECT *,
            row_number() OVER (PARTITION BY user_id, j ORDER BY ts, event_id) AS rna,
            row_number() OVER (PARTITION BY user_id, j ORDER BY ts DESC, event_id DESC) AS rnd
          FROM tou),
        sz AS (SELECT user_id, j, COUNT(*) AS n FROM tou GROUP BY 1, 2),
        k AS (SELECT user_id, j, event_type, COUNT(*) AS k FROM tou GROUP BY 1, 2, 3),
        lin AS (
          SELECT k.event_type,
                 CAST(SUM(k.k * (1000000 // sz.n)) AS BIGINT) AS linear_ppm
          FROM k JOIN sz USING (user_id, j) GROUP BY 1),
        ft AS (SELECT event_type, COUNT(*) AS first_touch FROM m WHERE rna = 1 GROUP BY 1),
        lt AS (SELECT event_type, COUNT(*) AS last_touch FROM m WHERE rnd = 1 GROUP BY 1),
        ty AS (SELECT DISTINCT event_type FROM tou)
        SELECT ty.event_type,
               CAST(COALESCE(ft.first_touch, 0) AS BIGINT) AS first_touch,
               CAST(COALESCE(lt.last_touch, 0) AS BIGINT) AS last_touch,
               CAST(COALESCE(lin.linear_ppm, 0) AS BIGINT) AS linear_ppm
        FROM ty LEFT JOIN ft USING (event_type)
                LEFT JOIN lt USING (event_type)
                LEFT JOIN lin USING (event_type)""")),

    QueryDef(
      "events_ccf",
      // cross-correlation of the hourly click series against the hourly
      // purchase series at lags -12..+12 — the lead/lag detector behind
      // "which signal moves first" questions. Same exact-integer centering
      // as events_acf (c_t = N·x_t − S on the shared hour frame), so
      // numerators and both denominators are order-independent BIGINT
      // sums; the only doubles are the final sqrt/divide from exact
      // integers (deterministic IEEE ops in both engines).
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        val hours = ev.select(col("h")).distinct()
        val a = ev.filter(col("event_type") === "click")
          .groupBy(col("h")).agg(count(lit(1)).as("a"))
        val b = ev.filter(col("event_type") === "purchase")
          .groupBy(col("h")).agg(count(lit(1)).as("b"))
        val f = hours.join(a, Seq("h"), "left").join(b, Seq("h"), "left")
          .select(col("h"),
            coalesce(col("a"), lit(0L)).as("a"),
            coalesce(col("b"), lit(0L)).as("b"))
        val st = f.agg(count(lit(1)).as("nn"),
          sum(col("a")).as("sa"), sum(col("b")).as("sb"))
        val c = f.crossJoin(broadcast(st))
          .select(col("h"),
            (col("nn") * col("a") - col("sa")).as("ca"),
            (col("nn") * col("b") - col("sb")).as("cb"))
          .withColumn("t", row_number().over(Window.orderBy(col("h"))))
        val den = c.agg(sum(col("ca") * col("ca")).as("dena"),
          sum(col("cb") * col("cb")).as("denb"))
        val lags = s.range(-12, 13).select(col("id").as("lag"))
        val x = c.select(col("t").as("ta"), col("ca"))
        val y = c.select(col("t").as("tb"), col("cb"))
        x.crossJoin(broadcast(lags))
          .join(y, col("tb") === col("ta") + col("lag"))
          .groupBy(col("lag"))
          .agg(sum(col("ca") * col("cb")).as("num"))
          .crossJoin(broadcast(den))
          .select(col("lag"), col("num"), col("dena"), col("denb"),
            round(col("num").cast("double") /
              (sqrt(col("dena").cast("double")) * sqrt(col("denb").cast("double"))), 6)
              .as("ccf"))
      },
      Some("""
        WITH ev AS (
          SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, event_type
          FROM events),
        hours AS (SELECT DISTINCT h FROM ev),
        a AS (SELECT h, COUNT(*) AS a FROM ev WHERE event_type = 'click' GROUP BY 1),
        b AS (SELECT h, COUNT(*) AS b FROM ev WHERE event_type = 'purchase' GROUP BY 1),
        f AS (SELECT hours.h, COALESCE(a.a, 0) AS a, COALESCE(b.b, 0) AS b
              FROM hours LEFT JOIN a USING (h) LEFT JOIN b USING (h)),
        st AS (SELECT COUNT(*) AS nn, CAST(SUM(a) AS BIGINT) AS sa,
                      CAST(SUM(b) AS BIGINT) AS sb FROM f),
        c AS (SELECT nn * a - sa AS ca, nn * b - sb AS cb,
                     row_number() OVER (ORDER BY h) AS t
              FROM f, st),
        d AS (SELECT CAST(SUM(ca * ca) AS BIGINT) AS dena,
                     CAST(SUM(cb * cb) AS BIGINT) AS denb FROM c),
        l AS (SELECT CAST(range AS BIGINT) AS lag FROM range(-12, 13)),
        n AS (SELECT l.lag, CAST(SUM(x.ca * y.cb) AS BIGINT) AS num
              FROM l, c x, c y WHERE y.t = x.t + l.lag GROUP BY 1)
        SELECT n.lag, n.num, d.dena, d.denb,
               round(CAST(n.num AS DOUBLE) /
                 (sqrt(CAST(d.dena AS DOUBLE)) * sqrt(CAST(d.denb AS DOUBLE))), 6) AS ccf
        FROM n, d""")),

    QueryDef(
      "events_trend_ols",
      // per-type linear trend over daily counts — closed-form OLS where
      // every moment (n, Σx, Σy, Σxy, Σxx) is an exact BIGINT over the
      // observed days (x = days since the global first event), so slope
      // and intercept are single divisions of exact integers. The daily
      // frame is ONE aggregate; everything after is metadata-sized.
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(to_date(col("ts")).as("d"), col("event_type"))
        val d0 = ev.agg(min(col("d")).as("d0"))
        val daily = ev.groupBy(col("event_type"), col("d"))
          .agg(count(lit(1)).as("y"))
          .crossJoin(broadcast(d0))
          .select(col("event_type"), datediff(col("d"), col("d0")).cast("long").as("x"),
            col("y"))
        daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
          .select(col("event_type"), col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
            (col("sy") * col("sxx") - col("sx") * col("sxy")).as("icept_num"))
          .select(col("event_type"), col("n"), col("slope_num"), col("den"),
            round(col("slope_num").cast("double") / col("den").cast("double"), 6)
              .as("slope"),
            round(col("icept_num").cast("double") / col("den").cast("double"), 6)
              .as("intercept"))
      },
      Some("""
        WITH ev AS (
          SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, event_type FROM events),
        d0 AS (SELECT MIN(d) AS d0 FROM ev),
        daily AS (
          SELECT event_type, CAST(ev.d - d0.d0 AS BIGINT) AS x, COUNT(*) AS y
          FROM ev, d0 GROUP BY 1, 2),
        m AS (
          SELECT event_type, COUNT(*) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM daily GROUP BY 1)
        SELECT event_type, n,
               n * sxy - sx * sy AS slope_num,
               n * sxx - sx * sx AS den,
               round(CAST(n * sxy - sx * sy AS DOUBLE) /
                     CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
               round(CAST(sy * sxx - sx * sxy AS DOUBLE) /
                     CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept
        FROM m""")),

    QueryDef(
      "events_hazard",
      // discrete-time hazard table (the Kaplan–Meier ingredients): users
      // enter at their first event day, exit at their last; exits on the
      // corpus's final day are right-censored. For each lifetime day t:
      // n_t = users still at risk (lifetime ≥ t), d_t = uncensored exits
      // at exactly t, hazard in ppm by truncating integer division — no
      // float survival product anywhere, so the table is exactly
      // replayable. One shuffle (per-user min/max), then a tiny
      // grid × users broadcast range-join.
      (s, dir) => {
        val u = Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .groupBy(col("user_id"))
          .agg(min(col("d")).as("b"), max(col("d")).as("e"))
        val m = u.agg(max(col("e")).as("mx"))
        val life = u.crossJoin(broadcast(m))
          .select(col("user_id"),
            datediff(col("e"), col("b")).cast("long").as("life"),
            (col("e") === col("mx")).as("cens"))
        val grid = life.agg(max(col("life")).as("ml"))
          .select(explode(sequence(lit(0L), col("ml"))).as("t"))
        broadcast(grid).join(life, col("life") >= col("t"))
          .groupBy(col("t"))
          .agg(count(lit(1)).as("at_risk"),
            count(when(!col("cens") && col("life") === col("t"), lit(1))).as("deaths"))
          .select(col("t"), col("at_risk"), col("deaths"),
            expr("deaths * 1000000 div at_risk").as("hazard_ppm"))
      },
      Some("""
        WITH u AS (
          SELECT user_id, MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS b,
                 MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS e
          FROM events GROUP BY 1),
        mx AS (SELECT MAX(e) AS mx FROM u),
        life AS (
          SELECT user_id, CAST(e - b AS BIGINT) AS life, e = mx.mx AS cens
          FROM u, mx),
        grid AS (
          SELECT CAST(unnest(generate_series(0,
                   (SELECT MAX(life) FROM life))) AS BIGINT) AS t)
        SELECT grid.t, COUNT(*) AS at_risk,
               CAST(COUNT(*) FILTER (WHERE NOT cens AND life = t) AS BIGINT) AS deaths,
               CAST(COUNT(*) FILTER (WHERE NOT cens AND life = t) AS BIGINT) * 1000000
                 // COUNT(*) AS hazard_ppm
        FROM grid JOIN life ON life.life >= grid.t
        GROUP BY 1""")),

    QueryDef(
      "q_skyline",
      // 2-D Pareto frontier over part (minimize price, maximize size) —
      // the multi-objective "best tradeoffs" operator. Scale shape: a
      // coarse price-bucket aggregate (metadata-sized) broadcasts a
      // running max-size prefix, pruning every row dominated across
      // bucket boundaries BEFORE any sort — the classic distributed
      // prefix-max skyline; the exact windows then run over the tiny
      // surviving candidate set only. Prices are held as exact cents.
      (s, dir) => {
        val p = Tables.part(s, dir)
          .select(col("p_partkey"),
            round(col("p_retailprice") * 100).cast("long").as("cents"),
            col("p_size").cast("long").as("p_size"))
        val withB = p.withColumn("bk", expr("cents div 10000"))
        val bmax = withB.groupBy(col("bk")).agg(max(col("p_size")).as("bsz"))
          .withColumn("prevmax",
            max(col("bsz")).over(Window.orderBy(col("bk"))
              .rowsBetween(Window.unboundedPreceding, -1)))
        val pruned = withB.join(broadcast(bmax.select(col("bk"), col("prevmax"))), Seq("bk"))
          .filter(col("prevmax").isNull || col("p_size") > col("prevmax"))
        val wLt = Window.orderBy(col("cents"))
          .rangeBetween(Window.unboundedPreceding, -1)
        val wEq = Window.partitionBy(col("cents"))
        pruned
          .withColumn("mlt", max(col("p_size")).over(wLt))
          .withColumn("meq", max(col("p_size")).over(wEq))
          .filter((col("mlt").isNull || col("mlt") < col("p_size")) &&
            col("meq") <= col("p_size"))
          .select(col("p_partkey"), col("cents"), col("p_size"))
      },
      Some("""
        WITH p AS (
          SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
                 CAST(p_size AS BIGINT) AS p_size
          FROM part)
        SELECT a.p_partkey, a.cents, a.p_size
        FROM p a
        WHERE NOT EXISTS (
          SELECT 1 FROM p b
          WHERE b.cents <= a.cents AND b.p_size >= a.p_size
            AND (b.cents < a.cents OR b.p_size > a.p_size))""")),

    QueryDef(
      "q_basket_rules",
      // association-rule mining over order baskets (support, directed
      // confidence, lift) — items are part classes so pair support is
      // dense enough to rank. One distinct-shuffle builds the baskets;
      // the pair join is WITHIN an order key (bounded by basket size, no
      // quadratic blowup at scale); item marginals and the basket count
      // broadcast into the final projection. Confidence and lift are
      // truncating-integer ppm — order-independent, no floats.
      (s, dir) => {
        val baskets = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("o"), (col("l_partkey") % 100).as("item"))
          .distinct()
        val nOrders = baskets.agg(countDistinct(col("o")).as("no"))
        val itemCnt = baskets.groupBy(col("item")).agg(count(lit(1)).as("ni"))
        val a = baskets.select(col("o"), col("item").as("ia"))
        val b = baskets.select(col("o"), col("item").as("ib"))
        val pairs = a.join(b, Seq("o")).filter(col("ia") < col("ib"))
          .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("nab"))
        pairs
          .join(broadcast(itemCnt.select(col("item").as("ia"), col("ni").as("na"))), Seq("ia"))
          .join(broadcast(itemCnt.select(col("item").as("ib"), col("ni").as("nb"))), Seq("ib"))
          .crossJoin(broadcast(nOrders))
          .select(col("ia"), col("ib"), col("nab"), col("na"), col("nb"),
            expr("nab * 1000000 div na").as("conf_ab_ppm"),
            expr("nab * 1000000 div nb").as("conf_ba_ppm"),
            // lift numerator is nab*no*1e6 ≤ no²·1e6 — overflows int64 once
            // order counts pass ~3e9 (silent wrap in non-ANSI Spark, error
            // in DuckDB), so the intermediates go through DECIMAL(38,0);
            // the quotient is ppm-scale and lands back in BIGINT exactly
            expr("""CAST(CAST(nab AS DECIMAL(38,0)) * no * 1000000
                    div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)""")
              .as("lift_ppm"))
          .orderBy(col("nab").desc, col("ia"), col("ib"))
          .limit(30)
      },
      Some("""
        WITH baskets AS (
          SELECT DISTINCT l_orderkey AS o, l_partkey % 100 AS item FROM lineitem),
        no AS (SELECT COUNT(DISTINCT o) AS no FROM baskets),
        ic AS (SELECT item, COUNT(*) AS ni FROM baskets GROUP BY 1),
        pr AS (
          SELECT a.item AS ia, b.item AS ib, COUNT(*) AS nab
          FROM baskets a JOIN baskets b ON a.o = b.o AND a.item < b.item
          GROUP BY 1, 2)
        SELECT pr.ia, pr.ib, pr.nab, ca.ni AS na, cb.ni AS nb,
               pr.nab * 1000000 // ca.ni AS conf_ab_ppm,
               pr.nab * 1000000 // cb.ni AS conf_ba_ppm,
               CAST(CAST(pr.nab AS HUGEINT) * no.no * 1000000
                    // (CAST(ca.ni AS HUGEINT) * cb.ni) AS BIGINT) AS lift_ppm
        FROM pr JOIN ic ca ON pr.ia = ca.item
                JOIN ic cb ON pr.ib = cb.item, no
        ORDER BY pr.nab DESC, pr.ia, pr.ib
        LIMIT 30""")),

    QueryDef(
      "graph_hits",
      // 2-iteration HITS over the customer→part-class purchase bipartite
      // graph: hub scores rank the broad buyers, authority scores the
      // widely-bought item classes. All-integer rounds on a 2^20 grid
      // (max-normalized with truncating division) — the oracle unrolls
      // the identical arithmetic as chained CTEs. See Analytics.hits for
      // the per-round shuffle accounting.
      (s, dir) => {
        val edges = Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"), (col("l_partkey") % 500).as("dst"))
        graft.operators.Analytics.hits(edges, iterations = 2)
      },
      Some("""
        WITH e AS (
          SELECT DISTINCT o_custkey AS src, l_partkey % 500 AS dst
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        h0 AS (SELECT DISTINCT src AS node, CAST(1048576 AS BIGINT) AS h FROM e),
        a1r AS (SELECT dst, CAST(SUM(h) AS BIGINT) AS raw
                FROM e JOIN h0 ON e.src = h0.node GROUP BY 1),
        a1 AS (SELECT dst AS node,
                      CAST(CAST(raw AS HUGEINT) * 1048576
                           // (SELECT MAX(raw) FROM a1r) AS BIGINT) AS a
               FROM a1r),
        h1r AS (SELECT src, CAST(SUM(a) AS BIGINT) AS raw
                FROM e JOIN a1 ON e.dst = a1.node GROUP BY 1),
        h1 AS (SELECT src AS node,
                      CAST(CAST(raw AS HUGEINT) * 1048576
                           // (SELECT MAX(raw) FROM h1r) AS BIGINT) AS h
               FROM h1r),
        a2r AS (SELECT dst, CAST(SUM(h) AS BIGINT) AS raw
                FROM e JOIN h1 ON e.src = h1.node GROUP BY 1),
        a2 AS (SELECT dst AS node,
                      CAST(CAST(raw AS HUGEINT) * 1048576
                           // (SELECT MAX(raw) FROM a2r) AS BIGINT) AS a
               FROM a2r),
        h2r AS (SELECT src, CAST(SUM(a) AS BIGINT) AS raw
                FROM e JOIN a2 ON e.dst = a2.node GROUP BY 1),
        h2 AS (SELECT src AS node,
                      CAST(CAST(raw AS HUGEINT) * 1048576
                           // (SELECT MAX(raw) FROM h2r) AS BIGINT) AS h
               FROM h2r)
        SELECT 'auth' AS side, node, a AS score FROM a2
        UNION ALL
        SELECT 'hub' AS side, node, h AS score FROM h2"""))
  )
}
