package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Distributed.StageSyntax

/** Analytics core (SURVEY.md §2.2 A1–A13): the batch query engine the
  * reference's flattened table feeds (transform-service/main.py writes
  * into a warehouse table precisely so queries like these can run).
  *
  * Scale notes (100 TB contract, SURVEY.md §5):
  *  - dim joins (region/nation/supplier) are explicit `broadcast` —
  *    no shuffle of the fact side's join keys;
  *  - fact⋈fact joins shuffle on the join key once and aggregate
  *    partially map-side (Catalyst does both for declarative plans);
  *  - every filter/projection is declarative → parquet pushdown;
  *  - top-N is agg → TakeOrderedAndProject, never a full sort.
  */
object Analytics {

  val defs: Seq[QueryDef] = Seq(

    // A1 — filtered scan + projection; filter reaches parquet PushedFilters.
    QueryDef(
      "date_filter",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_quantity AS DOUBLE) AS quantity,
        |       CAST(l_extendedprice AS DOUBLE) AS price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-03-01'
        |  AND l_quantity >= 45""".stripMargin) { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-03-01").cast("timestamp")
          && col("l_quantity") >= 45)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("quantity"),
          col("l_extendedprice").cast("double").as("price"))
    },

    // A2 — multi-measure hash aggregation (TPC-H Q1 shape); exact decimal sums.
    QueryDef(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revenueSum(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          countAll.as("count_order"))
    },

    // A3 — star join: fact against broadcast dim chain supplier→nation→region.
    QueryDef(
      "join_star",
      """SELECT r_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) { (spark, dir) =>
      // region (5 rows) and nation (25) are constant-size dims —
      // always broadcastable. The pre-joined dim chain is sized by
      // SUPPLIER, which scales with SF, so the fact join carries no
      // explicit hint: AQE broadcasts it while it fits (the plan
      // PlanSpec asserts locally) and falls back to a keyed join when
      // a 100 TB supplier dim outgrows the threshold.
      val dims = Tables.supplier(spark, dir)
        .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("n_name"), col("r_name"))
      Tables.lineitem(spark, dir)
        .join(dims, col("l_suppkey") === col("s_suppkey"))
        .groupBy("r_name", "n_name")
        .agg(
          revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          countAll.as("n_items"))
    },

    // A4 — fact⋈fact shuffle join on the order key; AQE re-plans at runtime.
    QueryDef(
      "join_orders",
      """SELECT o_orderpriority,
        |       COUNT(DISTINCT o_orderkey) AS n_orders,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY o_orderpriority""".stripMargin) { (spark, dir) =>
      // pre-aggregate the fact per order key: the join then carries one
      // row per order (no Expand for the distinct count) and shuffles
      // |orders| rows instead of |lineitem|. Decimal sums keep the
      // two-level aggregation exactly equal to the oracle's flat one.
      val perOrder = Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(Dec) - dec(col("l_discount")))).as("rev"))
      Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
        .join(perOrder, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          countAll.as("n_orders"),
          sum(col("rev")).cast("double").as("revenue"))
    },

    // A5 — top-N by aggregate → TakeOrderedAndProject, tie-broken by key.
    QueryDef(
      "topn_revenue",
      """SELECT c_custkey, c_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
        |                * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders   ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 10""".stripMargin) { (spark, dir) =>
      // same pre-aggregation trick: lineitem collapses to one row per
      // order before touching orders/customer, so the widest shuffle
      // is |orders|, and the top-N is TakeOrderedAndProject on the
      // already-aggregated per-customer rows.
      val perOrder = Tables.lineitem(spark, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(BigDecimal(1)).cast(Dec) - dec(col("l_discount")))).as("rev"))
      Tables.orders(spark, dir)
        .join(perOrder, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("rev")).as("crev"))
        .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("crev").cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(10)
    },

    // A6 — window rank-per-group: top-3 parts per brand by price.
    // p_brand has ~25 values, so a single rank window would pull a
    // 25th of the part table through one reducer at scale. The salted
    // TWO-PHASE window (ann_bruteforce's pattern) is exact because
    // (p_retailprice desc, p_partkey) is a total order: any global
    // top-3 row is also top-3 within its (brand, partkey%64) salt
    // shard, so the pre-cut keeps every survivor while bounding each
    // reducer to its shard.
    QueryDef(
      "window_rank",
      """SELECT p_brand, p_name, p_partkey, CAST(p_retailprice AS DOUBLE) AS price,
        |       CAST(rn AS BIGINT) AS rn
        |FROM (SELECT p_brand, p_name, p_partkey, p_retailprice,
        |             ROW_NUMBER() OVER (PARTITION BY p_brand
        |                                ORDER BY p_retailprice DESC, p_partkey) AS rn
        |      FROM part) t
        |WHERE rn <= 3""".stripMargin) { (spark, dir) =>
      val wSalted = Window.partitionBy(col("p_brand"), pmod(col("p_partkey"), lit(64)))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(spark, dir)
        .withColumn("srn", row_number().over(wSalted))
        .filter(col("srn") <= 3)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("p_brand"), col("p_name"), col("p_partkey"),
          col("p_retailprice").cast("double").as("price"), col("rn").cast("long").as("rn"))
    },

    // A7 — running total per customer (exact decimal window sum).
    QueryDef(
      "window_running",
      """SELECT o_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey < 200""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(spark, dir)
        .filter(col("o_custkey") < 200)
        .select(
          col("o_custkey"), col("o_orderkey"),
          fmtDay(col("o_orderdate")).as("order_day"),
          sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_total"))
    },

    // A8 — anti join: customers with no recent order, by segment.
    QueryDef(
      "join_anti",
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1997-06-01')
        |GROUP BY c_mktsegment""".stripMargin) { (spark, dir) =>
      val recent = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-06-01").cast("timestamp"))
      Tables.customer(spark, dir)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(countAll.as("n_customers"))
    },

    // A8b — semi join: the EXISTS twin of join_anti. Spark plans a
    // LeftSemi that stops probing a key at its first match — the
    // orders side never duplicates customers.
    QueryDef(
      "join_semi",
      """SELECT c_mktsegment, COUNT(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey
        |                AND o_orderdate >= TIMESTAMP '1997-06-01')
        |GROUP BY c_mktsegment""".stripMargin) { (spark, dir) =>
      val recent = Tables.orders(spark, dir)
        .filter(col("o_orderdate") >= lit("1997-06-01").cast("timestamp"))
      Tables.customer(spark, dir)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(countAll.as("n_customers"))
    },

    // A9 — rollup with subtotal rows (null keys coalesced to 'ALL').
    QueryDef(
      "rollup_agg",
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (spark, dir) =>
      // pre-aggregate at the finest granularity FIRST: the rollup's
      // Expand then multiplies the handful of partial rows, not the
      // full fact (an Expand before aggregation costs #levels × the
      // scan volume at 100 TB). Decimal partials stay exact under
      // re-summation, so results are bit-identical.
      val base = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(dec(col("l_quantity"))).as("s"), countAll.as("cnt"))
      base.rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("s")).cast("double").as("sum_qty"), sum(col("cnt")).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
    },

    // A10 — exact distinct aggregation (expand + two-phase agg in Spark).
    QueryDef(
      "distinct_agg",
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_partkey) AS n_parts,
        |       COUNT(DISTINCT l_suppkey) AS n_supps,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (spark, dir) =>
      Tables.lineitem(spark, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countAll.as("n"))
    },

    // A11 — conditional aggregation (pivot-style wide counts per status).
    QueryDef(
      "pivot_status",
      """SELECT o_orderpriority,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (spark, dir) =>
      def flag(s: String) = sum(when(col("o_orderstatus") === s, 1).otherwise(0)).cast("long")
      Tables.orders(spark, dir)
        .groupBy("o_orderpriority")
        .agg(
          flag("F").as("n_f"), flag("O").as("n_o"), flag("P").as("n_p"),
          dsum(col("o_totalprice")).as("total"))
    },

    // A18 — CUBE: all grouping-set combinations with subtotal rows.
    QueryDef(
      "cube_agg",
      """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        |       COALESCE(o_orderstatus, 'ALL') AS status,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin) { (spark, dir) =>
      // finest-granularity pre-agg before the cube Expand (rollup_agg
      // rationale): 4 cube levels multiply ~15 partial rows, not orders
      val base = Tables.orders(spark, dir)
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(countAll.as("cnt"), sum(dec(col("o_totalprice"))).as("s"))
      base.cube("o_orderpriority", "o_orderstatus")
        .agg(sum(col("cnt")).as("n"), sum(col("s")).cast("double").as("total"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"), col("total"))
    },

    // A9b — explicit GROUPING SETS: arbitrary (non-hierarchical) set
    // list — the general form rollup/cube specialize. One Expand +
    // one shuffle, same as rollup.
    QueryDef(
      "grouping_sets",
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        |       COALESCE(l_linestatus, 'ALL') AS linestatus,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) {
      (spark, dir) =>
        // finest-granularity pre-agg covers every requested set, so
        // the Expand multiplies 6 partial rows instead of lineitem
        val base = Tables.lineitem(spark, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(countAll.as("cnt"), sum(dec(col("l_extendedprice"))).as("s"))
        base.groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("cnt")).as("n"), sum(col("s")).cast("double").as("total"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
            col("n"), col("total"))
    },

    // A7b — lag/lead window: per-user event-over-event value delta and
    // the previous event id. One shuffle on user_id, evaluated inside
    // the sorted partition.
    QueryDef(
      "window_delta",
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT event_id, user_id,
        |       COALESCE(lag(event_id) OVER w, -1) AS prev_event_id,
        |       floor((value - COALESCE(lag(value) OVER w, value)) * 1000000.0) / 1000000.0 AS delta
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) {
      (spark, dir) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .select(col("event_id"), col("user_id"),
            coalesce(lag(col("event_id"), 1).over(w), lit(-1L)).as("prev_event_id"),
            quant6(col("value") - coalesce(lag(col("value"), 1).over(w), col("value"))).as("delta"))
    },

    // A7c — time-RANGE moving aggregate: per-user trailing-1-hour
    // event count and decimal sum. A RANGE frame over event-time is
    // the batch twin of a sliding stream window; ordering on unix
    // micros keeps the frame arithmetic integer-exact and identical
    // cross-engine (an INTERVAL literal would mean the same bounds,
    // micros are just unambiguous). One shuffle on user_id, frames
    // evaluated in-partition.
    QueryDef(
      "events_moving",
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT event_id, user_id,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |       COUNT(*) OVER w AS n_1h,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin) {
      (spark, dir) =>
        val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, 0L)
        Tables.events(spark, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts"),
            countAll.over(w).as("n_1h"),
            sum(dec(col("value"))).over(w).cast("double").as("sum_1h"))
    },

    // A24 — anomaly detection: per-type z-scores from DETERMINISTIC
    // moments. stddev_samp is shuffle-order-dependent in floating
    // point (different engines, different answers at the ulp level);
    // exact decimal sums of value and value² are not, and the variance
    // algebra then runs in double with an identical expression tree on
    // both engines. The 5-row moment table broadcasts; scoring is a
    // per-row map over the scan.
    QueryDef(
      "events_zscore",
      """WITH m AS (SELECT event_type, COUNT(*) AS n,
        |                 CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s,
        |                 CAST(SUM(CAST(value * value AS DECIMAL(12,2))) AS DOUBLE) AS sq
        |          FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |       floor(((e.value - s/n) / sqrt((sq - s*s/n)/(n - 1))) * 1000000.0) / 1000000.0 AS zscore
        |FROM events e JOIN m ON m.event_type = e.event_type
        |WHERE ABS((e.value - s/n) / sqrt((sq - s*s/n)/(n - 1))) >= 3""".stripMargin) {
      (spark, dir) =>
        val events = Tables.events(spark, dir)
        val m = events.groupBy(col("event_type"))
          .agg(countAll.as("n"), dsum(col("value")).as("s"),
            sum(dec(col("value") * col("value"))).cast("double").as("sq"))
        val z = (col("value") - col("s") / col("n")) /
          sqrt((col("sq") - col("s") * col("s") / col("n")) / (col("n") - 1))
        events.join(broadcast(m), "event_type")
          .filter(abs(z) >= 3)
          .select(col("event_id"), col("event_type"), col("value"),
            quant6(z).as("zscore"))
    },

    // A43 — ratio-to-report (percent-of-total): each (day, type)
    // cell's share of its day and of the whole table — the BI
    // normalization every dashboard applies. The safe shape is
    // two-level: aggregate the corpus FIRST (one mergeable groupBy to
    // ≤ |days|·|types| rows), then run the share windows on the tiny
    // aggregate — the events_growth rule. Windowing the raw rows by
    // day (~30 corpus-sized partitions) or by () would be the
    // low-cardinality reducer hazard; windowing the aggregate is a
    // few hundred rows on one node by design. Shares divide exact
    // BIGINTs in one double op (same order both engines, quant6'd).
    QueryDef(
      "events_share",
      s"""WITH d AS (SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
         |                 event_type, COUNT(*) AS n
         |           FROM events GROUP BY 1, 2)
         |SELECT day, event_type, n,
         |       ${Quant6Sql("CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY day) AS DOUBLE)")} AS pct_of_day,
         |       ${Quant6Sql("CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)")} AS pct_of_total
         |FROM d""".stripMargin) { (spark, dir) =>
      val daily = Tables.events(spark, dir)
        .groupBy(fmtDay(col("ts")).as("day"), col("event_type"))
        .agg(countAll.as("n"))
      val wDay = Window.partitionBy(col("day"))
      val wAll = Window.partitionBy()
      daily
        .select(col("day"), col("event_type"), col("n"),
          quant6(col("n").cast("double")
            / sum(col("n")).over(wDay).cast("double")).as("pct_of_day"),
          quant6(col("n").cast("double")
            / sum(col("n")).over(wAll).cast("double")).as("pct_of_total"))
    },

    // A13 — time-bucketed aggregation over the event stream table.
    QueryDef(
      "events_hourly",
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      // shuffle on the 8-byte truncated timestamp; format after agg
      Tables.events(spark, dir)
        .groupBy(date_trunc("hour", col("ts")).as("ts_hour"), col("event_type"))
        .agg(countAll.as("n"), dsum(col("value")).as("total_value"))
        .select(fmtTs(col("ts_hour")).as("hour"), col("event_type"),
          col("n"), col("total_value"))
    },

    // A53 — ABC / Pareto classification: every sold part placed on
    // the cumulative revenue curve and classed A (first 80% of
    // revenue), B (to 95%), C (tail) — the inventory-policy cut
    // behind "20% of SKUs are 80% of revenue". The per-part revenue
    // aggregate is mergeable exact decimal; the DESC cumulative runs
    // on the prefix primitive over ONE synthetic group (a |parts|-
    // sized ranked aggregate is NOT the tiny-table case a plain
    // ORDER BY window covers — millions of SKUs at warehouse scale
    // would serialize through one reducer). Class boundaries are
    // RATIONAL comparisons of exact decimals (100·cum ≤ 80·total —
    // no double accumulates, so the A/B cut cannot drift between
    // engines); only the reported share takes one double division.
    // Descending order rides an exact decimal negation (the range
    // sort is ASC-only by contract); (rev, partkey) is a total order.
    QueryDef(
      "pareto_class",
      s"""WITH r AS (SELECT l_partkey AS partkey,
         |                  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
         |           FROM lineitem GROUP BY 1),
         |t AS (SELECT SUM(rev) AS tot FROM r),
         |c AS (SELECT partkey, rev,
         |             SUM(rev) OVER (ORDER BY rev DESC, partkey
         |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM r)
         |SELECT c.partkey, CAST(c.rev AS DOUBLE) AS revenue,
         |       ${Quant6Sql("CAST(c.cum AS DOUBLE) / CAST(t.tot AS DOUBLE)")} AS cum_share,
         |       CASE WHEN 100 * c.cum <= 80 * t.tot THEN 'A'
         |            WHEN 100 * c.cum <= 95 * t.tot THEN 'B'
         |            ELSE 'C' END AS abc_class
         |FROM c, t""".stripMargin) { (spark, dir) =>
      // localCheckpoint, not persist: the two prefix-primitive branches
      // must canonicalize to the SAME subtree for exchange reuse, and
      // two InMemoryTableScans of a persisted relation do not — a
      // checkpointed RDD is one node both branches reference
      val rev = Tables.lineitem(spark, dir)
        .groupBy(col("l_partkey").as("partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
        .stage()
      val tot = rev.agg(sum(col("rev")).as("tot"))
      val d = rev.select(lit("all").as("g"), (-col("rev")).as("negrev"),
        col("partkey"), col("rev"))
      Distributed.globalRunning(d, grp = Seq("g"),
          ord = Seq("negrev", "partkey"), valueCol = Some("rev"))
        .crossJoin(broadcast(tot))
        .select(col("partkey"), col("rev").cast("double").as("revenue"),
          quant6(col("g_run").cast("double") / col("tot").cast("double")).as("cum_share"),
          when(lit(100) * col("g_run") <= lit(80) * col("tot"), "A")
            .when(lit(100) * col("g_run") <= lit(95) * col("tot"), "B")
            .otherwise("C").as("abc_class"))
    },

    // A71 — mix-shift decomposition of a metric movement (the
    // Oaxaca–Blinder / "why did the number move" analysis): average
    // order value changed between the two halves of the window —
    // how much of Δ came from each customer segment's SHARE moving
    // (mix), its own mean moving (rate), and the cross term?
    // Per-segment contributions: mix = (w₂−w₁)·m₁, rate = w₁·(m₂−m₁),
    // inter = (w₂−w₁)·(m₂−m₁); they sum EXACTLY to ΔAOV by algebra,
    // and the spec asserts that conservation. All inputs are exact
    // (BIGINT counts, decimal sums); shares/means are single double
    // divisions in one fixed op order (the stats_corr rule). The
    // orders⋈customer key join is AQE-decided; everything after is a
    // ≤2·|segments| mergeable aggregate pivoted by conditional sums.
    QueryDef(
      "metric_decomposition",
      """WITH o AS (SELECT c.c_mktsegment AS seg,
        |                  epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS us,
        |                  CAST(o.o_totalprice AS DECIMAL(12,2)) AS tp
        |           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |b AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM o),
        |h AS (SELECT seg, CASE WHEN us < mid THEN 1 ELSE 2 END AS half, tp FROM o, b),
        |g AS (SELECT seg,
        |             CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |             SUM(CASE WHEN half = 1 THEN tp END) AS s1,
        |             CAST(SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |             SUM(CASE WHEN half = 2 THEN tp END) AS s2
        |      FROM h GROUP BY seg),
        |t AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2 FROM g),
        |w AS (SELECT seg,
        |             CAST(n1 AS DOUBLE) / nullif(CAST(t.t1 AS DOUBLE), 0.0) AS w1,
        |             CAST(s1 AS DOUBLE) / nullif(CAST(n1 AS DOUBLE), 0.0) AS m1,
        |             CAST(n2 AS DOUBLE) / nullif(CAST(t.t2 AS DOUBLE), 0.0) AS w2,
        |             CAST(s2 AS DOUBLE) / nullif(CAST(n2 AS DOUBLE), 0.0) AS m2
        |      FROM g, t)
        |SELECT seg AS segment,
        |       floor((w2 - w1) * m1 * 1000000.0) / 1000000.0 AS mix_effect,
        |       floor(w1 * (m2 - m1) * 1000000.0) / 1000000.0 AS rate_effect,
        |       floor((w2 - w1) * (m2 - m1) * 1000000.0) / 1000000.0 AS interaction
        |FROM w""".stripMargin) { (spark, dir) =>
      val o = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment").as("seg"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
          dec(col("o_totalprice")).as("tp"))
      val b = o.agg(expr("(MIN(us) + MAX(us)) div 2").as("mid"))
      val g = o.crossJoin(broadcast(b))
        .select(col("seg"), when(col("us") < col("mid"), 1).otherwise(2).as("half"),
          col("tp"))
        .groupBy(col("seg"))
        .agg(sum(when(col("half") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("half") === 1, col("tp"))).as("s1"),
          sum(when(col("half") === 2, 1L).otherwise(0L)).as("n2"),
          sum(when(col("half") === 2, col("tp"))).as("s2"))
      val t = g.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
      // nullif-guard every count denominator (the ab_test/events_trend
      // convention): a segment absent from one half has n=0, and an
      // unguarded 0-division is NaN/Infinity in Spark vs NULL in DuckDB
      def nz(c: org.apache.spark.sql.Column) = when(c =!= 0.0d, c)
      val w1 = col("n1").cast("double") / nz(col("t1").cast("double"))
      val m1 = col("s1").cast("double") / nz(col("n1").cast("double"))
      val w2 = col("n2").cast("double") / nz(col("t2").cast("double"))
      val m2 = col("s2").cast("double") / nz(col("n2").cast("double"))
      g.crossJoin(broadcast(t))
        .select(col("seg").as("segment"),
          quant6((w2 - w1) * m1).as("mix_effect"),
          quant6(w1 * (m2 - m1)).as("rate_effect"),
          quant6((w2 - w1) * (m2 - m1)).as("interaction"))
    },

    // A68 — day-of-week seasonality index: per-weekday average order
    // revenue as a ratio to the overall average — the demand-shape
    // profile capacity planning reads. Day-of-week is pure INTEGER
    // epoch arithmetic ((epoch_day + 3) mod 7, 0 = Monday — the
    // events_chisq rule: no engine calendar in the hash path), the
    // index is the rational rearrangement (sum_dow · n_total) /
    // (n_dow · sum_total) over exact decimal/bigint products with ONE
    // double division, and the whole query is one mergeable 7-row
    // aggregate plus a broadcast 1-row total.
    QueryDef(
      "dow_seasonality",
      """WITH o AS (SELECT (epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 + 3) % 7 AS dow,
        |                  CAST(o_totalprice AS DECIMAL(12,2)) AS tp
        |           FROM orders),
        |g AS (SELECT dow, CAST(COUNT(*) AS BIGINT) AS n, SUM(tp) AS s FROM o GROUP BY dow),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, SUM(s) AS st FROM g)
        |SELECT CAST(g.dow AS BIGINT) AS dow, g.n AS n_orders,
        |       CAST(g.s AS DOUBLE) AS revenue,
        |       floor(CAST(g.s * t.nt AS DOUBLE) / CAST(g.n * t.st AS DOUBLE)
        |             * 1000000.0) / 1000000.0 AS seasonal_index
        |FROM g, t""".stripMargin) { (spark, dir) =>
      val g = Tables.orders(spark, dir)
        .select(
          expr("(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000 + 3) % 7")
            .as("dow"),
          dec(col("o_totalprice")).as("tp"))
        .groupBy(col("dow"))
        .agg(countAll.as("n"), sum(col("tp")).as("s"))
      val t = g.agg(sum(col("n")).as("nt"), sum(col("s")).as("st"))
      g.crossJoin(broadcast(t))
        .select(col("dow"), col("n").as("n_orders"),
          col("s").cast("double").as("revenue"),
          quant6((col("s") * col("nt")).cast("double")
            / (col("n") * col("st")).cast("double")).as("seasonal_index"))
    })
}
