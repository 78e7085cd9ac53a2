package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Remaining analytics families (SURVEY.md §2.2): exact interpolated
  * quantiles (A15), set operations INTERSECT/EXCEPT (A16), and the
  * exact mode (A63). All sort-free on the Spark side beyond what the
  * semantics require: percentile is a per-group aggregate (no global
  * sort), the set ops are hash-based distinct joins, and the mode is
  * a two-level bounded aggregate.
  */
object SetQuantile {

  val defs: Seq[QueryDef] = Seq(

    // A63 — exact MODE with a deterministic tie-break: the most
    // common order priority per market segment. The count matrix is
    // ≤ |segments|·|priorities| rows (mergeable partials cap each
    // task's output at the matrix size — the events_histogram rule),
    // the per-segment max is a second tiny aggregate, and the winner
    // is selected by an equi-join on (segment, max-count) + MIN(prio)
    // — ties resolve to the lexicographically smallest priority in
    // BOTH engines, so the output is total-order deterministic where
    // a bare mode()/max_by() would be engine-dependent. The
    // orders⋈customer key join is left to AQE (customer is
    // corpus-shaped, not a provably bounded dim — the §5 rule).
    QueryDef(
      "mode_agg",
      """WITH c AS (SELECT c.c_mktsegment AS segment, o.o_orderpriority AS prio,
        |                  CAST(COUNT(*) AS BIGINT) AS n
        |           FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |           GROUP BY 1, 2),
        |m AS (SELECT segment, MAX(n) AS mx FROM c GROUP BY segment)
        |SELECT c.segment, MIN(c.prio) AS mode_priority, m.mx AS n_orders
        |FROM c JOIN m ON m.segment = c.segment AND c.n = m.mx
        |GROUP BY c.segment, m.mx""".stripMargin) { (spark, dir) =>
      val counts = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment").as("segment"), col("o_orderpriority").as("prio"))
        .agg(countAll.as("n"))
      val mx = counts.groupBy(col("segment")).agg(max(col("n")).as("mx"))
      counts.join(broadcast(mx), Seq("segment"))
        .filter(col("n") === col("mx"))
        .groupBy(col("segment"), col("mx"))
        .agg(min(col("prio")).as("mode_priority"))
        .select(col("segment"), col("mode_priority"), col("mx").as("n_orders"))
    },

    // A15b — grouped exact quantiles at a HIGH-CARDINALITY key: per
    // user, exact median (interpolated) + nearest-rank p90 over the
    // user's own readings. This is the cardinality regime where
    // per-group buffering is CORRECT: the collected array is one
    // user's history (the same bound sessionize's window carries),
    // there are ~|users| groups spread across reducers, and the sort
    // is in-group. Contrast events_quantiles (A15), where ~5
    // corpus-sized groups force the range-sharded prefix primitive —
    // the pair documents WHERE the line sits. Median of an even count
    // is (a+b)/2.0 — one IEEE add + an exact halving, same op order
    // in both engines; p90 is nearest-rank ceil(0.9·n) (a real data
    // value, the winsor rule), so no interpolation drift anywhere.
    QueryDef(
      "user_quantiles",
      """WITH l AS (SELECT user_id, COUNT(*) AS n, list_sort(list(value)) AS vs
        |           FROM events WHERE value IS NOT NULL GROUP BY user_id)
        |SELECT user_id, n,
        |       CASE WHEN n % 2 = 1 THEN vs[CAST((n + 1) // 2 AS BIGINT)]
        |            ELSE (vs[CAST(n // 2 AS BIGINT)] + vs[CAST(n // 2 + 1 AS BIGINT)]) / 2.0
        |       END AS med,
        |       vs[CAST(ceil(0.9 * CAST(n AS DOUBLE)) AS BIGINT)] AS p90
        |FROM l""".stripMargin) { (spark, dir) =>
      Tables.events(spark, dir)
        .filter(col("value").isNotNull)
        .groupBy(col("user_id"))
        .agg(countAll.as("n"), sort_array(collect_list(col("value"))).as("vs"))
        .select(col("user_id"), col("n"),
          when(col("n") % 2 === 1,
            element_at(col("vs"), expr("(n + 1) div 2").cast("int")))
            .otherwise((element_at(col("vs"), expr("n div 2").cast("int"))
              + element_at(col("vs"), expr("n div 2 + 1").cast("int"))) / lit(2.0))
            .as("med"),
          element_at(col("vs"),
            ceil(lit(0.9) * col("n").cast("double")).cast("int")).as("p90"))
    },

    // A15 — exact interpolated quantiles per group (linear interp,
    // the same definition as DuckDB's quantile_cont / Spark's
    // percentile()). NOT computed with percentile(): that aggregate is
    // an ObjectHashAggregate that materializes EVERY value of a group
    // in one task's memory — with ~5 event_type groups that is N/5
    // doubles in one reducer at 100 TB. Instead: rank-based selection
    // over a distributed range sort (Distributed.globalRunning), where
    // only the 4 bracketing ranks per group are kept and interpolated —
    // every stage shuffle-parallel, memory O(shard), same semantics.
    QueryDef(
      "events_quantiles",
      """SELECT event_type,
        |       floor(quantile_cont(value, 0.5) * 1000000.0) / 1000000.0 AS p50,
        |       floor(quantile_cont(value, 0.9) * 1000000.0) / 1000000.0 AS p90,
        |       COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (spark, dir) =>
      // rank-based selection + the engines' shared interpolation op
      // order live in Distributed.groupedQuantiles (pos = p·(n−1),
      // bracketing 1-based ranks, (hi−pos)·vLo + (pos−lo)·vHi — so
      // quant6 can't straddle a floor boundary); g_n rides the same
      // per-shard summary, no second events scan
      val ev = Tables.events(spark, dir).select(col("event_type"), col("value"))
      Distributed.groupedQuantiles(ev, "event_type", "value",
          Seq("p50v" -> 0.5, "p90v" -> 0.9))
        .select(col("event_type"),
          quant6(col("p50v")).as("p50"), quant6(col("p90v")).as("p90"), col("n"))
    },

    // A51 — inter-arrival gap distribution: per event_type, the exact
    // median/p90 of the SECONDS between a user's consecutive events of
    // that type — the latency/cadence profile monitoring reads before
    // picking session gaps, watermarks, or SLA thresholds (sessionize's
    // 30-min gap is exactly a number this query justifies). Gaps are
    // computed in-partition after ONE (user, type) shuffle (lag over
    // the high-cardinality key, the window_delta shape) as INTEGER
    // epoch-second differences (truncating div — no engine calendar,
    // no double subtraction); the ~5 corpus-sized gap groups then go
    // through the SAME rank-based selection as events_quantiles (the
    // range-sharded prefix primitive — never a 5-key window or a
    // group-buffering percentile() over row data). Interpolation casts
    // the two bracketing BIGINT gaps to double in the engines' shared
    // op order.
    QueryDef(
      "events_interarrival",
      s"""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
         |g AS (SELECT event_type,
         |             (epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id, event_type
         |                                                    ORDER BY ts, event_id))) // 1000000 AS gap
         |      FROM e)
         |SELECT event_type, COUNT(*) AS n_gaps,
         |       ${Quant6Sql("quantile_cont(gap, 0.5)")} AS p50_s,
         |       ${Quant6Sql("quantile_cont(gap, 0.9)")} AS p90_s
         |FROM g WHERE gap IS NOT NULL GROUP BY event_type""".stripMargin) { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("gap", expr("(unix_micros(ts) - unix_micros(prev)) div 1000000"))
        .filter(col("gap").isNotNull)
        .select(col("event_type"), col("gap"))
      Distributed.groupedQuantiles(gaps, "event_type", "gap",
          Seq("p50v" -> 0.5, "p90v" -> 0.9))
        .select(col("event_type"), col("n").as("n_gaps"),
          quant6(col("p50v")).as("p50_s"), quant6(col("p90v")).as("p90_s"))
    },

    // A54 — WEIGHTED median: per brand, the price level at which half
    // the shipped QUANTITY transacts (volume-weighted median price) —
    // the robust "typical price" a plain median gets wrong when cheap
    // lines ship big quantities. No interpolation anywhere: the
    // answer is the smallest price whose inclusive cumulative weight
    // crosses half the total, an INTEGER-arithmetic condition
    // (2·cum ≥ W over BIGINT quantities — no FP boundary, and ties in
    // price cannot change the selected value because the crossing
    // price is unique). The per-brand cumulative weight is the prefix
    // primitive (brand is ~25 keys — the low-cardinality-window
    // case); totals come from a ≤|brands|-row mergeable aggregate,
    // broadcast back; the selection is min(price) over the crossed
    // region — a map-side partial, no second sort.
    QueryDef(
      "weighted_median",
      """WITH li AS (SELECT p.p_brand AS brand, l.l_extendedprice AS price,
        |                   CAST(l.l_quantity AS BIGINT) AS qty,
        |                   l.l_orderkey AS o, l.l_linenumber AS ln
        |            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |c AS (SELECT brand, price, qty,
        |             SUM(qty) OVER (PARTITION BY brand ORDER BY price, o, ln
        |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM li),
        |t AS (SELECT brand, CAST(SUM(qty) AS BIGINT) AS w, COUNT(*) AS n
        |      FROM li GROUP BY brand)
        |SELECT c.brand, MIN(t.w) AS total_qty, MIN(t.n) AS n_rows,
        |       MIN(c.price) AS wmedian_price
        |FROM c JOIN t ON t.brand = c.brand
        |WHERE 2 * c.cum >= t.w
        |GROUP BY c.brand""".stripMargin) { (spark, dir) =>
      val li = Tables.lineitem(spark, dir)
        .join(Tables.part(spark, dir), col("p_partkey") === col("l_partkey"))
        .select(col("p_brand").as("brand"), col("l_extendedprice").as("price"),
          col("l_quantity").cast("long").as("qty"),
          col("l_orderkey").as("o"), col("l_linenumber").as("ln"))
      val totals = li.groupBy(col("brand"))
        .agg(sum(col("qty")).as("w"), countAll.as("n"))
      val ranked = Distributed.globalRunning(li,
        grp = Seq("brand"), ord = Seq("price", "o", "ln"), valueCol = Some("qty"))
      ranked.join(broadcast(totals), "brand")
        .filter(lit(2L) * col("g_run") >= col("w"))
        .groupBy(col("brand"))
        .agg(min(col("w")).as("total_qty"), min(col("n")).as("n_rows"),
          min(col("price")).as("wmedian_price"))
    },

    // A16 — set operations over customer activity years. Year filters
    // are HALF-OPEN TIMESTAMP RANGES, not year(): wrapping the column
    // in a function defeats parquet predicate pushdown, so every
    // variant would scan all of orders (PlanSpec asserts PushedFilters).
    QueryDef(
      "set_ops",
      """SELECT
        |  (SELECT COUNT(DISTINCT o_custkey) FROM orders
        |   WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01') AS n_1997,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders
        |                         WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |                         INTERSECT
        |                         SELECT DISTINCT o_custkey FROM orders
        |                         WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01') t) AS n_both,
        |  (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders
        |                         WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |                         EXCEPT
        |                         SELECT DISTINCT o_custkey FROM orders
        |                         WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01') t) AS n_churned""".stripMargin) {
      (spark, dir) =>
        val o = Tables.orders(spark, dir)
        def custsIn(y: Int) = o.filter(
          col("o_orderdate") >= lit(s"$y-01-01").cast("timestamp")
            && col("o_orderdate") < lit(s"${y + 1}-01-01").cast("timestamp"))
          .select(col("o_custkey")).distinct()
        val c97 = custsIn(1997)
        val c98 = custsIn(1998)
        val n97 = c97.agg(count(lit(1)).as("n_1997"))
        val nBoth = c97.intersect(c98).agg(count(lit(1)).as("n_both"))
        val nChurned = c97.except(c98).agg(count(lit(1)).as("n_churned"))
        n97.crossJoin(nBoth).crossJoin(nChurned)
    })
}
