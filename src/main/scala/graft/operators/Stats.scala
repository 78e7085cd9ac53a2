package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical analytics (SURVEY.md §2.2 A25–A27): exact-moment
  * correlation, equi-width histograms, and global quantile binning.
  *
  * The profiling/quality layer of a 100 TB pipeline asks three
  * distribution questions the engine didn't answer yet: "how do two
  * measures co-vary?" (corr/covar), "what does the value distribution
  * look like?" (histogram), and "which decile is this row in?"
  * (ntile). Each is built on a primitive that already carries the
  * scale argument:
  *
  *  - corr/covar/stddev from EXACT decimal power sums (n, Σx, Σy,
  *    Σx², Σy², Σxy) — one map-side-partial aggregation pass, then
  *    scalar double arithmetic. `corr()`/`stddev_samp()` built-ins
  *    stream doubles and drift by partial-agg order (the same reason
  *    Portable.dsum exists); the decimal-sum form is
  *    order-independent, so the result is reproducible run-to-run AND
  *    bit-identical to the oracle evaluating the same formula.
  *  - histogram bins from broadcast global bounds — the bounds
  *    aggregate is one tiny all-reduce row, the binning pass is a
  *    scan-speed map, and the final count groupBy has ≤ nBins keys
  *    with map-side partials (each task emits ≤ nBins rows).
  *  - ntile via `Distributed.globalRunning` — decile assignment needs
  *    each row's global rank within its event_type; a plain
  *    `Window.partitionBy(event_type)` funnels the corpus through ~5
  *    reducers, the range-sharded primitive does not.
  */
object Stats {

  val defs: Seq[QueryDef] = Seq(

    // A25 — correlation / covariance / stddev between quantity and
    // price per return flag, from exact power sums. NOT corr():
    // Spark's streaming double moments are partial-agg-order-dependent
    // (nondeterministic across runs at scale) and drift from DuckDB's
    // by ulps. Instead ONE hash-agg pass collects {n, Σx, Σy, Σx²,
    // Σy², Σxy} in DECIMAL (exact, order-independent — a 2dp decimal
    // times a 2dp decimal is a 4dp decimal, still exact), and the
    // closed-form moments are evaluated in double with the oracle's
    // exact operation order. Shuffle: 3 group keys × 6 partial sums.
    QueryDef(
      "stats_corr",
      s"""WITH s AS (
         |  SELECT l_returnflag,
         |         COUNT(*) AS n,
         |         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
         |         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
         |         SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
         |         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy,
         |         SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
         |  FROM lineitem GROUP BY l_returnflag),
         |d AS (
         |  SELECT l_returnflag, n,
         |         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
         |         CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy, CAST(sxy AS DOUBLE) AS sxy
         |  FROM s)
         |SELECT l_returnflag, n,
         |       ${Quant6Sql("(nd * sxy - sx * sy) / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))")} AS corr_qty_price,
         |       ${Quant6Sql("(sxy - sx * sy / nd) / (nd - 1.0)")} AS covar_qty_price,
         |       ${Quant6Sql("sqrt((sxx - sx * sx / nd) / (nd - 1.0))")} AS stddev_qty,
         |       ${Quant6Sql("sqrt((syy - sy * sy / nd) / (nd - 1.0))")} AS stddev_price
         |FROM d ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      val x = dec(col("l_quantity"))
      val y = dec(col("l_extendedprice"))
      val s = Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countAll.as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"),
          sum(x * y).as("sxy"))
      val nd = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      val (sx, sy, sxx, syy, sxy) = (d("sx"), d("sy"), d("sxx"), d("syy"), d("sxy"))
      s.select(
        col("l_returnflag"), col("n"),
        quant6((nd * sxy - sx * sy)
          / sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy))).as("corr_qty_price"),
        quant6((sxy - sx * sy / nd) / (nd - lit(1.0))).as("covar_qty_price"),
        quant6(sqrt((sxx - sx * sx / nd) / (nd - lit(1.0)))).as("stddev_qty"),
        quant6(sqrt((syy - sy * sy / nd) / (nd - lit(1.0)))).as("stddev_price"))
    },

    // A26 — equi-width histogram of events.value: 20 bins over the
    // global [min, max]. Pass 1 reduces to ONE bounds row (map-side
    // partial min/max), broadcast back; pass 2 assigns bins at scan
    // speed and counts with ≤ 20 group keys (partial agg caps each
    // task's output at 20 rows — a low-cardinality groupBy is safe
    // exactly when the aggregate is mergeable and pre-reduced, unlike
    // the low-cardinality WINDOWS Distributed.globalRunning replaces).
    // Bin arithmetic is pure double with identical operation order in
    // both engines; the top edge closes into the last bin (least).
    // Assumes max > min (degenerate single-valued corpora would put
    // 0/0 = NaN in the bin expression — not a histogram anyone asks for).
    QueryDef(
      "events_histogram",
      s"""WITH e AS (SELECT value FROM events WHERE value IS NOT NULL),
         |b AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM e),
         |w AS (SELECT lo, hi, (hi - lo) / 20.0 AS width FROM b),
         |binned AS (
         |  SELECT CAST(LEAST(FLOOR((value - lo) / width), 19) AS BIGINT) AS bin, lo, width
         |  FROM e, w)
         |SELECT bin,
         |       ${Quant6Sql("lo + CAST(bin AS DOUBLE) * width")} AS bin_lo,
         |       ${Quant6Sql("lo + (CAST(bin AS DOUBLE) + 1.0) * width")} AS bin_hi,
         |       COUNT(*) AS n
         |FROM binned GROUP BY bin, lo, width ORDER BY bin""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .filter(col("value").isNotNull).select(col("value"))
      val b = e.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        .withColumn("width", (col("hi") - col("lo")) / lit(20.0))
        .select(col("lo"), col("width"))
      e.crossJoin(broadcast(b))
        .withColumn("bin",
          least(floor((col("value") - col("lo")) / col("width")), lit(19L)).cast("long"))
        .groupBy(col("bin"), col("lo"), col("width"))
        .agg(countAll.as("n"))
        .select(
          col("bin"),
          quant6(col("lo") + col("bin").cast("double") * col("width")).as("bin_lo"),
          quant6(col("lo") + (col("bin").cast("double") + lit(1.0)) * col("width")).as("bin_hi"),
          col("n"))
    },

    // A27 — global decile binning (NTILE) per event_type, oracled
    // against DuckDB's NATIVE ntile(10) window. The rank comes from
    // Distributed.globalRunning (range-sharded — no ~5-key window of
    // row data anywhere in the plan); the bucket is then pure integer
    // arithmetic on (g_rank, g_n): the first r = n mod 10 buckets take
    // q+1 = n div 10 + 1 rows, the rest take q. The (value, event_id)
    // order key makes the tie-break total, so bucket assignment is
    // deterministic in both engines. Output is the per-decile summary
    // (count + value range) — the shape a quality dashboard reads.
    QueryDef(
      "events_ntile",
      """WITH e AS (SELECT event_type, value, event_id FROM events WHERE value IS NOT NULL),
        |t AS (SELECT event_type, value,
        |             ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS decile
        |      FROM e)
        |SELECT event_type, decile, COUNT(*) AS n_rows,
        |       MIN(value) AS lo_value, MAX(value) AS hi_value
        |FROM t GROUP BY event_type, decile ORDER BY event_type, decile""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"), col("event_id"))
      val ranked = Distributed.globalRunning(e, Seq("event_type"), Seq("value", "event_id"))
      // NTILE(10) from (g_rank, g_n) in pure LONG arithmetic (`div`,
      // not `/` — double division would drift past 2^53 rows): the
      // first r = n mod 10 buckets take q+1 = n div 10 + 1 rows, the
      // rest take q ("larger groups first", the SQL ntile rule;
      // ceil(a/b) = (a + b - 1) div b). The else-branch divides by q,
      // but q = 0 implies n < 10, which puts every rank in the
      // then-branch — the division never sees zero.
      val decile = Distributed.ntileFromRank(10)
      ranked
        .withColumn("decile", decile)
        .groupBy(col("event_type"), col("decile"))
        .agg(countAll.as("n_rows"),
          min(col("value")).as("lo_value"), max(col("value")).as("hi_value"))
    },

    // A49 — lag-1 autocorrelation of the daily event series per type:
    // "is today's volume predicted by yesterday's?" — the first
    // question time-series monitoring asks. Two-level like
    // events_share: ONE mergeable groupBy collapses events to the
    // ≤ |days|·|types| daily-count table, the lead() pairing window
    // runs on that tiny aggregate (the events_growth rule), and the
    // correlation comes from EXACT power sums in DECIMAL(18,0) —
    // counts are integers, but Σx² of BIGINTs would overflow int64
    // near 1e12-event days while Spark wraps silently and DuckDB
    // widens to int128 (an engine divergence); decimal sums are exact
    // and identical in both. Closed form evaluated in double with the
    // stats_corr op order. Pairs are SERIES-adjacent (consecutive
    // present days) — gap semantics ride the data, not a calendar.
    QueryDef(
      "events_autocorr",
      s"""WITH d AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         |                  COUNT(*) AS c
         |           FROM events GROUP BY 1, 2),
         |p AS (SELECT event_type, c AS x,
         |             lead(c) OVER (PARTITION BY event_type ORDER BY day) AS y
         |      FROM d),
         |s AS (SELECT event_type, COUNT(*) AS n,
         |             SUM(CAST(x AS DECIMAL(18,0))) AS sx,
         |             SUM(CAST(y AS DECIMAL(18,0))) AS sy,
         |             SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS sxx,
         |             SUM(CAST(y AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS syy,
         |             SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS sxy
         |      FROM p WHERE y IS NOT NULL GROUP BY event_type),
         |t AS (SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
         |             CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
         |             CAST(sxx AS DOUBLE) AS sxx, CAST(syy AS DOUBLE) AS syy,
         |             CAST(sxy AS DOUBLE) AS sxy
         |      FROM s)
         |SELECT event_type, n AS n_pairs,
         |       ${Quant6Sql("(nd * sxy - sx * sy) / sqrt(nullif((nd * sxx - sx * sx) * (nd * syy - sy * sy), 0))")} AS autocorr
         |FROM t WHERE n >= 2""".stripMargin) { (spark, dir) =>
      val d0 = expr("CAST(x AS DECIMAL(18,0))")
      val d1 = expr("CAST(y AS DECIMAL(18,0))")
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val s = Tables.events(spark, dir)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(countAll.as("c"))
        .select(col("event_type"), col("day"), col("c").as("x"))
        .withColumn("y", lead(col("x"), 1).over(w))
        .filter(col("y").isNotNull)
        .groupBy(col("event_type"))
        .agg(countAll.as("n"),
          sum(d0).as("sx"), sum(d1).as("sy"),
          sum(d0 * d0).as("sxx"), sum(d1 * d1).as("syy"),
          sum(d0 * d1).as("sxy"))
      val nd = col("n").cast("double")
      def dd(c: String) = col(c).cast("double")
      // Degenerate-series guard (both engines, same shape): a type with
      // one pair or a constant series has zero variance product —
      // nullif turns the 0/0 into NULL, which hashes identically in
      // Spark and DuckDB where NaN would not.
      val vp = (nd * dd("sxx") - dd("sx") * dd("sx")) *
        (nd * dd("syy") - dd("sy") * dd("sy"))
      s.filter(col("n") >= 2)
        .select(col("event_type"), col("n").as("n_pairs"),
          quant6((nd * dd("sxy") - dd("sx") * dd("sy"))
            / sqrt(nullif(vp, lit(0.0)))).as("autocorr"))
    },

    // A46 — chi-squared independence test (event_type × day-of-week):
    // the categorical counterpart of A25's continuous moments. Counts,
    // marginals and N are exact integers from mergeable aggregates
    // over the ≤ r·c cell grid (the FULL grid — absent cells enter
    // with o = 0, contributing e — via a bounded r×c cross join of
    // the two marginal tables, the events_histogram bounded-broadcast
    // shape). The χ² reduction Σ (o−e)²/e is a sum of DOUBLES, which
    // GROUP BY would add in nondeterministic partial order (the
    // Portable.dsum hazard with no decimal escape since e is a
    // ratio); instead the ≤35 cells fold LEFT in a fixed (type, dow)
    // sort — Spark `aggregate` over sort_array ≙ DuckDB list_reduce
    // over list(ORDER BY), the events_ewma rule — so every add runs
    // in the same order in both engines and the statistic is
    // bit-identical before the final quant6. Day-of-week is pure
    // integer epoch arithmetic ((eday+4) mod 7), no engine calendar
    // function. dof = (r−1)(c−1).
    QueryDef(
      "events_chisq",
      s"""WITH e AS (SELECT event_type,
         |                  (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7 AS dow
         |           FROM events),
         |o AS (SELECT event_type, dow, COUNT(*) AS o FROM e GROUP BY 1, 2),
         |r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS ri FROM o GROUP BY 1),
         |c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS cj FROM o GROUP BY 1),
         |grid AS (SELECT r.event_type, c.dow, r.ri, c.cj,
         |                CAST(COALESCE(o.o, 0) AS BIGINT) AS o
         |         FROM r CROSS JOIN c
         |         LEFT JOIN o ON o.event_type = r.event_type AND o.dow = c.dow),
         |n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM o),
         |f AS (SELECT list(struct_pack(et := event_type, dow := dow, o := o,
         |                              ri := ri, cj := cj)
         |                  ORDER BY event_type, dow) AS cs,
         |             COUNT(DISTINCT event_type) AS nr, COUNT(DISTINCT dow) AS nc
         |      FROM grid)
         |SELECT n.n,
         |       CAST((f.nr - 1) * (f.nc - 1) AS BIGINT) AS dof,
         |       ${Quant6Sql(
               """list_reduce(
                 |  list_transform(f.cs, x ->
                 |    (CAST(x.o AS DOUBLE) - CAST(x.ri AS DOUBLE) * CAST(x.cj AS DOUBLE) / CAST(n.n AS DOUBLE))
                 |    * (CAST(x.o AS DOUBLE) - CAST(x.ri AS DOUBLE) * CAST(x.cj AS DOUBLE) / CAST(n.n AS DOUBLE))
                 |    / (CAST(x.ri AS DOUBLE) * CAST(x.cj AS DOUBLE) / CAST(n.n AS DOUBLE))),
                 |  (a, b) -> a + b)""".stripMargin)} AS chi2
         |FROM f, n""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .select(col("event_type"),
          expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"))
      val o = e.groupBy(col("event_type"), col("dow")).agg(countAll.as("o"))
      val r = o.groupBy(col("event_type")).agg(sum(col("o")).as("ri"))
      val c = o.groupBy(col("dow")).agg(sum(col("o")).as("cj"))
      val grid = r.crossJoin(broadcast(c))
        .join(o, Seq("event_type", "dow"), "left")
        .select(col("event_type"), col("dow"), col("ri"), col("cj"),
          coalesce(col("o"), lit(0L)).as("o"))
      grid.agg(
        sort_array(collect_list(struct(col("event_type").as("et"), col("dow"),
          col("o"), col("ri"), col("cj")))).as("cs"),
        sum(col("o")).as("n"),
        countDistinct(col("event_type")).as("nr"),
        countDistinct(col("dow")).as("nc"))
        .select(
          col("n").cast("long").as("n"),
          ((col("nr") - 1) * (col("nc") - 1)).cast("long").as("dof"),
          quant6(expr(
            """aggregate(
              |  transform(cs, x ->
              |    (CAST(x.o AS DOUBLE) - CAST(x.ri AS DOUBLE) * CAST(x.cj AS DOUBLE) / CAST(n AS DOUBLE))
              |    * (CAST(x.o AS DOUBLE) - CAST(x.ri AS DOUBLE) * CAST(x.cj AS DOUBLE) / CAST(n AS DOUBLE))
              |    / (CAST(x.ri AS DOUBLE) * CAST(x.cj AS DOUBLE) / CAST(n AS DOUBLE))),
              |  cast(0 as double), (a, b) -> a + b)""".stripMargin)).as("chi2"))
    },

    // A28 — winsorized (robust) aggregation: clip each group's values
    // into its own [p05, p95] band before averaging — the standard
    // outlier-robust mean for metrics/quality pipelines. Clip bounds
    // are NEAREST-RANK quantiles (rank ceil(p·n) of the same
    // range-sharded global order the quantile/ntile family rides), NOT
    // interpolated ones: a nearest-rank bound is an actual 2dp data
    // value, so the winsorized sum stays in exact decimal — an
    // interpolated bound is an arbitrary double whose repeated
    // summation would be partial-agg-order-dependent. ceil(p·n) runs
    // in double identically in both engines (consistency, not
    // mathematical exactness, is the contract). One corpus shuffle
    // (the shared range sort) + a 5-row broadcast of the bounds.
    QueryDef(
      "events_winsor",
      s"""WITH e AS (SELECT event_type, value, event_id FROM events WHERE value IS NOT NULL),
         |r AS (SELECT event_type, value,
         |             row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
         |             COUNT(*) OVER (PARTITION BY event_type) AS n
         |      FROM e),
         |b AS (SELECT event_type, n,
         |             MIN(CASE WHEN rk = CAST(ceil(0.05 * CAST(n AS DOUBLE)) AS BIGINT) THEN value END) AS p05,
         |             MIN(CASE WHEN rk = CAST(ceil(0.95 * CAST(n AS DOUBLE)) AS BIGINT) THEN value END) AS p95
         |      FROM r GROUP BY event_type, n)
         |SELECT r.event_type, b.n, b.p05, b.p95,
         |       ${Quant6Sql("CAST(SUM(CAST(r.value AS DECIMAL(12,2))) AS DOUBLE) / CAST(b.n AS DOUBLE)")} AS mean_raw,
         |       ${Quant6Sql("CAST(SUM(CAST(LEAST(GREATEST(r.value, b.p05), b.p95) AS DECIMAL(12,2))) AS DOUBLE) / CAST(b.n AS DOUBLE)")} AS mean_winsor,
         |       CAST(SUM(CASE WHEN r.value < b.p05 OR r.value > b.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
         |FROM r JOIN b ON r.event_type = b.event_type
         |GROUP BY r.event_type, b.n, b.p05, b.p95""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"), col("event_id"))
      val ranked = Distributed.globalRunning(e, Seq("event_type"), Seq("value", "event_id"))
      def cut(p: Double) = ceil(lit(p) * col("g_n").cast("double"))
      val bounds = ranked
        .filter(col("g_rank") === cut(0.05) || col("g_rank") === cut(0.95))
        .groupBy(col("event_type"), col("g_n").as("n"))
        .agg(
          min(when(col("g_rank") === cut(0.05), col("value"))).as("p05"),
          min(when(col("g_rank") === cut(0.95), col("value"))).as("p95"))
      val clipped = least(greatest(col("value"), col("p05")), col("p95"))
      ranked.join(broadcast(bounds), "event_type")
        .groupBy(col("event_type"), col("n"), col("p05"), col("p95"))
        .agg(
          quant6(dsum(col("value")) / col("n").cast("double")).as("mean_raw"),
          quant6(dsum(clipped) / col("n").cast("double")).as("mean_winsor"),
          sum(when(col("value") < col("p05") || col("value") > col("p95"), 1L)
            .otherwise(0L)).as("n_clipped"))
        .select(col("event_type"), col("n"), col("p05"), col("p95"),
          col("mean_raw"), col("mean_winsor"), col("n_clipped"))
    },

    // A56 — per-row percentile rank (empirical CDF): every event
    // placed at its within-type percentile — the feature-normalization
    // transform (rank-gauss, CDF features) a modeling pipeline runs
    // over raw values. PERCENT_RANK semantics exactly: (rank−1)/(n−1)
    // where rank is the TIE-SHARING rank, built in two steps — global
    // row numbers from the range-sharded prefix primitive (never a
    // ~5-key window over row data), then rank = min(row_number) over
    // the (type, value) tie group, a HIGH-cardinality window that
    // stays in-partition after its keyed shuffle (the user_quantiles
    // cardinality rule: fine-keyed windows are the safe kind). A
    // 1-row group degenerates to 0 in both engines (explicit guard
    // here, native percent_rank there).
    QueryDef(
      "events_percentile",
      s"""SELECT event_id, event_type, value,
         |       ${Quant6Sql("percent_rank() OVER (PARTITION BY event_type ORDER BY value)")} AS pct_rank
         |FROM events WHERE value IS NOT NULL""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"), col("event_id"))
      val ranked = Distributed.globalRunning(e,
        grp = Seq("event_type"), ord = Seq("value", "event_id"))
      val wTie = Window.partitionBy(col("event_type"), col("value"))
      ranked
        .withColumn("rnk", min(col("g_rank")).over(wTie))
        .select(col("event_id"), col("event_type"), col("value"),
          quant6(when(col("g_n") === 1, lit(0.0))
            .otherwise((col("rnk") - 1).cast("double")
              / (col("g_n") - 1).cast("double"))).as("pct_rank"))
    },

    // A55 — robust anomaly detection via MAD (median absolute
    // deviation): the outlier rule that survives what breaks
    // events_zscore — a z-score's mean AND stddev are themselves
    // dragged by the outliers they're meant to flag, while median and
    // MAD have a 50% breakdown point. Two passes of the shared
    // rank-based quantile machinery (Distributed.groupedQuantiles —
    // range-sharded, never a ~5-key window over row data): per-type
    // median m, then median of |v − m| after a ≤|types|-row broadcast
    // join-back (the events_zscore broadcast-moments shape, medians
    // in place of moments). The flag threshold 3σ-equivalent
    // (3·1.4826 = 4.4478·MAD) is one shared literal — both engines
    // parse the same decimal to the same IEEE double and compare
    // identical doubles, so the outlier COUNT is exact, no boundary
    // drift. Output is the constant-size per-type report.
    QueryDef(
      "events_mad",
      s"""WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
         |m AS (SELECT event_type, quantile_cont(value, 0.5) AS med FROM e GROUP BY 1),
         |d AS (SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS dev
         |      FROM e JOIN m USING (event_type)),
         |s AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1),
         |f AS (SELECT d.event_type, d.dev, d.med, s.mad
         |      FROM d JOIN s USING (event_type))
         |SELECT event_type, COUNT(*) AS n,
         |       ${Quant6Sql("MIN(med)")} AS med,
         |       ${Quant6Sql("MIN(mad)")} AS mad,
         |       CAST(SUM(CASE WHEN dev > 4.4478 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM f GROUP BY event_type""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("value"))
      val med = Distributed.groupedQuantiles(e, "event_type", "value",
          Seq("med" -> 0.5))
        .select(col("event_type"), col("med"))
      val d = e.join(broadcast(med), "event_type")
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = Distributed.groupedQuantiles(
          d.select(col("event_type"), col("dev")), "event_type", "dev",
          Seq("mad" -> 0.5))
        .select(col("event_type"), col("mad"))
      d.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(countAll.as("n"),
          quant6(min(col("med"))).as("med"),
          quant6(min(col("mad"))).as("mad"),
          sum(when(col("dev") > lit(4.4478) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
    },

    // A72 — OLS trend line per event type: slope/intercept of the
    // daily-count series against the day index — the "is volume
    // growing and how fast" regression beside events_autocorr's
    // persistence and events_changepoint's level shifts. Pure
    // closed-form least squares from EXACT integer sums (x = day −
    // first-day per type stays small; products in DECIMAL(30,0) so
    // n·Σxy can never wrap int64 at scale where DuckDB would widen),
    // evaluated in ONE fixed op order with two double divisions
    // (slope, then intercept from it — the stats_corr rule).
    // Everything past the daily rollup lives on the ≤|days|·|types|
    // aggregate (the events_growth rule). Single-day types guard to
    // NULL slope via nullif (hash-identical both engines).
    QueryDef(
      "events_trend",
      """WITH d AS (SELECT event_type,
        |                  epoch_us(date_trunc('day', CAST(ts AS TIMESTAMP))) // 86400000000 AS ed,
        |                  CAST(COUNT(*) AS BIGINT) AS y
        |           FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, MIN(ed) AS mind FROM d GROUP BY event_type),
        |x AS (SELECT d.event_type, d.ed - m.mind AS x, d.y
        |      FROM d JOIN m ON m.event_type = d.event_type),
        |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |             CAST(SUM(CAST(x AS DECIMAL(30,0)) * x) AS BIGINT) AS sxx,
        |             CAST(SUM(CAST(x AS DECIMAL(30,0)) * y) AS BIGINT) AS sxy
        |      FROM x GROUP BY event_type)
        |SELECT event_type, n AS n_days,
        |       floor(CAST(n * sxy - sx * sy AS DOUBLE)
        |             / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0) * 1000000.0)
        |         / 1000000.0 AS slope,
        |       floor((CAST(sy AS DOUBLE)
        |              - CAST(n * sxy - sx * sy AS DOUBLE)
        |                / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0)
        |                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) * 1000000.0)
        |         / 1000000.0 AS intercept
        |FROM s""".stripMargin) { (spark, dir) =>
      val d = Tables.events(spark, dir)
        .select(col("event_type"),
          expr("unix_micros(date_trunc('day', ts)) div 86400000000").as("ed"))
        .groupBy(col("event_type"), col("ed"))
        .agg(countAll.as("y"))
      val m = d.groupBy(col("event_type")).agg(min(col("ed")).as("mind"))
      val s = d.join(broadcast(m), "event_type")
        .select(col("event_type"), (col("ed") - col("mind")).as("x"), col("y"))
        .groupBy(col("event_type"))
        .agg(countAll.as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x").cast("decimal(30,0)") * col("x")).cast("long").as("sxx"),
          sum(col("x").cast("decimal(30,0)") * col("y")).cast("long").as("sxy"))
      val denom = nullif((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
        lit(0.0))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") / denom
      s.select(col("event_type"), col("n").as("n_days"),
        quant6(slope).as("slope"),
        quant6((col("sy").cast("double") - slope * col("sx").cast("double"))
          / col("n").cast("double")).as("intercept"))
    },

    // A64 — two-sample Kolmogorov–Smirnov drift test between the
    // first and second time-halves of the value stream: the
    // distribution-shift monitor a feature pipeline runs before
    // trusting new data. KS = max_x |F₁(x) − F₂(x)| computed WITHOUT
    // any floating CDF: per distinct value, the signed integer
    // d = cnt₁·n₂ − cnt₂·n₁ makes the running sum Σd = cum₁·n₂ −
    // cum₂·n₁, so the statistic is max |Σd| / (n₁·n₂) — ONE exact
    // integer running sum (in DECIMAL: cnt·n products overflow int64
    // past ~3e9 rows; Spark would wrap silently where DuckDB widens —
    // the events_autocorr divergence class), ONE double division at
    // the end, and a rational argmax for the drift location. The
    // running sum rides Distributed.globalRunning over the
    // VALUE-DOMAIN AGGREGATE (≤ |distinct 2dp values| rows — already
    // reduced from the corpus, then range-sharded anyway, so no
    // corpus-sized window exists even if the domain grows); the
    // midpoint split is a broadcast scalar; ties at the max break to
    // the SMALLEST value via a two-level tiny aggregate (the mode_agg
    // rule).
    QueryDef(
      "events_ks_drift",
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events
        |           WHERE value IS NOT NULL),
        |b AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM e),
        |s AS (SELECT value, CASE WHEN us < mid THEN 1 ELSE 0 END AS a FROM e, b),
        |n AS (SELECT CAST(SUM(a) AS BIGINT) AS na,
        |             CAST(COUNT(*) - SUM(a) AS BIGINT) AS nb FROM s),
        |g AS (SELECT value, CAST(SUM(a) AS BIGINT) AS ca,
        |             CAST(COUNT(*) - SUM(a) AS BIGINT) AS cb FROM s GROUP BY value),
        |r AS (SELECT value,
        |             SUM(CAST(ca AS DECIMAL(30,0)) * nb - CAST(cb AS DECIMAL(30,0)) * na)
        |               OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dsum
        |      FROM g, n),
        |m AS (SELECT MAX(ABS(dsum)) AS mxd FROM r)
        |SELECT n.na AS n_first, n.nb AS n_second,
        |       floor(CAST(m.mxd AS DOUBLE) / nullif(CAST(n.na AS DOUBLE) * CAST(n.nb AS DOUBLE), 0.0)
        |             * 1000000.0) / 1000000.0 AS ks_stat,
        |       (SELECT MIN(value) FROM r WHERE ABS(dsum) = m.mxd) AS ks_at
        |FROM m, n""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(unix_micros(col("ts")).as("us"), col("value"))
      val b = e.agg(expr("(MIN(us) + MAX(us)) div 2").as("mid"))
      val s = e.crossJoin(broadcast(b))
        .select(col("value"), when(col("us") < col("mid"), 1L).otherwise(0L).as("a"))
      val n = s.agg(sum(col("a")).as("na"), (countAll - sum(col("a"))).as("nb"))
      val g = s.groupBy(col("value"))
        .agg(sum(col("a")).as("ca"), (countAll - sum(col("a"))).as("cb"))
      val d = g.crossJoin(broadcast(n))
        .select(lit(1L).as("grp"), col("value"),
          (col("ca").cast("decimal(30,0)") * col("nb")
            - col("cb").cast("decimal(30,0)") * col("na")).as("d"))
      val ranked = Distributed.globalRunning(d, Seq("grp"), Seq("value"), Some("d"))
        .select(col("value"), col("g_run").as("dsum"))
      val m = ranked.agg(max(abs(col("dsum"))).as("mxd"))
      val at = ranked.crossJoin(broadcast(m))
        .filter(abs(col("dsum")) === col("mxd"))
        .agg(min(col("value")).as("ks_at"))
      // nullif-guard na·nb (the events_trend convention): min==max puts
      // every row in one half, and 0-division is NaN in Spark vs NULL
      // in DuckDB
      val nanb = col("na").cast("double") * col("nb").cast("double")
      m.crossJoin(broadcast(n)).crossJoin(broadcast(at))
        .select(col("na").as("n_first"), col("nb").as("n_second"),
          quant6(col("mxd").cast("double")
            / when(nanb =!= 0.0d, nanb)).as("ks_stat"),
          col("ks_at"))
    },

    // A66 — CUSUM change-point detection on the daily volume series
    // per event type: the level-shift monitor beside events_zscore
    // (point outliers), events_mad (robust outliers) and
    // events_autocorr (persistence). The classic statistic
    // max_k |Σ_{i≤k} (x_i − x̄)| needs no floating mean: with n days
    // and total T, the scaled deviation d_i = n·x_i − T is integer and
    // Σd over a prefix = n·Σx − k·T, so the change day is the argmax
    // of an exact integer running sum and the normalized magnitude is
    // ONE double division. Everything past the daily rollup lives on
    // the ≤|days|·|types| aggregate (the events_growth rule): the
    // prefix sum is a per-type window over the tiny table, the argmax
    // a two-level aggregate with an earliest-day tie-break.
    QueryDef(
      "events_changepoint",
      """WITH d AS (SELECT event_type,
        |                  CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
        |                  CAST(COUNT(*) AS BIGINT) AS c
        |           FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS tot
        |      FROM d GROUP BY event_type),
        |r AS (SELECT d.event_type, d.day, t.n, t.tot,
        |             SUM(CAST(d.c AS DECIMAL(30,0)) * t.n - t.tot)
        |               OVER (PARTITION BY d.event_type ORDER BY d.day
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cus
        |      FROM d JOIN t ON t.event_type = d.event_type),
        |m AS (SELECT event_type, MAX(ABS(cus)) AS mxc FROM r GROUP BY event_type)
        |SELECT r.event_type, strftime(MIN(r.day), '%Y-%m-%d') AS change_day,
        |       floor(CAST(m.mxc AS DOUBLE) / (CAST(r.n AS DOUBLE) * CAST(r.n AS DOUBLE))
        |             * 1000000.0) / 1000000.0 AS cusum_stat
        |FROM r JOIN m ON m.event_type = r.event_type AND ABS(r.cus) = m.mxc
        |GROUP BY r.event_type, m.mxc, r.n""".stripMargin) { (spark, dir) =>
      val d = Tables.events(spark, dir)
        .select(col("event_type"), to_date(date_trunc("day", col("ts"))).as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(countAll.as("c"))
      val t = d.groupBy(col("event_type"))
        .agg(countAll.as("n"), sum(col("c")).as("tot"))
      // the window is keyed per type over the ≤|days| aggregate rows
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = d.join(broadcast(t), "event_type")
        .withColumn("cus",
          sum(col("c").cast("decimal(30,0)") * col("n") - col("tot")).over(w))
      val m = r.groupBy(col("event_type")).agg(max(abs(col("cus"))).as("mxc"))
      r.join(broadcast(m), "event_type")
        .filter(abs(col("cus")) === col("mxc"))
        .groupBy(col("event_type"), col("mxc"), col("n"))
        .agg(min(col("day")).as("cd"))
        .select(col("event_type"), fmtDay(col("cd")).as("change_day"),
          quant6(col("mxc").cast("double")
            / (col("n").cast("double") * col("n").cast("double"))).as("cusum_stat"))
    })
}
