package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators (SURVEY.md §2.2 A12, §2.1 R6/R10).
  *
  * R6 mirrors transform-service/main.py:86-89 (`max(blobs, key=name)`,
  * i.e. "process only the newest snapshot"): at cluster scale the max-ts
  * subquery prunes to the latest date partition instead of scanning
  * history. R10 mirrors extract-service/main.py:159-174 (response
  * validation) as a declarative malformed-record filter.
  *
  * A12 is gap-based sessionization — the batch twin of the
  * flatMapGroupsWithState streaming version (graft.streaming). Both
  * shuffle once on user_id; state never touches the driver.
  */
object Events {

  private val SessionGapUs = 1800L * 1000 * 1000 // 30 min in microseconds

  val defs: Seq[QueryDef] = Seq(

    // A12 — sessionize: lag-gap flags, cumulative-sum session ids.
    QueryDef(
      "sessionize",
      s"""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events),
         |g AS (SELECT user_id, event_id, ts, value,
         |             CASE WHEN lag(ts) OVER w IS NULL
         |                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $SessionGapUs
         |                  THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
         |      FROM g)
         |SELECT user_id, CAST(session_seq AS BIGINT) AS session_id,
         |       COUNT(*) AS n_events,
         |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
         |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
         |FROM s GROUP BY user_id, session_seq""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .withColumn("new_s",
          when(lag(col("ts"), 1).over(w).isNull
            || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > SessionGapUs, 1)
            .otherwise(0))
        .withColumn("session_seq", sum(col("new_s")).over(wRun))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(
          countAll.as("n_events"),
          fmtTs(min(col("ts"))).as("session_start"),
          fmtTs(max(col("ts"))).as("session_end"),
          dsum(col("value")).as("session_value"))
        .select(col("user_id"), col("session_seq").cast("long").as("session_id"),
          col("n_events"), col("session_start"), col("session_end"), col("session_value"))
    },

    // A39 — time-series smoothing: per-user EWMA of `value` in event
    // order. The recursion s_1 = x_1, s_n = ½·x_n + ½·s_{n-1} is
    // evaluated as an explicit FOLD over the user's ordered history —
    // with α = ½ every multiply is an exact exponent decrement and
    // each step is ONE correctly-rounded add, so both engines running
    // the same fold order produce bit-identical doubles (a closed-form
    // Σ 0.5^(n-i)·x_i would be an order-dependent double sum; pow()
    // would add libm drift — the BM25 binary-exact-constants rule).
    // Scale: one shuffle keyed by the high-cardinality user_id; the
    // per-key state is the user's own history (the same bound every
    // per-user window in this file carries); order inside the array is
    // total — (ts, event_id) is unique — so the fold is deterministic.
    QueryDef(
      "events_ewma",
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |       list_reduce(list(value ORDER BY ts, event_id),
        |                   (acc, x) -> 0.5 * x + 0.5 * acc) AS ewma
        |FROM e GROUP BY user_id""".stripMargin) { (spark, dir) =>
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .groupBy(col("user_id"))
        .agg(countAll.as("n_events"),
          sort_array(collect_list(struct(col("ts"), col("event_id"), col("value"))))
            .as("h"))
        .select(col("user_id"), col("n_events"),
          expr("aggregate(transform(h, s -> s.value), cast(null as double)," +
            " (acc, x) -> if(acc is null, x, 0.5d * x + 0.5d * acc))").as("ewma"))
    },

    // A52 — clamped running balance: per-user "credit ledger" where
    // purchases/signups credit `value`, every other event debits it,
    // and the balance FLOORS AT ZERO — inventory-on-hand, prepaid
    // credits, rate-limit token buckets. The clamp makes the
    // recurrence b_i = max(0, b_{i-1} + x_i) NON-ASSOCIATIVE: no
    // window sum can express it (a running SUM ignores the floor), so
    // it runs as the events_ewma ordered fold — one shuffle on the
    // high-cardinality user_id, the user's own history collected and
    // sorted in-group, one correctly-rounded add + one max per step in
    // a fixed total order, bit-identical in both engines (DuckDB's
    // list_reduce seeds from the first element, so the oracle prepends
    // the 0.0 initial balance to run the SAME recurrence). The
    // mergeable companion (total credited) rides the same aggregate in
    // exact decimal.
    QueryDef(
      "events_balance",
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  CASE WHEN event_type IN ('purchase', 'signup')
        |                       THEN COALESCE(value, 0.0) ELSE -COALESCE(value, 0.0)
        |                  END AS delta,
        |                  CASE WHEN event_type IN ('purchase', 'signup')
        |                       THEN COALESCE(value, 0.0) ELSE 0.0 END AS credit
        |           FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(credit AS DECIMAL(18,2))) AS DOUBLE) AS credited,
        |       list_reduce(list_prepend(0.0, list(delta ORDER BY ts, event_id)),
        |                   (acc, x) -> greatest(acc + x, 0.0)) AS balance
        |FROM e GROUP BY user_id""".stripMargin) { (spark, dir) =>
      val isCredit = col("event_type").isin("purchase", "signup")
      Tables.events(spark, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          when(isCredit, coalesce(col("value"), lit(0.0)))
            .otherwise(-coalesce(col("value"), lit(0.0))).as("delta"),
          when(isCredit, coalesce(col("value"), lit(0.0))).otherwise(lit(0.0)).as("credit"))
        .groupBy(col("user_id"))
        .agg(countAll.as("n_events"),
          dsum(col("credit")).as("credited"),
          sort_array(collect_list(struct(col("ts"), col("event_id"), col("delta"))))
            .as("h"))
        .select(col("user_id"), col("n_events"), col("credited"),
          expr("aggregate(transform(h, s -> s.delta), cast(0 as double)," +
            " (acc, x) -> greatest(acc + x, 0d))").as("balance"))
    },

    // A40 — time-grid resampling with forward-fill (gap-fill): each
    // user's irregular readings become one row per DAY between their
    // first and last reading, carrying the most recent observed value
    // and its staleness — the resample/ffill step every time-series
    // feature pipeline runs before modeling. Scale shape: NO grid
    // join at all — each observed day emits itself plus the gap days
    // up to (exclusive) the next observation, via lead() + a bounded
    // sequence() explode, so the fill is structurally exact (every
    // grid day is generated FROM its most recent reading) instead of
    // a null-skipping window over a grid⋈readings join (which planned
    // two scans — Catalyst pushes the span min/max past the daily
    // aggregate, splitting the lineage and defeating exchange reuse).
    // ONE explicit user_id exchange serves the per-(user, day)
    // last-reading aggregate AND the lead window by subset clustering
    // (the user_streaks trick); fan-out is each user's own span in
    // days, never corpus-shaped. The daily "last reading" is
    // max(struct(ts, event_id, value)) — (ts, event_id) is unique, so
    // the argmax is total and matches the oracle's DESC row_number.
    // The oracle states the SPEC instead (conventional grid +
    // IGNORE-NULLS forward-fill): agreement proves the gap-emission
    // rewrite, QueriesSpec re-proves it driver-side.
    QueryDef(
      "events_resample",
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
        |           FROM events WHERE value IS NOT NULL),
        |d AS (SELECT user_id, date_trunc('day', ts) AS day, ts, event_id, value FROM e),
        |lastv AS (SELECT user_id, day, value FROM (
        |            SELECT user_id, day, value,
        |                   row_number() OVER (PARTITION BY user_id, day
        |                                      ORDER BY ts DESC, event_id DESC) AS rn
        |            FROM d) t WHERE rn = 1),
        |span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM d GROUP BY user_id),
        |grid AS (SELECT user_id, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |         FROM span),
        |j AS (SELECT g.user_id, g.day, o.value, o.value IS NOT NULL AS is_observed
        |      FROM grid g LEFT JOIN lastv o ON g.user_id = o.user_id AND g.day = o.day),
        |f AS (SELECT user_id, day, is_observed,
        |             last_value(value IGNORE NULLS) OVER w AS value_filled,
        |             MAX(CASE WHEN is_observed THEN day END) OVER w AS last_day
        |      FROM j WINDOW w AS (PARTITION BY user_id ORDER BY day
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, value_filled, is_observed,
        |       CAST(date_diff('day', last_day, day) AS BIGINT) AS days_stale
        |FROM f""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val e = Tables.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .repartition(col("user_id"))
      e.groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("obs"))
        // emit this day plus the gap up to the next observed day
        // (exclusive); the last observed day emits only itself
        .withColumn("stop",
          coalesce(lead(col("day"), 1).over(w) - expr("interval 1 day"), col("day")))
        .select(col("user_id"), col("day").as("obs_day"), col("obs"),
          explode(sequence(col("day"), col("stop"), expr("interval 1 day"))).as("day"))
        .select(col("user_id"), fmtDay(col("day")).as("day"),
          col("obs").as("value_filled"),
          (col("day") === col("obs_day")).as("is_observed"),
          datediff(col("day"), col("obs_day")).cast("long").as("days_stale"))
    },

    // A38 — interval concurrency (sweep-line): peak number of
    // simultaneously-open sessions per day. Session bounds come from
    // the same gap rule as `sessionize` (one user_id shuffle); each
    // session emits +1 at its start and -1 at its end, and the
    // inclusive global running sum of deltas IS the concurrency curve.
    // The global order is the Distributed.globalRunning primitive
    // (range-sharded local windows + broadcast prefix offsets — a
    // plain ORDER BY window would funnel every boundary through one
    // reducer). Starts sort before ends at an equal timestamp (mdelta
    // = −delta tiebreak), so back-to-back sessions count as
    // overlapping; ties WITHIN (ts, mdelta) carry equal deltas, so
    // the per-day MAX of the prefix curve is permutation-invariant —
    // deterministic even though row_number splits ties arbitrarily.
    QueryDef(
      "events_concurrency",
      s"""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events),
         |g AS (SELECT user_id, event_id, ts,
         |             CASE WHEN lag(ts) OVER w IS NULL
         |                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $SessionGapUs
         |                  THEN 1 ELSE 0 END AS new_s
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (SELECT user_id, ts,
         |             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seq
         |      FROM g),
         |b AS (SELECT user_id, seq, MIN(ts) AS st, MAX(ts) AS en FROM s GROUP BY 1, 2),
         |ev AS (SELECT st AS ts, 1 AS delta, -1 AS mdelta FROM b
         |       UNION ALL
         |       SELECT en AS ts, -1 AS delta, 1 AS mdelta FROM b),
         |r AS (SELECT ts, delta,
         |             SUM(delta) OVER (ORDER BY ts, mdelta
         |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
         |      FROM ev)
         |SELECT strftime(ts, '%Y-%m-%d') AS day,
         |       CAST(MAX(conc) AS BIGINT) AS max_concurrent,
         |       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_started
         |FROM r GROUP BY 1""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val bounds = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("new_s",
          when(lag(col("ts"), 1).over(w).isNull
            || unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > SessionGapUs, 1)
            .otherwise(0))
        .withColumn("seq", sum(col("new_s")).over(wRun))
        .groupBy(col("user_id"), col("seq"))
        .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
      val sweep = bounds
        .select(col("st").as("ts"), lit(1).as("delta"), lit(-1).as("mdelta"))
        .unionAll(bounds
          .select(col("en").as("ts"), lit(-1).as("delta"), lit(1).as("mdelta")))
        .withColumn("grp", lit("all"))
        .select(col("grp"), col("ts"), col("mdelta"), col("delta"))
      Distributed.globalRunning(sweep,
          grp = Seq("grp"), ord = Seq("ts", "mdelta"), valueCol = Some("delta"))
        .groupBy(fmtDay(col("ts")).as("day"))
        .agg(max(col("g_run")).as("max_concurrent"),
          sum(when(col("delta") === 1, 1).otherwise(0)).as("n_started"))
    },

    // A44 — leakage-free point-in-time FEATURE join (the feature-store
    // shape): daily per-user feature snapshots (count + decimal value
    // sum over day D) become visible at feat_ts = D+1 00:00, and each
    // purchase label joins the LATEST snapshot with feat_ts ≤ label
    // ts — so a training example can never see data from its own day
    // forward (temporal leakage, the classic ML-pipeline bug). The
    // oracle is DuckDB's NATIVE `ASOF LEFT JOIN`; the Spark side is
    // the engine's as-of rewrite (asof_purchase's tagged-union
    // window) generalized to a two-table join: features and labels
    // union into one per-user stream ordered by (t, kind, id) — the
    // kind tiebreak makes a snapshot visible at exactly its
    // publication instant — and a null-skipping last() carries the
    // newest snapshot onto every label. Two user-keyed shuffles (the
    // snapshot aggregate, the window), no join node at all; labels
    // with no prior snapshot keep NULL features (left semantics).
    QueryDef(
      "feature_asof",
      """WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |f AS (SELECT user_id, date_trunc('day', ts) + INTERVAL 1 DAY AS ft,
        |             COUNT(*) AS feat_n,
        |             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS feat_value
        |      FROM e GROUP BY user_id, date_trunc('day', ts)),
        |l AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id,
        |       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS event_time,
        |       strftime(f.ft, '%Y-%m-%d %H:%M:%S') AS feat_ts,
        |       f.feat_n, f.feat_value
        |FROM l ASOF LEFT JOIN f
        |  ON l.user_id = f.user_id AND l.ts >= f.ft""".stripMargin) { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      val feats = ev
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(countAll.as("feat_n"), sum(dec(col("value"))).as("fv"))
        .select(col("user_id"), (col("day") + expr("interval 1 day")).as("t"),
          lit(1).as("is_feat"), lit(-1L).as("event_id"),
          col("feat_n"), col("fv").cast("double").as("feat_value"))
      val labels = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("t"),
          lit(0).as("is_feat"), col("event_id"),
          lit(null).cast("long").as("feat_n"), lit(null).cast("double").as("feat_value"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("is_feat").desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      feats.unionByName(labels)
        .withColumn("snap",
          last(when(col("is_feat") === 1,
            struct(col("t"), col("feat_n"), col("feat_value"))),
            ignoreNulls = true).over(w))
        .filter(col("is_feat") === 0)
        .select(col("event_id"), col("user_id"),
          fmtTs(col("t")).as("event_time"),
          fmtTs(col("snap").getField("t")).as("feat_ts"),
          col("snap").getField("feat_n").as("feat_n"),
          col("snap").getField("feat_value").as("feat_value"))
    },

    // A47 — time-weighted average (TWAP): per user, the mean of the
    // value-as-a-step-function over the observation span — the
    // metric/finance average that ignores sampling cadence (a reading
    // held for an hour weighs 60× one held a minute, where the plain
    // mean would count them equally). Each reading carries to the
    // NEXT reading (lead over one user-keyed window, in-partition);
    // the integral Σ value·Δt is an EXACT DECIMAL×BIGINT product sum
    // (order-independent — no fold needed, unlike events_chisq's
    // ratio terms), and only the final integral/span division runs in
    // double. Users with one reading have no span and are excluded
    // (0/0 is not an average). One shuffle on the high-cardinality
    // user_id.
    QueryDef(
      "events_twap",
      s"""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
         |           FROM events WHERE value IS NOT NULL),
         |s AS (SELECT user_id, value,
         |             epoch_us(ts) AS t,
         |             lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tn
         |      FROM e),
         |g AS (SELECT user_id,
         |             SUM(CAST(value AS DECIMAL(12,2)) * (tn - t)) AS num,
         |             CAST(SUM(tn - t) AS BIGINT) AS span_us,
         |             COUNT(*) AS n_readings
         |      FROM s WHERE tn IS NOT NULL GROUP BY user_id)
         |SELECT user_id, n_readings + 1 AS n_readings, span_us,
         |       ${Quant6Sql("CAST(num AS DOUBLE) / CAST(span_us AS DOUBLE)")} AS twap
         |FROM g WHERE span_us > 0""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
      Tables.events(spark, dir)
        .filter(col("value").isNotNull)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("t"))
        .withColumn("tn", lead(col("t"), 1).over(w))
        .filter(col("tn").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          sum(dec(col("value")) * (col("tn") - col("t"))).as("num"),
          sum(col("tn") - col("t")).cast("long").as("span_us"),
          (countAll + 1).as("n_readings"))
        .filter(col("span_us") > 0)
        .select(col("user_id"), col("n_readings"), col("span_us"),
          quant6(col("num").cast("double") / col("span_us").cast("double")).as("twap"))
    },

    // A17 — as-of (temporal) join: for every non-purchase event, the
    // user's most recent purchase at-or-before it. Expressed as ONE
    // windowed pass over the union stream (max-over-preceding-rows of
    // the tagged timestamp) — no join at all, one shuffle on user_id.
    // This is the scalable as-of shape; a sort-merge as-of join would
    // need a custom SparkPlan for no gain here.
    QueryDef(
      "asof_purchase",
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |w AS (SELECT *, MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |               OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lp
        |      FROM e)
        |SELECT event_id, user_id, event_type,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time,
        |       COALESCE(strftime(make_timestamp(lp), '%Y-%m-%d %H:%M:%S'), 'never') AS last_purchase_time,
        |       CAST(COALESCE((epoch_us(ts) - lp) // 1000000, -1) AS BIGINT) AS secs_since_purchase
        |FROM w WHERE event_type <> 'purchase'""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("lp",
          max(when(col("event_type") === "purchase", unix_micros(col("ts")))).over(w))
        .filter(col("event_type") =!= "purchase")
        .select(
          col("event_id"), col("user_id"), col("event_type"),
          fmtTs(col("ts")).as("event_time"),
          coalesce(fmtTs(timestamp_micros(col("lp"))), lit("never")).as("last_purchase_time"),
          coalesce(expr("(unix_micros(ts) - lp) div 1000000"), lit(-1L))
            .cast("long").as("secs_since_purchase"))
    },

    // A19 — range (interval) join, bucketed: for every purchase, the
    // same user's events in the preceding 30 minutes. A naive
    // inequality join plans a nested-loop O(|p|·|e|); instead both
    // sides are keyed by (user_id, 30-min time bucket) — the probe
    // (purchase) side explodes to its bucket and the one before, which
    // COVERS the half-open window exactly, so candidates come from a
    // plain equi-join shuffle and each true match appears exactly once
    // (the build event's bucket is unique — no distinct needed). This
    // is the standard scale shape for interval joins Spark lacks
    // natively.
    QueryDef(
      "range_join",
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
        |p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase')
        |SELECT p.event_id, COUNT(*) AS n_prior,
        |       CAST(SUM(CAST(b.value AS DECIMAL(12,2))) AS DOUBLE) AS prior_value
        |FROM p JOIN e b ON b.user_id = p.user_id
        |  AND b.ts >= p.ts - INTERVAL 30 MINUTE AND b.ts < p.ts
        |GROUP BY p.event_id""".stripMargin) { (spark, dir) =>
      val bucketUs = SessionGapUs // 30 min, = the window width
      val e = Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
          unix_micros(col("ts")).as("tus"))
      val build = e
        .select(col("user_id"), col("value"), col("tus"),
          expr(s"tus div $bucketUs").as("bucket"))
      val probe = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("tus").as("p_tus"),
          explode(array(expr(s"tus div $bucketUs - 1"), expr(s"tus div $bucketUs"))).as("bucket"))
      probe
        .join(build,
          col("p_user") === col("user_id") && probe("bucket") === build("bucket")
            && col("tus") >= col("p_tus") - bucketUs && col("tus") < col("p_tus"))
        .groupBy(col("p_id"))
        .agg(countAll.as("n_prior"), dsum(col("value")).as("prior_value"))
        .select(col("p_id").as("event_id"), col("n_prior"), col("prior_value"))
    },

    // R6 — latest-snapshot selection: only rows from the newest day.
    QueryDef(
      "latest_snapshot",
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events),
        |m AS (SELECT date_trunc('day', MAX(ts)) AS latest_day FROM e)
        |SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM e, m WHERE e.ts >= m.latest_day
        |GROUP BY event_type""".stripMargin) { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      val latest = ev.agg(date_trunc("day", max(col("ts"))).as("latest_day"))
      ev.crossJoin(broadcast(latest))
        .filter(col("ts") >= col("latest_day"))
        .groupBy("event_type")
        .agg(
          countAll.as("n"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("total_value"))
    },

    // R11 — typed JSON promotion at scan speed: extract + cast a JSON
    // property per row (get_json_object is a codegen'd path evaluator,
    // null on malformed/missing — no error channel needed), then
    // aggregate the promoted column exactly. This is the semi-
    // structured half of the reference's response handling: R10 flags
    // malformed rows, this one consumes the valid payload as typed
    // data without a pre-parse pass or a second scan. At 100 TB a
    // JSON column parsed per-row at the scan is the standard
    // lakehouse shape (promote-then-aggregate, one pass); the oracle
    // guards DuckDB's error-throwing json_extract with json_valid to
    // match get_json_object's null-on-malformed contract.
    QueryDef(
      "events_json",
      """SELECT event_type,
        |       COUNT(*) AS n,
        |       CAST(COUNT(k) AS BIGINT) AS n_extracted,
        |       CAST(SUM(k) AS BIGINT) AS sum_k,
        |       CAST(MIN(k) AS BIGINT) AS min_k,
        |       CAST(MAX(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type,
        |             TRY_CAST(CASE WHEN json_valid(props)
        |                           THEN json_extract_string(props, '$.k') END AS BIGINT) AS k
        |      FROM events) t
        |GROUP BY event_type""".stripMargin) { (spark, dir) =>
      Tables.events(spark, dir)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(
          countAll.as("n"),
          count(col("k")).as("n_extracted"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).cast("long").as("min_k"),
          max(col("k")).cast("long").as("max_k"))
    },

    // R10 — response validation: malformed-record detection on props JSON.
    QueryDef(
      "validate_events",
      """SELECT event_type,
        |       CAST(SUM(CASE WHEN regexp_matches(props, '^\{"k": [0-9]+\}$') THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        |       CAST(SUM(CASE WHEN regexp_matches(props, '^\{"k": [0-9]+\}$') THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
        |FROM events GROUP BY event_type""".stripMargin) { (spark, dir) =>
      val valid = col("props").rlike("^\\{\"k\": [0-9]+\\}$")
      Tables.events(spark, dir)
        .groupBy("event_type")
        .agg(
          sum(when(valid, 1).otherwise(0)).cast("long").as("n_valid"),
          sum(when(valid, 0).otherwise(1)).cast("long").as("n_invalid"))
    },

    // A69 — refractory debounce: keep an event only if > 300 s have
    // passed since the last KEPT event of that user (telemetry /
    // alert-storm suppression). The "since last KEPT" chain is
    // NON-ASSOCIATIVE — no window frame expresses it (sessionize's
    // gap rule compares to the previous EVENT; debounce compares to
    // the previous SURVIVOR) — so it runs as the events_ewma ordered
    // fold, with the whole state packed into ONE BIGINT:
    // acc = last_kept_sec · 2²⁴ + kept_count (truncated absolute
    // epoch seconds — the SAME convention the streaming twin uses, so
    // batch and stream decide identically at boundaries; epoch-sec ·
    // 2²⁴ ≈ 3·10¹⁶ stays far under 2⁶³, 0 means "none kept yet";
    // 2²⁴ leaves 16 M events/user of counter headroom and the pack
    // stays pure integer arithmetic — div/mod, bit-identical in both
    // engines where a struct-state fold wouldn't fit DuckDB's
    // first-element-seeded list_reduce at all). Oracle prepends the
    // 0 seed (the events_balance trick); sorted equal-second ties
    // fold identically regardless of collect order.
    QueryDef(
      "events_debounce",
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |d AS (SELECT user_id, us // 1000000 AS sec FROM e),
        |l AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |             list_prepend(CAST(0 AS BIGINT), list_sort(list(sec))) AS xs
        |      FROM d GROUP BY user_id)
        |SELECT user_id, n_events,
        |       CAST(list_reduce(xs, (acc, x) ->
        |         CASE WHEN acc // 16777216 = 0 OR x - acc // 16777216 > 300
        |              THEN x * 16777216 + acc % 16777216 + 1
        |              ELSE acc END) % 16777216 AS BIGINT) AS n_kept
        |FROM l""".stripMargin) { (spark, dir) =>
      Tables.events(spark, dir)
        .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("sec"))
        .groupBy(col("user_id"))
        .agg(countAll.as("n_events"), sort_array(collect_list(col("sec"))).as("xs"))
        .select(col("user_id"), col("n_events"),
          (expr(
            """aggregate(xs, 0L, (acc, x) ->
              |  IF(acc div 16777216 = 0 OR x - acc div 16777216 > 300,
              |     x * 16777216 + acc % 16777216 + 1, acc))""".stripMargin)
            % 16777216).cast("long").as("n_kept"))
    })
}
