package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Distributed.StageSyntax

/** User-journey and experimentation operators over `events`
  * (SURVEY.md §2.2 A58–A61): entry-path analysis, regex sequence
  * matching (the batch seat of MATCH_RECOGNIZE-style CEP), a
  * deterministic A/B two-proportion z-test, and the Kaplan–Meier
  * survival curve with censoring — the product-growth layer on top of
  * the funnel/cohort/transition queries in [[Behavior]].
  *
  * Scale shapes:
  *  - session_paths: the per-user prefix is bounded (first 3 events),
  *    so the collect_list buffers ≤ 3 structs per user — the
  *    user_quantiles rule (a user's OWN history may sit in one task);
  *    the path census is a mergeable ≤|types|³-key count and the final
  *    cut is TakeOrdered, never a global sort.
  *  - sequence_match: each user's event stream folds to ONE initial
  *    string (bounded by the user's own history) on one user_id
  *    shuffle; the regex runs per-row at scan speed and the output is
  *    a constant-size report.
  *  - ab_test: arm assignment is a pure md5 projection (no
  *    randomness, reproducible across engines and runs); the per-user
  *    conversion relation is one mergeable aggregate; the z statistic
  *    is closed-form double arithmetic in one fixed op order.
  *  - kaplan_meier: per-user first/first-after timestamps are one
  *    mergeable aggregate plus a co-partitioned join-back; everything
  *    after lives on the ≤CensorHours death-time table (the
  *    events_growth rule), where the cumulative product
  *    folds an ordered factor list left-to-right — multiplication is
  *    correctly rounded IEEE, so a fixed fold order is bit-identical
  *    across engines (the events_ewma ordered-fold rule, applied to
  *    products).
  */
object Journey {

  /** First-k prefix length shared by session_paths and its oracle. */
  private val PathLen = 3

  /** CEP pattern shared by sequence_match and its oracle: a view
    * followed by a purchase with no intervening purchase — greedy,
    * non-overlapping, identical semantics in Java regex and RE2. */
  private val SeqPattern = "v[^p]*p"

  /** Fixed follow-up window (hours) shared by kaplan_meier and its
    * oracle: users whose first purchase lands past this horizon (or
    * never) are right-censored at it. */
  private val CensorHours = 48

  val defs: Seq[QueryDef] = Seq(

    // A58 — entry-path census: the first-3-event journey per user,
    // counted and cut to the top 20 paths (onboarding analysis: what
    // do new users actually do first?). The per-user prefix is
    // bounded by construction — row_number ≤ 3 BEFORE the collect, so
    // no task ever buffers more than 3 events of any user; the path
    // string census is a mergeable count over ≤|types|³ keys and the
    // final cut is TakeOrdered (count desc, path asc — total order).
    QueryDef(
      "session_paths",
      s"""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
         |r AS (SELECT user_id, event_type,
         |             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |      FROM e),
         |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
         |      FROM r WHERE rn <= $PathLen GROUP BY user_id)
         |SELECT path, COUNT(*) AS n_users
         |FROM p GROUP BY path
         |ORDER BY n_users DESC, path LIMIT 20""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= PathLen)
        .groupBy(col("user_id"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x("event_type")), ">").as("path"))
        .groupBy(col("path"))
        .agg(countAll.as("n_users"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(20)
    },

    // A59 — regex sequence matching over the event stream (the batch
    // seat of MATCH_RECOGNIZE / CEP): fold each user's ordered stream
    // to its event-initial string (s/e/c/v/p — initials are distinct
    // by data contract), then count users and non-overlapping
    // occurrences of view→…→purchase with no intervening purchase.
    // The fold is one user_id shuffle (a user's stream is their own
    // history); the regex is greedy and backtracking-free, so Java
    // regex (Spark) and RE2 (DuckDB) scan to identical matches — the
    // text_redact portability rule. Constant-size report output.
    QueryDef(
      "sequence_match",
      s"""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
         |s AS (SELECT user_id, string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS stream
         |      FROM e GROUP BY user_id),
         |m AS (SELECT user_id, len(regexp_extract_all(stream, '$SeqPattern')) AS n_occ FROM s)
         |SELECT '$SeqPattern' AS pattern,
         |       CAST(COUNT(*) AS BIGINT) AS n_users,
         |       CAST(SUM(CASE WHEN n_occ > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
         |       CAST(SUM(n_occ) AS BIGINT) AS n_occurrences
         |FROM m""".stripMargin) { (spark, dir) =>
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .groupBy(col("user_id"))
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("i")))), x => x("i")), "").as("stream"))
        .select(size(regexp_extract_all(col("stream"), lit(SeqPattern), lit(0))).as("n_occ"))
        .agg(countAll.as("n_users"),
          sum(when(col("n_occ") > 0, 1L).otherwise(0L)).as("n_matched"),
          sum(col("n_occ").cast("long")).as("n_occurrences"))
        .select(lit(SeqPattern).as("pattern"), col("n_users"),
          col("n_matched"), col("n_occurrences"))
    },

    // A60 — A/B experiment readout with a two-proportion z-test: arm
    // assignment is the first md5 nibble of the user id (deterministic,
    // uniform, engine-portable — the ONLY correct way to split when
    // the oracle must reproduce the split bit-for-bit), conversion is
    // "purchased within 24h of first activity" (a fixed-horizon metric
    // — 'ever purchased' saturates to 1.0 on an engaged population and
    // the pooled variance degenerates to 0), and the z statistic is
    // the pooled-variance closed form evaluated in ONE fixed op order:
    // p̂a, p̂b, pooled p̂, se = sqrt(p̂(1−p̂)(1/na+1/nb)),
    // z = (p̂a−p̂b)/se. Division and sqrt are correctly rounded IEEE
    // ops, so the identical expression tree yields the identical
    // double in both engines (the stats_corr rule); se is still
    // nullif-guarded (0/0 split → NULL, which hashes identically,
    // where ANSI Spark would otherwise throw — the events_autocorr
    // rule). First-activity and the 24h probe are one user-keyed
    // aggregate plus one co-partitioned join-back (the funnel_steps
    // shape); all counts are exact BIGINTs; output is one row.
    QueryDef(
      "ab_test",
      """WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |f AS (SELECT user_id, MIN(us) AS f_us FROM e GROUP BY user_id),
        |u AS (SELECT f.user_id,
        |             CASE WHEN substr(md5(CAST(f.user_id AS VARCHAR)), 1, 1)
        |                       BETWEEN '0' AND '7' THEN 'A' ELSE 'B' END AS arm,
        |             MAX(CASE WHEN e.event_type = 'purchase' AND e.us > f.f_us
        |                           AND e.us - f.f_us <= 86400000000 THEN 1 ELSE 0 END) AS conv
        |      FROM f JOIN e ON e.user_id = f.user_id GROUP BY f.user_id),
        |c AS (SELECT
        |        CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |        CAST(SUM(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        |        CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |        CAST(SUM(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
        |      FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        |       floor((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) * 1000000.0) / 1000000.0 AS rate_a,
        |       floor((CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) * 1000000.0) / 1000000.0 AS rate_b,
        |       floor(((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |               - (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |             / NULLIF(sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |                    * (CAST(1 AS DOUBLE) - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
        |                    * (CAST(1 AS DOUBLE) / CAST(n_a AS DOUBLE)
        |                       + CAST(1 AS DOUBLE) / CAST(n_b AS DOUBLE))), 0)
        |             * 1000000.0) / 1000000.0 AS z_score
        |FROM c""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val f = e.groupBy(col("user_id")).agg(min(col("us")).as("f_us"))
      val u = f.join(e, Seq("user_id"))
        .groupBy(col("user_id"), col("f_us"))
        .agg(max(when(col("event_type") === "purchase" && col("us") > col("f_us")
          && col("us") - col("f_us") <= 86400000000L, 1).otherwise(0)).as("conv"))
        .withColumn("arm",
          when(substring(md5(col("user_id").cast("string")), 1, 1)
            .between("0", "7"), "A").otherwise("B"))
      val c = u.agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "A", col("conv").cast("long")).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "B", col("conv").cast("long")).otherwise(0L)).as("conv_b"))
      val pa = col("conv_a").cast("double") / col("n_a").cast("double")
      val pb = col("conv_b").cast("double") / col("n_b").cast("double")
      val pp = (col("conv_a") + col("conv_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double")
      val se = sqrt(pp * (lit(1).cast("double") - pp) *
        (lit(1).cast("double") / col("n_a").cast("double")
          + lit(1).cast("double") / col("n_b").cast("double")))
      c.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        quant6(pa).as("rate_a"), quant6(pb).as("rate_b"),
        quant6((pa - pb) / nullif(se, lit(0.0))).as("z_score"))
    },

    // A74 — Wilson 95% confidence interval per event-type reach: the
    // uncertainty-aware companion to ab_test — every "X% of users do
    // Y" number published with the interval that survives small n
    // (the normal approximation's interval goes negative near 0;
    // Wilson's never does). p̂ = k/n from exact BIGINT counts; the
    // interval is the closed form evaluated in ONE fixed op order
    // with z = 1.96 as a shared literal — division, sqrt and the
    // fixed-order adds are correctly rounded IEEE ops, so both
    // engines produce the identical doubles (the ab_test rule). One
    // per-user distinct relation, one ≤|types| mergeable aggregate,
    // one broadcast scalar.
    QueryDef(
      "conversion_ci",
      """WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
        |n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu FROM events),
        |k AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS ku FROM u GROUP BY event_type),
        |w AS (SELECT event_type, ku, nu,
        |             CAST(ku AS DOUBLE) / CAST(nu AS DOUBLE) AS p,
        |             CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / CAST(nu AS DOUBLE) AS zz
        |      FROM k, n)
        |SELECT event_type, nu AS n_users, ku AS n_reached,
        |       floor(p * 1000000.0) / 1000000.0 AS reach_rate,
        |       floor((p + zz / 2 - CAST(1.96 AS DOUBLE) * sqrt(p * (CAST(1 AS DOUBLE) - p) / CAST(nu AS DOUBLE)
        |                                       + zz / (4 * CAST(nu AS DOUBLE)))) / (CAST(1 AS DOUBLE) + zz)
        |             * 1000000.0) / 1000000.0 AS ci_lo,
        |       floor((p + zz / 2 + CAST(1.96 AS DOUBLE) * sqrt(p * (CAST(1 AS DOUBLE) - p) / CAST(nu AS DOUBLE)
        |                                       + zz / (4 * CAST(nu AS DOUBLE)))) / (CAST(1 AS DOUBLE) + zz)
        |             * 1000000.0) / 1000000.0 AS ci_hi
        |FROM w""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
      val u = e.select(col("user_id"), col("event_type")).distinct()
      val n = e.agg(countDistinct(col("user_id")).as("nu"))
      val k = u.groupBy(col("event_type")).agg(countAll.as("ku"))
      val p = col("ku").cast("double") / col("nu").cast("double")
      val zz = lit(1.96) * lit(1.96) / col("nu").cast("double")
      def bound(sign: Double) =
        (p + zz / lit(2) + lit(sign) * lit(1.96)
          * sqrt(p * (lit(1).cast("double") - p) / col("nu").cast("double")
            + zz / (lit(4) * col("nu").cast("double")))) / (lit(1).cast("double") + zz)
      k.crossJoin(broadcast(n))
        .select(col("event_type"), col("nu").as("n_users"), col("ku").as("n_reached"),
          quant6(p).as("reach_rate"),
          quant6(bound(-1.0)).as("ci_lo"),
          quant6(bound(1.0)).as("ci_hi"))
    },

    // A61 — Kaplan–Meier survival estimator for time-to-first-purchase
    // under a fixed CensorHours follow-up window: t = hours from a
    // user's first activity to their first subsequent purchase; users
    // whose first purchase falls past the window (or never happens)
    // are right-CENSORED at CensorHours — the fixed-horizon design
    // every product "conversion curve" implicitly is. S(t) =
    // Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over death times tᵢ, with nᵢ = users
    // still unconverted and uncensored entering tᵢ (at-risk includes
    // the later-censored — dropping them is the classic conversion-
    // rate bias this estimator exists to fix). Per-user first/first-
    // after timestamps are the funnel_steps aggregate+join-back shape
    // in pure integer epoch arithmetic; the death-time table is
    // ≤ CensorHours rows, so the at-risk window, the ordered factor
    // list, and the per-row prefix product all run on the tiny
    // aggregate (the events_growth rule). The prefix product is an
    // explicit left fold over the ordered factor prefix — IEEE
    // multiplication is correctly rounded, so Spark's aggregate() and
    // DuckDB's list_reduce() agree bit-for-bit (events_ewma's
    // ordered-fold rule; the 1.0 seed is exact under the first
    // multiply, matching DuckDB's first-element seeding).
    QueryDef(
      "kaplan_meier",
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
         |f AS (SELECT user_id, MIN(us) AS f_us FROM e GROUP BY user_id),
         |p AS (SELECT f.user_id, MIN(e.us) AS p_us
         |      FROM f JOIN e ON e.user_id = f.user_id
         |                   AND e.event_type = 'purchase' AND e.us > f.f_us
         |      GROUP BY f.user_id),
         |uu AS (SELECT CASE WHEN p.p_us IS NOT NULL
         |                        AND (p.p_us - f.f_us) // 3600000000 <= $CensorHours
         |                   THEN (p.p_us - f.f_us) // 3600000000 ELSE $CensorHours END AS t,
         |              CASE WHEN p.p_us IS NOT NULL
         |                        AND (p.p_us - f.f_us) // 3600000000 <= $CensorHours
         |                   THEN 1 ELSE 0 END AS death
         |       FROM f LEFT JOIN p ON p.user_id = f.user_id),
         |g AS (SELECT t, CAST(SUM(death) AS BIGINT) AS d, CAST(COUNT(*) AS BIGINT) AS c FROM uu GROUP BY t),
         |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
         |r AS (SELECT t, d,
         |             n - CAST(COALESCE(SUM(c) OVER (ORDER BY t
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
         |      FROM g, tot),
         |fk AS (SELECT t, d, n_risk,
         |             CAST(1 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
         |      FROM r WHERE d > 0),
         |s AS (SELECT t, d, n_risk,
         |             list(factor) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs
         |      FROM fk)
         |SELECT CAST(t AS BIGINT) AS t_days, n_risk AS n_at_risk, d AS n_deaths,
         |       ${Quant6Sql("list_reduce(fs, (a, x) -> a * x)")} AS survival
         |FROM s""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val f = e.groupBy(col("user_id")).agg(min(col("us")).as("f_us"))
      val p = f.join(e.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("us")), Seq("user_id"))
        .filter(col("us") > col("f_us"))
        .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
      val lagH = expr("(p_us - f_us) div 3600000000")
      val died = col("p_us").isNotNull && lagH <= CensorHours
      val g = f.join(p, Seq("user_id"), "left")
        .select(when(died, lagH).otherwise(lit(CensorHours.toLong)).as("t"),
          when(died, 1L).otherwise(0L).as("death"))
        .groupBy(col("t"))
        .agg(sum(col("death")).as("d"), countAll.as("c"))
      // everything below runs on the ≤|days| aggregate: global windows
      // over the tiny table are the one safe global-window case
      val wPrev = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("n", sum(col("c")).over(wTot))
        .withColumn("n_risk", col("n") - coalesce(sum(col("c")).over(wPrev), lit(0L)))
        .filter(col("d") > 0)
        .withColumn("factor",
          lit(1).cast("double") - col("d").cast("double") / col("n_risk").cast("double"))
        .withColumn("fs", collect_list(col("factor")).over(wCum))
        .select(col("t").as("t_days"), col("n_risk").as("n_at_risk"),
          col("d").as("n_deaths"),
          quant6(aggregate(col("fs"), lit(1).cast("double"), (a, x) => a * x))
            .as("survival"))
    },

    // A62 — RFM segmentation: every customer scored 1–5 on Recency /
    // Frequency / Monetary quintiles (5 = best on each axis), rolled
    // to the ≤125-cell segment matrix with classic lifecycle labels.
    // The base is one mergeable per-customer aggregate of orders
    // (last-order epoch day, order count, exact decimal spend),
    // localCheckpoint'd because THREE independent quintile passes read
    // it (the pareto_class rule — a .cache() materializes as
    // InMemoryTableScans that defeat exchange reuse inside the prefix
    // primitive). Each quintile is NTILE(5) over |customers| rows — a
    // GLOBAL window, i.e. exactly the one-reducer hazard
    // Distributed.globalRunning exists for: ranks come range-sharded,
    // the bucket is Distributed.ntileFromRank's pure LONG arithmetic,
    // and the oracle runs DuckDB's NATIVE ntile(5) (recency DESCending
    // via exact integer negation — the pareto_class trick — so 5 =
    // most recent; tie-break ck makes every order total). Scores
    // re-join on the high-cardinality ck (co-partitioned), the matrix
    // aggregate is mergeable, and the one double division per cell
    // (avg spend) comes last.
    QueryDef(
      "rfm_segments",
      """WITH o AS (SELECT o_custkey AS ck,
        |                  epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS od,
        |                  o_totalprice FROM orders),
        |b AS (SELECT ck, MAX(od) AS lastd, CAST(COUNT(*) AS BIGINT) AS f,
        |             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS m
        |      FROM o GROUP BY ck),
        |mx AS (SELECT MAX(lastd) AS mxd FROM b),
        |r AS (SELECT ck, mxd - lastd AS r, f, m FROM b, mx),
        |s AS (SELECT ck, m,
        |             ntile(5) OVER (ORDER BY -r, ck) AS r_score,
        |             ntile(5) OVER (ORDER BY f, ck) AS f_score,
        |             ntile(5) OVER (ORDER BY m, ck) AS m_score
        |      FROM r)
        |SELECT CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
        |       CAST(m_score AS BIGINT) AS m_score,
        |       CASE WHEN r_score = 5 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        |            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
        |            WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
        |            ELSE 'other' END AS segment,
        |       COUNT(*) AS n_customers,
        |       floor(CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1000000.0) / 1000000.0 AS avg_monetary
        |FROM s GROUP BY r_score, f_score, m_score""".stripMargin) { (spark, dir) =>
      val o = Tables.orders(spark, dir).select(col("o_custkey").as("ck"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("od"),
        col("o_totalprice"))
      val base = o.groupBy(col("ck"))
        .agg(max(col("od")).as("lastd"), countAll.as("f"),
          sum(dec(col("o_totalprice"))).as("m"))
        .stage()
      val mx = base.agg(max(col("lastd")).as("mxd"))
      val rfm = base.crossJoin(broadcast(mx))
        .select(col("ck"), (col("mxd") - col("lastd")).as("r"), col("f"), col("m"))
      // one quintile pass per axis: globalRunning demands exactly the
      // (grp, ord) columns, so each pass carries its own metric + ck
      def quintile(metric: Column, name: String): DataFrame =
        Distributed.globalRunning(
          rfm.select(lit(1L).as("g"), metric.as("v"), col("ck")),
          Seq("g"), Seq("v", "ck"))
          .select(col("ck"), Distributed.ntileFromRank(5).as(name))
      val scored = quintile(-col("r"), "r_score")
        .join(quintile(col("f"), "f_score"), "ck")
        .join(quintile(col("m"), "m_score"), "ck")
        .join(rfm.select(col("ck"), col("m")), "ck")
      scored.groupBy(col("r_score"), col("f_score"), col("m_score"))
        .agg(countAll.as("n_customers"), sum(col("m")).as("sm"))
        .select(col("r_score"), col("f_score"), col("m_score"),
          when(col("r_score") === 5 && col("f_score") >= 4 && col("m_score") >= 4, "champion")
            .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
            .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
            .otherwise("other").as("segment"),
          col("n_customers"),
          quant6(col("sm").cast("double") / col("n_customers").cast("double"))
            .as("avg_monetary"))
    },

    // A75 — first/last-touch conversion attribution: every purchase
    // credits the FIRST and the MOST RECENT preceding touch event
    // (view/click) in the user's history — the marketing-analytics
    // primitive between funnel_steps (did the path happen) and
    // time_to_convert (how long it took). Scale shape: the as-of
    // family's no-join rule — both credits are IGNORE NULLS window
    // picks over ONE (user_id) shuffle and ONE (ts, event_id) sort;
    // the ROWS frame (UNBOUNDED..1 PRECEDING) excludes only the
    // current row — a same-timestamp touch with a lower event_id IS a
    // preceding row and IS credited, identically in both engines
    // because the (ts, event_id) order is a total order. Touchless purchases keep -1 (never NULL: a
    // nullable BIGINT would come back float64 from pandas on one side
    // and poison the driver's string hash). Output ∝ purchases.
    QueryDef(
      "attribution",
      """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
        |           FROM events),
        |t AS (SELECT *, CASE WHEN event_type IN ('view', 'click') THEN event_id END AS touch
        |      FROM e),
        |x AS (SELECT event_id, user_id, event_type, value,
        |             first_value(touch IGNORE NULLS) OVER w AS ft,
        |             last_value(touch IGNORE NULLS) OVER w AS lt
        |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id AS purchase_id, user_id,
        |       COALESCE(ft, -1) AS first_touch, COALESCE(lt, -1) AS last_touch,
        |       CAST(value AS DOUBLE) AS revenue
        |FROM x WHERE event_type = 'purchase'""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touch = when(col("event_type").isin("view", "click"), col("event_id"))
      Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
        .withColumn("ft", first(touch, ignoreNulls = true).over(w))
        .withColumn("lt", last(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          coalesce(col("ft"), lit(-1L)).as("first_touch"),
          coalesce(col("lt"), lit(-1L)).as("last_touch"),
          col("value").as("revenue"))
    })
}
