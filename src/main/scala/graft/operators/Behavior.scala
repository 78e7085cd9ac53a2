package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Distributed.StageSyntax

/** Behavioral / product-analytics operators over `events`
  * (SURVEY.md §2.2 A30–A32): cohort retention, ordered funnels, and
  * the event-transition matrix — the workhorse queries of a product
  * warehouse, all keyed by the high-cardinality user_id so no reducer
  * ever holds more than one user's history.
  *
  * Scale shapes:
  *  - cohort_retention: the (user, day) activity relation is made
  *    distinct ONCE (its rows are then unique, so a plain count(*) is
  *    the distinct-user count — no count-distinct Expand anywhere);
  *    first-activity day is a map-side min partial; the join back is
  *    keyed on user_id.
  *  - funnel_steps: one keyed aggregate per funnel stage (min-ts of
  *    the step event AFTER the previous stage's timestamp), chained by
  *    co-partitioned user_id joins — k stages = k passes, the standard
  *    engine shape; per-stage state is one timestamp per user.
  *  - event_transitions: one shuffle on user_id, lag() in-partition,
  *    then a ≤|types|² count aggregate (mergeable — partials cap each
  *    task's output at the matrix size, the events_histogram rule).
  */
object Behavior {

  /** The distinct (order, brand) relation every market-basket seat and
    * graph_triangles joins per-order — REPARTITIONED BY `o` BEFORE the
    * distinct, then checkpointed (r16 optimization, guide §2.4 "two
    * operations keyed the same way can share one exchange"): the
    * distinct's ClusteredDistribution((o, b)) is satisfied by
    * HashPartitioning(o) ({o} ⊆ {o, b}), and the per-order self-join
    * and every per-order aggregate then run EXCHANGE-FREE on the
    * checkpointed layout, where the old per-seat shape paid the
    * distinct's (o, b) exchange PLUS one fresh o-exchange per
    * self-join SIDE (two 5.6 MB re-shuffles of the same relation in
    * the graph_triangles profile). One narrow relation, one shuffle,
    * all consumers aligned. */
  private[operators] def orderBrands(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("p_partkey") === col("l_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b"))
      .repartition(col("o"))
      .distinct()
      .stage()

  /** Funnel definition shared by the query and its oracle. */
  private val FunnelSteps = Seq("signup", "click", "purchase")

  /** Per-user first-completion timestamps of each ordered funnel
    * stage: t1 = min ts of step 1, t_{i+1} = min ts of step i+1 AFTER
    * t_i. Stage i+1's aggregate carries t_1..t_i through via max()
    * (constant per user, so max is the value). */
  private def funnelReached(e: DataFrame, steps: Seq[String]): DataFrame = {
    val init = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === steps.head, col("ts"))).as("t1"))
    steps.zipWithIndex.tail.foldLeft(init) { case (acc, (s, i)) =>
      val carries = (1 to i).map(j => max(col(s"t$j")).as(s"t$j"))
      val next = min(when(col("event_type") === s && col("ts") > col(s"t$i"), col("ts")))
        .as(s"t${i + 1}")
      e.join(acc, "user_id")
        .groupBy(col("user_id"))
        .agg(carries.head, (carries.tail :+ next): _*)
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // A30 — cohort retention: users cohorted by first-activity day;
    // each matrix cell counts the cohort's users active `age_days`
    // later. The (user, day) relation is distinct, so count(*) per
    // cell IS the distinct-user count.
    QueryDef(
      "cohort_retention",
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM e),
        |f AS (SELECT user_id, MIN(d) AS c FROM ud GROUP BY user_id)
        |SELECT strftime(f.c, '%Y-%m-%d') AS cohort,
        |       CAST(date_diff('day', f.c, ud.d) AS BIGINT) AS age_days,
        |       COUNT(*) AS n_users
        |FROM ud JOIN f USING (user_id)
        |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      val ud = Tables.events(spark, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
        .distinct()
      val first = ud.groupBy(col("user_id")).agg(min(col("d")).as("c"))
      ud.join(first, "user_id")
        .groupBy(col("c"), datediff(col("d"), col("c")).cast("long").as("age_days"))
        .agg(countAll.as("n_users"))
        .select(fmtDay(col("c")).as("cohort"), col("age_days"), col("n_users"))
    },

    // A31 — ordered funnel: signup → click → purchase, each stage
    // strictly after the previous one's first completion (the
    // product-analytics semantics, not mere per-type existence).
    QueryDef(
      "funnel_steps", {
        s"""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
           |s1 AS (SELECT user_id,
           |              MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t1
           |       FROM e GROUP BY user_id),
           |s2 AS (SELECT e.user_id, MAX(s1.t1) AS t1,
           |              MIN(CASE WHEN e.event_type = 'click' AND e.ts > s1.t1 THEN e.ts END) AS t2
           |       FROM e JOIN s1 USING (user_id) GROUP BY e.user_id),
           |s3 AS (SELECT e.user_id, MAX(s2.t1) AS t1, MAX(s2.t2) AS t2,
           |              MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s2.t2 THEN e.ts END) AS t3
           |       FROM e JOIN s2 USING (user_id) GROUP BY e.user_id),
           |c AS (SELECT COUNT(t1) AS n1, COUNT(t2) AS n2, COUNT(t3) AS n3 FROM s3)
           |SELECT CAST(1 AS BIGINT) AS step_idx, 'signup' AS step, n1 AS n_users,
           |       floor(CAST(n1 AS DOUBLE) / n1 * 1000000.0) / 1000000.0 AS frac_of_first FROM c
           |UNION ALL
           |SELECT CAST(2 AS BIGINT), 'click', n2,
           |       floor(CAST(n2 AS DOUBLE) / n1 * 1000000.0) / 1000000.0 FROM c
           |UNION ALL
           |SELECT CAST(3 AS BIGINT), 'purchase', n3,
           |       floor(CAST(n3 AS DOUBLE) / n1 * 1000000.0) / 1000000.0 FROM c""".stripMargin
      }) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val reached = funnelReached(e, FunnelSteps)
      val counts = reached.agg(
        count(col("t1")).as("n1"),
        (2 to FunnelSteps.size).map(i => count(col(s"t$i")).as(s"n$i")): _*)
      val stackArgs = FunnelSteps.zipWithIndex
        .map { case (s, i) => s"CAST(${i + 1} AS BIGINT), '$s', n${i + 1}" }
        .mkString(", ")
      counts
        .select(col("n1"),
          expr(s"stack(${FunnelSteps.size}, $stackArgs) AS (step_idx, step, n_users)"))
        .select(col("step_idx"), col("step"), col("n_users"),
          quant6(col("n_users").cast("double") / col("n1")).as("frac_of_first"))
    },

    // A33 — trailing-7-day distinct users (WAU): sliding-window
    // DISTINCT cannot ride a running aggregate (a distinct set is not
    // mergeable across frame slides), so the engine shape is COVER-SET
    // EXPLOSION — each activity day covers the 7 window-ends it
    // contributes to, the (user, cover_day) distinct collapses
    // multi-active overlap, and the final per-day count needs no
    // Expand because the relation is already a set (the range_join
    // bucket-covering idea applied to time windows). Work = 7× the
    // daily-activity relation, INDEPENDENT of raw event volume (the
    // first distinct reduces events to user-days); cover days past
    // the data's edge are cut by a broadcast max-day scalar.
    QueryDef(
      "events_wau",
      """WITH e AS (SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d FROM events),
        |ud AS (SELECT DISTINCT user_id, d FROM e),
        |mx AS (SELECT MAX(d) AS m FROM ud),
        |cov AS (SELECT DISTINCT user_id, d + CAST(i.i AS INTEGER) AS cd
        |        FROM ud, generate_series(0, 6) i(i))
        |SELECT strftime(cd, '%Y-%m-%d') AS day, COUNT(*) AS wau
        |FROM cov, mx WHERE cd <= mx.m
        |GROUP BY 1""".stripMargin) { (spark, dir) =>
      val ud = Tables.events(spark, dir)
        .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("d"))
        .distinct()
      val mx = ud.agg(max(col("d")).as("m"))
      val cov = ud
        .withColumn("i", explode(sequence(lit(0), lit(6))))
        .select(col("user_id"), date_add(col("d"), col("i")).as("cd"))
        .distinct()
      cov.crossJoin(broadcast(mx))
        .filter(col("cd") <= col("m"))
        .groupBy(col("cd"))
        .agg(countAll.as("wau"))
        .select(fmtDay(col("cd")).as("day"), col("wau"))
    },

    // A35 — growth accounting: per day, active users (DAU), first-time
    // users, and the cumulative adoption curve. DAU and new-user
    // counts are Expand-free counts over the distinct (user, day) /
    // first-day relations; the running total is a window over the
    // ~|days| aggregated table — the one place a global window is
    // correct, because the input is already reduced to one row per day
    // (the Distributed.globalRunning pass-2 rule: windows over TINY
    // aggregate tables, never over the corpus).
    QueryDef(
      "events_growth",
      """WITH e AS (SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d FROM events),
        |ud AS (SELECT DISTINCT user_id, d FROM e),
        |dau AS (SELECT d, COUNT(*) AS n_active FROM ud GROUP BY d),
        |f AS (SELECT user_id, MIN(d) AS c FROM ud GROUP BY user_id),
        |nu AS (SELECT c AS d, COUNT(*) AS n_new FROM f GROUP BY c)
        |SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.n_active,
        |       COALESCE(nu.n_new, 0) AS n_new,
        |       CAST(SUM(COALESCE(nu.n_new, 0)) OVER (ORDER BY dau.d
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM dau LEFT JOIN nu ON nu.d = dau.d""".stripMargin) { (spark, dir) =>
      val ud = Tables.events(spark, dir)
        .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("d"))
        .distinct()
      val dau = ud.groupBy(col("d")).agg(countAll.as("n_active"))
      val nu = ud.groupBy(col("user_id")).agg(min(col("d")).as("c"))
        .groupBy(col("c")).agg(countAll.as("n_new"))
      val wCum = Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dau.join(nu, col("c") === col("d"), "left")
        .select(col("d"), col("n_active"), coalesce(col("n_new"), lit(0L)).as("n_new"))
        .withColumn("cum_users", sum(col("n_new")).over(wCum))
        .select(fmtDay(col("d")).as("day"), col("n_active"), col("n_new"), col("cum_users"))
    },

    // A34 — market-basket co-occurrence at brand granularity: which
    // brands are bought together in one order. The (order, brand)
    // relation is distinct'd first (so the pair count is per-ORDER
    // co-occurrence, not per-line), then self-joined KEYED ON THE
    // ORDER — per-order fan-out is C(brands-in-order, 2), bounded by
    // order size, so pair generation is linear in orders at any scale
    // (the same bounded-fan-out argument as the dedup band buckets);
    // the ≤|brands|² matrix aggregates mergeable counts. A pairwise
    // self-join on the BRAND key would be the quadratic mistake this
    // shape exists to avoid.
    QueryDef(
      "basket_pairs",
      """WITH ob AS (SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        |            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey)
        |SELECT a.b AS brand_a, bb.b AS brand_b, COUNT(*) AS n_orders
        |FROM ob a JOIN ob bb ON a.o = bb.o AND a.b < bb.b
        |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      val ob = orderBrands(spark, dir)
      ob.as("a").join(ob.as("bb"),
          col("a.o") === col("bb.o") && col("a.b") < col("bb.b"))
        .groupBy(col("a.b").as("brand_a"), col("bb.b").as("brand_b"))
        .agg(countAll.as("n_orders"))
    },

    // A70 — frequent triples with A-Priori candidate pruning
    // (Agrawal & Srikant, VLDB 1994): brand triples bought together
    // in ≥ 0.5% of orders. The Spark side runs the REAL A-Priori
    // shape — frequent pairs first (≤|brands|² rows, broadcast), then
    // triple candidates generated by extending only FREQUENT-pair
    // prefixes and pruned against the pair set on all three faces
    // BEFORE counting (downward closure guarantees no qualifying
    // triple is lost), so generation work scales with frequent-pair
    // occurrences, not C(brands-in-order, 3). The oracle deliberately
    // counts ALL triples brute-force and thresholds at the end — the
    // two-algorithms pattern proving the pruning exact. The support
    // cut is RATIONAL (1000·n ≥ 5·n_orders — no FP boundary).
    QueryDef(
      "basket_triples",
      """WITH ob AS (SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        |            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS nt FROM ob),
        |tr AS (SELECT a.b AS brand_a, bb.b AS brand_b, c.b AS brand_c,
        |              CAST(COUNT(*) AS BIGINT) AS n_orders
        |       FROM ob a
        |       JOIN ob bb ON a.o = bb.o AND a.b < bb.b
        |       JOIN ob c ON a.o = c.o AND bb.b < c.b
        |       GROUP BY 1, 2, 3)
        |SELECT tr.brand_a, tr.brand_b, tr.brand_c, tr.n_orders
        |FROM tr, n WHERE 1000 * tr.n_orders >= 5 * n.nt""".stripMargin) { (spark, dir) =>
      val ob = orderBrands(spark, dir)
      val nt = ob.agg(countDistinct(col("o")).as("nt"))
      // pass 1: frequent pairs at the same relative support (downward
      // closure: any frequent triple's faces are frequent pairs)
      val fp = ob.as("a").join(ob.as("bb"),
          col("a.o") === col("bb.o") && col("a.b") < col("bb.b"))
        .groupBy(col("a.b").as("x"), col("bb.b").as("y"))
        .agg(countAll.as("c"))
        .crossJoin(broadcast(nt))
        .filter(lit(1000) * col("c") >= lit(5) * col("nt"))
        .select(col("x"), col("y"))
      // pass 2: extend only frequent-pair prefixes, prune the other
      // two faces against the broadcast pair set, THEN count
      val cand = ob.as("a").join(ob.as("bb"),
          col("a.o") === col("bb.o") && col("a.b") < col("bb.b"))
        .select(col("a.o").as("o"), col("a.b").as("ba"), col("bb.b").as("bb2"))
        .join(broadcast(fp), col("ba") === col("x") && col("bb2") === col("y"), "left_semi")
        .withColumnRenamed("o", "po")
        .join(ob.as("c"), col("po") === col("c.o") && col("bb2") < col("c.b"))
        .select(col("po"), col("ba"), col("bb2"), col("c.b").as("bc"))
        .join(broadcast(fp), col("bb2") === col("x") && col("bc") === col("y"), "left_semi")
        .join(broadcast(fp), col("ba") === col("x") && col("bc") === col("y"), "left_semi")
      cand.groupBy(col("ba").as("brand_a"), col("bb2").as("brand_b"), col("bc").as("brand_c"))
        .agg(countAll.as("n_orders"))
        .crossJoin(broadcast(nt))
        .filter(lit(1000) * col("n_orders") >= lit(5) * col("nt"))
        .select(col("brand_a"), col("brand_b"), col("brand_c"), col("n_orders"))
    },

    // A67 — item-item cosine on the co-occurrence matrix: the
    // collaborative-filtering similarity sim(a,b) = n_ab/√(n_a·n_b)
    // beside basket_lift's independence ratio — lift asks "more than
    // chance?", cosine asks "how aligned?", and a recommender ranks
    // by the latter. The √ of an exact BIGINT product is ONE
    // correctly-rounded IEEE op (identical both engines — the ab_test
    // sqrt rule), then one division; everything upstream is the
    // order-keyed bounded-fan-out pair join and broadcast marginals
    // the basket family shares.
    QueryDef(
      "basket_cosine",
      """WITH ob AS (SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        |            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |m AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cb FROM ob GROUP BY b),
        |pr AS (SELECT a.b AS brand_a, bb.b AS brand_b, CAST(COUNT(*) AS BIGINT) AS n_ab
        |       FROM ob a JOIN ob bb ON a.o = bb.o AND a.b < bb.b
        |       GROUP BY 1, 2)
        |SELECT pr.brand_a, pr.brand_b, pr.n_ab,
        |       floor(CAST(pr.n_ab AS DOUBLE)
        |             / sqrt(CAST(ma.cb * mb.cb AS DOUBLE)) * 1000000.0) / 1000000.0 AS cosine
        |FROM pr
        |JOIN m ma ON ma.b = pr.brand_a
        |JOIN m mb ON mb.b = pr.brand_b""".stripMargin) { (spark, dir) =>
      val ob = orderBrands(spark, dir)
      val marg = ob.groupBy(col("b")).agg(countAll.as("cb"))
      ob.as("a").join(ob.as("bb"),
          col("a.o") === col("bb.o") && col("a.b") < col("bb.b"))
        .groupBy(col("a.b").as("brand_a"), col("bb.b").as("brand_b"))
        .agg(countAll.as("n_ab"))
        .join(broadcast(marg.as("ma")), col("brand_a") === col("ma.b"))
        .join(broadcast(marg.as("mb")), col("brand_b") === col("mb.b"))
        .select(col("brand_a"), col("brand_b"), col("n_ab"),
          quant6(col("n_ab").cast("double")
            / sqrt((col("ma.cb") * col("mb.cb")).cast("double"))).as("cosine"))
    },

    // A34b — association scoring on the co-occurrence matrix: lift =
    // P(a,b) / (P(a)·P(b)) computed as (n_orders_total · c_ab) /
    // (c_a · c_b). All counts are exact BIGINTs (order-independent
    // sums), the products stay in int64 far below 2^53, and the ONE
    // double division runs per matrix cell — the text_lm_score
    // rational-arithmetic rule, so no ln()/PMI drift between engines.
    // Scale: the (order, brand) relation is localCheckpoint'd (the
    // pareto_class rule — one RDD node every branch references, and no
    // corpus-shaped deserialized cache pinning executor memory) and
    // shared by the pair join, the marginals, and the total; the
    // marginal table is
    // ≤|brands| rows (provably bounded → broadcast), the total is a
    // broadcast scalar, and pair generation stays keyed on the order.
    QueryDef(
      "basket_lift",
      """WITH ob AS (SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        |            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |m AS (SELECT b, COUNT(*) AS cb FROM ob GROUP BY b),
        |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_total FROM ob),
        |pr AS (SELECT a.b AS brand_a, bb.b AS brand_b, COUNT(*) AS n_ab
        |       FROM ob a JOIN ob bb ON a.o = bb.o AND a.b < bb.b
        |       GROUP BY 1, 2)
        |SELECT pr.brand_a, pr.brand_b, pr.n_ab,
        |       floor(CAST(n.n_total * pr.n_ab AS DOUBLE)
        |             / CAST(ma.cb * mb.cb AS DOUBLE) * 1000000.0) / 1000000.0 AS lift
        |FROM pr
        |JOIN m ma ON ma.b = pr.brand_a
        |JOIN m mb ON mb.b = pr.brand_b
        |CROSS JOIN n""".stripMargin) { (spark, dir) =>
      val ob = orderBrands(spark, dir)
      val marg = ob.groupBy(col("b")).agg(countAll.as("cb"))
      val n = ob.agg(countDistinct(col("o")).as("n_total"))
      ob.as("a").join(ob.as("bb"),
          col("a.o") === col("bb.o") && col("a.b") < col("bb.b"))
        .groupBy(col("a.b").as("brand_a"), col("bb.b").as("brand_b"))
        .agg(countAll.as("n_ab"))
        .join(broadcast(marg.as("ma")), col("brand_a") === col("ma.b"))
        .join(broadcast(marg.as("mb")), col("brand_b") === col("mb.b"))
        .crossJoin(broadcast(n))
        .select(col("brand_a"), col("brand_b"), col("n_ab"),
          quant6((col("n_total") * col("n_ab")).cast("double")
            / (col("ma.cb") * col("mb.cb")).cast("double")).as("lift"))
    },

    // A37 — gaps-and-islands: per-user consecutive-day activity
    // streaks. The island id is (epoch_day - per-user row_number):
    // constant within a run of consecutive days, strictly decreasing
    // across gaps — the classic warehouse idiom, computed here with
    // ONE shuffle total: an explicit hash repartition on user_id
    // up front means the (user, day) distinct, the row_number window,
    // and both downstream groupBys are all satisfied by subset
    // clustering on the same exchange (EnsureRequirements accepts a
    // partitioning on a subset of the grouping keys). Windows are
    // keyed by the high-cardinality user_id — bounded per-task work.
    QueryDef(
      "user_streaks",
      """WITH e AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |r AS (SELECT user_id, day,
        |             date_diff('day', DATE '1970-01-01', day)
        |               - row_number() OVER (PARTITION BY user_id ORDER BY day) AS isl
        |      FROM e),
        |s AS (SELECT user_id, isl, COUNT(*) AS len, MAX(day) AS d1 FROM r GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_streaks, CAST(MAX(len) AS BIGINT) AS max_streak,
        |       CAST(SUM(len) AS BIGINT) AS active_days,
        |       strftime(MAX(d1), '%Y-%m-%d') AS last_active
        |FROM s GROUP BY user_id""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      Tables.events(spark, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .repartition(col("user_id"))
        .distinct()
        .withColumn("isl",
          datediff(col("day"), lit("1970-01-01").cast("date")) - row_number().over(w))
        .groupBy(col("user_id"), col("isl"))
        .agg(countAll.as("len"), max(col("day")).as("d1"))
        .groupBy(col("user_id"))
        .agg(
          countAll.as("n_streaks"),
          max(col("len")).as("max_streak"),
          sum(col("len")).as("active_days"),
          fmtDay(max(col("d1"))).as("last_active"))
    },

    // A32 — event-transition matrix: per-user next-event pairs via one
    // lag() pass, counted into the ≤|types|² matrix (path / Markov
    // analysis over the event stream).
    QueryDef(
      "event_transitions",
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |p AS (SELECT user_id,
        |             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
        |             event_type AS to_type
        |      FROM e)
        |SELECT from_type, to_type, COUNT(*) AS n
        |FROM p WHERE from_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type"))
        .agg(countAll.as("n"))
        .select(col("from_type"), col("event_type").as("to_type"), col("n"))
    },

    // A57 — conversion-lag distribution: per weekly signup cohort,
    // how many users signed up, how many went on to purchase AFTER
    // their first signup, and the exact median hours to that first
    // purchase — funnel_steps tells you IF users convert, this tells
    // you HOW FAST, the number activation teams actually act on.
    // First-signup and first-qualifying-purchase are user-keyed min
    // aggregates chained by a co-partitioned join (the funnel_steps
    // shape; the ts > s_ts predicate rides the equi-join). Cohort
    // week and the lag in hours are pure integer epoch arithmetic
    // (truncating div, no engine calendar); the median runs on the
    // shared groupedQuantiles machinery (cohort week is ~5 keys — the
    // range-sharded case). Cohorts with zero conversions survive the
    // left join with a NULL median, which hashes identically in both
    // engines.
    QueryDef(
      "time_to_convert",
      s"""WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
         |s AS (SELECT user_id, MIN(ts) AS s_ts FROM e WHERE event_type = 'signup' GROUP BY 1),
         |p AS (SELECT s.user_id, s.s_ts, MIN(e.ts) AS p_ts
         |      FROM s JOIN e ON e.user_id = s.user_id
         |                   AND e.event_type = 'purchase' AND e.ts > s.s_ts
         |      GROUP BY s.user_id, s.s_ts),
         |sc AS (SELECT user_id, (epoch_us(s_ts) // 86400000000 + 3) // 7 AS cw FROM s),
         |d AS (SELECT sc.cw, (epoch_us(p.p_ts) - epoch_us(p.s_ts)) // 3600000000 AS h
         |      FROM p JOIN sc ON sc.user_id = p.user_id),
         |n AS (SELECT cw, COUNT(*) AS n_signups FROM sc GROUP BY 1)
         |SELECT n.cw AS cohort_week, n.n_signups,
         |       COUNT(d.h) AS n_converted,
         |       ${Quant6Sql("quantile_cont(d.h, 0.5)")} AS med_hours
         |FROM n LEFT JOIN d ON d.cw = n.cw
         |GROUP BY n.cw, n.n_signups""".stripMargin) { (spark, dir) =>
      val e = Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val s = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("s_ts"))
      val p = s.join(e.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts")),
          Seq("user_id"))
        .filter(col("ts") > col("s_ts"))
        .groupBy(col("user_id"), col("s_ts")).agg(min(col("ts")).as("p_ts"))
      val sc = s.select(col("user_id"),
        expr("(unix_micros(s_ts) div 86400000000 + 3) div 7").as("cw"))
      val d = p.join(sc, Seq("user_id"))
        .select(col("cw"),
          expr("(unix_micros(p_ts) - unix_micros(s_ts)) div 3600000000").as("h"))
      val q = Distributed.groupedQuantiles(d, "cw", "h", Seq("medv" -> 0.5))
      sc.groupBy(col("cw")).agg(countAll.as("n_signups"))
        .join(q, Seq("cw"), "left")
        .select(col("cw").as("cohort_week"), col("n_signups"),
          coalesce(col("n"), lit(0L)).as("n_converted"),
          quant6(col("medv")).as("med_hours"))
    })
}
