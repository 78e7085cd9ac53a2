package graft.operators

import graft.QueryDef
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Warehouse audit operators (SURVEY.md §2.2 A21–A22): snapshot
  * reconciliation (CDC-style diff) and one-pass column profiling —
  * the maintenance jobs a 100 TB warehouse runs nightly next to the
  * reference's append loads (transform-service/main.py:54-76 appends
  * snapshots into a warehouse table; diffing consecutive snapshots and
  * profiling the loaded columns is how such a pipeline is monitored).
  *
  * Scale shape:
  *  - snapshot_diff: one shuffle per snapshot on the primary key, one
  *    full-outer sort-merge join — the canonical reconciliation plan;
  *    row-identical snapshots cost |keys| shuffled bytes, and the
  *    change classification is a per-row expression. No broadcast
  *    (both sides are fact-sized), no driver state.
  *  - profile_stats: ONE scan, map-side partial aggregation to a
  *    single row (count/min/max/decimal-sum per column), then a
  *    constant-width `stack` unpivot — profiling N columns costs one
  *    pass regardless of N, vs N scans for naive per-column jobs.
  */
object Audit {

  /** Deterministic snapshot classifier: first hex char of
    * md5(orderkey). '0'/'1' → row only in the NEW snapshot (insert),
    * '2'/'3' → only in the OLD (delete), '4'/'5' → totalprice bumped
    * in the new snapshot (update), rest → identical in both. md5 of
    * the decimal key string is reproduced bit-for-bit by the oracle
    * (SURVEY.md §4). */
  private val cls = substring(md5(col("o_orderkey").cast("string")), 1, 1)

  /** The two synthesized snapshot versions, (key, price) each — shared
    * by snapshot_diff (classification) and snapshot_merge (apply), so
    * the merge invariant "applying the diff to OLD reproduces NEW"
    * (QueriesSpec-asserted) can never drift between the two queries. */
  private[graft] def snapshots(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), cls.as("cls"))
    val old = base.filter(!col("cls").isin("0", "1"))
      .select(col("o_orderkey").as("old_key"), col("o_totalprice").as("old_price"))
    val neu = base.filter(!col("cls").isin("2", "3"))
      .select(col("o_orderkey").as("new_key"),
        when(col("cls").isin("4", "5"), col("o_totalprice") + 10)
          .otherwise(col("o_totalprice")).as("new_price"))
    (old, neu)
  }

  /** A21 classification (the snapshot_diff query body). */
  private[graft] def snapshotDiff(
      spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val (snapOld, snapNew) = snapshots(spark, dir)
    snapOld
      .join(snapNew, col("old_key") === col("new_key"), "full_outer")
      .filter(col("old_key").isNull || col("new_key").isNull
        || col("old_price") =!= col("new_price"))
      .select(
        coalesce(col("old_key"), col("new_key")).as("o_orderkey"),
        when(col("old_key").isNull, "insert")
          .when(col("new_key").isNull, "delete")
          .otherwise("update").as("change"),
        col("old_price"), col("new_price"))
  }

  /** Oracle CTEs shared by snapshot_diff / snapshot_merge: the two
    * snapshot versions plus the classified change set. */
  private val snapshotCtes =
    """c AS (SELECT o_orderkey, o_totalprice,
      |             substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS cls
      |      FROM orders),
      |snap_old AS (SELECT o_orderkey, o_totalprice AS p FROM c
      |             WHERE cls NOT IN ('0', '1')),
      |snap_new AS (SELECT o_orderkey,
      |                    CASE WHEN cls IN ('4', '5') THEN o_totalprice + 10
      |                         ELSE o_totalprice END AS p
      |             FROM c WHERE cls NOT IN ('2', '3')),
      |diff AS (SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |                CASE WHEN o.o_orderkey IS NULL THEN 'insert'
      |                     WHEN n.o_orderkey IS NULL THEN 'delete'
      |                     ELSE 'update' END AS change,
      |                o.p AS old_price, n.p AS new_price
      |         FROM snap_old o FULL OUTER JOIN snap_new n ON o.o_orderkey = n.o_orderkey
      |         WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL OR o.p <> n.p)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // A21 — CDC-style snapshot reconciliation: full-outer join of two
    // snapshot versions on the key, classify insert/delete/update,
    // drop unchanged rows.
    QueryDef(
      "snapshot_diff",
      s"""WITH $snapshotCtes
         |SELECT o_orderkey, change, old_price, new_price FROM diff""".stripMargin) {
      (spark, dir) => snapshotDiff(spark, dir)
    },

    // A21b — CDC APPLY: materialize the classification into the merged
    // next-version table (MERGE-INTO semantics: inserts and updates
    // take the changed row, deletes drop, untouched keys keep the base
    // row). The plan is the reconciliation shape again — base and
    // change set shuffle once on the key into a full-outer sort-merge
    // join, the apply rule is a per-row projection. No broadcast (the
    // change set scales with churn, the base with the table), no
    // driver state; at 100 TB this is one co-partitioned
    // shuffle-and-rewrite, the same cost envelope as a warehouse
    // MERGE INTO. QueriesSpec asserts the invariant that makes it CDC:
    // applying the diff to OLD reproduces NEW bit-for-bit.
    QueryDef(
      "snapshot_merge",
      s"""WITH $snapshotCtes
         |SELECT COALESCE(b.o_orderkey, d.o_orderkey) AS o_orderkey,
         |       CASE WHEN d.change IS NULL THEN b.p ELSE d.new_price END AS o_totalprice,
         |       COALESCE(d.change, 'keep') AS action
         |FROM snap_old b FULL OUTER JOIN diff d ON b.o_orderkey = d.o_orderkey
         |WHERE d.change IS NULL OR d.change <> 'delete'""".stripMargin) {
      (spark, dir) =>
        val (snapOld, _) = snapshots(spark, dir)
        val diff = snapshotDiff(spark, dir)
          .select(col("o_orderkey").as("d_key"), col("change"), col("new_price"))
        snapOld
          .join(diff, col("old_key") === col("d_key"), "full_outer")
          .filter(col("change").isNull || col("change") =!= "delete")
          .select(
            coalesce(col("old_key"), col("d_key")).as("o_orderkey"),
            when(col("change").isNull, col("old_price"))
              .otherwise(col("new_price")).as("o_totalprice"),
            coalesce(col("change"), lit("keep")).as("action"))
    },

    // A29 — SCD2 (slowly-changing dimension, type 2): collapse a
    // per-key attribute history into [valid_from, valid_to) validity
    // intervals with a current flag — the standard warehouse dimension
    // model next to snapshot_diff's reconciliation and snapshot_merge's
    // apply. The history here is synthesized from orders (3 versions;
    // md5-classified keys change price at v2, v3, both, or never), so
    // every interval shape occurs. Plan: ONE shuffle on the key, then
    // two in-partition windows (lag to find change points, lead to
    // close each segment) — the key is high-cardinality, so no reducer
    // ever holds more than one key's (3-row) history; at 100 TB this
    // is the dimension-table rebuild that runs beside the fact loads.
    QueryDef(
      "scd2_history",
      """WITH h AS (SELECT o_orderkey, o_totalprice,
        |                  substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) AS h1,
        |                  substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1) AS h2
        |           FROM orders),
        |hist AS (SELECT o_orderkey, v.version,
        |                o_totalprice
        |                + (CASE WHEN v.version >= 2 AND h1 IN ('0','1','2','3') THEN 10e0 ELSE 0e0 END)
        |                + (CASE WHEN v.version >= 3 AND h2 IN ('0','1','2','3') THEN 5e0 ELSE 0e0 END) AS price
        |         FROM h, (SELECT unnest(generate_series(1, 3)) AS version) v),
        |c AS (SELECT *, lag(price) OVER (PARTITION BY o_orderkey ORDER BY version) AS prev
        |      FROM hist),
        |seg AS (SELECT o_orderkey, price, version AS valid_from FROM c
        |        WHERE prev IS NULL OR price <> prev)
        |SELECT o_orderkey, price, CAST(valid_from AS BIGINT) AS valid_from,
        |       CAST(lead(valid_from) OVER (PARTITION BY o_orderkey ORDER BY valid_from) AS BIGINT) AS valid_to,
        |       lead(valid_from) OVER (PARTITION BY o_orderkey ORDER BY valid_from) IS NULL AS is_current
        |FROM seg""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val key = col("o_orderkey").cast("string")
      val hist = Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_totalprice"),
          substring(md5(key), 1, 1).as("h1"), substring(md5(key), 2, 1).as("h2"))
        .withColumn("version", explode(sequence(lit(1), lit(3))))
        .select(col("o_orderkey"), col("version"),
          (col("o_totalprice")
            + when(col("version") >= 2 && col("h1").isin("0", "1", "2", "3"), lit(10.0))
              .otherwise(lit(0.0))
            + when(col("version") >= 3 && col("h2").isin("0", "1", "2", "3"), lit(5.0))
              .otherwise(lit(0.0))).as("price"))
      val byVersion = Window.partitionBy(col("o_orderkey")).orderBy(col("version"))
      val seg = hist
        .withColumn("prev", lag(col("price"), 1).over(byVersion))
        .filter(col("prev").isNull || col("price") =!= col("prev"))
        .select(col("o_orderkey"), col("price"), col("version").as("valid_from"))
      val bySegment = Window.partitionBy(col("o_orderkey")).orderBy(col("valid_from"))
      seg
        .withColumn("valid_to", lead(col("valid_from"), 1).over(bySegment))
        .select(col("o_orderkey"), col("price"),
          col("valid_from").cast("long").as("valid_from"),
          col("valid_to").cast("long").as("valid_to"),
          col("valid_to").isNull.as("is_current"))
    },

    // A36 — declarative data-quality constraint checking (the
    // dbt-test / Deequ shape): uniqueness via groupBy-HAVING (map-side
    // count partials — never a distinct-vs-total comparison that scans
    // twice), referential integrity via anti joins (keyed, AQE-sized),
    // null/range rules at scan speed; every check reduces to a 1-row
    // count so the report is constant-size no matter the table. The
    // childless-orders check genuinely fires on this data — the report
    // carries real violation counts, not a wall of zeros.
    QueryDef(
      "audit_constraints",
      """SELECT 'pk_orders_unique' AS check_name, CAST(COUNT(*) AS BIGINT) AS n_violations
        |FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1) t
        |UNION ALL
        |SELECT 'fk_lineitem_has_order', CAST(COUNT(*) AS BIGINT)
        |FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orders_have_lineitems', CAST(COUNT(*) AS BIGINT)
        |FROM orders o WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |UNION ALL
        |SELECT 'not_null_totalprice', CAST(COUNT(*) AS BIGINT)
        |FROM orders WHERE o_totalprice IS NULL OR o_orderkey IS NULL
        |UNION ALL
        |SELECT 'range_quantity_1_50', CAST(COUNT(*) AS BIGINT)
        |FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50""".stripMargin) { (spark, dir) =>
      val o = Tables.orders(spark, dir)
      val l = Tables.lineitem(spark, dir)
      def report(name: String, d: org.apache.spark.sql.DataFrame) =
        d.agg(countAll.as("n_violations"))
          .select(lit(name).as("check_name"), col("n_violations"))
      report("pk_orders_unique",
        o.groupBy(col("o_orderkey")).agg(countAll.as("c")).filter(col("c") > 1))
        .unionByName(report("fk_lineitem_has_order",
          l.join(o.select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"), "left_anti")))
        .unionByName(report("orders_have_lineitems",
          o.join(l.select(col("l_orderkey")),
            col("o_orderkey") === col("l_orderkey"), "left_anti")))
        .unionByName(report("not_null_totalprice",
          o.filter(col("o_totalprice").isNull || col("o_orderkey").isNull)))
        .unionByName(report("range_quantity_1_50",
          l.filter(col("l_quantity") < 1 || col("l_quantity") > 50)))
    },

    // A23 — incremental aggregate maintenance: yesterday's materialized
    // partial state + today's delta partition merge into the exact
    // full-history aggregate. The two branches stand in for "read the
    // materialized agg table" and "aggregate only the new partition" —
    // the merge is valid because every measure is a mergeable partial
    // (counts and decimal sums re-sum exactly), which is precisely why
    // a 100 TB warehouse never re-scans history for a daily rollup.
    // Both branch filters reach the parquet scan (partition pruning at
    // cluster scale).
    QueryDef(
      "incremental_agg",
      """SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
        |       event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2""".stripMargin) { (spark, dir) =>
      // whole-second cut pushed to both branch scans as raw-nanos
      // comparisons (PlanSpec-asserted; see Tables.eventsInRange for
      // why second granularity makes the pushdown exact)
      val cutSec = java.time.Instant.parse("2024-01-21T00:00:00Z").getEpochSecond
      def partial(events: org.apache.spark.sql.DataFrame) = events
        .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
        .agg(countAll.as("cnt"), sum(dec(col("value"))).as("s"))
      val basePart = partial(
        Tables.eventsInRange(spark, dir, untilSec = Some(cutSec))) // = materialized state
      val deltaPart = partial(
        Tables.eventsInRange(spark, dir, fromSec = Some(cutSec))) // = new partition only
      basePart.unionByName(deltaPart)
        .groupBy(col("d"), col("event_type"))
        .agg(sum(col("cnt")).as("n"), sum(col("s")).cast("double").as("total"))
        .select(fmtDay(col("d")).as("day"), col("event_type"), col("n"), col("total"))
    },

    // A23b — incremental JOIN-view maintenance (two-sided delta
    // algebra): the joined, aggregated view V = Agg(O ⋈ C) kept
    // current when BOTH sides receive deltas. With O = O₀ ∪ ΔO and
    // C = C₀ ∪ ΔC the join distributes:
    //   V = merge( Agg(O₀⋈C₀)   — the stored view state,
    //              Agg(ΔO⋈C)    — new facts against the full dim,
    //              Agg(O₀⋈ΔC) ) — old facts matching new dim keys,
    // and the three terms partition the pairs exactly (every order
    // matches ONE customer, so its pair lands in exactly one term by
    // (order-age, customer-age)). Deltas are deterministic: ΔO =
    // orders from 1998 (the arriving partition), ΔC = customers whose
    // md5 class is '0'/'1' (~⅛ churn). Measures (count + decimal sum)
    // are mergeable, so the merge step costs |segments| rows. At
    // 100 TB the state term is a stored-table read, ΔO⋈C shuffles
    // only the delta (C pre-bucketed on the key), and O₀⋈ΔC — the
    // classic dim-churn term — is a co-partitioned probe of the fact
    // by a churn-sized key set (AQE-decided build side, per the hint
    // policy: churn is corpus-shaped, not provably bounded). The
    // oracle computes the plain full join; equality IS the algebra.
    QueryDef(
      "incremental_join",
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (spark, dir) =>
      val cutoff = lit("1998-01-01").cast("timestamp")
      val isNewCust = substring(md5(col("c_custkey").cast("string")), 1, 1).isin("0", "1")
      val cust = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"), isNewCust.as("cnew"))
      val custOld = cust.filter(!col("cnew"))
      val custNew = cust.filter(col("cnew"))
      val ord = Tables.orders(spark, dir)
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      val ordOld = ord.filter(col("o_orderdate") < cutoff)
      val ordNew = ord.filter(col("o_orderdate") >= cutoff)
      def partial(o: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) = o
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(countAll.as("cnt"), sum(dec(col("o_totalprice"))).as("s"))
      partial(ordOld, custOld)           // stored view state
        .unionByName(partial(ordNew, cust))    // ΔO ⋈ (C₀ ∪ ΔC)
        .unionByName(partial(ordOld, custNew)) // O₀ ⋈ ΔC
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("cnt")).as("n_orders"), sum(col("s")).cast("double").as("total_price"))
    },

    // A48 — golden-record consolidation (MDM survivorship): one
    // customer profile from TWO source systems with field-level
    // "latest non-null wins" (version, then source priority). The
    // warehouse trio completes: scd2_history keeps versions,
    // snapshot_merge applies one system's changes, THIS merges
    // disagreeing systems. Survivorship is a per-field
    // max(when(f IS NOT NULL, struct(version, prio, f))) argmax — a
    // mergeable aggregate with map-side partials, ONE shuffle on the
    // entity key, no window over the union and no per-field joins
    // (the oracle does it the row_number-per-field way — same
    // output, the fuzzy_match two-algorithms rule). (version, prio)
    // is unique per (entity, row), so the argmax is total; a field
    // null in every surviving source stays null. Sources are
    // synthesized deterministically from md5 classes (the
    // snapshot_diff classifier idiom).
    QueryDef(
      "golden_record", {
        val unionCte =
          """c AS (SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
            |             substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) AS cls
            |      FROM customer),
            |u AS (
            |  SELECT c_custkey AS custkey, 10 AS v, 1 AS prio,
            |         c_name AS name,
            |         CASE WHEN cls IN ('0','1','2','3') THEN NULL ELSE c_acctbal END AS acctbal,
            |         c_mktsegment AS mktsegment
            |  FROM c
            |  UNION ALL
            |  SELECT c_custkey AS custkey, 20 AS v, 2 AS prio,
            |         '+B ' || c_name AS name,
            |         CASE WHEN cls = '4' THEN NULL ELSE c_acctbal + 100 END AS acctbal,
            |         CAST(NULL AS VARCHAR) AS mktsegment
            |  FROM c WHERE cls IN ('0','1','4','5'))""".stripMargin
        def pick(f: String) =
          s"""$f AS (SELECT custkey, $f FROM (
             |  SELECT custkey, $f,
             |         row_number() OVER (PARTITION BY custkey ORDER BY v DESC, prio DESC) AS rn
             |  FROM u WHERE $f IS NOT NULL) t WHERE rn = 1)""".stripMargin
        s"""WITH $unionCte,
           |${pick("name")},
           |${pick("acctbal")},
           |${pick("mktsegment")},
           |n AS (SELECT custkey, COUNT(*) AS n_sources FROM u GROUP BY custkey)
           |SELECT n.custkey, p.name, a.acctbal, m.mktsegment, n.n_sources
           |FROM n
           |LEFT JOIN name p USING (custkey)
           |LEFT JOIN acctbal a USING (custkey)
           |LEFT JOIN mktsegment m USING (custkey)""".stripMargin
      }) { (spark, dir) =>
      val ccls = substring(md5(col("c_custkey").cast("string")), 1, 1)
      val c = Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_mktsegment"), ccls.as("cls"))
      val srcA = c.select(
        col("c_custkey").as("custkey"), lit(10).as("v"), lit(1).as("prio"),
        col("c_name").as("name"),
        when(col("cls").isin("0", "1", "2", "3"), lit(null).cast("double"))
          .otherwise(col("c_acctbal")).as("acctbal"),
        col("c_mktsegment").as("mktsegment"))
      val srcB = c.filter(col("cls").isin("0", "1", "4", "5")).select(
        col("c_custkey").as("custkey"), lit(20).as("v"), lit(2).as("prio"),
        concat(lit("+B "), col("c_name")).as("name"),
        when(col("cls") === "4", lit(null).cast("double"))
          .otherwise(col("c_acctbal") + 100).as("acctbal"),
        lit(null).cast("string").as("mktsegment"))
      def survive(f: String) =
        max(when(col(f).isNotNull, struct(col("v"), col("prio"), col(f))))
          .getField(f).as(f)
      srcA.unionByName(srcB)
        .groupBy(col("custkey"))
        .agg(survive("name"), survive("acctbal"), survive("mktsegment"),
          countAll.as("n_sources"))
    },

    // A22 — one-pass numeric column profiling of the biggest fact.
    QueryDef(
      "profile_stats", {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        cols.map { c =>
          s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
             |       COUNT(*) - COUNT($c) AS n_null,
             |       CAST(MIN($c) AS DOUBLE) AS min_val,
             |       CAST(MAX($c) AS DOUBLE) AS max_val,
             |       CAST(SUM(CAST($c AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM lineitem""".stripMargin
        }.mkString("\nUNION ALL\n")
      }) { (spark, dir) =>
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val aggs = cols.flatMap(c => Seq(
        count(col(c)).as(s"${c}_n"),
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"),
        dsum(col(c)).as(s"${c}_sum")))
      val one = Tables.lineitem(spark, dir)
        .agg(countAll.as("n_rows"), aggs: _*)
      val stacked = one.select(
        col("n_rows"),
        expr(s"stack(${cols.size}, " +
          cols.map(c => s"'$c', ${c}_n, ${c}_min, ${c}_max, ${c}_sum").mkString(", ") +
          ") AS (column_name, n_non_null, min_val, max_val, total)"))
      stacked.select(
        col("column_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_null"),
        col("min_val"), col("max_val"), col("total"))
    })
}
