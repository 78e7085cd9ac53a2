package graft.operators

import graft.QueryDef
import graft.functions.Portable
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §5): salted two-phase aggregation.
  *
  * A hot key (one user, one null-ish default, one viral document)
  * funnels its whole group through a single reducer. Salting splits
  * each group into `nSalts` sub-groups for the wide partial phase,
  * then combines the tiny partial results. AQE's skew-join handles
  * join-side skew at runtime; this helper is for aggregation skew,
  * where the partial/final split must be explicit.
  */
object Skew {

  /** groupBy(key).agg(count, sum(valueCol)) computed skew-safely.
    * The salt derives from md5 of a uniquifier column, so the split is
    * deterministic, needs no RNG state, and stays within the repo's
    * md5-only hashing rule (the salt never reaches the output — any
    * uniform hash works — but one hash family everywhere is simpler
    * to audit). Pass an exact (decimal) valueCol when the total must
    * be order-independent. */
  def saltedSum(df: DataFrame, key: Column, uniquifier: Column, valueCol: Column,
      nSalts: Int): DataFrame =
    df.withColumn("__salt",
      pmod(conv(substring(md5(uniquifier.cast("string")), 1, 8), 16, 10).cast("long"), lit(nSalts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(valueCol).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("total"))

  val defs: Seq[QueryDef] = Seq(

    // §5 scale machinery, oracle-checked: the salted two-phase sum
    // equals the plain GROUP BY. event_type is the engine's hottest
    // key (5 values across all rows) — exactly the shape where a
    // single-phase reducer would bottleneck at 100 TB. The decimal
    // value keeps the total independent of partial order, so the
    // salt split is invisible in the output.
    QueryDef(
      "skew_agg",
      """SELECT event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY event_type""".stripMargin) { (spark, dir) =>
      saltedSum(Tables.events(spark, dir),
        col("event_type"), col("event_id"), Portable.dec(col("value")), nSalts = 8)
        .select(col("k").as("event_type"), col("n"),
          col("total").cast("double").as("total_value"))
    },

    // A42 — join-key skew profiling: the diagnostic that DECIDES when
    // the machinery above (salting, AQE skew-join) is needed. For each
    // candidate key column: row count, distinct-key count, the hottest
    // key and its count, and the skew factor max_cnt·n_keys/n_rows
    // (1.0 = uniform; event_type's ~5 hot values profile high, user_id
    // near 1). Shape: one mergeable groupBy per key column (per-task
    // output ≤ |keys|), a count(*) over the already-distinct relation
    // for n_keys (no Expand — the text_vocab rule), and the hottest
    // key as a max(struct(cnt, key)) argmax partial (total order, ties
    // by key — matches the oracle's rn=1 DESC/DESC). At 100 TB this
    // runs as one pass per key column and returns a constant-size
    // report — the audit_constraints shape applied to physical-plan
    // health.
    QueryDef(
      "skew_profile",
      s"""WITH p AS (
         |  SELECT 'event_type' AS key_col, CAST(event_type AS VARCHAR) AS k FROM events
         |  UNION ALL
         |  SELECT 'user_id' AS key_col, CAST(user_id AS VARCHAR) AS k FROM events),
         |c AS (SELECT key_col, k, COUNT(*) AS cnt FROM p GROUP BY 1, 2),
         |r AS (SELECT key_col, k, cnt,
         |             row_number() OVER (PARTITION BY key_col ORDER BY cnt DESC, k DESC) AS rn
         |      FROM c)
         |SELECT key_col,
         |       CAST(SUM(cnt) AS BIGINT) AS n_rows,
         |       COUNT(*) AS n_keys,
         |       MAX(cnt) AS max_cnt,
         |       MIN(CASE WHEN rn = 1 THEN k END) AS top_key,
         |       ${Portable.Quant6Sql("CAST(MAX(cnt) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)")} AS skew
         |FROM r GROUP BY key_col""".stripMargin) { (spark, dir) =>
      val ev = Tables.events(spark, dir)
      val keyed = ev
        .select(lit("event_type").as("key_col"), col("event_type").cast("string").as("k"))
        .unionByName(ev
          .select(lit("user_id").as("key_col"), col("user_id").cast("string").as("k")))
      keyed
        .groupBy(col("key_col"), col("k"))
        .agg(Portable.countAll.as("cnt"))
        .groupBy(col("key_col"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          Portable.countAll.as("n_keys"),
          max(col("cnt")).as("max_cnt"),
          max(struct(col("cnt"), col("k"))).getField("k").as("top_key"))
        .select(col("key_col"), col("n_rows"), col("n_keys"), col("max_cnt"),
          col("top_key"),
          Portable.quant6(col("max_cnt").cast("double") * col("n_keys").cast("double")
            / col("n_rows").cast("double")).as("skew"))
    })
}
