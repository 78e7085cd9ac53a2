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
    })
}
