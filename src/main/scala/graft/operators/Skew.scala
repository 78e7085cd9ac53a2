package graft.operators

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
    * The salt is derived from a uniquifier column so the split is
    * deterministic and needs no RNG state. */
  def saltedSum(df: DataFrame, key: Column, uniquifier: Column, valueCol: Column,
      nSalts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(uniquifier), lit(nSalts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(valueCol).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("total"))
}
