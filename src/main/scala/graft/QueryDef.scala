package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One SURVEY.md §2 operator: a Spark query over an sf dir plus the
  * DuckDB SQL the driver replays on the same parquet tables. Column
  * names must match exactly (driver sorts columns by name, then hashes
  * values) — alias everything on both sides. `oracle = None` → driver
  * records a weaker rows-only check. */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
}
