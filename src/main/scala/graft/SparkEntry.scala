package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 (inventory) and §7. */
object SparkEntry {

  /** All implemented operators, each with its DuckDB oracle. */
  def allDefs: Seq[QueryDef] =
    operators.Analytics.defs ++
      operators.Events.defs ++
      operators.Behavior.defs ++
      operators.Journey.defs ++
      operators.CourseFlatten.defs ++
      operators.TextOps.defs ++
      operators.TextStats.defs ++
      operators.Bpe.defs ++
      operators.Dedup.defs ++
      operators.Fuzzy.defs ++
      operators.Graph.defs ++
      operators.Similarity.defs ++
      operators.SetQuantile.defs ++
      operators.Stats.defs ++
      operators.Skew.defs ++
      operators.Audit.defs ++
      operators.Decontam.defs ++
      operators.Corpus.defs ++
      operators.Multimodal.defs ++
      operators.Web.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("flatten_courses")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
