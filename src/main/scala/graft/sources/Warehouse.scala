package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed warehouse tables (SURVEY.md §5): pre-shuffle a fact table
  * once at write time so every later equi-join/aggregation on the
  * bucket key runs WITHOUT an Exchange. This is the R8 append-load
  * target done the way a 100 TB warehouse needs it — the join key
  * layout is paid once at load, not on every query.
  */
object Warehouse {

  /** Write `df` as a bucketed+sorted parquet table registered in the
    * session catalog, with data at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketKey: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketKey)
      .sortBy(bucketKey)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
