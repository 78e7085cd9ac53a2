package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source registry over the driver-provided star schema (TESTDATA.md).
  *
  * Loads are plain parquet scans so Catalyst keeps full pushdown:
  * filters and column pruning travel to the reader (`PushedFilters` /
  * `ReadSchema` in the formatted plan). At cluster scale the same call
  * sites read partitioned/bucketed layouts without query changes.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 has no native
    * type for (PARQUET_TYPE_ILLEGAL). Read it as a long of nanos and
    * truncate to micros with integer division — double division would
    * lose precision above 2^53, and truncation matches the oracle's
    * CAST(ts AS TIMESTAMP) (TIMESTAMP_NS -> us) exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** events with a time predicate applied to the RAW nanos long BEFORE
    * the micros conversion, so it reaches the parquet scan as a plain
    * long comparison (`PushedFilters`) — a filter on the derived
    * timestamp column cannot push. Whole-second boundaries are exact
    * under the div-1000 truncation, so `ts < nanos(cut)` on the raw
    * column is equivalent to `ts < cut` on the converted one. */
  def eventsWhereNanos(spark: SparkSession, dir: String)(
      pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .filter(pred(col("ts")))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
