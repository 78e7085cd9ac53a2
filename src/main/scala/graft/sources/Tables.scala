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

  /** events restricted to `[fromSec, untilSec)` (epoch seconds), with
    * the bounds applied to the RAW nanos long BEFORE the micros
    * conversion so they reach the parquet scan as plain long
    * comparisons (`PushedFilters`) — a filter on the derived timestamp
    * column cannot push. Taking the bounds in whole SECONDS (not a
    * free-form predicate) is deliberate: second boundaries are exact
    * under the div-1000 truncation, so the pushed raw-nanos filter is
    * provably equivalent to the same bound on the converted timestamp,
    * and a caller can never accidentally compare a micros value
    * against the nanos column. */
  def eventsInRange(spark: SparkSession, dir: String,
      fromSec: Option[Long] = None, untilSec: Option[Long] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    val bounded = (fromSec.map(s => col("ts") >= s * 1000000000L) ++
      untilSec.map(s => col("ts") < s * 1000000000L))
      .reduceOption(_ && _).map(raw.filter).getOrElse(raw)
    bounded.withColumn("ts", timestamp_micros(expr("ts div 1000")))
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
