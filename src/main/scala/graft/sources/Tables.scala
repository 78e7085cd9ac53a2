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

  /** events.ts has shipped in TWO parquet encodings across driver
    * rounds: TIMESTAMP(NANOS) (no native Spark 4 type —
    * PARQUET_TYPE_ILLEGAL unless read as a long of nanos) and plain
    * TIMESTAMP(MICROS)/NTZ. Detect from the scanned schema: a LONG ts
    * is nanos (truncate to micros with integer division — double
    * division would lose precision above 2^53, and truncation matches
    * the oracle's CAST(ts AS TIMESTAMP) exactly); a timestamp ts is
    * native micros and is only normalized NTZ→LTZ (a wall-clock no-op
    * under the UTC session every entry point pins) so every downstream
    * unix_micros/date function sees one type. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** events restricted to `[fromSec, untilSec)` (epoch seconds), with
    * the bounds applied to the RAW scan column BEFORE any conversion
    * so they reach the parquet scan (`PushedFilters`) — a filter on a
    * derived column cannot push. For the nanos-long encoding the bound
    * is a plain long comparison; for the native-timestamp encoding it
    * is a constant-folded timestamp literal (cast to the scan's exact
    * NTZ/LTZ type, so no runtime cast blocks pushdown). Taking the
    * bounds in whole SECONDS (not a free-form predicate) is
    * deliberate: second boundaries are exact under both encodings, so
    * the pushed filter is provably equivalent to the same bound on the
    * converted timestamp, and a caller can never accidentally compare
    * a micros value against a nanos column. */
  def eventsInRange(spark: SparkSession, dir: String,
      fromSec: Option[Long] = None, untilSec: Option[Long] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        val bounded = (fromSec.map(s => col("ts") >= s * 1000000000L) ++
          untilSec.map(s => col("ts") < s * 1000000000L))
          .reduceOption(_ && _).map(raw.filter).getOrElse(raw)
        bounded.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case dt =>
        def bound(s: Long) = timestamp_seconds(lit(s)).cast(dt)
        val bounded = (fromSec.map(s => col("ts") >= bound(s)) ++
          untilSec.map(s => col("ts") < bound(s)))
          .reduceOption(_ && _).map(raw.filter).getOrElse(raw)
        bounded.withColumn("ts", col("ts").cast("timestamp"))
    }
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
