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

  /** Clustered data layout: range-partition + sort the table on its
    * dominant scan key at write time. Each output file (and each row
    * group / page inside it) then covers a NARROW min/max band of the
    * key, so a later point or range predicate prunes most of the
    * table inside the parquet reader (row-group stats + column-index
    * pages) — the same scan serves 100× less I/O than a round-robin
    * layout, with zero query changes. Bucketing (above) optimizes the
    * JOIN layout; clustering optimizes the FILTER layout — a warehouse
    * table usually wants its fact clustered by the hot predicate
    * column (time, tenant, user) and bucketed by the hot join key.
    * ScaleSpec measures the pruning, not assumes it. */
  def writeClustered(df: DataFrame, path: String, targetFiles: Int,
      keys: String*): Unit =
    df.repartitionByRange(targetFiles, keys.map(df.col): _*)
      .sortWithinPartitions(keys.map(df.col): _*)
      .write.mode("overwrite").parquet(path)

  /** Z-ORDER layout: cluster on TWO scan keys at once by sorting on
    * their bit-interleaved (Morton) value. A single-key sort
    * ([[writeClustered]]) gives perfect pruning on its key and NONE on
    * any other; the Z-curve trades a little of the first key's
    * locality for bounded locality on both — a selective predicate on
    * EITHER key prunes a large fraction of files/row groups (Delta's
    * OPTIMIZE ZORDER, Snowflake clustering keys — same idea). Both
    * keys are min-max normalized to `bits` bits first (pure integer
    * arithmetic), because interleaving raw values lets the wider
    * key's high bits dominate the curve and the narrow key stops
    * pruning. The bounds lookup is one tiny all-reduce row fetched to
    * the driver — the scalar-broadcast pattern, write-path only.
    * ScaleSpec measures both-dimension pruning, not assumes it. */
  def writeZOrdered(df: DataFrame, path: String, targetFiles: Int,
      keyA: String, keyB: String, bits: Int = 8): Unit = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    val b = df.agg(
      min(col(keyA).cast("long")), max(col(keyA).cast("long")),
      min(col(keyB).cast("long")), max(col(keyB).cast("long"))).head()
    // `div`, not `/`: Column./ is double division, and the bit ops
    // below need to stay in exact LONG arithmetic
    def scaled(key: String, lo: Long, hi: Long): Column =
      expr(s"((CAST(`$key` AS BIGINT) - $lo) * ${1L << bits}) div ${hi - lo + 1}")
    val a = scaled(keyA, b.getLong(0), b.getLong(1))
    val c = scaled(keyB, b.getLong(2), b.getLong(3))
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), 2 * i))
    }
    df.withColumn("__z", z)
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z") // projection after the sort — row order is preserved
      .write.mode("overwrite").parquet(path)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
