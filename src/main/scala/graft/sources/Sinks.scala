package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}

/** Sinks mirroring the reference's load side (SURVEY.md §2.1 R7–R9):
  *
  *  - R7 CSV with header + pinned 15-column schema
  *    (transform-service/main.py:141-166),
  *  - R8 append load with schema check (main.py:54-76, WRITE_APPEND),
  *  - R9 timestamped snapshot naming (extract-service/main.py:218-220),
  *    plus the matching latest-snapshot pick (transform/main.py:86-89).
  *
  * Snapshots are directories `snapshot=<ts>/` so at cluster scale the
  * "latest" pick is partition pruning over listing metadata, not a
  * data read.
  */
object Sinks {

  /** The reference's pinned CSV header (transform-service/main.py:141-157). */
  val courseColumns: Seq[String] = Seq(
    "collection_label", "collection_id", "course_name", "course_id",
    "slug", "url", "image_url", "partners", "partner_ids",
    "difficulty_level", "is_part_of_coursera_plus", "course_count",
    "is_cost_free", "marketing_product_type", "is_pathway_content")

  /** R7 — header CSV in the pinned column order; refuses schema drift. */
  def writeCourseCsv(df: DataFrame, path: String): Unit = {
    require(df.columns.toSeq.sorted == courseColumns.sorted,
      s"course CSV schema drift: got ${df.columns.mkString(",")}")
    df.select(courseColumns.map(df.col): _*)
      .write.mode("overwrite").option("header", "true").csv(path)
  }

  /** The pinned 15-column type layout of the course CSV: every column
    * a string except the two booleans the flatten projects as typed —
    * exactly what landing the reference's CSV into a typed table
    * should recover. */
  val courseCsvSchema: StructType = StructType(courseColumns.map {
    case n @ ("is_part_of_coursera_plus" | "is_pathway_content") =>
      StructField(n, BooleanType)
    case n => StructField(n, StringType)
  })

  /** R7-load, production form — explicit-schema CSV read-back: one
    * scan, no inference pass (the 100 TB rule the inferred variant's
    * Scaladoc states), types pinned so upstream drift surfaces as
    * parse nulls instead of a silently retyped table. */
  def readCourseCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema(courseCsvSchema)
      .csv(path)

  /** R7-load — the warehouse's schema-inferred CSV read-back: the twin
    * of the reference's BigQuery `autodetect=True, skip_leading_rows=1`
    * load (transform-service/main.py:63-64). Spark scans the file once
    * to recover column types (booleans, longs) instead of landing
    * everything as strings. At 100 TB prefer the explicit-schema read —
    * inference doubles the scan — but the reference behavior is load-
    * time type recovery, and this is its Spark form. */
  def readCourseCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true") // = skip_leading_rows=1 + names from header
      .option("inferSchema", "true") // = autodetect=True
      .csv(path)

  /** R8 — WRITE_APPEND into a warehouse parquet table. */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** R8 with the warehouse's type gate: BigQuery's autodetect load
    * REFUSES an append whose inferred schema diverges from the table
    * (transform-service/main.py:63-65 relies on that refusal). Spark's
    * parquet append has no such gate — it would happily interleave
    * files of two types and poison every later read — so this is the
    * explicit check: existing-table field (name, dataType) must match
    * the batch exactly, nullability aside. The failure mode this pins:
    * batch 1 infers `course_count` LONG from all-numeric values, a
    * later batch holds "N/A" and infers STRING — that append must die
    * HERE, loudly, not at some reader three days later. Fields are
    * compared as NAME→TYPE maps, not positionally (r8 ADVICE): parquet
    * append resolves columns by name — a later reader unions the files
    * by name — and BigQuery's load matches by name too, so a batch
    * with identical columns in a different order is a legal append,
    * not drift. Duplicate column names are refused outright: a
    * name-keyed resolution is undefined under them. */
  def appendParquetChecked(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val g = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    require(g.map(_._1).distinct.size == g.size,
      s"append refused: duplicate column names in batch (${df.columns.mkString(", ")})")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(path))) {
      val e = spark.read.parquet(path).schema.fields.map(f => (f.name, f.dataType)).toSeq
      require(e.toMap == g.toMap,
        s"append schema drift (BigQuery-autodetect failure mode): table has " +
          s"${e.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")} but batch has " +
          s"${g.map { case (n, t) => s"$n:${t.simpleString}" }.mkString(", ")}")
    }
    df.write.mode("append").parquet(path)
  }

  /** R8 variant — the append load is format-agnostic: ORC keeps the
    * columnar/pushdown properties of parquet (a second columnar
    * format the warehouse can serve), JSON-lines is the interchange
    * form. Same append semantics, same call sites. */
  def appendFormat(df: DataFrame, path: String, format: String): Unit =
    df.write.mode("append").format(format).save(path)

  /** R8 at scale — append with OUTPUT-FILE SIZING. An unsized append
    * writes one file per task: a wide job appending every hour turns
    * the warehouse into millions of KB-files, and every later reader
    * pays listing + footer overhead per file — the classic 100 TB sink
    * failure. Two bounds compose:
    *  - `targetFiles` caps file COUNT via a pre-write round-robin
    *    repartition — deliberately NOT `coalesce(n)`: coalesce fuses
    *    into the write stage and would throttle the PRODUCING
    *    computation to n tasks, while the repartition costs one extra
    *    pass of the output data and leaves upstream stages wide.
    *  - `maxRecordsPerFile` caps file SIZE: a writer task that exceeds
    *    it rolls to a new file, so a skewed or miscounted partition
    *    can never produce one unsplittable multi-GB file.
    * On a cluster the count knob is sized as output-bytes ÷ target
    * file size (~128-512 MB for parquet); SinksSpec pins both bounds. */
  def appendParquetSized(df: DataFrame, path: String,
      targetFiles: Int, maxRecordsPerFile: Long): Unit =
    df.repartition(targetFiles)
      .write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** The sized OVERWRITE twin of [[appendParquetSized]] — same two
    * bounds, idempotent: a retried materialization or compaction
    * REWRITES its output instead of appending a duplicate copy. Use
    * this for produce-a-table jobs; the append form is for
    * accumulating loads. */
  def writeParquetSized(df: DataFrame, path: String,
      targetFiles: Int, maxRecordsPerFile: Long): Unit =
    df.repartition(targetFiles)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)

  /** R8 at scale — partitioned daily load with DYNAMIC partition
    * overwrite: the idempotent-backfill idiom. A re-run (or late-data
    * correction) of one day's load replaces EXACTLY the partition
    * directories present in `df` and leaves every other day's data
    * untouched. The two mode-alternatives both corrupt a warehouse at
    * scale: static overwrite truncates the WHOLE table before writing
    * (one bad backfill deletes years of history), append duplicates
    * the re-run day. Dynamic overwrite is also the natural exactly-
    * once batch sink: day-keyed reprocessing can crash and retry
    * without a dedup pass. File sizing rides along (`maxRecordsPerFile`
    * bounds size; callers pre-repartition by the partition column to
    * bound count — that also aligns writer tasks with output
    * partitions, so a task writes whole files into one directory).
    *
    * SINGLE-WRITER CONTRACT (r12 advice): on entry this sink sweeps
    * `.spark-staging-*` debris that a crashed predecessor stranded
    * under `path` (invisible to readers, but accreting a full copy of
    * the failed write per crash — found by the r12 CrashPointSpec
    * sweep). The default `sweepStagingOlderThanMs = 0` deletes ALL
    * staging dirs found at entry, which is only safe when one writer
    * at a time touches this table path — the crash-retry idiom this
    * sink documents. CONCURRENT backfills of different days into one
    * table must not use the default: a second live writer's staging
    * dir would be deleted mid-write, corrupting its commit. Such
    * callers pass `-1` (never sweep; debris needs separate nightly
    * cleanup) or an age threshold comfortably above their longest
    * write (only dirs with mtime older than that are swept). */
  def overwriteDayPartitions(df: DataFrame, path: String, dayCol: String,
      maxRecordsPerFile: Long, sweepStagingOlderThanMs: Long = 0L): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (sweepStagingOlderThanMs >= 0 && fs.exists(p)) {
      val cutoff = System.currentTimeMillis() - sweepStagingOlderThanMs
      fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".spark-staging")
          && s.getModificationTime <= cutoff)
        .foreach(s => fs.delete(s.getPath, true))
    }
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(dayCol)
      .parquet(path)
  }

  /** Small-files COMPACTION for an append-accumulated table: rewrite
    * `src` into `dst` under the sized bounds. Append sinks (R8 and the
    * streaming batch dirs) accumulate one file per task per batch by
    * design; compaction is the periodic maintenance job that restores
    * scan efficiency. Rewrite-to-fresh-directory (not in place): a
    * production deployment swaps the table pointer (metastore
    * location / view) after the rewrite lands, so readers never see a
    * half-compacted directory. The write is an idempotent sized
    * OVERWRITE — a crashed-and-retried compaction rewrites dst rather
    * than stacking a second copy on a partial one. Returns the
    * rewritten row count so the caller can gate the swap on it. */
  def compactParquet(spark: SparkSession, src: String, dst: String,
      targetFiles: Int, maxRecordsPerFile: Long): Long = {
    writeParquetSized(spark.read.parquet(src), dst, targetFiles, maxRecordsPerFile)
    spark.read.parquet(dst).count()
  }

  /** R9 — timestamped snapshot dir under a base path. */
  def writeSnapshot(df: DataFrame, base: String, ts: String): Unit =
    df.write.mode("overwrite").parquet(s"$base/snapshot=$ts")

  /** R6 — pick the lexicographically-latest snapshot (the reference's
    * `max(blobs, key=name)`), via filesystem listing metadata only. */
  def latestSnapshotPath(spark: SparkSession, base: String): Option[String] = {
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new Path(base)
    if (!fs.exists(p)) None
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snapshot="))
      .map(_.getPath.toString).sorted.lastOption
  }

  def readLatestSnapshot(spark: SparkSession, base: String): Option[DataFrame] =
    latestSnapshotPath(spark, base).map(spark.read.parquet(_))
}
