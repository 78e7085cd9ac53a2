package graft.sources

import org.apache.hadoop.fs.Path
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
    // empty input / all-null key: there is no band structure to build
    // (min/max are null) — write the sized output as-is instead of
    // NPEing before the destination even exists
    if ((0 until 4).exists(b.isNullAt)) {
      df.repartition(targetFiles).write.mode("overwrite").parquet(path)
      return
    }
    // Scale by integer DIVISION into 2^bits buckets (div, not /:
    // Column./ is double division and the bit ops below need exact
    // LONG arithmetic). Dividing by a precomputed step — instead of
    // the (x - lo) * 2^bits form — keeps every intermediate inside
    // Long for ANY key span: a nanos-timestamp key spans ~2^55+ and
    // the multiply-first form silently wraps negative (garbage Z
    // values, random bands, pruning quietly gone). Spans the
    // SUBTRACTION itself cannot represent are refused loudly.
    def scaled(key: String, lo: Long, hi: Long): Column = {
      val span = BigInt(hi) - BigInt(lo) + 1
      require(span <= BigInt(Long.MaxValue),
        s"writeZOrdered: key `$key` spans $span (> Long range) — rescale the column first")
      val step = ((span + (1L << bits) - 1) / (1L << bits)).toLong max 1L
      expr(s"(CAST(`$key` AS BIGINT) - $lo) div $step")
    }
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

  /** What [[eraseKeys]] did: total data files seen, files rewritten
    * (their key band intersected the delete set), rows deleted. */
  case class EraseReport(filesTotal: Int, filesRewritten: Int, rowsDeleted: Long)

  /** Band discovery for [[eraseKeys]], kept distributed end-to-end:
    * the per-file (min, max, count) band table never leaves the
    * executors; the sorted delete set is broadcast and range-semi-
    * joined against it, and ONLY the affected (file, rowCount) list is
    * collected — O(affected) driver state instead of O(|files|).
    * Returns (total data files, affected files with their row counts).
    * The semi-join is a broadcast nested-loop over |files| × |keys|
    * band comparisons — distributed, and this is a maintenance path
    * driven by a bounded compliance batch, not a query path. Files
    * with no non-null keys have NULL bands and never match. */
  def discoverAffected(spark: SparkSession, path: String, key: String,
      sortedKeys: Array[Long]): (Long, Array[(String, Long)]) = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val bands = spark.read.parquet(path)
      .select(input_file_name().as("file"), col(key).cast("long").as("k"))
      .groupBy(col("file"))
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"), count(lit(1)).as("c"))
      .persist() // |files| rows; reused by the count and the semi-join
    try {
      val filesTotal = bands.count()
      val del = broadcast(sortedKeys.toSeq.toDF("__dk"))
      val affected = bands
        .join(del, col("__dk").between(col("lo"), col("hi")), "left_semi")
        .select(col("file"), col("c"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
      (filesTotal, affected)
    } finally bands.unpersist()
  }

  /** Targeted erasure (right-to-be-forgotten) on a clustered table:
    * delete every row whose `key` is in `deleteKeys`, rewriting ONLY
    * the files whose [min, max] key band can contain a deleted key.
    *
    * This is why the FILTER-side layout ([[writeClustered]] on the
    * entity key) matters operationally, not just for scans: each file
    * covers a narrow key band, so erasing K entities touches O(K)
    * files while a round-robin layout would rewrite the whole table —
    * at 100 TB that is the difference between a nightly compliance
    * job and a full-table rewrite per deletion batch.
    *
    * Mechanics:
    *  1. band discovery is a ONE-COLUMN scan grouped by
    *     `input_file_name()` (column pruning makes it footer + single
    *     column I/O) into a DISTRIBUTED per-file (band, row count)
    *     table; the broadcast delete set is range-semi-joined against
    *     it so only the AFFECTED file list ever reaches the driver —
    *     a 100 TB table has 10⁶–10⁷ files and collecting every path
    *     string would be hundreds of MB of driver state, while the
    *     affected list is O(K) for K deleted entities (and is needed
    *     on the driver anyway, as the re-read file list);
    *  2. only intersecting files are re-read, anti-filtered (null
    *     keys are KEPT — a NULL is never one of the requested keys),
    *     and rewritten into a sibling temp dir;
    *  3. the swap renames the rewrites IN first (their part-file
    *     names are UUID-unique, so they cannot collide), THEN deletes
    *     the affected originals — under the two-phase [[SwapJournal]]:
    *     a crash mid-rename is rolled BACK (targets deleted, originals
    *     intact) and a crash mid-delete is rolled FORWARD (remaining
    *     originals deleted) by the next maintenance call, so the
    *     duplicate window is transient and never silent row LOSS,
    *     which the delete-first order would cause and nothing could
    *     detect. Untouched files are never read, never rewritten, and
    *     keep their identity (SinksSpec asserts names + mtimes
    *     survive).
    *
    * A band may cover a deleted key without containing it (bands are
    * conservative), and a file with no non-null keys has no band —
    * neither can be affected incorrectly; correctness never depends
    * on the pruning. Re-running the same erasure is idempotent: the
    * second pass deletes 0 rows. */
  def eraseKeys(spark: SparkSession, path: String, key: String,
      deleteKeys: Seq[Long]): EraseReport = {
    import org.apache.spark.sql.functions._
    require(deleteKeys.nonEmpty, "empty delete set")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, path) // heal any interrupted prior swap first
    val sortedKeys = deleteKeys.sorted.toArray
    val (filesTotal, affected) = discoverAffected(spark, path, key, sortedKeys)
    if (affected.isEmpty) return EraseReport(filesTotal.toInt, 0, 0L)

    val before = affected.map(_._2).sum
    val files = affected.map(_._1)
    val tmp = path.stripSuffix("/") + "__erase_tmp"
    val src = spark.read.parquet(files: _*)
    // Small batches inline the keys as an In-filter (pushes to the
    // scan); large batches would blow up the expression tree, so they
    // go through a broadcast LEFT ANTI join instead. Null keys are
    // KEPT on both paths — and "null" means null AFTER the long cast:
    // an uncastable key (e.g. a stray 'n/a' in a string column) casts
    // to null, and `!null.isin(...)` is null, which a bare filter
    // silently DROPS — erasing a row whose key was never requested.
    // Guarding on the cast's null matches the anti-join path, where a
    // null join key matches nothing and the row survives.
    val kept =
      if (sortedKeys.length <= 1000) {
        val castKey = col(key).cast("long")
        src.filter(castKey.isNull || !castKey.isin(deleteKeys: _*))
      } else {
        import spark.implicits._
        val del = sortedKeys.toSeq.toDF("__delete_key")
        src.join(broadcast(del), col(key).cast("long") === col("__delete_key"), "left_anti")
      }
    // Rewrite each affected file's survivors under that file's OWN
    // identity (a per-source-file partitioned write), NOT one joint
    // repartitionByRange over the union: when the delete set hits
    // DISJOINT bands, a joint range-shuffle must place some output
    // file across the gap between them, and that file's min/max span
    // then defeats the page pruning the clustered layout exists for
    // (observed: a two-band erasure regressed a selective scan from
    // 744 to 772 decoded rows). Hash-repartitioning on the file index
    // sends each source file's rows to one task, the in-partition
    // sort keeps (file, key) runs contiguous, and partitionBy splits
    // the write per source file — so every rewritten file's span is a
    // SUBSET of its original's and pruning can only improve. Still
    // ONE Spark job at any batch size.
    import spark.implicits._
    val lookup = broadcast(files.zipWithIndex.toSeq.toDF("__file", "__fidx"))
    val toWrite = kept.withColumn("__file", input_file_name())
      .join(lookup, "__file").drop("__file")
    toWrite
      .repartition(files.length, col("__fidx"))
      .sortWithinPartitions(col("__fidx"), col(key))
      .write.partitionBy("__fidx").mode("overwrite").parquet(tmp)
    // Explicit schema on the read-back: a batch that deletes EVERY row
    // of the affected files writes no data files at all (dynamic-
    // partition writes emit nothing for zero rows), and schema
    // inference over the empty tmp dir would throw — turning a valid
    // "erase everything in these files" batch into one that can never
    // complete. With the schema pinned, the count is 0 and the swap
    // proceeds (renames find no files; originals are deleted).
    val after = spark.read.schema(toWrite.schema).parquet(tmp).count()

    // rename in, THEN delete: the crash window duplicates, never loses.
    // fs.rename/delete report many failures as `false` WITHOUT
    // throwing (HDFS semantics) — an unchecked false rename followed
    // by the unconditional delete below would be exactly the silent
    // row loss this ordering exists to prevent, so every boolean is
    // checked and a failed rename aborts BEFORE any original is
    // deleted (leaving the documented duplicate-rows state).
    // a task that owns several __fidx groups writes IDENTICALLY-named
    // part files into each group dir, so the flat target name carries
    // the fidx to stay collision-free (and keeps the part- prefix the
    // compaction globs rely on)
    val renames = fs.listStatus(new Path(tmp)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("__fidx="))
      .flatMap { d =>
        val fidx = d.getPath.getName.stripPrefix("__fidx=")
        fs.listStatus(d.getPath).toSeq
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .map(s => (s.getPath,
            new Path(path, s"part-e$fidx-${s.getPath.getName.stripPrefix("part-")}")))
      }
    swapIn(fs, path, renames, files.map(f => new Path(new java.net.URI(f))), "eraseKeys")
    fs.delete(new Path(tmp), true)
    EraseReport(filesTotal.toInt, files.length, before - after)
  }

  /** The journaled rename-in-then-delete swap shared by [[eraseKeys]]
    * and [[compactSmallFiles]] (one definition, so the two ops'
    * recovery guarantees cannot drift): journal phase 1 before any
    * rename (a crash mid-rename rolls the landed targets BACK —
    * originals are all intact), phase 2 once every target is in (a
    * crash mid-delete rolls the remaining originals FORWARD), journal
    * removed after the deletes. Every rename/delete boolean is checked
    * — HDFS reports many failures as `false` without throwing, and an
    * unchecked false rename followed by the deletes would be exactly
    * the silent row loss the rename-first order exists to prevent. An
    * in-process rename failure triggers recoverSwap (restoring the
    * exact pre-call state, stale tmp dirs swept) before throwing. */
  private def swapIn(fs: org.apache.hadoop.fs.FileSystem, path: String,
      renames: Seq[(Path, Path)], originals: Seq[Path], op: String): Unit = {
    writeJournal(fs, path, "renaming", renames.map(_._2.getName))
    val failedRenames = renames.filterNot { case (from, to) => fs.rename(from, to) }
    if (failedRenames.nonEmpty) {
      recoverSwap(fs, path)
      throw new java.io.IOException(
        s"$op: ${failedRenames.size} rename(s) into $path returned false; " +
          "swap rolled back, table unchanged — safe to re-run: " +
          failedRenames.map(_._1.getName).mkString(", "))
    }
    writeJournal(fs, path, "deleting", originals.map(_.getName))
    val failedDeletes = originals.filterNot(p => fs.delete(p, false) || !fs.exists(p))
    if (failedDeletes.nonEmpty)
      throw new java.io.IOException(
        s"$op: ${failedDeletes.size} original-file delete(s) returned false; " +
          "the swap journal remains — the next eraseKeys/compactSmallFiles call " +
          "(or recoverSwap) rolls the deletes forward: " + failedDeletes.mkString(", "))
    fs.delete(new Path(path, SwapJournal), false)
  }

  // ---- the two-phase swap journal shared by eraseKeys and ----
  // ---- compactSmallFiles ----
  //
  // A file swap (rename rewrites in, delete originals) has a crash
  // window in which BOTH copies exist. Checked booleans catch the
  // in-process failure, but a hard crash (process death) used to leave
  // duplicates with no principled recovery — re-running compaction
  // would have PACKED the duplicates permanently, and eraseKeys'
  // old message even recommended exactly that. The journal makes every
  // swap resumable: before any rename the op writes
  // `_swap_journal` = "renaming" + the TARGET names it is about to
  // create; after all renames succeed it atomically becomes
  // "deleting" + the ORIGINAL names; after the deletes it is removed.
  // Recovery (run automatically at the start of every swap op) is one
  // rule: delete every listed name that still exists —
  //   · phase "renaming": originals are all intact, so deleting the
  //     listed targets ROLLS BACK to the exact pre-swap state;
  //   · phase "deleting": targets are all in place, so deleting the
  //     listed originals ROLLS FORWARD to the exact post-swap state.
  // Either way the table is consistent and the op can be re-run.
  private val SwapJournal = "_swap_journal"
  private val SwapJournalTmp = "_swap_journal.tmp"
  private val JournalPhases = Set("renaming", "deleting")

  /** Journal writes are crash-atomic (the r8 ADVICE item): a plain
    * fs.create(overwrite=true) TRUNCATES the live journal in place, so
    * a crash inside the phase-1→phase-2 overwrite window used to leave
    * an empty/partial journal — recovery then "healed" nothing and
    * deleted the journal, permanently stranding the duplicate rows the
    * journal exists to clean up. Instead: write the full content to a
    * sibling tmp name, then delete+rename over the journal. The only
    * new window (after the delete, before the rename) leaves a
    * COMPLETE tmp and no journal, which [[recoverSwap]] promotes; a
    * crash during the tmp write leaves the old journal authoritative
    * (a present journal always wins over a possibly-partial tmp). */
  private def writeJournal(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      phase: String, names: Seq[String]): Unit = {
    val tmp = new Path(dir, SwapJournalTmp)
    val out = fs.create(tmp, true)
    try out.write((phase +: names).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val j = new Path(dir, SwapJournal)
    if (fs.exists(j) && !fs.delete(j, false))
      throw new java.io.IOException(s"could not replace swap journal $j")
    if (!fs.rename(tmp, j))
      throw new java.io.IOException(s"could not rename $tmp over $j")
  }

  /** Apply any pending swap journal under `dir` (no-op without one).
    * Public so an operator can heal a table before scanning it. */
  def recoverSwap(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, dir)
  }

  private def recoverSwap(fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit = {
    val j = new Path(dir, SwapJournal)
    val tmp = new Path(dir, SwapJournalTmp)
    if (fs.exists(j)) {
      // a journal always outranks the tmp: the tmp may be a partial
      // write from a crash mid-writeJournal, the journal never is
      if (fs.exists(tmp)) fs.delete(tmp, false)
    } else if (fs.exists(tmp)) {
      // crashed between writeJournal's delete and rename: the tmp is
      // COMPLETE by construction (written+closed before the delete) —
      // promote it and recover from it
      if (!fs.rename(tmp, j))
        throw new java.io.IOException(s"could not promote $tmp to $j during recovery")
    } else {
      cleanupSwapTmpDirs(fs, dir)
      return
    }
    val in = fs.open(j)
    val content = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
        .foreach(n => bos.write(buf, 0, n))
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
    val lines = content.split("\n").toSeq
    val (phase, names) = (lines.head, lines.tail.filter(_.nonEmpty))
    // fail LOUDLY on a phase recovery does not understand (r8 ADVICE):
    // silently deleting an unparseable journal would discard the only
    // record that a swap is half-applied — the exact silent state the
    // journal exists to prevent. Leave the journal in place for a
    // human (or a fixed binary) to act on.
    if (!JournalPhases.contains(phase))
      throw new java.io.IOException(
        s"swap journal $j has unknown phase '$phase' — refusing to recover; " +
          "inspect the journal (its listed names are either swap targets to roll " +
          "back or originals to roll forward) before deleting it")
    val leftover = names.map(n => new Path(dir, n)).filter(fs.exists)
    val failed = leftover.filterNot(p => fs.delete(p, false) || !fs.exists(p))
    if (failed.nonEmpty)
      throw new java.io.IOException(
        s"swap recovery (phase $phase) could not delete: ${failed.mkString(", ")}")
    fs.delete(j, false)
    cleanupSwapTmpDirs(fs, dir)
  }

  /** Remove the swap ops' rewrite directories (r8 ADVICE): a crash
    * before/inside a swap can strand <path>__erase_tmp (sibling) or
    * <path>/.compact_tmp (hidden, inside) on disk, and stale rewrite
    * output both accumulates and invites being mistaken for table
    * data. Always safe: a LIVE swap never runs concurrently with
    * recovery (every swap op starts by calling recoverSwap, then
    * writes its tmp), and originals are intact whenever a tmp exists
    * without a "deleting" journal. The legacy sibling
    * <path>__compact_tmp name is swept too (pre-r10 crashes). */
  private def cleanupSwapTmpDirs(fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit = {
    Seq("__erase_tmp", "__compact_tmp").foreach { suffix =>
      val p = new Path(dir.stripSuffix("/") + suffix)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val hidden = new Path(dir, CompactTmp)
    if (fs.exists(hidden)) fs.delete(hidden, true)
  }

  /** Compaction rewrite dir: INSIDE the table dir with a dot-name, so
    * Spark's file listing ignores it even mid-crash. The old sibling
    * naming (<path>__compact_tmp) was safe for flat tables but lethal
    * inside a `cid=` partitioned index layout: a crash would strand a
    * `cid=3__compact_tmp` DIRECTORY that partition discovery then
    * parses as a partition value, flipping the cid column's inferred
    * type for every reader until someone cleans up. A dot-dir is
    * invisible to every Spark reader at every nesting level. */
  private val CompactTmp = ".compact_tmp"

  final case class CompactReport(
      filesTotal: Int, filesCompacted: Int, filesWritten: Int, bytesCompacted: Long)

  /** Small-file compaction — the warehouse's nightly bin-packing job.
    * An hourly append writes one file per task; after a month a 100 TB
    * table is millions of KB-files and every reader pays listing +
    * footer overhead per file (the classic sink failure
    * [[graft.sources.Sinks.appendParquetSized]] PREVENTS for its own
    * writes — this repairs tables written without it, and the
    * duplicate-rows state an interrupted [[eraseKeys]] swap documents
    * as "recoverable by the surrounding compaction" gets rewritten
    * into fresh files here too). Only files under `smallBytes` are
    * read or rewritten: large files keep their identity (names,
    * mtimes — spec-asserted), so the job's cost scales with the
    * small-file MASS, not the table. Packed output is sized by
    * `targetBytes` via round-robin repartition + one write.
    *
    * Same crash discipline as eraseKeys: rewrites land in a sibling
    * tmp dir, rename IN first (a `part-c` prefix keeps names
    * collision-free), originals deleted after — a crash inside the
    * window duplicates rows, never loses them, and every rename/delete
    * boolean is checked because HDFS reports failures as `false`.
    *
    * The file inventory is a driver-side listing — O(|files|) path
    * strings, the standard shape for a maintenance job that must
    * decide per-file anyway; at 10⁷-file extremes run it per partition
    * directory. NOT for [[writeClustered]] tables: merging band files
    * widens their key spans and defeats the pruning that layout exists
    * for — recluster those with writeClustered instead. */
  def compactSmallFiles(spark: SparkSession, path: String,
      smallBytes: Long, targetBytes: Long = 128L << 20): CompactReport = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, path) // heal any interrupted prior swap first
    val files = fs.listStatus(new Path(path)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val small = files.filter(_.getLen < smallBytes)
    if (small.size <= 1) return CompactReport(files.size, 0, 0, 0L)
    val totalBytes = small.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(path, CompactTmp).toString
    spark.read.parquet(small.map(_.getPath.toString): _*)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp)
    val renames = fs.listStatus(new Path(tmp)).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(s => (s.getPath,
        new Path(path, "part-c" + s.getPath.getName.stripPrefix("part-"))))
    swapIn(fs, path, renames, small.map(_.getPath), "compactSmallFiles")
    fs.delete(new Path(tmp), true)
    CompactReport(files.size, small.size, renames.size, totalBytes)
  }

  /** [[compactSmallFiles]] over a Hive-style partitioned layout: run
    * the swap-journaled compaction INSIDE every `key=value` partition
    * directory (each partition heals, packs, and journals
    * independently — a crash in one partition never blocks the
    * others). Part files inside a partition dir carry only the data
    * columns (the partition value lives in the dir name), so the
    * rewrite round-trips them unchanged and readers of the full
    * layout are oblivious. Cost is ∝ the small-file MASS actually
    * rewritten (files at or above `smallBytes` — e.g. a compacted
    * base — are never reread), which is what makes this the right
    * nightly maintenance for an append-heavy `cid=` ANN index: each
    * daily delta adds O(tasks) small files per cell, and compaction
    * pays for the deltas, not the index. */
  def compactPartitionedSmallFiles(spark: SparkSession, root: String,
      smallBytes: Long, targetBytes: Long = 128L << 20): CompactReport = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    // Partitions pack CONCURRENTLY (bounded pool): each partition dir
    // owns an independent swap journal, so parallelism is exactly as
    // safe as the sequential fold was — and sequential was pure
    // job-floor waste (K small Spark jobs back to back; the r11 bench
    // priced 16 cells at ~0.3 s each, ~4 s of the lifecycle seat). On
    // a cluster this is the same shape a real nightly job uses:
    // per-partition maintenance fanned out, each unit journaling its
    // own swap. The finally-block JOIN matters for crash discipline:
    // after a failure every in-flight partition job has terminated
    // before this returns, so a caller's recovery re-run never races
    // a straggler thread from the failed attempt.
    // pool width: at least the historical 8, up to half the box's
    // cores (r16 — each unit is a tiny Spark job; 16 cells behind an
    // 8-wide pool left half the lifecycle seat's compaction phase
    // serialized on a 32-core box, and the per-partition Spark jobs
    // are scheduler-bound, not core-bound). Still bounded: a
    // million-partition table queues, it does not fork a million
    // threads.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parts.size,
        math.max(8, Runtime.getRuntime.availableProcessors() / 2))))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    var bodyCompleted = false
    try {
      val report = scala.concurrent.Await.result(
        scala.concurrent.Future.traverse(parts)(p => scala.concurrent.Future(
          compactSmallFiles(spark, p.getPath.toString, smallBytes, targetBytes))),
        scala.concurrent.duration.Duration.Inf)
        .foldLeft(CompactReport(0, 0, 0, 0L)) { (a, b) =>
          CompactReport(a.filesTotal + b.filesTotal,
            a.filesCompacted + b.filesCompacted,
            a.filesWritten + b.filesWritten,
            a.bytesCompacted + b.bytesCompacted)
        }
      bodyCompleted = true
      report
    } finally {
      pool.shutdown()
      // The boolean matters (r12 advice): after a FAILED partition job
      // the other futures may still be running, and a straggler that
      // outlives the cap would keep mutating its partition's swap
      // journal while the caller starts recovery — exactly the race
      // the join exists to prevent. Log loudly either way; escalate to
      // a throw only when no original exception is already in flight
      // (a throw from finally would swallow it).
      val terminated =
        pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
      if (!terminated) {
        System.err.println(
          "[warehouse] compactPartitionedSmallFiles: worker pool did NOT terminate " +
            "within 10 minutes — a straggler may still be mutating a partition's swap " +
            "journal; do not start recovery against this table until this JVM exits")
        if (bodyCompleted)
          throw new IllegalStateException(
            "compactPartitionedSmallFiles: pool failed to terminate within 10 minutes")
      }
    }
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
