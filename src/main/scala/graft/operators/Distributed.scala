package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix aggregation — global per-group rank / running sum
  * WITHOUT a per-group window.
  *
  * `Window.partitionBy(g).orderBy(o)` funnels every row of a group
  * through ONE reducer; when the group key has few values (event_type,
  * lang: ~5), that is the whole corpus through one task at 100 TB. The
  * scale-safe equivalent is the classic two-pass prefix-sum:
  *
  *   1. range-partition on (group, order) — each shard is a contiguous
  *      slice of the group's global order, sized by the shuffle
  *      partitioning, never by the group;
  *   2. rank/running-sum WITHIN each shard (window keyed by
  *      (group, shard-id): bounded work per task);
  *   3. a one-row-per-shard summary table (counts/sums) turned into
  *      per-shard prefix OFFSETS — tiny, broadcast back;
  *   4. global value = shard offset + local value.
  *
  * Equal (group, order) keys land in one shard (range partitioning
  * compares whole keys), so ranks never split a tie across shards.
  * This is the same mergeable-partials idea `incremental_agg` uses for
  * its materialized rollups, applied to ordered prefixes.
  */
object Distributed {

  /** Lineage cut for iterative chains and multiply-consumed subtrees —
    * the ONE seam every pipeline stages through (r8 verdict gap 3 /
    * ADVICE cluster-reality note). Default is `localCheckpoint`:
    * executor-local block storage, no dfs round-trip — right for a
    * static-executor cluster and local[n]. But local checkpoint blocks
    * DIE WITH THEIR EXECUTOR, and under dynamic allocation an idle
    * executor being reclaimed mid-query kills the job (Spark's own
    * localCheckpoint scaladoc warning). So when
    * `spark.dynamicAllocation.enabled` is set — or a deployment opts
    * in via `graft.checkpoint.reliable=true` (runtime conf) — this
    * switches to RELIABLE `checkpoint` into the configured checkpoint
    * dir, and fails loudly if no cluster-visible checkpoint dir was
    * set rather than silently running the unsafe form. Both forms are
    * EAGER: callers rely on the cut materializing before fan-out. */
  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val reliable = sc.getConf.getBoolean("spark.dynamicAllocation.enabled", false) ||
      spark.conf.getOption("graft.checkpoint.reliable").contains("true")
    if (reliable) {
      require(sc.getCheckpointDir.isDefined,
        "reliable checkpointing requested (spark.dynamicAllocation.enabled or " +
          "graft.checkpoint.reliable=true) but no checkpoint dir is set — call " +
          "sparkContext.setCheckpointDir with a cluster-visible path (HDFS/S3); " +
          "executor-local checkpoints are not safe under dynamic allocation")
      // File-leak guard: reliable checkpoint files are only removed by
      // the ContextCleaner, and ONLY when cleanCheckpoints is on (a
      // session-build SparkConf, default false). Without it every
      // iterative round of the dedup/BPE/pagerank families strands one
      // corpus-sized relation in the checkpoint dir per call — the
      // per-round free() unpersists blocks but cannot delete files —
      // so refuse loudly unless the deployment either enabled the
      // cleaner or explicitly acknowledged the accumulation
      // (graft.checkpoint.allowAccumulation=true, for setups that
      // sweep the dir themselves or reuse checkpoints across jobs).
      require(
        sc.getConf.getBoolean("spark.cleaner.referenceTracking.cleanCheckpoints", false)
          || spark.conf.getOption("graft.checkpoint.allowAccumulation").contains("true"),
        "reliable checkpointing would strand files: set " +
          "spark.cleaner.referenceTracking.cleanCheckpoints=true at session build " +
          "(checkpoint files are then GC-collected with their RDDs) or set " +
          "graft.checkpoint.allowAccumulation=true to accept unbounded growth")
      df.checkpoint(eager = true)
    } else df.localCheckpoint(eager = true)
  }

  /** `.stage()` chaining syntax for [[stage]]. */
  implicit class StageSyntax(private val df: DataFrame) extends AnyVal {
    def stage(): DataFrame = Distributed.stage(df)
  }

  /** Adds `g_rank` (global 1-based row number per `grp` in `ord`
    * order), `g_n` (the group's total row count — free, from the same
    * per-shard summary the offsets come from; a separate count would
    * either rescan the input or duplicate this whole subtree, since
    * spark_partition_id is nondeterministic and blocks exchange
    * reuse), and — when `valueCol` is set — `g_run` (inclusive global
    * running sum of that column) to `df`. No window in the plan
    * partitions by `grp` alone over row data; every corpus-sized
    * window is keyed by (grp, shard). The explicit shard count pins
    * the range shuffle so AQE cannot re-coalesce it differently
    * between the data pass and the offsets pass. Group keys must be
    * non-null: the offsets attach through an inner equi-join on `grp`,
    * so null-keyed rows would drop (pre-filter or coalesce them).
    *
    * CONTRACT — `df` must carry EXACTLY the grp/ord/value columns (a
    * hard require, not a convention): any passenger column makes the
    * offsets branch's subtree column-prune into a NON-identical copy
    * of the ranked-rows branch, which defeats exchange reuse and
    * materializes two independently-sampled range shuffles — the two
    * could then disagree on `__pid` and the ranks would be silently
    * wrong. Join passengers back by (grp, ord) afterwards. The group
    * key must also be LOW-cardinality (that is the case where a plain
    * window is the scale hazard this primitive replaces): the offsets
    * table is (groups × shards) rows and is broadcast — a
    * high-cardinality group key belongs in a plain keyed window. */
  def globalRunning(
      df: DataFrame,
      grp: Seq[String],
      ord: Seq[String],
      valueCol: Option[String] = None): DataFrame = {
    val expected = (grp ++ ord ++ valueCol).toSet
    require(df.columns.toSet == expected,
      s"globalRunning needs exactly the grp/ord/value columns ${expected.mkString(", ")} " +
        s"(got ${df.columns.mkString(", ")}): passenger columns break the single-range-" +
        "shuffle invariant — join them back by the (grp, ord) key afterwards")
    require(expected.forall(c => !c.startsWith("__") && !c.startsWith("g_")),
      "column names starting with __ or g_ are reserved by globalRunning")
    val nPart = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    // Both consumers below (the ranked rows and the per-shard summary)
    // MUST read the SAME materialized range shuffle: range bounds come
    // from seeded sampling whose seed involves the instantiated RDD
    // id, so two independently executed exchanges could draw different
    // bounds and mismatch __pid between the branches. The subtrees are
    // identical by construction (one `parts` val), so Spark's exchange
    // reuse collapses them into one shuffle stage — PlanSpec asserts a
    // single materialized rangepartitioning exchange plus a
    // ReusedExchange in every consumer plan.
    val parts = df.repartitionByRange(nPart, (grp ++ ord).map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val shardKey = (grp :+ "__pid").map(col)

    val wLocOrder = Window.partitionBy(shardKey: _*).orderBy(ord.map(col): _*)
    val wLocRun = wLocOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local0 = parts.withColumn("__lr", row_number().over(wLocOrder))
    val local = valueCol.fold(local0)(v => local0.withColumn("__ls", sum(col(v)).over(wLocRun)))

    // one row per (grp, shard): the offsets relation is sized by the
    // shard count, not the data — safe to window by grp and broadcast
    val per = parts.groupBy(shardKey: _*)
      .agg(count(lit(1)).as("__c"),
        valueCol.fold(lit(0L).as("__s"))(v => sum(col(v)).as("__s")))
    val wOff = Window.partitionBy(grp.map(col): _*).orderBy(col("__pid"))
    // group totals from the SAME tiny off-table window pass (full
    // frame over the per-shard rows): a separate aggregate branch gets
    // column-pruned into a non-identical subtree, which defeats
    // exchange reuse and materializes a THIRD range shuffle of the
    // input just to count groups (observed in text_pack's plan)
    val wTot = wOff.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // offsets come from an EXCLUSIVE preceding-shards frame, not the
    // inclusive-sum-minus-own form: with nullable values an all-null
    // shard has __s = null, and `sum - null` would null-poison its
    // offset where the window-SUM reference (which null-skips) carries
    // the prior shards' total through
    val wPrev = wOff.rowsBetween(Window.unboundedPreceding, -1)
    val off = per
      .withColumn("__coff", coalesce(sum(col("__c")).over(wPrev), lit(0L)))
      .withColumn("__soff", sum(col("__s")).over(wPrev))
      .withColumn("__n", sum(col("__c")).over(wTot))
      .select((grp :+ "__pid").map(col) :+ col("__coff") :+ col("__soff") :+ col("__n"): _*)

    val out0 = local.join(broadcast(off), grp :+ "__pid")
      .withColumn("g_rank", (col("__coff") + col("__lr")).cast("long"))
      .withColumn("g_n", col("__n"))
    // null semantics must match window SUM exactly: null only while NO
    // non-null value has occurred yet (local prefix all-null AND no
    // prior-shard sum), otherwise the null side contributes zero
    val out = valueCol.fold(out0)(_ => out0.withColumn("g_run",
      when(col("__ls").isNull && col("__soff").isNull, lit(null))
        .otherwise(coalesce(col("__soff"), lit(0)) + coalesce(col("__ls"), lit(0)))))
    out.drop("__pid", "__lr", "__ls", "__coff", "__soff", "__n")
  }

  /** NTILE(n) reconstructed from [[globalRunning]]'s (g_rank, g_n) in
    * pure LONG arithmetic (`div`, not `/` — double division would
    * drift past 2^53 rows), matching SQL ntile's "larger groups
    * first" rule: the first r = n mod k buckets take q+1 = n div k +
    * 1 rows, the rest take q (ceil(a/b) = (a + b - 1) div b). The
    * else-branch divides by q, but q = 0 implies fewer rows than
    * buckets, which puts every rank in the then-branch — the division
    * never sees zero. Oracled against DuckDB's NATIVE ntile in
    * events_ntile and rfm_segments. */
  def ntileFromRank(k: Int): org.apache.spark.sql.Column = expr(
    s"""CASE WHEN g_rank <= (g_n div $k + 1) * (g_n % $k)
       |     THEN (g_rank + g_n div $k) div (g_n div $k + 1)
       |     ELSE g_n % $k
       |          + (g_rank - (g_n div $k + 1) * (g_n % $k) + g_n div $k - 1) div (g_n div $k)
       |END""".stripMargin).cast("long")

  /** Exact interpolated quantiles per LOW-cardinality group — the
    * rank-based selection events_quantiles established, extracted so
    * every consumer (plain quantiles, inter-arrival gaps, the MAD
    * anomaly detector) shares one implementation. `df` must carry
    * EXACTLY (grp, v) — the [[globalRunning]] contract. For each
    * (name, p) the result carries a double column `name` interpolated
    * with the engines' shared op order ((hi−pos)·vLo + (pos−lo)·vHi,
    * values cast to double first — works for long and double inputs
    * alike), plus `n`, the group count. Only the ≤ 2·|ps| bracketing
    * ranks per group survive the filter; every stage is
    * shuffle-parallel with memory O(shard), never O(group). */
  def groupedQuantiles(
      df: DataFrame,
      grp: String,
      v: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val ranked = globalRunning(df, Seq(grp), Seq(v))
      .withColumnRenamed("g_n", "n")
    def pos(p: Double) = lit(p) * (col("n") - 1).cast("double")
    def isLo(p: Double) = col("g_rank") === floor(pos(p)) + 1
    def isHi(p: Double) = col("g_rank") === ceil(pos(p)) + 1
    def interp(p: Double, vLo: org.apache.spark.sql.Column, vHi: org.apache.spark.sql.Column) =
      when(floor(pos(p)) === ceil(pos(p)), vLo.cast("double"))
        .otherwise(vLo.cast("double") * (ceil(pos(p)).cast("double") - pos(p))
          + vHi.cast("double") * (pos(p) - floor(pos(p)).cast("double")))
    val keep = ps.map { case (_, p) => isLo(p) || isHi(p) }.reduce(_ || _)
    val aggs = ps.flatMap { case (name, p) =>
      Seq(min(when(isLo(p), col(v))).as(s"__lo_$name"),
        min(when(isHi(p), col(v))).as(s"__hi_$name"))
    }
    ranked.filter(keep)
      .groupBy(col(grp), col("n"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(grp) +: col("n") +:
        ps.map { case (name, p) =>
          interp(p, col(s"__lo_$name"), col(s"__hi_$name")).as(name)
        }: _*)
  }
}
