package graft

import graft.operators.Skew
import graft.sources.{Tables, Warehouse}
import org.apache.spark.sql.functions._

/** Scale-pattern components (SURVEY.md §5): bucketed co-located joins
  * and salted aggregation. */
class ScaleSpec extends SparkSuite {

  test("bucketed tables join without a shuffle exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    Warehouse.writeBucketed(Tables.orders(spark, sf0001),
      "orders_b", s"$dir/orders_b", "o_custkey", 8)
    Warehouse.writeBucketed(Tables.customer(spark, sf0001),
      "customer_b", s"$dir/customer_b", "c_custkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Warehouse.table(spark, "orders_b")
        .join(Warehouse.table(spark, "customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join keys must come straight off the bucketed scans — only
      // the final groupBy on mktsegment (a different key) may shuffle
      assert(plan.contains("Bucketed: true"))
      assert(!plan.contains("Exchange hashpartitioning(o_custkey")
        && !plan.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join shuffled its join keys:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  /** Rows the parquet reader actually DECODED for this query (the
    * scan's numOutputRows) — row-group/page pruning shows up here. */
  private def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val top = df.queryExecution.executedPlan
    val finalPlan = top match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val rows = finalPlan.collectLeaves().collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numOutputRows").value
    }
    assert(rows.isDefined, s"no file scan in:\n$finalPlan")
    rows.get
  }

  test("clustered layout prunes the scan; round-robin layout reads everything") {
    // measure, don't guess: the SAME filter over the SAME rows must
    // decode far fewer rows from the clustered layout (narrow per-file
    // and per-page key bands → parquet row-group/column-index pruning)
    // than from a round-robin one (every page spans the key range).
    val dir = java.nio.file.Files.createTempDirectory("graft_cluster").toString
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val total = li.count()
    Warehouse.writeClustered(li, s"$dir/clustered", 8, "l_partkey")
    li.repartition(8).write.mode("overwrite").parquet(s"$dir/roundrobin")
    val pred = col("l_partkey") < 20 // ~10% of the 0..199 key range
    val matched = li.filter(pred).count()
    assert(matched > 0 && matched < total / 5, "predicate should be selective")
    val clustered = scanRows(spark.read.parquet(s"$dir/clustered").filter(pred))
    val roundrobin = scanRows(spark.read.parquet(s"$dir/roundrobin").filter(pred))
    // both layouts return identical results...
    assert(spark.read.parquet(s"$dir/clustered").filter(pred).count() === matched)
    assert(spark.read.parquet(s"$dir/roundrobin").filter(pred).count() === matched)
    // ...but the round-robin scan decodes (nearly) the whole table
    // while the clustered scan decodes only the matching band's pages
    assert(roundrobin > total / 2,
      s"round-robin layout unexpectedly pruned: $roundrobin of $total")
    assert(clustered <= roundrobin / 3,
      s"clustering should prune the scan: clustered=$clustered round-robin=$roundrobin")
  }

  test("targeted erasure preserves the clustered layout's pruning contract") {
    // the compliance path must not quietly degrade the scan layout it
    // depends on: after eraseKeys rewrites a band, the SAME selective
    // predicate must still decode only the matching band's pages
    val dir = java.nio.file.Files.createTempDirectory("graft_erase_layout").toString
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    Warehouse.writeClustered(li, s"$dir/t", 8, "l_partkey")
    val pred = col("l_partkey") < 20
    val before = scanRows(spark.read.parquet(s"$dir/t").filter(pred))
    // one doomed key inside the probed band, one far outside it —
    // TWO bands rewritten, including the one the predicate reads
    val r = Warehouse.eraseKeys(spark, s"$dir/t", "l_partkey", Seq(5L, 130L))
    assert(r.filesRewritten >= 1 && r.rowsDeleted > 0, s"erasure must have bitten: $r")
    val total = spark.read.parquet(s"$dir/t").count()
    val after = scanRows(spark.read.parquet(s"$dir/t").filter(pred))
    // correctness: the erased keys are gone, the rest intact
    assert(spark.read.parquet(s"$dir/t").filter(col("l_partkey").isin(5, 130)).count() === 0)
    assert(spark.read.parquet(s"$dir/t").filter(pred).count()
      === li.filter(pred && col("l_partkey") =!= 5).count())
    // layout: the rewritten region was re-range-sorted on the key, so
    // pruning holds exactly as the pre-erase contract demanded — the
    // probed band's pages, not the table
    assert(after <= total / 3,
      s"post-erase clustered scan must still prune: decoded $after of $total")
    assert(after <= before,
      s"erasure only removed rows; decoding MORE ($after > $before) means the rewrite spread the band")
  }

  test("z-order layout prunes BOTH predicate dimensions; single-key sort sacrifices one") {
    // the measured trade: sort-by-partkey gives near-perfect pruning
    // on partkey and NONE on orderkey; the Morton interleave bounds
    // the damage on both. 6000 rows × 8 range files, ~10%-selective
    // predicates on each key (partkey < 20 of 0..199, orderkey < 150
    // of 0..1499) → z-layout should keep either scan under ~5/8 of
    // the table while the single-key layout's off-key scan reads it all.
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val total = li.count()
    Warehouse.writeZOrdered(li, s"$dir/z", 8, "l_partkey", "l_orderkey")
    Warehouse.writeClustered(li, s"$dir/single", 8, "l_partkey")
    val pPart = col("l_partkey") < 20
    val pOrd = col("l_orderkey") < 150
    // identical results from every layout
    assert(spark.read.parquet(s"$dir/z").filter(pPart).count() === li.filter(pPart).count())
    assert(spark.read.parquet(s"$dir/z").filter(pOrd).count() === li.filter(pOrd).count())
    val zPart = scanRows(spark.read.parquet(s"$dir/z").filter(pPart))
    val zOrd = scanRows(spark.read.parquet(s"$dir/z").filter(pOrd))
    val singleOffKey = scanRows(spark.read.parquet(s"$dir/single").filter(pOrd))
    assert(singleOffKey > total * 9 / 10,
      s"single-key layout should NOT prune the off-key predicate: $singleOffKey of $total")
    assert(zPart <= total * 11 / 16, s"z-order should prune partkey: $zPart of $total")
    assert(zOrd <= total * 11 / 16, s"z-order should prune orderkey: $zOrd of $total")
    assert(math.max(zPart, zOrd) < singleOffKey,
      "z-order's WORST dimension must beat the single-key layout's sacrificed one")
  }

  test("partitioned writes are pruned at read time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf0001)
      .write.partitionBy("event_type").mode("overwrite").parquet(s"$dir/events_p")
    val df = spark.read.parquet(s"$dir/events_p")
      .filter(col("event_type") === "click")
      .select(col("event_id"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("event_type"),
      s"partition filter should prune directories:\n$plan")
  }

  test("approximate ANN paths are measured: recall@k vs the exact baseline") {
    // "measure, don't guess": the approximate operators carry a
    // measured recall against brute force, not an assumed one. The
    // IVFADC composition must hold 0.9 — probing 10/16 cells with the
    // cheap int8 coarse pass is its whole premise.
    import org.apache.spark.sql.functions._
    val exact = SparkEntry.queries("ann_bruteforce")(spark, sf0001)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    assert(nExact > 0)
    // ann_pq/ann_ivf_pq floors lifted per the r7 verdict: M=16 geometry
    // + R=128 rerank + 12/16 probes measured 0.96 / 0.84 on the
    // worst-case random corpus (R=64 @ 10 probes measured 0.80 / 0.76).
    // Re-measured r13 on the fixed 20-query md5 sample (was 5 queries
    // via % 100): lsh 0.51, ivf 0.59, quantized 1.0, ivf_sq8 0.88,
    // pq 0.98, ivf_pq 0.90 — ivf_sq8's floor drops 0.9 -> 0.85 (the
    // 0.92 was 5-query statistics, the method is unchanged), the rest
    // hold or gained margin.
    Seq("ann_lsh" -> 0.4, "ann_ivf" -> 0.4, "ann_quantized" -> 0.9,
      "ann_ivf_sq8" -> 0.85, "ann_pq" -> 0.85, "ann_ivf_pq" -> 0.8).foreach { case (q, floor) =>
      val approx = SparkEntry.queries(q)(spark, sf0001)
        .select(col("query_id"), col("neighbor_id"))
      val hit = approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      val recall = hit.toDouble / nExact
      info(f"$q recall@k = $recall%.3f ($hit/$nExact)")
      assert(recall >= floor, f"$q recall@k $recall%.3f below $floor")
    }
  }

  test("k-means-refined IVF centroids hold the measured recall floor, incl. K=64") {
    // the refinement the ann_ivf Scaladoc promises: one Lloyd step over
    // the fixed-K seed sample, searched through the SAME ivfSearch
    // stage — measured, not assumed (on random vectors the uplift is
    // modest; on clustered real embeddings it is the standard win).
    // The K=64 point backs the K≈√N guidance with a measured value
    // (recall/K table in PLANS.md; graft.RecallCurve reproduces it on
    // the ×10 stress corpus).
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    val queries = graft.operators.Similarity.defaultQueries(emb)
    val exact = SparkEntry.queries("ann_bruteforce")(spark, sf0001)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    def recall(cent: org.apache.spark.sql.DataFrame): Double = {
      val approx = graft.operators.Similarity.ivfSearch(emb, cent, queries)
        .select(col("query_id"), col("neighbor_id"))
      approx.join(exact, Seq("query_id", "neighbor_id"), "left_semi").count().toDouble / nExact
    }
    val seed = graft.operators.Similarity.seedCentroids(emb)
    val r0 = recall(seed)
    val r1 = recall(graft.operators.Similarity.refineCentroids(emb, seed, 1))
    val refined64 = graft.operators.Similarity.refineCentroids(
      emb, graft.operators.Similarity.seedCentroids(emb, 64), 2)
    // empty cells keep their previous centroid — refinement must not
    // silently shrink K across iterations
    assert(refined64.count() === 64L, "refinement shrank the centroid table")
    val r64 = recall(refined64)
    info(f"ivf recall@k: K=16 seed=$r0%.3f refined=$r1%.3f; K=64 refined=$r64%.3f")
    assert(r1 >= 0.4, f"refined recall $r1%.3f fell below the 0.4 floor")
    // more, finer cells at the same nProbe → candidates shrink ∝ nProbe/K;
    // recall may drop but the search must still find true neighbors
    assert(r64 > 0.0, "K=64 refined search found no true neighbors")
  }

  test("the keyed (fragment-and-replicate) query pairing matches the broadcast default") {
    // an oversized query batch can't broadcast; the keyed path must be
    // bit-identical so the strategy flag is purely a physical choice
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = graft.operators.Similarity.defaultQueries(emb)
    Seq[(String, Boolean => org.apache.spark.sql.DataFrame)](
      "ann_bruteforce" -> (b => graft.operators.Similarity.bruteForce(emb, q, b)),
      "ann_quantized" -> (b => graft.operators.Similarity.quantizedSearch(emb, q, b))
    ).foreach { case (name, run) =>
      val broad = run(true)
      val keyed = run(false)
      assert(broad.exceptAll(keyed).count() === 0, s"$name: broadcast ⊄ keyed")
      assert(keyed.exceptAll(broad).count() === 0, s"$name: keyed ⊄ broadcast")
      val p = keyed.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name keyed variant plans a cartesian")
      assert(p.contains("__qs"), s"$name keyed variant should join on the fragment id")
    }
  }

  test("excludeSelf=false serves external query batches without dropping id-colliding neighbors") {
    // an external batch's ids are not corpus ids: a query that happens
    // to carry id 7 must still receive corpus vector 7 when it is the
    // true nearest neighbor (here: the identical vector)
    import org.apache.spark.sql.functions._
    graft.functions.VectorOps.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = emb.filter(col("vec_id") === 7)
    val kept = graft.operators.Similarity.bruteForce(emb, q, excludeSelf = false)
      .filter(col("rank") === 1).collect()
    assert(kept.length === 1)
    assert(kept(0).getAs[Long]("neighbor_id") === 7L,
      "the identical corpus twin must rank first for an external query")
    val dropped = graft.operators.Similarity.bruteForce(emb, q)
      .filter(col("neighbor_id") === 7).count()
    assert(dropped === 0L, "the corpus-subset default must still exclude self")
  }

  test("the persisted IVF index searches identically, skipping assignment, pruning to probed cells") {
    // build-once lifecycle: the O(N·K) assignment + quantization are
    // paid at index-build time; the searcher reads the cid-partitioned
    // layout and must (a) return bit-identical results, (b) plan no
    // assignment aggregate, (c) prune the scan to probed cells at
    // runtime (dynamic partition pruning from the probe join)
    import org.apache.spark.sql.functions._
    graft.functions.VectorOps.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    val queries = graft.operators.Similarity.defaultQueries(emb)
    val cent = graft.operators.Similarity.seedCentroids(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_idx").toString
    graft.operators.Similarity.buildIvfIndex(emb, cent, s"$dir/idx")
    val dynamic = graft.operators.Similarity.ivfSq8Search(emb, cent, queries)
    val indexed = graft.operators.Similarity.searchIvfIndex(spark, s"$dir/idx", emb, queries)
    assert(dynamic.exceptAll(indexed).count() === 0)
    assert(indexed.exceptAll(dynamic).count() === 0)
    indexed.collect()
    val p = indexed.queryExecution.executedPlan.toString
    assert(!p.contains("partial_max_by"),
      "index search must not recompute the centroid assignment")
    assert(p.contains("dynamicpruning"),
      "the probe join should prune index partitions at runtime (DPP)")
  }

  test("the persisted IVF index built with TWO-LEVEL assignment serves the search contract") {
    // the K = dynCentroids(N) production shape (r13 verdict task 3):
    // buildIvfIndex(..., twoLevel) routes assignment through
    // assignTwoLevel (coarse √K groups, 2 probes — APPROXIMATE, so the
    // layout is not bit-identical to a flat build; the searches' own
    // sampled score-recall gate and semantic_assign_audit's regret
    // ceiling monitor the trade). The contract to pin: the cell layout
    // conserves the corpus, the searcher still plans no assignment and
    // prunes to probed cells, and measured recall vs brute force stays
    // healthy. dev/ivf_dynk.sh runs the same path at a genuinely
    // dynamic K on the 10× tile set; here sf0.001's K floors at 16
    // (g=4), which exercises the identical code path every test run.
    import org.apache.spark.sql.functions._
    graft.functions.VectorOps.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    val n = emb.count()
    val k = graft.operators.Similarity.dynCentroids(n)
    val g = graft.operators.Similarity.dynCoarse(k)
    val cent = graft.operators.Similarity.seedCentroids(emb, k)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_two").toString
    graft.operators.Similarity.buildIvfIndex(emb, cent, s"$dir/idx", twoLevel = Some((k, g)))
    // every vector lands in exactly one cell of the persisted layout
    assert(spark.read.parquet(s"$dir/idx/cells").count() === n)
    val queries = graft.operators.Similarity.defaultQueries(emb)
    val exact = SparkEntry.queries("ann_bruteforce")(spark, sf0001)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    val indexed = graft.operators.Similarity.searchIvfIndex(spark, s"$dir/idx", emb, queries)
    val hit = indexed.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hit.toDouble / nExact
    info(f"two-level-built IVF index recall@k = $recall%.3f ($hit/$nExact) at K=$k g=$g")
    // flat-build ann_ivf_sq8 measures 0.88 here; two-level assignment
    // may move borderline vectors a cell over — 0.6 is the collapse
    // floor, not the expected value
    assert(recall >= 0.6, f"two-level-built index recall $recall%.3f below 0.6")
    indexed.collect()
    val p = indexed.queryExecution.executedPlan.toString
    assert(!p.contains("partial_max_by"),
      "index search must not recompute the centroid assignment")
    assert(p.contains("dynamicpruning"),
      "the probe join should prune index partitions at runtime (DPP)")
  }

  test("the persisted PQ index searches identically, skipping assign+encode, with DPP") {
    // the PQ twin of the SQ8 index lifecycle: assignment, residuals,
    // and codebook encoding are paid at build time; the frozen book
    // persists beside the centroids (codes are meaningless against
    // any other book); the searcher must be bit-identical, plan no
    // assignment aggregate, and prune to probed cells at runtime
    import org.apache.spark.sql.functions._
    graft.functions.VectorOps.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    val queries = graft.operators.Similarity.defaultQueries(emb)
    val cent = graft.operators.Similarity.seedCentroids(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
    graft.operators.Similarity.buildIvfPqIndex(emb, cent, s"$dir/idx")
    val dynamic = graft.operators.Similarity.ivfPqSearch(emb, cent, queries)
    val indexed = graft.operators.Similarity.searchIvfPqIndex(spark, s"$dir/idx", emb, queries)
    assert(dynamic.exceptAll(indexed).count() === 0)
    assert(indexed.exceptAll(dynamic).count() === 0)
    indexed.collect()
    val p = indexed.queryExecution.executedPlan.toString
    assert(!p.contains("partial_max_by"),
      "index search must not recompute assignment or encoding")
    assert(p.contains("dynamicpruning"),
      "the probe join should prune index partitions at runtime (DPP)")
  }

  test("the persisted FLAT-PQ index searches identically, skipping train+encode") {
    // the r13 build/serve split behind the ann_pq seat: codebook train
    // + the N-row encode persist as (codes, book); the searcher must
    // be bit-identical to the dynamic pqSearch (integer codes and the
    // book's doubles round-trip parquet exactly) and plan no encode
    // aggregate. No DPP assert — flat PQ has no cell layout to prune;
    // the win is skipping the corpus-proportional build, not the scan.
    import org.apache.spark.sql.functions._
    graft.functions.VectorOps.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    val queries = graft.operators.Similarity.defaultQueries(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_fpq_idx").toString
    graft.operators.Similarity.buildPqIndex(emb, s"$dir/idx")
    val dynamic = graft.operators.Similarity.pqSearch(emb, queries)
    val indexed = graft.operators.Similarity.searchPqIndex(spark, s"$dir/idx", emb, queries)
    assert(dynamic.exceptAll(indexed).count() === 0)
    assert(indexed.exceptAll(dynamic).count() === 0)
    assert(indexed.count() > 0)
    indexed.collect()
    val p = indexed.queryExecution.executedPlan.toString
    assert(!p.contains("partial_min_by"),
      "index search must not recompute the per-subspace argmin encode")
  }

  test("appending delta vectors to the PQ index equals a full rebuild") {
    import org.apache.spark.sql.functions._
    graft.functions.VectorOps.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val cent = graft.operators.Similarity.seedCentroids(emb)
    val queries = graft.operators.Similarity.defaultQueries(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_app").toString
    graft.operators.Similarity.buildIvfPqIndex(old, cent, s"$dir/inc")
    graft.operators.Similarity.appendToIvfPqIndex(spark, delta, s"$dir/inc")
    // rebuild over the combined corpus under the SAME frozen book the
    // incremental index carries — codes only compare within one book
    graft.operators.Similarity.buildIvfPqIndex(emb, cent, s"$dir/full",
      Some(spark.read.parquet(s"$dir/inc/book")))
    val inc = graft.operators.Similarity.searchIvfPqIndex(spark, s"$dir/inc", emb, queries)
    val full = graft.operators.Similarity.searchIvfPqIndex(spark, s"$dir/full", emb, queries)
    assert(inc.exceptAll(full).count() === 0)
    assert(full.exceptAll(inc).count() === 0)
  }

  test("appending delta vectors to the IVF index equals a full rebuild") {
    // incremental maintenance: the delta is assigned + quantized
    // against the index's FROZEN centroids and appended into the cid=
    // layout — searches must be bit-identical to rebuilding over the
    // combined corpus with the same centroids
    import org.apache.spark.sql.functions._
    graft.functions.VectorOps.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val delta = emb.filter(col("vec_id") % 5 === 0)
    val cent = graft.operators.Similarity.seedCentroids(emb)
    val queries = graft.operators.Similarity.defaultQueries(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    graft.operators.Similarity.buildIvfIndex(old, cent, s"$dir/inc")
    graft.operators.Similarity.appendToIvfIndex(spark, delta, s"$dir/inc")
    graft.operators.Similarity.buildIvfIndex(emb, cent, s"$dir/full")
    val inc = graft.operators.Similarity.searchIvfIndex(spark, s"$dir/inc", emb, queries)
    val full = graft.operators.Similarity.searchIvfIndex(spark, s"$dir/full", emb, queries)
    assert(inc.exceptAll(full).count() === 0)
    assert(full.exceptAll(inc).count() === 0)
    assert(inc.count() > 0)
  }

  test("index compaction packs append-accumulated small files; searches are unchanged") {
    // the maintenance lifecycle the daily-append tests imply: each
    // appendToIvfIndex delta writes one file per task per touched
    // cid= cell, so cells accumulate small files; compactIndex must
    // bin-pack them (R12's swap-journaled compaction per partition)
    // without changing a single search result, and its cost must be
    // the DELTA mass, not the index (files >= smallBytes are skipped)
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    graft.functions.VectorOps.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    val cent = Similarity.seedCentroids(emb)
    val queries = Similarity.defaultQueries(emb)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_compact").toString
    Similarity.buildIvfIndex(emb.filter(col("vec_id") % 5 =!= 0), cent, s"$dir/ix")
    // four daily deltas → ≥4 extra files in every touched cell
    (0 until 4).foreach { d =>
      Similarity.appendToIvfIndex(spark,
        emb.filter(col("vec_id") % 5 === 0 && col("vec_id") % 4 === d), s"$dir/ix")
    }
    def partFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/ix/cells"))
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    }
    val before = Similarity.searchIvfIndex(spark, s"$dir/ix", emb, queries).collect()
    val filesBefore = partFiles()
    assert(filesBefore.size >= 20, s"appends produced only ${filesBefore.size} files")

    // a stale hidden rewrite dir from a hypothetical earlier crash
    // must be invisible to readers (the reason the tmp moved INSIDE
    // the partition dir with a dot-name: a sibling `cid=N__compact_tmp`
    // would poison partition discovery) and swept by the next compact
    val cidDir = new java.io.File(s"$dir/ix/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid=")).head
    val stale = new java.io.File(cidDir, ".compact_tmp")
    java.nio.file.Files.createDirectories(stale.toPath)
    java.nio.file.Files.writeString(new java.io.File(stale, "junk").toPath, "stale")
    val withStale = Similarity.searchIvfIndex(spark, s"$dir/ix", emb, queries).collect()
    assert(withStale.toSet === before.toSet, "a hidden tmp dir changed search results")

    // a cell left with a single file is skipped (nothing to pack), so
    // the accounting asserts cover the multi-file cells only
    val byCell = filesBefore.groupBy(_.getParentFile)
    val packable = byCell.values.filter(_.size >= 2)
    val smallMass = packable.flatten.map(_.length).sum
    val report = Similarity.compactIndex(spark, s"$dir/ix", smallBytes = 1L << 20)
    assert(!stale.exists(), "compaction did not sweep the stale rewrite dir")
    val filesAfter = partFiles()
    val nCells = new java.io.File(s"$dir/ix/cells").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cid="))
    assert(filesAfter.size === nCells,
      s"expected one packed file per cell, got ${filesAfter.size} across $nCells cells")
    // cost ∝ small-file mass: the report accounts exactly the bytes
    // of the files it rewrote, which is every multi-file cell's mass
    assert(report.bytesCompacted === smallMass)
    assert(report.filesCompacted === packable.map(_.size).sum)
    val after = Similarity.searchIvfIndex(spark, s"$dir/ix", emb, queries).collect()
    assert(after.toSet === before.toSet, "compaction changed search results")
    assert(after.length === before.length)

    // idempotence: a second pass finds nothing small enough to touch
    // twice (each cell is already one file — the <=1 early exit)
    val report2 = Similarity.compactIndex(spark, s"$dir/ix", smallBytes = 1L << 20)
    assert(report2.filesCompacted === 0)
    emb.unpersist()
  }

  test("dedup_embed candidate generation stays LINEAR at 10x data (r7's 61x scale-killer)") {
    // r7 verdict headline: the fixed 16-bucket LSH self-join measured
    // 61× runtime at 10× data (candidate set Θ(N²)). The fix — planes
    // = dynPlanes(N) so bucket count grows with N and occupancy stays
    // ~TargetBucketOcc — is pinned here as a MEASURED candidate-count
    // ratio at the exact sf0.1→sf1 sizes (2k→20k vectors), bounded by
    // the verdict's ≤~12× linear envelope (13 with headroom for the
    // power-of-two bucket stepping).
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    graft.functions.VectorOps.ensureRegistered(spark) // vec_dot/vec_cosine for the cell assignment
    assert(Similarity.dynPlanes(500) === 4)   // = the r1-r7 fixed grid at the oracle gate
    assert(Similarity.dynPlanes(2000) === 6)
    assert(Similarity.dynPlanes(20000) === 10)
    def synth(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> cast(pmod(hash(id * 64 + i), 1000) as double) / 1000.0 - 0.5)")
        .as("v"))
    def cands(n: Long): Long =
      Similarity.embedCandidates(synth(n), Similarity.dynPlanes(n)).count()
    val c1 = cands(2000)
    val c10 = cands(20000)
    val ratio = c10.toDouble / c1
    info(f"dedup_embed candidates: 2k -> $c1, 20k -> $c10 (ratio $ratio%.1f at 10x data)")
    assert(c1 > 0, "candidate generation found nothing at 2k")
    assert(ratio <= 13.0,
      f"candidate growth $ratio%.1fx at 10x data — the self-join has gone superlinear again")

    // dedup_semantic carries the SAME self-join disease class: its
    // in-cell pair count (Σ occ²/2 over cells) must also stay linear
    // now that K = dynCentroids(N) pins cell size (fixed K=16 measured
    // 18.6× runtime at 10× data before the fix)
    import graft.operators.Similarity.{dynCentroids, seedCentroids, assign}
    assert(dynCentroids(500) === 16) // = the fixed-K oracle-gate grid
    def cellPairs(n: Long): Long = {
      val emb = synth(n)
      assign(emb, seedCentroids(emb, dynCentroids(n)))
        .groupBy(col("cid")).agg(count(lit(1)).as("n"))
        .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")).as("p"))
        .collect()(0).getLong(0)
    }
    val s1 = cellPairs(2000)
    val s10 = cellPairs(20000)
    val sr = s10.toDouble / s1
    info(f"dedup_semantic in-cell pairs: 2k -> $s1, 20k -> $s10 (ratio $sr%.1f at 10x data)")
    assert(sr <= 13.0,
      f"in-cell pair growth $sr%.1fx at 10x data — cell size is no longer bounded")

    // ...and the ASSIGNMENT cost must stay sub-flat too (r9: the
    // checked path routes through assignTwoLevel): per-vector dots are
    // G + probes·ceil(K/G) with G = dynCoarse(K) ≈ √K, so at 10× data
    // they grow ~√10 ≈ 3.2×, never the flat path's 10× (K ∝ N).
    // Closed-form arithmetic — this is the cost model the Scaladoc
    // promises, pinned so a future K/G change can't silently
    // reintroduce the flat growth curve.
    import graft.operators.Similarity.dynCoarse
    def dotsPerVec(n: Long): Long = {
      val k = dynCentroids(n); val g = dynCoarse(k)
      g + 2L * ((k + g - 1) / g)
    }
    val d1 = dotsPerVec(2000)
    val d10 = dotsPerVec(20000)
    info(f"two-level dots/vector: 2k -> $d1, 20k -> $d10 (${d10.toDouble / d1}%.1fx; flat would be 10x)")
    assert(d10.toDouble / d1 <= 5.0,
      "two-level per-vector assignment cost is growing like the flat path again")
  }

  test("hybrid sparse-bit LSH grid: flat per-vector hashing work, expression parity, planted recall") {
    // r9 sweep's one above-linear entry: dedup_embed at 122× wall for
    // 100× data, because every dynPlanes bit was a dims-wide dot
    // (4×8 → 4×14 dots/vector). Since r10 planes past DensePlanes are
    // sparse e_i−e_j comparison bits — per-vector DOT work is capped:
    import graft.operators.Similarity
    import graft.functions.{Portable, VectorOps}
    VectorOps.ensureRegistered(spark)
    def denseDots(n: Long): Int = math.min(Similarity.dynPlanes(n), 8)
    assert(denseDots(5000) === 8)        // the sweep's 1× base: unchanged
    assert(denseDots(500000) === 8)      // 100×: was 14 dense dots, now 8 + 6 cheap bits
    assert(denseDots(500) === 4)         // oracle gate: below the cap, bit-identical history

    // expression parity: the DataFrame signBucket column must equal a
    // plain-Scala recompute from the same md5 seeds (guards bit order,
    // 1-based element_at, the j≥i shift — the exact seams the DuckDB
    // oracle mirrors)
    def synth(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> cast(pmod(hash(id * 64 + i), 1000) as double) / 1000.0 - 0.5)")
        .as("v"))
    val nP = 12 // 8 dense + 4 sparse
    val rows = synth(64)
      .select(col("vec_id"), col("v"),
        VectorOps.signBucket(col("v"), 2, nP, 64, 8).as("bucket"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      var want = 0
      for (p <- 0 until nP) {
        val set =
          if (p < 8) {
            val w = VectorOps.hyperplane(2, p, 64)
            v.iterator.zip(w.iterator).map { case (a, b) => a * b }.sum > 0
          } else {
            val (i, j) = VectorOps.sparsePair(2, p, 64)
            v(i) > v(j)
          }
        if (set) want |= 1 << p
      }
      assert(r.getInt(2) === want, s"bucket mismatch for vec ${r.getLong(0)}")
    }

    // planted near-dup recall where the sparse bits are LIVE:
    // n≈21k → dynPlanes=10 → 2 sparse bits per table. Twins perturb
    // every coordinate by ±0.001; a sparse bit flips only when the
    // md5-chosen coordinate gap is inside that perturbation, so the
    // 4-table union must still catch nearly all planted pairs.
    val base = synth(20000)
    val twins = base.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(v, (x, i) -> x + if(pmod(vec_id + i, 2) = 0, 0.001, -0.001))").as("v"))
    val emb = base.unionByName(twins).cache()
    val n = emb.count()
    assert(Similarity.dynPlanes(n) === 10)
    val cand = Similarity.embedCandidates(emb, Similarity.dynPlanes(n))
      .filter(col("vb") - col("va") === 1000000L)
    val caught = cand.count()
    val planted = 1000L
    info(f"hybrid-grid planted recall: $caught/$planted = ${caught.toDouble / planted}%.3f")
    assert(caught >= 0.8 * planted,
      s"sparse-bit grid lost planted near-dups: $caught/$planted")
    emb.unpersist()
  }

  test("media band-join candidate growth stays near-linear at 10x data") {
    // the r8 verdict's item 2: the old 4×16-bit single-block join had
    // a constant 2^16 bucket space, so uniform-random collisions grew
    // Θ(N²/2^16) (≈44x at this 10x synthetic). The 5-block/2-match
    // pigeonhole keys are ≥21 effective bits on these 60-bit hashes,
    // so candidates are dominated by the PLANTED near-dup mass (∝ N)
    // — bound mirrors dedup_embed's candidate-growth pin.
    import org.apache.spark.sql.functions._
    def synth(n: Long) = {
      val base = spark.range(n).select(col("id").as("doc_id"),
        expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      val twins = base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"),
          expr("""h ^ (shiftleft(CAST(1 AS BIGINT), CAST(doc_id * 7 % 60 AS INT))
                     | shiftleft(CAST(1 AS BIGINT), CAST(doc_id * 13 % 60 AS INT))
                     | shiftleft(CAST(1 AS BIGINT), CAST(doc_id * 29 % 60 AS INT)))""").as("h"))
      base.unionByName(twins)
    }
    val c1 = graft.operators.Multimodal.hammingCandidates(synth(2000)).count()
    val c10 = graft.operators.Multimodal.hammingCandidates(synth(20000)).count()
    val ratio = c10.toDouble / c1
    info(f"media band candidates: 2k -> $c1, 20k -> $c10 (ratio $ratio%.1f at 10x data)")
    assert(c1 > 0, "band join found none of the planted twins at 2k")
    assert(ratio <= 13.0,
      f"candidate growth $ratio%.1fx at 10x data — the block-pair bucket space has gone quadratic again")
  }

  test("two-level assignment routes to the flat-assignment cell for most vectors") {
    // the production refinement for K = dynCentroids(N): flat
    // assignment is N×K dots; the two-level tree is ~N·(G + 2K/G)
    // (16x fewer at N=20k, K=625, G=25). MEASURED agreement with flat
    // assignment on the worst-case random corpus — on clustered real
    // embeddings routing is far cleaner; the floor pins the
    // random-vector baseline so a routing regression can't hide.
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    graft.functions.VectorOps.ensureRegistered(spark)
    def synth(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> cast(pmod(hash(id * 64 + i), 1000) as double) / 1000.0 - 0.5)")
        .as("v"))
    val n = 20000L
    val emb = synth(n).cache()
    val k = Similarity.dynCentroids(n) // 625 cells (the sf1 geometry)
    val cent = Similarity.seedCentroids(emb, k)
    val g = math.max(4, math.ceil(math.sqrt(k.toDouble)).toInt)
    val flat = Similarity.assign(emb, cent)
      .withColumnRenamed("cid", "cid_flat")
    val two = Similarity.assignTwoLevel(emb, cent, k, g)
      .withColumnRenamed("cid", "cid_two")
    val joined = flat.join(two, "vec_id").cache()
    assert(joined.count() === n, "two-level must assign every vector exactly once")
    val agree = joined.filter(col("cid_flat") === col("cid_two")).count().toDouble / n
    val dotsFlat = n * k
    val dotsTwo = k.toLong * g + n * (g + 2L * ((k + g - 1) / g))
    info(f"two-level agreement $agree%.3f at N=$n K=$k G=$g; dots $dotsTwo vs flat $dotsFlat (${dotsFlat.toDouble / dotsTwo}%.1fx fewer)")
    assert(dotsTwo * 5 < dotsFlat, "the two-level tree must cut assignment work >5x here")
    assert(agree >= 0.2,
      f"agreement $agree%.3f collapsed — coarse routing is broken, not merely approximate")
    // probing more coarse groups must not reduce agreement
    val twoP4 = Similarity.assignTwoLevel(emb, cent, k, g, probes = 4)
      .withColumnRenamed("cid", "cid_p4")
    val agree4 = flat.join(twoP4, "vec_id")
      .filter(col("cid_flat") === col("cid_p4")).count().toDouble / n
    info(f"agreement at probes=4: $agree4%.3f")
    assert(agree4 >= agree - 0.02, "more probes must not lose agreement")
    emb.unpersist(); joined.unpersist()
  }

  test("Lloyd-refined two-level dynK build evens occupancy and lifts recall on clustered data") {
    // the production dyn-K contract (r14 verdict task 1): on a
    // label-correlated corpus — the SemDeDup regime, which the random
    // tiles cannot exhibit (clusters of ~200 ≫ cellSize 32, so several
    // cells tile one cluster and a query's neighbors live in its
    // nearest cells) — the refined build must (a) conserve the corpus
    // and keep exactly K centroids (the empty-cell rule), (b) not
    // WORSEN the seed sample's occupancy skew, (c) reach a
    // production-grade recall@5 while probing ~6% of cells AT THE
    // PRODUCTION RERANK WIDTH (128 — the r15 finding: a tight cluster
    // puts hundreds of candidates inside the int8 coarse scan's
    // quantization noise, so the shipped 4·k cut caps clustered
    // recall at ~0.35 no matter where the centroids are; width is the
    // PqRerank lesson re-measured), and (d) beat-or-match the
    // unrefined build's recall at that point. dev/ivf_dynk.sh runs
    // the same grid at the 10× tile scale; this pins the contract in
    // CI at n=4000 (K=125, g=16).
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    graft.functions.VectorOps.ensureRegistered(spark)
    val n = 4000L
    val clu = graft.ClusteredFixture
      .generate(spark, n, clusters = (n / 200).toInt)
      .select(col("vec_id"), col("v")).cache()
    assert(clu.count() === n)
    val k = Similarity.dynCentroids(n)
    val g = Similarity.dynCoarse(k)
    val cent = Similarity.seedCentroids(clu, k)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_refined").toString
    Similarity.buildIvfIndex(clu, cent, s"$dir/raw", twoLevel = Some((k, g)))
    Similarity.buildIvfIndex(clu, cent, s"$dir/ref", twoLevel = Some((k, g)), refineIters = 2)
    def skewOf(path: String): Double = {
      val occ = spark.read.parquet(s"$path/cells")
        .groupBy(col("cid")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("cells"), sum(col("c")).as("total"), max(col("c")).as("mx"))
        .head()
      assert(occ.getAs[Long]("total") === n, s"$path lost vectors")
      occ.getAs[Long]("mx").toDouble * occ.getAs[Long]("cells") / n
    }
    assert(spark.read.parquet(s"$dir/ref/centroids").count() === k.toLong,
      "refinement shrank the centroid table")
    val (skewRaw, skewRef) = (skewOf(s"$dir/raw"), skewOf(s"$dir/ref"))
    val queries = Similarity.defaultQueries(clu).cache()
    val exact = Similarity.bruteForce(clu, queries)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    val nProbe = math.max(8, k / 20) // ~6% of cells
    def recallOf(path: String, rerankK: Int): Double =
      Similarity.searchIvfIndex(spark, path, clu, queries, nProbe, rerankK = rerankK)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .count().toDouble / nExact
    val (rRaw, rRef) = (recallOf(s"$dir/raw", 128), recallOf(s"$dir/ref", 128))
    val rNarrow = recallOf(s"$dir/ref", 20)
    info(f"clustered dynK (K=$k g=$g nProbe=$nProbe): skew raw $skewRaw%.2fx -> refined $skewRef%.2fx; recall@5 raw $rRaw%.3f -> refined $rRef%.3f (rerank 20: $rNarrow%.3f)")
    assert(skewRef <= skewRaw + 0.25,
      f"refinement worsened occupancy skew: $skewRaw%.2fx -> $skewRef%.2fx")
    assert(skewRef <= 4.0, f"refined occupancy skew $skewRef%.2fx above the 4x collapse ceiling")
    assert(rRef >= rRaw - 0.02,
      f"refinement lost recall: $rRaw%.3f -> $rRef%.3f")
    assert(rRef >= 0.8,
      f"refined recall $rRef%.3f below the 0.8 floor at ~6%% probed cells, rerank 128")
    // the width lever must stay measurable: if the narrow cut ever
    // matches the wide one here, the clustered fixture has lost the
    // near-tie structure this contract exists to exercise
    assert(rRef >= rNarrow,
      f"wider rerank lost recall: $rNarrow%.3f (rk=20) -> $rRef%.3f (rk=128)")
    clu.unpersist(); queries.unpersist(); exact.unpersist()
  }

  test("salted aggregation matches the plain aggregation exactly") {
    val ev = Tables.events(spark, sf0001)
    val salted = Skew.saltedSum(ev, col("user_id"), col("event_id"),
      graft.functions.Portable.dec(col("value")), nSalts = 16)
      .select(col("k"), col("n"), col("total").cast("double").as("total"))
      .orderBy("k").collect()
    val plain = ev.groupBy(col("user_id").as("k"))
      .agg(count(lit(1)).as("n"),
        sum(graft.functions.Portable.dec(col("value"))).cast("double").as("total"))
      .orderBy("k").collect()
    assert(salted.length === plain.length)
    salted.zip(plain).foreach { case (s, p) => assert(s === p) }
  }
}
