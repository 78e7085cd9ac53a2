package graft

/** Physical-plan audits (SURVEY.md §5): the scale contract is part of
  * correctness. A bucketed dedup that silently plans a CartesianProduct
  * is wrong even if its rows match. */
class PlanSpec extends SparkSuite {

  /** Final (post-AQE) physical plan: materialize THIS QueryExecution
    * (a noop write would plan a separate one), then inspect. Memoized —
    * several tests audit the same query, and a plan doesn't change
    * between tests of one suite run. */
  private val planCache = scala.collection.mutable.Map.empty[String, String]
  private def plan(name: String): String = planCache.getOrElseUpdate(name, {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect()
    df.queryExecution.executedPlan.toString
  })

  test("NO query in the entire surface plans a cartesian product") {
    // the blanket form of the scale contract: every pairing in every
    // operator must come from a keyed/bucketed/broadcast join — a
    // CartesianProduct anywhere is a 100 TB failure regardless of
    // whether the rows match
    SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
      assert(!plan(q).contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("ann_bruteforce broadcasts the query set by default, not the corpus") {
    // the query set is a bounded workload input — broadcast is the
    // default strategy; the keyed fragment-and-replicate alternative is
    // asserted (plan + equivalence) in ScaleSpec
    val p = plan("ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "query set should be broadcast")
  }

  test("the IVF cell join is salted — K cells never mean K reducers") {
    // the probe⋈assignment equi-join must key on (cid, __cs), not the
    // K≈16 distinct cids alone: without the salt at most K shuffle
    // partitions carry the whole corpus
    Seq("ann_ivf", "ann_ivf_sq8", "ann_ivf_pq", "dedup_semantic").foreach { q =>
      assert(plan(q).contains("__cs"),
        s"$q: expected the cell join to carry the __cs probe-replication salt")
    }
  }

  test("join_star broadcasts the dimension chain") {
    assert(plan("join_star").contains("BroadcastHashJoin"))
  }

  test("date_filter pushes predicates into the parquet scan") {
    val p = SparkEntry.queries("date_filter")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [") && p.contains("l_shipdate"),
      "shipdate filter should reach the scan")
  }

  test("q1_agg stays inside whole-stage codegen") {
    // codegen stages render as "*(n) " prefixes in the plan string
    assert(plan("q1_agg").contains("*(1) "))
  }

  test("topn_revenue uses TakeOrdered instead of a global sort") {
    assert(plan("topn_revenue").contains("TakeOrderedAndProject"))
  }

  test("range_join is a bucketed equi-join, not a nested loop") {
    val p = plan("range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join must go through the (user, bucket) equi-join")
  }

  test("text_vocab ends in TakeOrdered, not a global sort") {
    assert(plan("text_vocab").contains("TakeOrderedAndProject"))
  }

  test("set_ops pushes the year ranges into the orders scan") {
    val p = plan("set_ops")
    assert(p.contains("PushedFilters: [") && p.contains("o_orderdate"),
      "o_orderdate range should reach the parquet scan")
  }

  test("profile_stats profiles all columns in ONE scan of lineitem") {
    // count scans in the final plan only — the AQE plan string repeats
    // the tree under "== Initial Plan ==" and would double-count
    val p = plan("profile_stats").split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1, s"expected a single lineitem scan, saw $scans")
  }

  test("snapshot_diff/snapshot_merge reconcile via equi-joins, not nested loops") {
    Seq("snapshot_diff", "snapshot_merge").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q: snapshot reconciliation must be keyed full-outer equi-joins")
    }
  }

  test("incremental_agg pushes both branch cuts into the events scan") {
    val p = plan("incremental_agg")
    assert(p.contains("PushedFilters: [IsNotNull(ts), LessThan(ts,"),
      "base-branch raw-nanos cut must reach the parquet scan")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      "delta-branch raw-nanos cut must reach the parquet scan")
  }

  test("rollup/cube/grouping-sets Expand sits above a pre-aggregation, not the scan") {
    Seq("rollup_agg", "cube_agg", "grouping_sets").foreach { q =>
      val p = plan(q).split("== Initial Plan ==")(0)
      assert(p.contains("Expand"), s"$q: expected an Expand node in the plan")
      val afterExpand = p.substring(p.lastIndexOf("Expand"))
      assert(afterExpand.contains("HashAggregate"),
        s"$q: Expand must multiply the finest-granularity partials, not the full fact")
    }
  }

  test("ann_ivf assigns centroids via aggregate, not a window over N×K rows") {
    val p = plan("ann_ivf")
    // no window may rank the N×K assignment rows on vec_id — the only
    // row_number left is the final per-query top-k over candidates
    assert(!p.contains("windowspecdefinition(vec_id"),
      "assignment must not rank N×K rows in a window keyed by vec_id")
    assert(p.contains("partial_max_by"),
      "assignment should collapse map-side via a partial max_by aggregate")
  }

  test("ann_cell_census rides the aggregate assignment and a broadcast total") {
    val p = plan("ann_cell_census")
    // shares assign(): the N×K scored rows must collapse via the
    // partial max_by aggregate, never rank in a vec_id-keyed window
    assert(!p.contains("windowspecdefinition(vec_id"),
      "census assignment must not rank N×K rows in a window")
    assert(p.contains("partial_max_by"),
      "census must share the aggregate assignment path")
    // the share division joins a 1-row total — broadcast, not shuffle
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the corpus total should broadcast against the K-row census")
  }

  test("source_sketch never shuffles the shingle relation") {
    val p = plan("source_sketch")
    // per-doc lane minima are array expressions (no explode): the only
    // shuffles may carry |partitions|×|sources| partial-min rows, and
    // the pair matrix is a broadcast self-join of the sketch table
    assert(!p.contains("Generate explode"),
      "lane minima must fold map-side via array_min, not explode shingles")
    assert(p.contains("partial_min"),
      "the per-source sketch must collapse via mergeable partial mins")
    assert(p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the |sources|² pair matrix should be a broadcast self-join")
  }

  test("ann_ivf's centroid table is a fixed-K TakeOrdered, not a corpus fraction") {
    // |centroids| must not grow with the corpus: the deterministic
    // md5-order sample plans as TakeOrderedAndProject(limit=K)
    assert(plan("ann_ivf").contains("TakeOrderedAndProject"),
      "centroid seeding should be a constant-K distributed top-K")
  }

  test("text_vocab/text_lm_score derive df and frequencies without a count-distinct Expand") {
    // each (doc, token) row appears exactly once after the shared
    // partial aggregation, so count(*) IS the document frequency —
    // a countDistinct here would put an Expand over the exploded
    // token relation (multiplying the corpus-sized stream)
    Seq("text_vocab", "text_lm_score").foreach { q =>
      val p = plan(q).split("== Initial Plan ==")(0)
      assert(!p.contains("Expand"), s"$q must not plan a count-distinct Expand")
    }
  }

  test("events_quantiles never buffers a whole group (no percentile aggregate)") {
    val p = plan("events_quantiles")
    assert(!p.contains("percentile("),
      "exact quantiles must come from rank selection, not the " +
        "group-buffering percentile() aggregate")
    assert(!p.contains("ObjectHashAggregate"),
      "no aggregate in this plan may materialize per-group state objects")
  }

  test("every growing top-k window carries a salted pre-cut and a group-limit pushdown") {
    // ann candidates grow with the corpus (cell/bucket size ∝ N) and
    // window_rank's p_brand has ~25 values: each final top-k must be
    // preceded by a per-salt pre-top (pmod key, extracted by Catalyst
    // into a _w projection) so no reducer ranks a whole group, and the
    // rank filter must engage Spark's WindowGroupLimit pushdown (maps
    // forward only k rows per group to the reducer). Exactness of the
    // pre-cut comes from the total-order comparator.
    Seq("ann_bruteforce", "ann_quantized", "ann_ivf", "ann_ivf_sq8", "ann_lsh", "ann_pq",
      "ann_ivf_pq", "window_rank").foreach { q =>
        val p = plan(q)
        assert(p.contains("pmod("),
          s"$q: expected a pmod-salted pre-top window in the plan")
        assert(p.contains("WindowGroupLimit"),
          s"$q: the rank filter should push down as a WindowGroupLimit")
      }
  }

  test("distinct-relation counts plan no count-distinct Expand") {
    // events_wau / cohort_retention / events_growth count over
    // relations that are already sets, so a count(*) is the distinct
    // count — an Expand in these plans would mean the multiplying
    // countDistinct form crept back in
    Seq("events_wau", "cohort_retention", "events_growth").foreach { q =>
      val p = plan(q).split("== Initial Plan ==")(0)
      assert(!p.contains("Expand"), s"$q must stay Expand-free")
    }
  }

  test("url_canonical is one canonical-key shuffle over a codegen'd map stage") {
    // normalization must stay per-row builtins (whole-stage codegen'd,
    // no UDF) and dedup must be the single hash aggregate — a second
    // exchange would mean the string chain leaked a shuffle
    val p = plan("url_canonical").split("== Initial Plan ==")(0)
    val n = "Exchange ".r.findAllIn(p.replace("ReusedExchange", "Reused")).length
    assert(n === 1, s"expected exactly one shuffle, plan has $n:\n$p")
    assert(p.contains("HashAggregate"), "canonical dedup should hash-aggregate")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "normalization must be builtins, not UDFs")
  }

  test("attribution rides ONE user_id exchange through both window credits") {
    // first_value and last_value share the same window frame, so the
    // plan must sort once and shuffle once — a second exchange means
    // the two credits planned separate windows
    val p = plan("attribution").split("== Initial Plan ==")(0)
    val n = "Exchange ".r.findAllIn(p.replace("ReusedExchange", "Reused")).length
    assert(n === 1, s"expected exactly one shuffle, plan has $n:\n$p")
    assert("Sort ".r.findAllIn(p).length <= 1, "both credits must share one sort")
  }

  test("source_overlap joins on the shingle hash and broadcasts the counts table") {
    val p = plan("source_overlap")
    assert(!p.contains("CartesianProduct"), "pair generation must stay keyed")
    assert(p.contains("BroadcastHashJoin"),
      "the |sources|-row count table should broadcast like a dimension")
  }

  test("user_streaks rides ONE user_id exchange end-to-end") {
    // the explicit repartition(user_id) must satisfy the distinct, the
    // island window, and both groupBys by subset clustering — a second
    // exchange would mean one of them re-shuffled on its full key set
    val p = plan("user_streaks").split("== Initial Plan ==")(0)
    val n = "Exchange ".r.findAllIn(p.replace("ReusedExchange", "Reused")).length
    assert(n === 1, s"expected exactly one shuffle, plan has $n:\n$p")
  }

  test("events_resample rides ONE user_id shuffle through agg, lead and gap emission") {
    // the explicit repartition(user_id) must serve both the
    // per-(user, day) last-reading aggregate and the lead() window by
    // subset clustering, and the gap-fill must be the bounded
    // sequence() explode — a second hash shuffle would mean the
    // grid-join formulation (split lineage, twice-scanned events)
    // crept back in
    val p = plan("events_resample").split("== Initial Plan ==")(0)
    val materialized = p.split("\n").count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(materialized === 1,
      s"expected exactly one materialized hash shuffle, saw $materialized:\n$p")
  }

  test("the as-of family plans NO join for the temporal match itself") {
    // the whole point of the tagged-union window rewrite: the
    // temporal match costs a window, not a join. asof_purchase has no
    // join anywhere; feature_asof's only join-shaped node may be the
    // final passenger-free projection — assert the temporal core by
    // checking the label-side match: no sort-merge/hash join keyed on
    // user_id plus a time condition survives in either plan
    assert(!plan("asof_purchase").contains("Join"),
      "asof_purchase must be pure window, no join node")
    val fa = plan("feature_asof")
    Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin").foreach { j =>
      assert(!fa.contains(j),
        s"feature_asof: the as-of match must be the union window, found $j")
    }
  }

  test("incremental_join pushes the two order-age cuts into the orders scans") {
    val p = plan("incremental_join")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate"),
      "the state-term order cut must reach the parquet scan")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      "the delta-term order cut must reach the parquet scan")
  }

  test("text_bm25 retrieves via posting lists and ends in TakeOrdered") {
    val p = plan("text_bm25").split("== Initial Plan ==")(0)
    assert(p.contains("TakeOrderedAndProject"),
      "the result page must come from a distributed top-k, not a global sort")
    assert(!p.contains("Expand"),
      "df must come from count(*) over the (doc, token) relation, not a count-distinct")
  }

  test("text_contamination_bloom probes a scalar bloom and verifies with a keyed join") {
    val p = plan("text_contamination_bloom")
    assert(p.contains("might_contain"),
      "the bloom probe must gate the corpus gram stream")
    assert(p.contains("Subquery") || p.contains("bloom_filter_agg"),
      "the bloom should be built once as a scalar subquery aggregate")
    assert(p.contains("ShuffledHashJoin"),
      "the exact verify join must stay keyed — this path models a " +
        "benchmark too large to broadcast")
  }

  test("the prefix primitive's branches share ONE materialized range shuffle") {
    // load-bearing for correctness, not just cost: range bounds come
    // from seeded sampling (seed involves the instantiated RDD id), so
    // if the ranked-rows branch and the offsets branch executed
    // separate range exchanges they could draw different bounds and
    // disagree on __pid. Exchange reuse must collapse them.
    Seq("events_quantiles", "text_pack", "events_ntile", "events_winsor",
        "events_concurrency", "text_pps_sample", "text_recency_sample",
        "text_mixture", "events_interarrival", "pareto_class", "weighted_median",
        "events_percentile", "events_ks_drift", "embed_outliers").foreach { q =>
      val finalPlan = plan(q).split("== Initial Plan ==")(0)
      val lines = finalPlan.split("\n")
      val materialized = lines.count(l =>
        l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange"))
      val reused = lines.count(l =>
        l.contains("ReusedExchange") && l.contains("rangepartitioning"))
      assert(materialized === 1,
        s"$q: expected exactly one materialized range shuffle, saw $materialized")
      assert(reused >= 1,
        s"$q: the second consumer must read the range shuffle via ReusedExchange")
    }
  }

  test("span_corrupt is a pure map stage — zero exchanges") {
    // the masking preview claims scan speed at 100 TB; any Exchange in
    // the plan would falsify it
    assert(!plan("span_corrupt").contains("Exchange"),
      "span_corrupt must not shuffle")
  }

  test("session_paths cuts the census with TakeOrdered, not a global sort") {
    assert(plan("session_paths").contains("TakeOrdered"),
      "top-20 paths must plan as TakeOrderedAndProject")
  }

  test("rfm_segments runs all three quintile passes on the range-sharded primitive") {
    // three metrics → three independent range shuffles (different sort
    // keys — reuse is impossible and NOT expected), each feeding
    // ntileFromRank; no corpus-wide single-reducer window anywhere
    val finalPlan = plan("rfm_segments").split("== Initial Plan ==")(0)
    val ranges = finalPlan.split("\n")
      .count(l => l.contains("Exchange rangepartitioning") && !l.contains("ReusedExchange"))
    assert(ranges === 3, s"expected 3 materialized range shuffles, saw $ranges")
    assert(finalPlan.contains("__pid"), "quintile windows must carry the shard id")
  }

  test("bpe_merges broadcasts the round's winning pair into the match scan") {
    // the rounds run under localCheckpoint, so the top-level plan no
    // longer contains them — audit one round directly: the 1-row
    // top-pair table must reach the merge stage as a broadcast, never
    // a shuffled join key, and the round must not plan a cartesian
    import org.apache.spark.sql.functions._
    val vocab = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("s",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    val (merged, _) = graft.operators.Bpe.mergeRound(vocab)
    merged.collect()
    val p = merged.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the winning pair should broadcast into the match scan")
    assert(!p.contains("CartesianProduct"), "a merge round must not plan a cartesian")
  }

  test("corpus-sized running windows shard by range partition, never by the group alone") {
    // events_quantiles ranks values per event_type (~5 groups);
    // text_pack runs a token sum per lang (~5 groups). Every window
    // spec in their plans must carry the __pid shard id — a window
    // keyed by the low-cardinality group alone serializes the corpus
    // through one reducer.
    Seq("events_quantiles" -> "event_type", "text_pack" -> "lang",
      "events_ntile" -> "event_type", "events_winsor" -> "event_type",
      "text_mixture" -> "lang", "weighted_median" -> "brand").foreach {
      case (q, g) =>
        val p = plan(q)
        val specs = raw"windowspecdefinition\([^)]*".r.findAllIn(p).toList
        assert(specs.nonEmpty, s"$q: expected window specs in the plan")
        specs.filter(_.contains(g)).foreach { s =>
          assert(s.contains("__pid"),
            s"$q: window partitioned by $g without the shard id:\n$s")
        }
    }
  }
}
