package graft

import org.apache.spark.sql.functions._

/** Smoke + golden checks for every SparkEntry query at sf0.001. The
  * full value-level gate is the driver's DuckDB oracle replay
  * (dev/check.sh locally); these keep `sbt test` meaningful offline. */
class QueriesSpec extends SparkSuite {

  test("every query runs at sf0.001 and has deterministic schema") {
    SparkEntry.allDefs.foreach { d =>
      val df = d.run(spark, sf0001)
      assert(df.columns.nonEmpty, s"${d.name}: no columns")
      assert(df.count() >= 0, s"${d.name}: count failed")
    }
  }

  test("query names are unique across all operator files") {
    val names = SparkEntry.allDefs.map(_.name)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
  }

  test("every query has an oracle") {
    val missing = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("entry returns flagship rows") {
    assert(SparkEntry.entry(spark).count() === 200)
  }

  test("q1_agg golden cell (A,F)") {
    val row = SparkEntry.queries("q1_agg")(spark, sf0001)
      .filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .collect()(0)
    assert(row.getAs[Double]("sum_qty") === 13096.0)
    assert(row.getAs[Long]("count_order") === 510L)
  }

  test("sessionize session count golden") {
    assert(SparkEntry.queries("sessionize")(spark, sf0001).count() === 946)
  }

  test("dedup_exact keeps every unique text") {
    val out = SparkEntry.queries("dedup_exact")(spark, sf0001)
      .agg(sum(col("n_docs")).as("n"), sum(col("n_kept")).as("k")).collect()(0)
    assert(out.getAs[Long]("n") === 500L)
    assert(out.getAs[Long]("k") === 500L) // sf0.001 has no exact dups
  }

  test("ann_bruteforce returns k neighbors per query, self excluded") {
    val df = SparkEntry.queries("ann_bruteforce")(spark, sf0001)
    val perQ = df.groupBy("query_id").count().collect()
    assert(perQ.nonEmpty)
    assert(perQ.forall(_.getAs[Long]("count") === 5L))
    assert(df.filter(col("query_id") === col("neighbor_id")).count() === 0)
  }

  test("snapshot_diff classifies one-sided and changed rows consistently") {
    val df = SparkEntry.queries("snapshot_diff")(spark, sf0001).cache()
    assert(df.filter(col("change") === "insert" && col("old_price").isNotNull).count() === 0)
    assert(df.filter(col("change") === "delete" && col("new_price").isNotNull).count() === 0)
    assert(df.filter(col("change") === "update"
      && (col("old_price") === col("new_price"))).count() === 0)
    // all three change classes occur, keys unique across the diff
    assert(df.select("change").distinct().count() === 3)
    assert(df.select("o_orderkey").distinct().count() === df.count())
  }

  test("snapshot_merge applies the diff: merged table equals the new snapshot") {
    // the CDC invariant — OLD + diff = NEW, bit-for-bit — plus action
    // provenance agreeing with snapshot_diff's classification
    val merged = SparkEntry.queries("snapshot_merge")(spark, sf0001).cache()
    val (_, snapNew) = graft.operators.Audit.snapshots(spark, sf0001)
    val got = merged.select(col("o_orderkey"), col("o_totalprice").cast("double"))
    val want = snapNew.select(col("new_key").as("o_orderkey"),
      col("new_price").cast("double"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    val diff = SparkEntry.queries("snapshot_diff")(spark, sf0001).cache()
    val mergedByAction = merged.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val diffByChange = diff.groupBy("change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!mergedByAction.contains("delete")) // deletes are dropped, not carried
    assert(mergedByAction("insert") === diffByChange("insert"))
    assert(mergedByAction("update") === diffByChange("update"))
  }

  test("events_moving frames always include the current event") {
    val df = SparkEntry.queries("events_moving")(spark, sf0001)
    assert(df.filter(col("n_1h") < 1).count() === 0)
  }

  test("profile_stats covers each column with sane bounds") {
    val rows = SparkEntry.queries("profile_stats")(spark, sf0001).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_null") === 0L)
      assert(r.getAs[Double]("min_val") <= r.getAs[Double]("max_val"))
    }
  }

  test("incremental_agg merge equals the direct full-history aggregate") {
    val inc = SparkEntry.queries("incremental_agg")(spark, sf0001)
    val direct = graft.sources.Tables.events(spark, sf0001)
      .groupBy(date_trunc("day", col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("total"))
    assert(inc.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(inc).count() === 0)
  }

  test("text_contamination never flags benchmark docs and bounds hit_frac") {
    val df = SparkEntry.queries("text_contamination")(spark, sf0001).cache()
    assert(df.filter(substring(md5(col("doc_id").cast("string")), 1, 1) === "0").count() === 0)
    assert(df.filter(col("n_hits") > col("n_grams") || col("hit_frac") > 1.0).count() === 0)
  }

  test("text_repetition covers the corpus with fractions in [0,1]") {
    val df = SparkEntry.queries("text_repetition")(spark, sf0001).cache()
    assert(df.count() === 500)
    assert(df.filter(col("top2_frac") <= 0.0 || col("top2_frac") > 1.0
      || col("dup2_frac") < 0.0 || col("dup2_frac") > 1.0).count() === 0)
  }

  test("corpus_keep gates agree with the standalone queries (no drift)") {
    val ck = SparkEntry.queries("corpus_keep")(spark, sf0001).cache()
    // keep == AND of the five gates, and the corpus actually splits
    assert(ck.filter(col("keep") =!= (col("q_pass") && col("rep_pass") && col("lang_pass")
      && col("contam_pass") && col("dedup_keep"))).count() === 0)
    assert(ck.filter(col("keep")).count() > 0)
    assert(ck.filter(!col("keep")).count() > 0)
    // dedup gate == dedup_clusters.kept
    val kept = SparkEntry.queries("dedup_clusters")(spark, sf0001)
      .select(col("doc_id"), col("kept"))
    assert(ck.join(kept, "doc_id")
      .filter(col("dedup_keep") =!= col("kept")).count() === 0)
    // quality gate == the standalone text_quality score at the threshold
    val q = SparkEntry.queries("text_quality")(spark, sf0001)
      .select(col("doc_id"), (col("quality") >= 0.6).as("q2"))
    assert(ck.join(q, "doc_id").filter(col("q_pass") =!= col("q2")).count() === 0)
    // language gate == standalone text_langid signal
    val l = SparkEntry.queries("text_langid")(spark, sf0001)
      .select(col("doc_id"), (col("predicted") =!= "unknown").as("l2"))
    assert(ck.join(l, "doc_id").filter(col("lang_pass") =!= col("l2")).count() === 0)
    // repetition gate == the standalone text_repetition fraction at the threshold
    val r = SparkEntry.queries("text_repetition")(spark, sf0001)
      .select(col("doc_id"), (col("dup2_frac") <= 0.15).as("r2"))
    assert(ck.join(r, "doc_id").filter(col("rep_pass") =!= col("r2")).count() === 0)
  }

  test("bloom decontamination is bit-identical to the broadcast path") {
    // the bloom is a pre-filter; the exact verify join must erase its
    // false positives, leaving the two variants indistinguishable
    val broad = SparkEntry.queries("text_contamination")(spark, sf0001)
    val bloom = SparkEntry.queries("text_contamination_bloom")(spark, sf0001)
    assert(broad.count() > 0)
    assert(broad.exceptAll(bloom).count() === 0)
    assert(bloom.exceptAll(broad).count() === 0)
  }

  test("corpus_keep's keyed and bloom contamination strategies match the broadcast default") {
    // a heavily contaminated corpus can't broadcast its flag set, and
    // an oversized benchmark can't broadcast its gram set; both
    // at-scale strategies must produce the identical decision table
    val broad = SparkEntry.queries("corpus_keep")(spark, sf0001).cache()
    val keyed = graft.operators.Corpus.decide(spark, sf0001, graft.operators.Corpus.Keyed)
    assert(broad.exceptAll(keyed).count() === 0)
    assert(keyed.exceptAll(broad).count() === 0)
    val p = keyed.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      "keyed fallback should plan a shuffle-hash contamination join")
    val bloom = graft.operators.Corpus.decide(spark, sf0001, graft.operators.Corpus.Bloom)
    assert(broad.exceptAll(bloom).count() === 0)
    assert(bloom.exceptAll(broad).count() === 0)
    val pb = bloom.queryExecution.executedPlan.toString
    assert(pb.contains("might_contain"),
      "bloom strategy should gate the gram stream with the bloom probe")
  }

  test("staged decision table serves exactly the inline decide() rows") {
    // corpus_keep/filter_attribution serve from the per-JVM staged
    // parquet (r14 verdict task 2); the staged table must be
    // indistinguishable from running the pipeline inline
    val staged = SparkEntry.queries("corpus_keep")(spark, sf0001)
    val inline = graft.operators.Corpus.decide(spark, sf0001, graft.operators.Corpus.Broadcast)
    assert(staged.count() === 500)
    assert(staged.exceptAll(inline).count() === 0)
    assert(inline.exceptAll(staged).count() === 0)
  }

  test("text_lm_score covers the corpus with probabilities in (0, 1]") {
    val df = SparkEntry.queries("text_lm_score")(spark, sf0001).cache()
    assert(df.count() === 500)
    assert(df.filter(col("mean_p") <= 0.0 || col("mean_p") > 1.0).count() === 0)
    // frequency weighting must discriminate: the corpus is not uniform
    assert(df.select("mean_p").distinct().count() > 1)
  }

  test("materialize lands exactly the kept docs as a sized corpus") {
    val out = s"${java.nio.file.Files.createTempDirectory("graft_mat").toString}/corpus"
    val (nIn, nKept) = graft.operators.Corpus.materialize(
      spark, sf0001, out, targetFiles = 2, maxRecordsPerFile = 1000000)
    val expected = SparkEntry.queries("corpus_keep")(spark, sf0001)
      .filter(col("keep")).select("doc_id")
    assert(nIn === 500L)
    assert(nKept === expected.count())
    val landed = spark.read.parquet(out)
    assert(landed.select("doc_id").exceptAll(expected).count() === 0)
    assert(expected.exceptAll(landed.select("doc_id")).count() === 0)
    // full document rows, sized write
    assert(landed.columns.contains("text"))
    val files = new java.io.File(out).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(files === 2)
    // IDEMPOTENT: a retried materialization rewrites, never doubles
    val (_, nKept2) = graft.operators.Corpus.materialize(
      spark, sf0001, out, targetFiles = 2, maxRecordsPerFile = 1000000)
    assert(nKept2 === nKept, "re-running materialize must not duplicate the corpus")
  }

  test("sessionize agrees with Spark's native session_window aggregation") {
    // cross-validate the hand-rolled gap rule (lag + cumulative sum —
    // the oracle-checkable form) against Spark's built-in session
    // window on the same real events
    val native = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Portable.fmtTs(min(col("ts"))).as("session_start"),
        graft.functions.Portable.fmtTs(max(col("ts"))).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
    val ours = SparkEntry.queries("sessionize")(spark, sf0001)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
    assert(native.exceptAll(ours).count() === 0)
    assert(ours.exceptAll(native).count() === 0)
  }

  test("events_growth accounting is conserved") {
    val df = SparkEntry.queries("events_growth")(spark, sf0001)
      .orderBy("day").collect()
    val ev = graft.sources.Tables.events(spark, sf0001)
    val nUsers = ev.select("user_id").distinct().count()
    // new users sum to the distinct user count; the cumulative curve
    // is non-decreasing and ends at the total; DAU never exceeds it
    assert(df.map(_.getAs[Long]("n_new")).sum === nUsers)
    assert(df.last.getAs[Long]("cum_users") === nUsers)
    df.sliding(2).foreach { w =>
      assert(w(1).getAs[Long]("cum_users") >= w(0).getAs[Long]("cum_users"))
    }
    df.foreach { r =>
      assert(r.getAs[Long]("n_active") >= r.getAs[Long]("n_new"))
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cum_users"))
    }
  }

  test("audit_constraints reports the known violation profile") {
    val m = SparkEntry.queries("audit_constraints")(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.size === 5)
    // clean keys and ranges on the synthetic warehouse...
    assert(m("pk_orders_unique") === 0L)
    assert(m("fk_lineitem_has_order") === 0L)
    assert(m("not_null_totalprice") === 0L)
    assert(m("range_quantity_1_50") === 0L)
    // ...and the one genuinely dirty rule fires (childless orders
    // exist in TPC-H-ish data), proving violations actually flow
    assert(m("orders_have_lineitems") > 0L)
  }

  test("basket_pairs mass equals the per-order pair combinatorics") {
    val df = SparkEntry.queries("basket_pairs")(spark, sf0001).cache()
    assert(df.filter(col("brand_a") >= col("brand_b") || col("n_orders") <= 0).count() === 0)
    // sum over the matrix = sum over orders of C(#brands_in_order, 2)
    val ob = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.part(spark, sf0001), col("p_partkey") === col("l_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b")).distinct()
    val expected = ob.groupBy("o").count()
      .agg(sum(col("count") * (col("count") - 1) / 2).cast("long")).collect()(0).getLong(0)
    assert(df.agg(sum("n_orders")).collect()(0).getLong(0) === expected)
  }

  test("basket_lift cells recompute exactly from driver-side marginals") {
    val lifts = SparkEntry.queries("basket_lift")(spark, sf0001).collect()
    val ob = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.part(spark, sf0001), col("p_partkey") === col("l_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b")).distinct().collect()
      .map(r => (r.getAs[Long]("o"), r.getAs[String]("b")))
    val byBrand = ob.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nTotal = ob.map(_._1).distinct.length.toLong
    val pairCounts = ob.groupBy(_._1).values.flatMap { xs =>
      val bs = xs.map(_._2).sorted
      for (i <- bs.indices; j <- i + 1 until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(lifts.length === pairCounts.size)
    lifts.foreach { r =>
      val (a, b) = (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"))
      val nAb = r.getAs[Long]("n_ab")
      assert(nAb === pairCounts((a, b)), s"($a,$b)")
      val expected =
        math.floor(nTotal.toDouble * nAb / (byBrand(a) * byBrand(b)).toDouble * 1e6) / 1e6
      assert(r.getAs[Double]("lift") === expected, s"($a,$b)")
    }
  }

  test("events_json typed promotion agrees with the regex extraction route") {
    val df = SparkEntry.queries("events_json")(spark, sf0001).cache()
    // the synthetic props are all well-formed, so extraction is total
    assert(df.filter(col("n_extracted") =!= col("n")).count() === 0)
    assert(df.filter(col("min_k") > col("max_k")).count() === 0)
    val direct = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"),
        regexp_extract(col("props"), "([0-9]+)", 1).cast("long").as("k"))
      .groupBy("event_type").agg(sum("k").as("sum2"))
    assert(df.join(direct, "event_type")
      .filter(col("sum_k") =!= col("sum2")).count() === 0)
  }

  test("events_wau equals the direct trailing-window distinct count") {
    val df = SparkEntry.queries("events_wau")(spark, sf0001).cache()
    val ud = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(date_trunc("day", col("ts"))).as("d"))
      .distinct().cache()
    // ground truth via an inequality join (fine at test scale): for
    // every output day, distinct users active in [day-6, day]
    val truth = df.select(to_date(col("day")).as("dd"))
      .join(ud, col("d").between(date_sub(col("dd"), 6), col("dd")))
      .groupBy(col("dd"))
      .agg(countDistinct("user_id").as("wau"))
      .select(date_format(col("dd"), "yyyy-MM-dd").as("day"), col("wau"))
    assert(df.exceptAll(truth).count() === 0)
    assert(truth.exceptAll(df).count() === 0)
  }

  test("cohort_retention matrix mass equals the distinct activity relation") {
    val df = SparkEntry.queries("cohort_retention")(spark, sf0001).cache()
    val ev = graft.sources.Tables.events(spark, sf0001)
    val nUsers = ev.select("user_id").distinct().count()
    val nUserDays = ev.select(col("user_id"), date_trunc("day", col("ts"))).distinct().count()
    // age-0 cells count every user exactly once (everyone has a first day)
    assert(df.filter(col("age_days") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0) === nUsers)
    // total matrix mass = the distinct (user, day) activity relation
    assert(df.agg(sum("n_users")).collect()(0).getLong(0) === nUserDays)
    assert(df.filter(col("age_days") < 0 || col("n_users") <= 0).count() === 0)
  }

  test("funnel_steps is monotone with well-formed fractions") {
    val rows = SparkEntry.queries("funnel_steps")(spark, sf0001)
      .orderBy("step_idx").collect()
    assert(rows.length === 3)
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) > 0)
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), "a later stage can never out-count an earlier one")
    assert(rows(0).getAs[Double]("frac_of_first") === 1.0)
    rows.foreach(r => assert(r.getAs[Double]("frac_of_first") <= 1.0))
  }

  test("event_transitions conserves the event stream minus each user's first event") {
    val df = SparkEntry.queries("event_transitions")(spark, sf0001).cache()
    val ev = graft.sources.Tables.events(spark, sf0001)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(df.agg(sum("n")).collect()(0).getLong(0) === expected)
    assert(df.filter(col("n") <= 0).count() === 0)
  }

  test("events_concurrency matches a driver-side sweep over the session intervals") {
    val df = SparkEntry.queries("events_concurrency")(spark, sf0001).collect()
      .map(r => r.getAs[String]("day") ->
        ((r.getAs[Long]("max_concurrent"), r.getAs[Long]("n_started")))).toMap
    // independent route: rebuild the session intervals from raw event
    // micros in plain Scala (full precision — the formatted
    // session_start/end strings truncate to seconds, which would
    // reorder the sweep at sub-second boundary races)
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us")))
    val gapUs = 1800L * 1000 * 1000
    val sess = ev.groupBy(_._1).values.flatMap { xs =>
      val ts = xs.map(_._2).sorted
      val bounds = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      var st = ts.head; var prev = ts.head
      ts.tail.foreach { t =>
        if (t - prev > gapUs) { bounds += ((st, prev)); st = t }
        prev = t
      }
      bounds += ((st, prev))
      bounds
    }
    // sweep in plain Scala: +1 at start (before ends at equal ts), -1 at end
    val sweep = sess.flatMap { case (st, en) => Seq((st, 1), (en, -1)) }
      .toArray.sortBy { case (us, d) => (us, -d) }
    val dayFmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC)
    var conc = 0L
    val perDay = scala.collection.mutable.Map.empty[String, (Long, Long)]
    sweep.foreach { case (us, d) =>
      conc += d
      val day = dayFmt.format(java.time.Instant.ofEpochSecond(us / 1000000L))
      val (m, s) = perDay.getOrElse(day, (Long.MinValue, 0L))
      perDay(day) = (math.max(m, conc), s + (if (d == 1) 1L else 0L))
    }
    assert(df.size === perDay.size)
    perDay.foreach { case (day, t) => assert(df(day) === t, s"day $day") }
    assert(conc === 0L, "every opened session must close")
  }

  test("events_ewma matches a driver-side fold bit-for-bit") {
    val got = SparkEntry.queries("events_ewma")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("ewma")))).toMap
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    val truth = ev.groupBy(_._1).map { case (u, xs) =>
      val vals = xs.sortBy(t => (t._2, t._3)).map(_._4)
      u -> ((xs.length.toLong, vals.reduceLeft((acc, x) => 0.5 * x + 0.5 * acc)))
    }
    assert(got.size === truth.size)
    // exact double equality is the point: the fold must be bit-stable
    truth.foreach { case (u, t) => assert(got(u) === t, s"user $u") }
  }

  test("user_streaks matches a driver-side recomputation of every user") {
    val df = SparkEntry.queries("user_streaks")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_streaks"), r.getAs[Long]("max_streak"),
          r.getAs[Long]("active_days"), r.getAs[String]("last_active")))).toMap
    val ud = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day")))
    val truth = ud.groupBy(_._1).map { case (u, xs) =>
      val days = xs.map(_._2.toLocalDate.toEpochDay).distinct.sorted
      // split the sorted day list into consecutive runs
      val runs = days.foldLeft(List.empty[List[Long]]) {
        case (cur :: rest, d) if d == cur.head + 1 => (d :: cur) :: rest
        case (acc, d) => List(d) :: acc
      }.map(_.length.toLong)
      u -> ((runs.length.toLong, runs.max, days.length.toLong,
        java.time.LocalDate.ofEpochDay(days.last).toString))
    }
    assert(df.size === truth.size)
    truth.foreach { case (u, t) => assert(df(u) === t, s"user $u") }
  }

  test("text_substring_dedup bounds its fractions and covers the near-dup mass") {
    val df = SparkEntry.queries("text_substring_dedup")(spark, sf0001).cache()
    assert(df.count() === 500)
    assert(df.filter(col("n_dup") > col("n_windows") || col("n_windows") < 1
      || col("dup_frac") < 0.0 || col("dup_frac") > 1.0).count() === 0)
    // a duplicated window needs at least two docs carrying it
    assert(df.filter(col("n_dup") > 0).count() >= 2)
    // every doc in a verified near-dup pair (jaccard >= 0.7 on 5-gram
    // shingles) must show duplicated 8-token windows — the span signal
    // subsumes the doc-level one
    val nearDup = SparkEntry.queries("dedup_minhash")(spark, sf0001)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id")).distinct()
    assert(nearDup.join(df.filter(col("n_dup") === 0), "doc_id").count() === 0)
  }

  test("dedup_semantic agrees with the brute-force in-cluster ground truth") {
    import graft.functions.VectorOps.cosine
    val df = SparkEntry.queries("dedup_semantic")(spark, sf0001).cache()
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    // total coverage, flag consistency, and the rule actually engages
    assert(df.count() === emb.count())
    assert(df.filter(col("kept") === col("dup_of").isNotNull).count() === 0)
    assert(df.filter(!col("kept")).count() > 0)
    assert(df.filter(col("kept")).count() > 0)
    // ground truth at this scale: full pairwise within each cluster —
    // dropped == "has a smaller-id cluster-mate with cosine >= tau"
    val v = df.select(col("vec_id"), col("cid"))
      .join(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")), "vec_id")
    val qcos = floor(cosine(col("a.v"), col("b.v")) * 1000000.0) / 1000000.0
    val truthDropped = v.as("a").join(v.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(qcos >= 0.4)
      .select(col("b.vec_id").as("vec_id")).distinct()
    val gotDropped = df.filter(!col("kept")).select("vec_id")
    assert(gotDropped.exceptAll(truthDropped).count() === 0)
    assert(truthDropped.exceptAll(gotDropped).count() === 0)
  }

  test("dedup_semantic stays ground-truth-correct as K scales") {
    // the production guidance is K ∝ N (cells ~√N bound the pairwise
    // work); this pins that the drop rule is EXACT at any K, so
    // scaling K is purely a cost knob, never a semantics change
    import graft.functions.VectorOps.cosine
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val df = graft.operators.Similarity.semanticDedup(
      emb, graft.operators.Similarity.seedCentroids(emb, 64)).cache()
    assert(df.count() === emb.count())
    val v = df.select(col("vec_id"), col("cid"))
      .join(emb.select(col("vec_id"), col("v")), "vec_id")
    val qcos = floor(cosine(col("a.v"), col("b.v")) * 1000000.0) / 1000000.0
    val truthDropped = v.as("a").join(v.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(qcos >= 0.4)
      .select(col("b.vec_id").as("vec_id")).distinct()
    val gotDropped = df.filter(!col("kept")).select("vec_id")
    assert(gotDropped.exceptAll(truthDropped).count() === 0)
    assert(truthDropped.exceptAll(gotDropped).count() === 0)
  }

  test("dedup_semantic under two-level assignment keeps the drop rule exact") {
    // the production path (r9): assignment is the APPROXIMATE
    // assignTwoLevel routing, but given whatever cells it produced the
    // drop rule must still be EXACT — every dropped vector has a
    // lower-id cell-mate above τ and no kept vector does. Truth is
    // recomputed from the query's own cid column, so this pins the
    // pair/drop stages independently of routing quality.
    import graft.functions.VectorOps.cosine
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val df = graft.operators.Similarity.semanticDedup(
      emb, graft.operators.Similarity.seedCentroids(emb, 64),
      twoLevel = Some((64, 8))).cache()
    assert(df.count() === emb.count())
    val v = df.select(col("vec_id"), col("cid"))
      .join(emb.select(col("vec_id"), col("v")), "vec_id")
    val qcos = floor(cosine(col("a.v"), col("b.v")) * 1000000.0) / 1000000.0
    val truthDropped = v.as("a").join(v.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(qcos >= 0.4)
      .select(col("b.vec_id").as("vec_id")).distinct()
    val gotDropped = df.filter(!col("kept")).select("vec_id")
    assert(gotDropped.exceptAll(truthDropped).count() === 0)
    assert(truthDropped.exceptAll(gotDropped).count() === 0)
  }

  test("rrf_fusion equals a driver-side fold of the two shipped rankings") {
    // independence check: the two retriever rankings come from the
    // production query surface, the FUSION is re-folded in plain Scala
    // (sum of 1/(60+rank), missing rank = 0, top-5 by score desc then
    // neighbor id) — any drift in the join/coalesce/window shape of
    // the operator shows up against this reference.
    def ranks(q: String) = SparkEntry.queries(q)(spark, sf0001).collect()
      .map(r => ((r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")),
        r.getAs[Long]("rank"))).toMap
    val lsh = ranks("ann_lsh")
    val ivf = ranks("ann_ivf")
    val expect = (lsh.keySet ++ ivf.keySet).toSeq
      .map { case k @ (q, n) =>
        val s = lsh.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          ivf.get(k).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (q, n, s)
      }
      .groupBy(_._1)
      .flatMap { case (_, rows) =>
        rows.sortBy { case (_, n, s) => (-s, n) }.take(5).zipWithIndex
          .map { case ((q, n, s), i) => (q, n, (i + 1).toLong, s) }
      }.toSet
    val got = SparkEntry.queries("rrf_fusion")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("rank"), r.getAs[Double]("score"))).toSet
    assert(got === expect)
    // a neighbor found by BOTH retrievers outscores any single-source rank-1
    assert(got.forall { case (_, _, _, s) => s > 0.0 && s <= 2.0 / 61.0 + 1e-12 })
  }

  test("embed_outliers flags exactly the top-5% distances per label, distances exact") {
    val df = SparkEntry.queries("embed_outliers")(spark, sf0001).cache()
    val rows = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Any]("label").toString,
        r.getAs[Long]("dist"), r.getAs[Boolean]("is_outlier")))
    // exact distance reference, recomputed in plain Scala with the
    // same integer arithmetic (micro-quantized components, z = q·n−S
    // exact, per-component floor(z²/1e12) BIGINT sum)
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getSeq[Double](2).toArray))
    val byLabel = emb.groupBy(_._2)
    val refDist: Map[Long, Long] = byLabel.iterator.flatMap { case (_, vs) =>
      val n = vs.length.toLong
      val dim = vs.head._3.length
      val qs = vs.map { case (id, _, v) => (id, v.map(x => math.floor(x * 1e6).toLong)) }
      val sums = Array.tabulate(dim)(j => qs.map(_._2(j)).sum)
      qs.iterator.map { case (id, qv) =>
        id -> (0 until dim).map { j =>
          val z = (qv(j) * n - sums(j)).toDouble
          math.floor(z * z / 1e12).toLong
        }.sum
      }
    }.toMap
    rows.foreach { case (id, _, dist, _) =>
      assert(dist === refDist(id), s"distance mismatch for vec $id")
    }
    // per label: flagged count = ceil(5%), and no flagged vector has a
    // smaller distance than an unflagged one (modulo exact ties)
    rows.groupBy(_._2).foreach { case (label, vs) =>
      val flagged = vs.filter(_._4)
      val expectK = (vs.length + 19) / 20
      assert(flagged.length === expectK, s"label $label: ${flagged.length} != $expectK")
      if (flagged.nonEmpty && flagged.length < vs.length) {
        val minOut = flagged.map(_._3).min
        val maxIn = vs.filterNot(_._4).map(_._3).max
        assert(minOut >= maxIn, s"label $label: outlier below a non-outlier")
      }
    }
    df.unpersist()
  }

  test("scd2_history intervals tile each key's history with one current row") {
    val df = SparkEntry.queries("scd2_history")(spark, sf0001).cache()
    val nOrders = graft.sources.Tables.orders(spark, sf0001).count()
    // exactly one open (current) interval per key, and every key present
    assert(df.filter(col("is_current")).count() === nOrders)
    assert(df.select("o_orderkey").distinct().count() === nOrders)
    // every history starts at version 1 and closed intervals are well-formed
    assert(df.filter(col("valid_from") === 1).count() === nOrders)
    assert(df.filter(!col("is_current") && (col("valid_to").isNull
      || col("valid_to") <= col("valid_from"))).count() === 0)
    assert(df.filter(col("is_current") && col("valid_to").isNotNull).count() === 0)
    // segments per key bounded by the 3 versions, and the corpus splits
    // across 1-, 2- and 3-segment histories (all change shapes occur)
    val perKey = df.groupBy("o_orderkey").count()
    assert(perKey.filter(col("count") > 3).count() === 0)
    assert(perKey.select("count").distinct().count() === 3)
  }

  test("text_bm25 fills the page and the rare term's idf dominates the ranking") {
    val df = SparkEntry.queries("text_bm25")(spark, sf0001).cache()
    assert(df.count() === 20)
    assert(df.filter(col("score") <= 0.0 || col("n_terms") < 1 || col("n_terms") > 3)
      .count() === 0)
    // 'dup' appears in ~25/500 docs vs 'spark'/'merge' in ~390: its idf
    // outweighs any common-term combination, so page one must be
    // exactly rare-term postings — the property BM25 exists to have
    val dup = graft.sources.Tables.documents(spark, sf0001)
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id")
    assert(df.join(dup, "doc_id").count() === 20)
  }

  test("fuzzy_match equals a driver-side brute-force edit-distance join") {
    def ed(a: String, b: String): Int = {
      val d = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 0 to a.length) d(i)(0) = i
      for (j <- 0 to b.length) d(0)(j) = j
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.sources.Tables.part(spark, sf0001)
      .select("p_name").distinct().collect().map(_.getString(0)).sorted
    val truth = (for {
      i <- names.indices; j <- i + 1 until names.length
      dist = ed(names(i), names(j)) if dist <= 2
    } yield (names(i), names(j)) -> dist).toMap
    val got = SparkEntry.queries("fuzzy_match")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
        -> r.getAs[Int]("dist")).toMap
    // FastSS candidates + exact verify must reproduce the full
    // brute-force pair set — completeness is the theorem under test
    assert(got.size === truth.size,
      s"missing: ${(truth.keySet -- got.keySet).take(5)}; extra: ${(got.keySet -- truth.keySet).take(5)}")
    truth.foreach { case (p, d) => assert(got(p) === d, s"pair $p") }
    assert(truth.nonEmpty, "the check is vacuous if no close pairs exist")
  }

  test("text_ppjoin equals a brute-force all-pairs Jaccard sweep (prefix completeness)") {
    val got = SparkEntry.queries("text_ppjoin")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("n_common")).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val tk = r.getAs[String]("text").split(" ", -1)
        val starts = 0 to math.min(math.max(tk.length - 5, 0), 4095)
        r.getAs[Long]("doc_id") ->
          starts.map(i => tk.slice(i, i + 5).mkString(" ")).toSet
      }
    val truth = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      o = (sa & sb).size.toLong
      if 10 * o >= 7 * (sa.size + sb.size - o)
    } yield (a, b) -> o).toMap
    assert(got === truth)
    assert(truth.nonEmpty, "the check is vacuous if no pair clears the threshold")
  }

  test("ppjoin length filter cuts candidates without losing a single true pair") {
    // Bayardo et al. 2007 §3.1: J >= 0.7 forces 10*min(n) >= 7*max(n),
    // so a size-incompatible pair can be dropped at the candidate join
    // — cheaper than letting the verify stage reject it after the
    // distinct's shuffle. The planted shape is the one the prefix
    // filter alone cannot block: a short doc whose only shingle is
    // shared with a long doc whose OTHER shingles are common
    // boilerplate — the shared shingle is rare, so it sits in both
    // prefixes and generates the candidate, while the sizes (1 vs ~55)
    // already rule out tau. Both claims measured, not assumed.
    import spark.implicits._
    val boiler = (1 to 54).map(i => s"b$i").mkString(" ")
    val s5 = "s1 s2 s3 s4 s5"
    val docs = Seq(
      (1L, s5), (2L, s"$boiler $s5"),
      (3L, boiler), (4L, boiler), (5L, boiler), (6L, boiler)
    ).toDF("doc_id", "text")
    val sorted = graft.operators.TextOps.ppjoinSorted(docs).cache()
    val without = graft.operators.TextOps.ppjoinCandidates(sorted, lengthFilter = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = graft.operators.TextOps.ppjoinCandidates(sorted)
    val withFilter = cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    info(s"ppjoin candidates: ${without.size} unfiltered -> ${withFilter.size} length-filtered")
    assert(without.contains((1L, 2L)),
      "the planted size-incompatible pair must be a prefix candidate")
    assert(!withFilter.contains((1L, 2L)) && withFilter.size < without.size,
      s"length filter should cut the size-incompatible candidate ($withFilter)")
    // completeness: the filtered candidates verify to the same pair
    // set the unfiltered ones do (and the planted true pairs survive)
    val fromFiltered = graft.operators.TextOps.ppjoinVerify(sorted, cands)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val fromAll = graft.operators.TextOps.ppjoinVerify(sorted,
      graft.operators.TextOps.ppjoinCandidates(sorted, lengthFilter = false))
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(fromFiltered === fromAll)
    assert(fromFiltered.contains((3L, 4L)) && fromFiltered.contains((2L, 3L)),
      s"expected identical and 50/55-overlap pairs to survive: $fromFiltered")
    sorted.unpersist()
  }

  test("text_pps_sample matches a driver-side systematic-PPS walk") {
    val got = SparkEntry.queries("text_pps_sample")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"),
          r.getAs[Long]("sample_idx")))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").split(" ", -1).length.toLong)
      .sortBy { case (id, _) => (graft.functions.Portable.md5Hex(id.toString), id) }
    var c = 0L
    val truth = docs.flatMap { case (id, w) =>
      val lo = c; c += w
      if (c / 4096 > lo / 4096) Some(id -> ((w, c, c / 4096))) else None
    }.toMap
    assert(got === truth)
    // systematic PPS covers every full stride exactly once
    assert(truth.size.toLong === c / 4096, "one selected doc per crossed stride tail")
    assert(truth.values.map(_._3).toSeq.distinct.size === truth.size)
  }

  test("text_recency_sample matches a driver-side decayed walk and oversamples fresh sources") {
    val got = SparkEntry.queries("text_recency_sample")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("age_days"),
          r.getAs[Long]("eff_w8"), r.getAs[Long]("cum_w8"),
          r.getAs[Long]("sample_idx")))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map { r =>
        val src = r.getAs[String]("source")
        val age = java.lang.Long.parseLong(
          graft.functions.Portable.md5Hex(s"age_$src").take(2), 16) % 28
        val w = r.getAs[String]("text").split(" ", -1).length.toLong
        val ew = w * (8L >> math.min(age / 7, 3L).toInt)
        (r.getAs[Long]("doc_id"), age, w, ew)
      }
      .sortBy { case (id, _, _, _) => (graft.functions.Portable.md5Hex(id.toString), id) }
    var c = 0L
    val truth = docs.flatMap { case (id, age, w, ew) =>
      val lo = c; c += ew
      if (c / 32768 > lo / 32768) Some(id -> ((w, age, ew, c, c / 32768))) else None
    }.toMap
    assert(got === truth)
    assert(truth.nonEmpty)
    // the decay is LIVE: at least two distinct decay factors occur in
    // the corpus (else the fixture degenerated to plain PPS and the
    // freshness knob measures nothing)
    assert(docs.map(d => d._4 / d._3).distinct.length > 1,
      "fixture must span more than one age bucket")
    // fresh sources are oversampled: a selected doc's expected spacing
    // is one per 32768 eighth-token stride, so the per-age-bucket
    // selection RATE (selected / total docs) must not increase with
    // age — verified on the two extreme buckets present
    val byDecay = docs.groupBy(d => d._4 / d._3)
    val rates = byDecay.map { case (k, ds) =>
      k -> (ds.count(d => truth.contains(d._1)).toDouble / ds.length) }
    val freshest = rates(byDecay.keys.max)
    val stalest = rates(byDecay.keys.min)
    assert(freshest > stalest,
      s"fresh docs must be selected at a higher rate: fresh=$freshest stale=$stalest")
  }

  test("minhash pairs are ordered and above threshold") {
    val bad = SparkEntry.queries("dedup_minhash")(spark, sf0001)
      .filter(col("doc_a") >= col("doc_b") || col("jaccard") < 0.7)
    assert(bad.count() === 0)
  }

  test("skew_profile separates per-key volume from within-column imbalance") {
    val rows = SparkEntry.queries("skew_profile")(spark, sf0001).collect()
      .map(r => r.getAs[String]("key_col") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"), r.getAs[Long]("max_cnt"),
          r.getAs[String]("top_key"), r.getAs[Double]("skew")))).toMap
    val et = rows("event_type")
    val uid = rows("user_id")
    assert(et._1 === uid._1, "both profiles cover the same table")
    // event_type's hotness is per-key VOLUME (~5 keys carry everything);
    // the skew factor measures imbalance AMONG a column's keys and is
    // >= 1 by construction for both
    assert(et._2 < 10 && uid._2 > 10)
    assert(et._3 > uid._3, "the low-cardinality column's hottest key carries more rows")
    assert(et._5 >= 1.0 - 1e-6 && uid._5 >= 1.0 - 1e-6)
    assert(et._4 != null && uid._4 != null)
  }

  test("user_quantiles brackets are ordered and sized by the user's history") {
    val bad = SparkEntry.queries("user_quantiles")(spark, sf0001)
      .filter(col("med") > col("p90") || col("n") < 1)
    assert(bad.count() === 0)
  }

  test("feature_asof never exposes a snapshot published after the label") {
    val rows = SparkEntry.queries("feature_asof")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    var matched = 0
    rows.foreach { r =>
      val ft = r.getAs[String]("feat_ts")
      if (ft != null) {
        matched += 1
        // same format → lexicographic == chronological; equality is
        // legal (a snapshot is visible at exactly its publication)
        assert(ft <= r.getAs[String]("event_time"), s"leak on ${r}")
        assert(r.getAs[Long]("feat_n") > 0)
      } else {
        assert(r.isNullAt(r.fieldIndex("feat_n")), "null snapshot must mean null features")
      }
    }
    assert(matched > 0, "the check is vacuous if no label has a prior snapshot")
  }

  test("trade_pagerank matches a driver-side integer power iteration") {
    val got = SparkEntry.queries("trade_pagerank")(spark, sf0001).collect()
      .map(r => r.getAs[String]("n_name") -> r.getAs[Long]("mass")).toMap
    // rebuild the trade edges with a plain Spark join, then iterate in
    // exact Long arithmetic on the driver — same formula, same order
    val t = (n: String) => graft.sources.Tables.load(spark, sf0001, n)
    val edges = t("lineitem").select(col("l_orderkey"), col("l_suppkey"))
      .join(t("orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t("customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(t("supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"))
      .count().collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"), r.getAs[Long]("count")))
    val nations = t("nation")
      .select(col("n_nationkey").cast("long").as("nkey"), col("n_name")).collect()
      .map(r => r.getAs[Long]("nkey") -> r.getAs[String]("n_name")).toMap
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var mass = nations.keys.map(_ -> 1000000000L).toMap
    (1 to 5).foreach { _ =>
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => mass(s) * w / outw(s) }.sum
      }
      mass = nations.keys.map(n => n -> (150000000L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    assert(got === mass.map { case (k, m) => nations(k) -> m })
  }

  test("part_hierarchy conserves the part table and matches a driver-side parent walk") {
    val got = SparkEntry.queries("part_hierarchy")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("root") ->
        ((r.getAs[Long]("n_nodes"), r.getAs[Long]("max_depth")))).toMap
    val keys = graft.sources.Tables.part(spark, sf0001)
      .select(col("p_partkey").cast("long")).collect().map(_.getLong(0))
    // driver truth: walk each key's parent chain (k div 4) to its root
    val truth = keys.map { k =>
      var n = k; var d = 0L
      while (n / 4 >= 1) { n = n / 4; d += 1 }
      (n, d)
    }
    val byRoot = truth.groupBy(_._1)
      .map { case (r, xs) => r -> ((xs.length.toLong, xs.map(_._2).max)) }
    assert(got === byRoot)
    assert(got.values.map(_._1).sum === keys.length.toLong, "every part in exactly one subtree")
  }

  test("ancestor closure depth contract: 5 rounds cover depth 2^5 and fail LOUDLY past it") {
    import spark.implicits._
    // adversarial input: a pure chain 0 ← 1 ← … ← 40 (parent(n) = n−1),
    // depth 40 > the 2^5 = 32 the production round budget reaches
    val edges = (1L to 40L).map(n => (n, n - 1L)).toDF("node", "anc")
    val five = graft.operators.Graph.ancestorClosure(edges, 5)
    // the truncation is not silent: the fixpoint check reports it
    assert(!graft.operators.Graph.closureComplete(five),
      "a depth-40 chain must NOT satisfy the 5-round closure contract")
    // and the coverage boundary is exactly the documented 2^rounds:
    // node 40 knows its 32 nearest ancestors (39 down to 8), no root
    val anc40 = five.filter(col("node") === 40L)
    assert(anc40.count() === 32L)
    assert(anc40.agg(min(col("anc"))).head.getLong(0) === 8L)
    // one more round doubles coverage past the chain depth: the check
    // clears, and min(anc)/count per node are the true root and depth
    val six = graft.operators.Graph.ancestorClosure(edges, 6)
    assert(graft.operators.Graph.closureComplete(six))
    val got = six.groupBy(col("node"))
      .agg(min(col("anc")).as("root"), count(lit(1)).as("depth"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === (1L to 40L).map(n => n -> ((0L, n))).toMap)
  }

  test("forest rollup: same contract as the closure, N-row state, early exit at the fixpoint") {
    import spark.implicits._
    // same adversarial chain as the closure test: 0 ← 1 ← … ← 40
    val edges = (1L to 40L).map(n => (n, n - 1L)).toDF("node", "anc")
    val five = graft.operators.Graph.forestRollup(edges, 5)
    assert(!graft.operators.Graph.forestComplete(five, edges),
      "a depth-40 chain must NOT satisfy the 5-round rollup budget")
    // coverage boundary is exactly 2^rounds: node 40 covered its 32
    // nearest ancestors, ptr parked at 8 (still internal)
    val s40 = five.filter(col("node") === 40L).head
    assert(s40.getAs[Long]("depth") === 32L)
    assert(s40.getAs[Long]("ptr") === 8L)
    assert(s40.getAs[Long]("mn") === 8L)
    // one more round clears the contract and yields the true walk
    val six = graft.operators.Graph.forestRollup(edges, 6)
    assert(graft.operators.Graph.forestComplete(six, edges))
    val got = six.collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("ptr"), r.getAs[Long]("mn"), r.getAs[Long]("depth")))).toMap
    assert(got === (1L to 40L).map(n => n -> ((0L, 0L, n))).toMap)
    // early exit: a generous budget costs only the fixpoint rounds —
    // the result is identical, not over-iterated garbage
    val twenty = graft.operators.Graph.forestRollup(edges, 20)
    assert(twenty.collect().map(_.toSeq).toSet === six.collect().map(_.toSeq).toSet)
    // derived-budget mode (checkConvergence = false): same result with
    // no fixpoint probes, both at the exact budget and past it (rounds
    // past the fixpoint are no-op substitutions, never garbage)
    val unchecked = graft.operators.Graph.forestRollup(edges, 6, checkConvergence = false)
    assert(unchecked.collect().map(_.toSeq).toSet === six.collect().map(_.toSeq).toSet)
    val uncheckedOver = graft.operators.Graph.forestRollup(edges, 8, checkConvergence = false)
    assert(uncheckedOver.collect().map(_.toSeq).toSet === six.collect().map(_.toSeq).toSet)
    // and on the part tree it must agree with the pair-closure form
    val pe = graft.sources.Tables.part(spark, sf0001)
      .select(col("p_partkey").cast("long").as("node"))
      .select(col("node"), expr("node div 4").as("anc"))
      .filter(col("anc") >= 1)
    val viaClosure = graft.operators.Graph.ancestorClosure(pe, 5)
      .groupBy(col("node"))
      .agg(min(col("anc")).as("root"), count(lit(1)).as("depth"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val viaRollup = graft.operators.Graph.forestRollup(pe, 5)
      .select(col("node"), col("mn"), col("depth"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(viaRollup === viaClosure)
  }

  test("events_twap matches a driver-side step-function integral per user") {
    val got = SparkEntry.queries("events_twap")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_readings"), r.getAs[Long]("span_us"),
          r.getAs[Double]("twap")))).toMap
    val ev = graft.sources.Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .groupBy(_._1)
    ev.foreach { case (u, xs) =>
      val ordered = xs.sortBy(t => (t._2, t._3))
      if (ordered.length < 2 || ordered.last._2 == ordered.head._2) {
        assert(!got.contains(u), s"user $u has no span, must be excluded")
      } else {
        // exact integral in BigDecimal cents x micros, like the query
        val num = ordered.sliding(2).map { case Array(a, b) =>
          BigDecimal(a._4).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
            BigDecimal(b._2 - a._2)
        }.sum
        val span = ordered.last._2 - ordered.head._2
        val (gn, gs, gt) = got(u)
        assert(gn === ordered.length.toLong, s"user $u readings")
        assert(gs === span, s"user $u span")
        assert(gt === math.floor(num.toDouble / span.toDouble * 1e6) / 1e6,
          s"user $u twap")
      }
    }
  }

  test("events_share cells are consistent shares of exact counts") {
    val rows = SparkEntry.queries("events_share")(spark, sf0001).collect()
      .map(r => ((r.getAs[String]("day"), r.getAs[String]("event_type")),
        (r.getAs[Long]("n"), r.getAs[Double]("pct_of_day"),
          r.getAs[Double]("pct_of_total"))))
    val total = rows.map(_._2._1).sum
    val dayTotals = rows.groupBy(_._1._1)
      .map { case (d, xs) => d -> xs.map(_._2._1).sum }
    rows.foreach { case ((d, t), (n, pd, pt)) =>
      assert(pd === math.floor(n.toDouble / dayTotals(d).toDouble * 1e6) / 1e6,
        s"($d, $t) day share")
      assert(pt === math.floor(n.toDouble / total.toDouble * 1e6) / 1e6,
        s"($d, $t) total share")
    }
    // each day's shares cover the day (quantization loses < cells·1e-6)
    rows.groupBy(_._1._1).foreach { case (d, xs) =>
      val s = xs.map(_._2._2).sum
      assert(s > 1.0 - xs.length * 1e-6 && s <= 1.0 + xs.length * 1e-6, s"day $d sums to $s")
    }
  }

  test("golden_record applies field-level survivorship per source membership") {
    val rows = SparkEntry.queries("golden_record")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("custkey") ->
        ((r.getAs[String]("name"), r.getAs[java.lang.Double]("acctbal"),
          r.getAs[String]("mktsegment"), r.getAs[Long]("n_sources")))).toMap
    val base = graft.sources.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      .collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        ((r.getAs[String]("c_name"), r.getAs[Double]("c_acctbal"),
          r.getAs[String]("c_mktsegment"))))
    assert(rows.size === base.length)
    base.foreach { case (k, (nm, bal, seg)) =>
      val cls = graft.functions.Portable.md5Hex(k.toString).substring(0, 1)
      val inB = "0145".contains(cls)
      val (gName, gBal, gSeg, nSrc) = rows(k)
      assert(nSrc === (if (inB) 2L else 1L), s"cust $k sources")
      // B (version 20) wins name when present; A's name otherwise
      assert(gName === (if (inB) s"+B $nm" else nm), s"cust $k name")
      // mktsegment only exists in A — survivorship must fall back past
      // B's null to the older non-null version
      assert(gSeg === seg, s"cust $k segment")
      // acctbal: A nulls classes 0-3, B nulls class 4 and adds 100
      val expectBal: Option[Double] =
        if (inB && cls != "4") Some(bal + 100)
        else if ("0123".contains(cls)) None // A null; B absent or (never) null
        else Some(bal)
      assert(Option(gBal).map(_.doubleValue) === expectBal, s"cust $k acctbal")
    }
  }

  test("events_resample tiles each user's span and forward-fills exactly") {
    val got = SparkEntry.queries("events_resample")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("day"),
        r.getAs[Double]("value_filled"), r.getAs[Boolean]("is_observed"),
        r.getAs[Long]("days_stale")))
      .groupBy(_._1)
    val ev = graft.sources.Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
      .groupBy(_._1)
    assert(got.keySet === ev.keySet)
    ev.foreach { case (u, xs) =>
      // truth: per-day last reading (by ts, event_id), forward-filled
      val daily = xs.groupBy(_._2 / 86400000000L)
        .map { case (d, es) => d -> es.maxBy(t => (t._2, t._3))._4 }
      val (d0, d1) = (daily.keys.min, daily.keys.max)
      val rows = got(u).sortBy(_._2)
      assert(rows.length === (d1 - d0 + 1).toInt, s"user $u grid size")
      var lastVal = 0.0
      var lastDay = 0L
      (d0 to d1).zip(rows).foreach { case (d, (_, dayStr, vf, obs, stale)) =>
        assert(dayStr === java.time.LocalDate.ofEpochDay(d).toString, s"user $u day")
        assert(obs === daily.contains(d), s"user $u $dayStr observed flag")
        if (daily.contains(d)) { lastVal = daily(d); lastDay = d }
        assert(vf === lastVal, s"user $u $dayStr fill")
        assert(stale === d - lastDay, s"user $u $dayStr staleness")
      }
    }
  }

  test("incremental_join's delta algebra equals the direct join view") {
    import graft.functions.Portable._
    val got = SparkEntry.queries("incremental_join")(spark, sf0001).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        ((r.getAs[Long]("n_orders"), r.getAs[Double]("total_price")))).toMap
    val direct = graft.sources.Tables.orders(spark, sf0001)
      .join(graft.sources.Tables.customer(spark, sf0001),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countAll.as("n"), dsum(col("o_totalprice")).as("t"))
      .collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("t")))).toMap
    assert(got === direct)
  }

  test("text_mixture matches a driver-side budget walk per language") {
    val got = SparkEntry.queries("text_mixture")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("lang"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("cum_tokens")))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("text").split(" ", -1).length.toLong))
    val truth = docs.groupBy(_._2).toSeq.flatMap { case (lang, xs) =>
      val budget = if (lang == "en") 8192L else 4096L
      var c = 0L
      xs.sortBy { case (id, _, _) => (graft.functions.Portable.md5Hex(id.toString), id) }
        .toSeq.flatMap { case (id, _, w) =>
          val lo = c; c += w
          if (lo < budget) Some(id -> ((lang, w, c))) else None
        }
    }.toMap
    assert(got === truth)
    // the budget line is crossed by at most ONE document per language
    got.groupBy(_._2._1).foreach { case (lang, ks) =>
      val budget = if (lang == "en") 8192L else 4096L
      val over = ks.values.count(_._3 > budget)
      assert(over <= 1, s"$lang: $over docs past the budget line")
    }
  }

  test("text_chunks equals a driver-side sliding-window rechunk, hash included") {
    val got = SparkEntry.queries("text_chunks")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[String]("chunk_hash")))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val truth = docs.flatMap { case (id, text) =>
      val tk = text.split(" ", -1)
      (1 to tk.length by 48)
        .filter(s => s == 1 || tk.length - s >= 16)
        .map { s =>
          val chunk = tk.slice(s - 1, s - 1 + 64)
          (id, (s - 1).toLong / 48) ->
            ((chunk.length.toLong, graft.functions.Portable.md5Hex(chunk.mkString(" "))))
        }
    }.toMap
    assert(got === truth)
    // coverage: chunk ids are 0..k-1 consecutive per doc
    got.keys.groupBy(_._1).foreach { case (id, ks) =>
      val ids = ks.map(_._2).toSeq.sorted
      assert(ids === (0L until ids.length).toSeq, s"doc $id chunk ids")
    }
  }

  test("graph_triangles equals a brute-force sweep of the thresholded brand graph") {
    val got = SparkEntry.queries("graph_triangles")(spark, sf0001).collect()
      .map(r => r.getAs[String]("brand") ->
        ((r.getAs[Long]("degree"), r.getAs[Long]("n_triangles")))).toMap
    val ob = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.part(spark, sf0001),
        col("p_partkey") === col("l_partkey"))
      .select(col("l_orderkey").as("o"), col("p_brand").as("b")).distinct()
      .collect().map(r => (r.getAs[Long]("o"), r.getAs[String]("b")))
    val nTotal = ob.map(_._1).distinct.length.toLong
    val pairCounts = ob.groupBy(_._1).values.flatMap { rows =>
      val bs = rows.map(_._2).distinct.sorted
      for (i <- bs.indices; j <- (i + 1) until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // filter-then-keySet, NOT collect-to-tuples: collect on a Map
    // rebuilds a Map, silently collapsing edges by their left brand
    val edges = pairCounts.filter { case (_, n) => 10000L * n >= 222L * nTotal }.keySet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val deg = nodes.map(n => n -> edges.count(e => e._1 == n || e._2 == n).toLong).toMap
    val triCount = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val es = edges.toSeq.sorted
    for {
      (x, y) <- es; (x2, z) <- es
      if x2 == x && z > y && edges.contains((y, z))
    } Seq(x, y, z).foreach(n => triCount(n) += 1)
    assert(got.keySet === nodes)
    nodes.foreach { n =>
      assert(got(n) === ((deg(n), triCount(n))), s"brand $n")
    }
  }

  test("events_interarrival matches a driver-side gap-quantile recomputation") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("events_interarrival")(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_gaps"), r.getAs[Double]("p50_s"), r.getAs[Double]("p90_s")))).toMap
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("us"), r.getAs[Long]("event_id")))
    val gaps = ev.groupBy(t => (t._1, t._2)).values.flatMap { xs =>
      val s = xs.sortBy(t => (t._3, t._4))
      s.zip(s.drop(1)).map { case (a, b) => (a._2, (b._3 - a._3) / 1000000L) }
    }.toSeq
    def interp(vs: Seq[Long], p: Double): Double = {
      val pos = p * (vs.length - 1).toDouble
      val lo = math.floor(pos); val hi = math.ceil(pos)
      if (lo == hi) vs(pos.toInt).toDouble
      else vs(lo.toInt).toDouble * (hi - pos) + vs(hi.toInt).toDouble * (pos - lo)
    }
    val truth = gaps.groupBy(_._1).map { case (t, xs) =>
      val vs = xs.map(_._2).sorted
      t -> ((vs.length.toLong, q6(interp(vs, 0.5)), q6(interp(vs, 0.9))))
    }
    assert(got === truth)
  }

  test("pareto_class matches a driver-side exact-decimal Pareto walk") {
    val got = SparkEntry.queries("pareto_class")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("partkey") ->
        ((r.getAs[Double]("revenue"), r.getAs[Double]("cum_share"),
          r.getAs[String]("abc_class")))).toMap
    val rev = graft.sources.Tables.lineitem(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("l_partkey"),
        // decimal(d) = valueOf (shortest decimal repr) — matches the
        // engines' double→DECIMAL(18,2) cast on 2dp price data
        BigDecimal.decimal(r.getAs[Double]("l_extendedprice"))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    val tot = rev.values.sum
    var cum = BigDecimal(0)
    val truth = rev.toSeq.sortBy { case (p, v) => (-v, p) }.map { case (p, v) =>
      cum += v
      val cls = if (cum * 100 <= tot * 80) "A" else if (cum * 100 <= tot * 95) "B" else "C"
      p -> ((v.toDouble,
        math.floor(cum.toDouble / tot.toDouble * 1000000.0) / 1000000.0, cls))
    }.toMap
    assert(got === truth)
    // all three classes fire on this data (the synthetic revenue curve
    // is near-uniform, so A ≈ 73% of parts — the classifier is graded
    // on exactness above, not on the data being skewed)
    assert(Set("A", "B", "C").subsetOf(got.values.map(_._3).toSet))
  }

  test("weighted_median matches a driver-side cumulative-weight walk") {
    val got = SparkEntry.queries("weighted_median")(spark, sf0001).collect()
      .map(r => r.getAs[String]("brand") ->
        ((r.getAs[Long]("total_qty"), r.getAs[Long]("n_rows"),
          r.getAs[Double]("wmedian_price")))).toMap
    val li = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.part(spark, sf0001),
        col("p_partkey") === col("l_partkey"))
      .select(col("p_brand"), col("l_extendedprice"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Double]("l_extendedprice"),
        r.getAs[Double]("l_quantity").toLong, r.getAs[Long]("l_orderkey"),
        r.getAs[Int]("l_linenumber")))
    val truth = li.groupBy(_._1).map { case (b, xs) =>
      val sorted = xs.sortBy(t => (t._2, t._4, t._5))
      val w = sorted.map(_._3).sum
      var cum = 0L
      val crossing = sorted.find { t => cum += t._3; 2 * cum >= w }.get
      b -> ((w, xs.length.toLong, crossing._2))
    }
    assert(got === truth)
    // the weighted median is a real data value of its brand
    got.foreach { case (b, (_, _, m)) =>
      assert(li.exists(t => t._1 == b && t._2 == m), s"brand $b median not a data value")
    }
  }

  test("events_mad matches a driver-side robust-statistics recomputation") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    def interp(vs: Seq[Double], p: Double): Double = {
      val pos = p * (vs.length - 1).toDouble
      val lo = math.floor(pos); val hi = math.ceil(pos)
      if (lo == hi) vs(pos.toInt)
      else vs(lo.toInt) * (hi - pos) + vs(hi.toInt) * (pos - lo)
    }
    val got = SparkEntry.queries("events_mad")(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("med"), r.getAs[Double]("mad"),
          r.getAs[Long]("n_outliers")))).toMap
    val ev = graft.sources.Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
    val truth = ev.groupBy(_._1).map { case (t, xs) =>
      val vs = xs.map(_._2).sorted.toSeq
      val med = interp(vs, 0.5)
      val devs = xs.map(x => math.abs(x._2 - med))
      val mad = interp(devs.sorted.toSeq, 0.5)
      t -> ((xs.length.toLong, q6(med), q6(mad),
        devs.count(_ > 4.4478 * mad).toLong))
    }
    assert(got === truth)
  }

  test("text_heavy_hitters equals the full aggregation and its MG bound held") {
    val got = SparkEntry.queries("text_heavy_hitters")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"))).toSeq
    val full = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(20).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("cnt"))).toSeq
    assert(got === full)
    // the Misra-Gries superset guarantee was in force for this cut:
    // every reported count clears N/(k+1), so no qualifying token can
    // have been evicted in every partition
    val n = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("token")).count()
    assert(got.last._2 > n / 257,
      s"f20=${got.last._2} must exceed N/(k+1)=${n / 257} for the MG bound")
  }

  test("corpus_split is leakage-free and matches the md5 cut") {
    val split = SparkEntry.queries("corpus_split")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("split"), r.getAs[Long]("n_cross_dups")))).toMap
    val pairs = SparkEntry.queries("dedup_minhash")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    def isEval(id: Long) = graft.functions.Portable.md5Hex(id.toString).startsWith("0")
    // the assignment is exactly the md5 cut, quarantine included
    split.foreach { case (id, (s, n)) =>
      if (!isEval(id)) assert(s === "train", s"doc $id")
      else {
        val crossDups = pairs.count { case (a, b) =>
          (a == id && !isEval(b)) || (b == id && !isEval(a))
        }
        assert(n === crossDups.toLong, s"doc $id cross-dup count")
        assert(s === (if (crossDups > 0) "quarantine" else "eval"), s"doc $id")
      }
    }
    // THE invariant the operator exists for: no verified near-dup pair
    // straddles the final train/eval boundary
    pairs.foreach { case (a, b) =>
      val sa = split(a)._1; val sb = split(b)._1
      assert(!(sa == "train" && sb == "eval") && !(sa == "eval" && sb == "train"),
        s"leaky pair ($a=$sa, $b=$sb)")
    }
    assert(split.values.count(_._1 == "train") > split.size / 2)
  }

  test("events_percentile matches a driver-side ECDF with tie-sharing ranks") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("events_percentile")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("pct_rank")).toMap
    val ev = graft.sources.Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    val truth = ev.groupBy(_._2).values.flatMap { xs =>
      val sorted = xs.map(_._3).sorted
      val n = sorted.length
      xs.map { case (id, _, v) =>
        val rank = sorted.indexWhere(_ == v) + 1 // min rank of the tie group
        id -> (if (n == 1) 0.0 else q6((rank - 1).toDouble / (n - 1).toDouble))
      }
    }.toMap
    assert(got === truth)
  }

  test("text_freq_spectrum matches a driver-side Good-Turing table") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("text_freq_spectrum")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("freq") ->
        ((r.getAs[Long]("n_tokens"),
          Option(r.get(r.fieldIndex("gt_count"))).map(_.asInstanceOf[Double])))).toMap
    val tokens = graft.sources.Tables.documents(spark, sf0001)
      .select(col("text")).collect()
      .flatMap(_.getAs[String]("text").split(" ", -1))
    val tf = tokens.groupBy(identity(_)).map(_._2.length.toLong)
    val spectrum = tf.groupBy(identity(_)).map { case (f, xs) => f -> xs.size.toLong }
    val truth = spectrum.map { case (f, n) =>
      val gt = spectrum.get(f + 1).map(nNext => q6((f.toDouble + 1.0) * nNext / n))
      f -> ((n, gt))
    }
    assert(got === truth)
    // conservation: Σ freq·n_tokens = the corpus token count
    assert(got.map { case (f, (n, _)) => f * n }.sum === tokens.length.toLong)
  }

  test("label_centroids matches a driver-side quantized mean per component") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("label_centroids")(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("component")) ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_val")))).toMap
    val em = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Int]("label"), r.getSeq[Float](1)))
    val truth = em.groupBy(_._1).toSeq.flatMap { case (l, xs) =>
      val dim = xs.head._2.length
      (1 to dim).map { j =>
        val qs = xs.map(x => math.floor(x._2(j - 1).toDouble * 1000000).toLong)
        (l, j.toLong) -> ((xs.length.toLong,
          q6(qs.sum.toDouble / (xs.length.toLong * 1000000L).toDouble)))
      }
    }.toMap
    assert(got === truth)
    // every label × every component present
    assert(got.size === got.keys.map(_._1).toSeq.distinct.size * 64)
  }

  test("time_to_convert matches a driver-side cohort walk") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    def interp(vs: Seq[Long], p: Double): Double = {
      val pos = p * (vs.length - 1).toDouble
      val lo = math.floor(pos); val hi = math.ceil(pos)
      if (lo == hi) vs(pos.toInt).toDouble
      else vs(lo.toInt).toDouble * (hi - pos) + vs(hi.toInt).toDouble * (pos - lo)
    }
    val got = SparkEntry.queries("time_to_convert")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("cohort_week") ->
        ((r.getAs[Long]("n_signups"), r.getAs[Long]("n_converted"),
          Option(r.get(r.fieldIndex("med_hours"))).map(_.asInstanceOf[Double])))).toMap
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("us")))
    val firstSignup = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val lag = firstSignup.flatMap { case (u, s) =>
      val ps = ev.filter(t => t._1 == u && t._2 == "purchase" && t._3 > s).map(_._3)
      if (ps.isEmpty) None else Some(u -> (ps.min - s) / 3600000000L)
    }
    val cohort = firstSignup.map { case (u, s) => u -> (s / 86400000000L + 3) / 7 }
    val truth = cohort.groupBy(_._2).map { case (cw, us) =>
      // keys is a SET — flatMap must leave it before collecting hour
      // values, or equal lags deduplicate
      val hs = us.keys.toSeq.flatMap(lag.get).sorted
      cw -> ((us.size.toLong, hs.length.toLong,
        if (hs.isEmpty) None else Some(q6(interp(hs, 0.5)))))
    }
    assert(got === truth)
    got.foreach { case (cw, (ns, nc, _)) =>
      assert(nc <= ns, s"cohort $cw converted > signups")
    }
  }

  test("events_balance matches a driver-side clamped fold bit-for-bit") {
    val got = SparkEntry.queries("events_balance")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("balance")))).toMap
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        if (r.isNullAt(4)) 0.0 else r.getAs[Double]("value")))
    val truth = ev.groupBy(_._1).map { case (u, xs) =>
      val deltas = xs.sortBy(t => (t._2, t._3)).map(t =>
        if (t._4 == "purchase" || t._4 == "signup") t._5 else -t._5)
      u -> ((xs.length.toLong,
        deltas.foldLeft(0.0)((acc, x) => math.max(acc + x, 0.0))))
    }
    assert(got.size === truth.size)
    // exact double equality: the clamped fold must be bit-stable
    truth.foreach { case (u, t) => assert(got(u) === t, s"user $u") }
  }

  /** Ordered per-user event tuples (user, type, micros, event_id) —
    * shared by the Journey-layer driver-side recomputations. */
  private def collectedEvents(): Array[(Long, String, Long, Long)] =
    graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("us"), r.getAs[Long]("event_id")))

  test("session_paths matches a driver-side first-3 path census") {
    val got = SparkEntry.queries("session_paths")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("path"), r.getAs[Long]("n_users")))
    val paths = collectedEvents().groupBy(_._1).map { case (_, xs) =>
      xs.sortBy(t => (t._3, t._4)).take(3).map(_._2).mkString(">")
    }
    val truth = paths.groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq === truth)
  }

  test("sequence_match matches a driver-side regex scan") {
    val got = SparkEntry.queries("sequence_match")(spark, sf0001).collect()(0)
    val streams = collectedEvents().groupBy(_._1).map { case (_, xs) =>
      xs.sortBy(t => (t._3, t._4)).map(_._2.head).mkString
    }
    val occ = streams.map(s => "v[^p]*p".r.findAllIn(s).size)
    assert(got.getAs[Long]("n_users") === streams.size.toLong)
    assert(got.getAs[Long]("n_matched") === occ.count(_ > 0).toLong)
    assert(got.getAs[Long]("n_occurrences") === occ.map(_.toLong).sum)
  }

  test("ab_test matches a driver-side z-test recomputation") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("ab_test")(spark, sf0001).collect()(0)
    val users = collectedEvents().groupBy(_._1).toSeq.map { case (u, xs) =>
      val f = xs.map(_._3).min
      val conv = xs.exists(t => t._2 == "purchase" && t._3 > f && t._3 - f <= 86400000000L)
      val arm = if (graft.functions.Portable.md5Hex(u.toString).head <= '7') "A" else "B"
      (arm, conv)
    }
    val (na, ca) = (users.count(_._1 == "A").toLong, users.count(u => u._1 == "A" && u._2).toLong)
    val (nb, cb) = (users.count(_._1 == "B").toLong, users.count(u => u._1 == "B" && u._2).toLong)
    assert((got.getAs[Long]("n_a"), got.getAs[Long]("conv_a")) === ((na, ca)))
    assert((got.getAs[Long]("n_b"), got.getAs[Long]("conv_b")) === ((nb, cb)))
    val (pa, pb) = (ca.toDouble / na.toDouble, cb.toDouble / nb.toDouble)
    val pp = (ca + cb).toDouble / (na + nb).toDouble
    val se = math.sqrt(pp * (1.0 - pp) * (1.0 / na.toDouble + 1.0 / nb.toDouble))
    assert(got.getAs[Double]("z_score") === q6((pa - pb) / se))
  }

  test("kaplan_meier matches a driver-side survival walk") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("kaplan_meier")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("t_days") ->
        ((r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_deaths"),
          r.getAs[Double]("survival")))).toMap
    val users = collectedEvents().groupBy(_._1).toSeq.map { case (_, xs) =>
      val f = xs.map(_._3).min
      val ps = xs.filter(t => t._2 == "purchase" && t._3 > f).map(_._3)
      val lagH = if (ps.isEmpty) None else Some((ps.min - f) / 3600000000L)
      lagH.filter(_ <= 48L).map(t => (t, 1L)).getOrElse((48L, 0L))
    }
    val byT = users.groupBy(_._1).map { case (t, xs) =>
      (t, xs.map(_._2).sum, xs.size.toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = users.size.toLong
    var surv = 1.0
    val truth = byT.flatMap { case (t, d, c) =>
      val row = if (d > 0) {
        surv = surv * (1.0 - d.toDouble / atRisk.toDouble)
        Some(t -> ((atRisk, d, q6(surv))))
      } else None
      atRisk -= c
      row
    }.toMap
    assert(got === truth)
    // the curve is a survival function: non-increasing, within (0, 1]
    val ordered = truth.toSeq.sortBy(_._1).map(_._2._3)
    assert(ordered === ordered.sorted.reverse)
  }

  test("rfm_segments matches a driver-side quintile walk") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    def ntile5(rank: Long, n: Long): Long = {
      val q = n / 5; val r = n % 5
      if (rank <= (q + 1) * r) (rank + q) / (q + 1)
      else r + (rank - (q + 1) * r + q - 1) / q
    }
    val got = SparkEntry.queries("rfm_segments")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"),
        r.getAs[Long]("m_score")) ->
        ((r.getAs[String]("segment"), r.getAs[Long]("n_customers"),
          r.getAs[Double]("avg_monetary")))).toMap
    val orders = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("od"),
        col("o_totalprice").cast("decimal(12,2)").as("tp"))
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("od"),
        r.getAs[java.math.BigDecimal]("tp")))
    val base = orders.groupBy(_._1).map { case (ck, xs) =>
      (ck, xs.map(_._2).max, xs.size.toLong,
        xs.map(t => BigDecimal(t._3)).sum)
    }.toSeq
    val mxd = base.map(_._2).max
    def scores(key: ((Long, Long, Long, BigDecimal)) => (BigDecimal, Long)) = {
      val sorted = base.sortBy(key)
      val n = sorted.size.toLong
      sorted.zipWithIndex.map { case (b, i) => b._1 -> ntile5(i + 1L, n) }.toMap
    }
    val rS = scores(b => (BigDecimal(-(mxd - b._2)), b._1))
    val fS = scores(b => (BigDecimal(b._3), b._1))
    val mS = scores(b => (b._4, b._1))
    val truth = base.groupBy(b => (rS(b._1), fS(b._1), mS(b._1)))
      .map { case (k @ (r, f, m), xs) =>
        val seg =
          if (r == 5 && f >= 4 && m >= 4) "champion"
          else if (r <= 2 && f >= 4) "at_risk"
          else if (r <= 2 && f <= 2) "hibernating"
          else "other"
        k -> ((seg, xs.size.toLong,
          q6(xs.map(_._4).sum.toDouble / xs.size.toDouble)))
      }
    assert(got === truth)
  }

  test("text_line_dedup removes exactly the cross-document blocks and recomposes in order") {
    def md5 = graft.functions.Portable.md5Hex _
    val got = SparkEntry.queries("text_line_dedup")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_blocks"), r.getAs[Long]("n_removed"),
          r.getAs[String]("clean_hash")))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val blocks = docs.map { case (id, t) =>
      id -> t.split(" ", -1).grouped(16).map(_.mkString(" ")).toSeq
    }
    val nd = blocks.flatMap { case (id, bs) => bs.distinct.map(b => (md5(b), id)) }
      .distinct.groupBy(_._1).map { case (h, xs) => h -> xs.length }
    val truth = blocks.map { case (id, bs) =>
      val kept = bs.filter(b => nd(md5(b)) < 2)
      id -> ((bs.size.toLong, (bs.size - kept.size).toLong, md5(kept.mkString(" "))))
    }.toMap
    assert(got === truth)
    // the planted near-dups guarantee the operator actually fires
    assert(truth.values.map(_._2).sum > 0, "no duplicated blocks in fixture")
  }

  test("domain_filter verdicts match a driver-side source census") {
    val got = SparkEntry.queries("domain_filter")(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup"),
          r.getAs[String]("verdict")))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("source"), col("n_chars"), col("text")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_chars"),
        r.getAs[String]("text")))
    val dupTexts = docs.groupBy(_._3).filter(_._2.length >= 2).keySet
    val truth = docs.groupBy(_._1).map { case (s, xs) =>
      val n = xs.length.toLong
      val nd = xs.count(d => dupTexts(d._3)).toLong
      val sc = xs.map(_._2).sum
      s -> ((n, nd, if (sc >= 280 * n && 20 * nd <= n) "keep" else "drop"))
    }
    assert(got === truth)
    // both verdicts must occur or the gate is vacuous at this fixture
    assert(truth.values.map(_._3).toSet.size === 2)
  }

  test("hard_negatives are the true cross-label top-5 by centroid cosine") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("hard_negatives")(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("neighbor_id"), r.getAs[Double]("score")))).toMap
    val em = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val centroids = em.groupBy(_._2).map { case (l, xs) =>
      val dim = xs.head._3.length
      l -> (0 until dim).map { j =>
        xs.map(x => math.floor(x._3(j) * 1000000).toLong).sum.toDouble /
          (xs.length.toLong * 1000000L).toDouble
      }.toArray
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (a.indices).foreach { i => d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = centroids.toSeq.flatMap { case (l, cv) =>
      em.filter(_._2 != l)
        .map(x => (x._1, q6(cos(x._3, cv))))
        .sortBy { case (nid, s) => (-s, nid) }
        .take(5).zipWithIndex
        .map { case ((nid, s), i) => (l, i + 1L) -> ((nid, s)) }
    }.toMap
    assert(got === truth)
    // no hard negative may carry its own query label
    val labelOf = em.map(x => x._1 -> x._2).toMap
    got.foreach { case ((l, _), (nid, _)) => assert(labelOf(nid) !== l) }
  }

  test("ann_audit recall equals the intersection of the shipped search results") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("ann_audit")(spark, sf0001).collect()(0)
    def pairs(q: String) = SparkEntry.queries(q)(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute = pairs("ann_bruteforce")
    val lsh = pairs("ann_lsh")
    val hits = (brute & lsh).size.toLong
    assert(got.getAs[Long]("n_baseline") === brute.size.toLong)
    assert(got.getAs[Long]("n_hits") === hits)
    assert(got.getAs[Double]("recall") === q6(hits.toDouble / brute.size.toDouble))
    // the probabilistic path retrieves something real but not everything
    val r = got.getAs[Double]("recall")
    assert(r > 0.2 && r < 1.0, s"recall $r implausible for 4x4 sign buckets")
  }

  test("dedup_audit scores the detector against a driver-side exact ground truth") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("dedup_audit")(spark, sf0001).collect()(0)
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val sample = docs.map(_._1)
      .sortBy(id => (graft.functions.Portable.md5Hex(id.toString), id)).take(200).toSet
    def shingles(t: String): Set[String] = {
      val tk = t.split(" ", -1)
      (0 to math.min(math.max(tk.length - 5, 0), 199))
        .map(i => tk.slice(i, i + 5).mkString(" ")).toSet
    }
    val sh = docs.filter(d => sample(d._1)).map { case (id, t) => id -> shingles(t) }
    val truth = (for {
      i <- sh.indices; j <- i + 1 until sh.length
      (a, sa) = if (sh(i)._1 < sh(j)._1) sh(i) else sh(j)
      (b, sb) = if (sh(i)._1 < sh(j)._1) sh(j) else sh(i)
      inter = (sa & sb).size
      if inter.toDouble / (sa.size + sb.size - inter) >= 0.7
    } yield (a, b)).toSet
    val det = SparkEntry.queries("dedup_minhash")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .filter(p => sample(p._1) && sample(p._2)).toSet
    val tp = truth & det
    assert(got.getAs[Long]("n_sample") === sample.size.toLong)
    assert(got.getAs[Long]("n_truth_pairs") === truth.size.toLong)
    assert(got.getAs[Long]("n_detected") === det.size.toLong)
    assert(got.getAs[Long]("n_true_pos") === tp.size.toLong)
    assert(got.getAs[Double]("recall") === q6(tp.size.toDouble / truth.size.toDouble))
    // the verify stage makes precision structurally 1 — assert it
    assert(truth.nonEmpty && det.nonEmpty, "audit must be non-vacuous at this fixture")
    assert(got.getAs[Double]("precision") === 1.0)
  }

  test("langid_confusion diagonal equals text_langid's per-doc agreement") {
    val got = SparkEntry.queries("langid_confusion")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("true_lang"), r.getAs[String]("pred_lang")) ->
        r.getAs[Long]("n_docs")).toMap
    // cross-check against the standalone classifier query — shared
    // formula means the matrix must reproduce its per-doc predictions
    val preds = SparkEntry.queries("text_langid")(spark, sf0001)
      .select(col("lang"), col("predicted")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("predicted")))
    val truth = preds.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(got === truth)
    // matrix mass = corpus size; the classifier is better than chance
    assert(got.values.sum === preds.length.toLong)
    val correct = got.collect { case ((t, p), n) if t == p => n }.sum
    // better than the 1-in-5 chance baseline (the heuristic is weak
    // on synthetic word-soup; the matrix exists to MEASURE that)
    assert(correct.toDouble / preds.length > 0.25)
  }

  test("conversion_ci Wilson bounds match a driver-side closed form") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("conversion_ci")(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_reached"),
          r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi")))).toMap
    val ev = collectedEvents()
    val nu = ev.map(_._1).distinct.length.toLong
    val truth = ev.map(t => (t._1, t._2)).distinct.groupBy(_._2).map { case (ty, xs) =>
      val k = xs.length.toLong
      val p = k.toDouble / nu.toDouble
      val zz = 1.96 * 1.96 / nu.toDouble
      def bound(sign: Double) =
        (p + zz / 2 + sign * 1.96 *
          math.sqrt(p * (1.0 - p) / nu.toDouble + zz / (4 * nu.toDouble))) / (1.0 + zz)
      ty -> ((nu, k, q6(bound(-1.0)), q6(bound(1.0))))
    }
    assert(got === truth)
    // the interval is proper: 0 < lo < p̂ <= hi <= 1 (p̂ = 1 pins
    // the Wilson upper bound AT 1 exactly — the reason this interval
    // exists instead of the normal approximation)
    got.foreach { case (ty, (n, k, lo, hi)) =>
      val p = k.toDouble / n.toDouble
      assert(lo > 0.0 && hi <= 1.0 && lo < p && p <= hi, s"$ty: [$lo, $hi] vs $p")
    }
  }

  test("events_trend matches a driver-side least-squares fit") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("events_trend")(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_days"), r.getAs[Double]("slope"),
          r.getAs[Double]("intercept")))).toMap
    val daily = collectedEvents()
      .map(t => (t._2, t._3 / 86400000000L))
      .groupBy(identity).map { case ((ty, d), xs) => (ty, d, xs.size.toLong) }
      .toSeq.groupBy(_._1)
    val truth = daily.map { case (ty, xs) =>
      val mind = xs.map(_._2).min
      val pts = xs.map(p => (p._2 - mind, p._3))
      val n = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum; val sxy = pts.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      val icept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
      ty -> ((n, q6(slope), q6(icept)))
    }
    assert(got === truth)
  }

  test("metric_decomposition contributions conserve the AOV delta") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("metric_decomposition")(spark, sf0001).collect()
      .map(r => r.getAs[String]("segment") ->
        ((r.getAs[Double]("mix_effect"), r.getAs[Double]("rate_effect"),
          r.getAs[Double]("interaction")))).toMap
    val cust = graft.sources.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_mktsegment")).toMap
    val orders = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"),
        col("o_totalprice").cast("decimal(12,2)").as("tp")).collect()
      .map(r => (cust(r.getAs[Long]("o_custkey")), r.getAs[Long]("us"),
        BigDecimal(r.getAs[java.math.BigDecimal]("tp"))))
    val mid = (orders.map(_._2).min + orders.map(_._2).max) / 2
    val halves = orders.map(o => (o._1, if (o._2 < mid) 1 else 2, o._3))
    val t1 = halves.count(_._2 == 1).toLong; val t2 = halves.count(_._2 == 2).toLong
    val raw = halves.groupBy(_._1).map { case (s, xs) =>
      val h1 = xs.filter(_._2 == 1); val h2 = xs.filter(_._2 == 2)
      val w1 = h1.length.toDouble / t1.toDouble
      val m1 = h1.map(_._3).sum.toDouble / h1.length.toDouble
      val w2 = h2.length.toDouble / t2.toDouble
      val m2 = h2.map(_._3).sum.toDouble / h2.length.toDouble
      s -> (((w2 - w1) * m1, w1 * (m2 - m1), (w2 - w1) * (m2 - m1),
        w2 * m2 - w1 * m1))
    }
    assert(got === raw.map { case (s, (a, b, c, _)) => s -> ((q6(a), q6(b), q6(c))) })
    // the three effects sum to the segment's exact AOV contribution
    raw.values.foreach { case (a, b, c, d) => assert(math.abs(a + b + c - d) < 1e-9) }
    // and across segments, to the total AOV movement
    val aov1 = halves.filter(_._2 == 1).map(_._3).sum.toDouble / t1.toDouble
    val aov2 = halves.filter(_._2 == 2).map(_._3).sum.toDouble / t2.toDouble
    val total = raw.values.map { case (a, b, c, _) => a + b + c }.sum
    assert(math.abs(total - (aov2 - aov1)) < 1e-6)
  }

  test("events_debounce packed fold equals a driver-side greedy refractory walk") {
    val got = SparkEntry.queries("events_debounce")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_kept")))).toMap
    val ev = collectedEvents()
    val truth = ev.groupBy(_._1).map { case (u, xs) =>
      val secs = xs.map(_._3 / 1000000L).sorted
      var lastKept = -1L; var kept = 0L
      secs.foreach { s => if (lastKept < 0 || s - lastKept > 300) { lastKept = s; kept += 1 } }
      u -> ((xs.length.toLong, kept))
    }
    assert(got === truth)
    // the debounce genuinely suppresses something at this fixture
    assert(truth.values.exists { case (n, k) => k < n })
    assert(truth.values.forall { case (n, k) => k >= 1 && k <= n })
  }

  test("basket_triples A-Priori pruning equals the brute-force census") {
    val got = SparkEntry.queries("basket_triples")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"),
        r.getAs[String]("brand_c")) -> r.getAs[Long]("n_orders")).toMap
    val ob = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.part(spark, sf0001),
        col("p_partkey") === col("l_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[String]("p_brand")))
    val nt = ob.map(_._1).distinct.length.toLong
    val truth = ob.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val bs = xs.map(_._2).distinct.sorted
      for (i <- bs.indices; j <- i + 1 until bs.length; k <- j + 1 until bs.length)
        yield (bs(i), bs(j), bs(k))
    }.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
      .filter { case (_, n) => 1000 * n >= 5 * nt }
    assert(got === truth)
    assert(truth.nonEmpty, "support threshold should keep some triples at this fixture")
  }

  test("basket_cosine matches a driver-side pair census") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("basket_cosine")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("brand_a"), r.getAs[String]("brand_b")) ->
        ((r.getAs[Long]("n_ab"), r.getAs[Double]("cosine")))).toMap
    val ob = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.part(spark, sf0001),
        col("p_partkey") === col("l_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[String]("p_brand")))
    val marg = ob.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val truth = ob.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val bs = xs.map(_._2).distinct.sorted
      for (i <- bs.indices; j <- i + 1 until bs.length) yield (bs(i), bs(j))
    }.groupBy(identity).map { case (p @ (a, b), xs) =>
      val n = xs.length.toLong
      p -> ((n, q6(n.toDouble / math.sqrt((marg(a) * marg(b)).toDouble))))
    }
    assert(got === truth)
    // cosine is a similarity: every cell in (0, 1]
    got.values.foreach { case (_, c) => assert(c > 0.0 && c <= 1.0) }
  }

  test("dow_seasonality indexes average to 1 and match a driver walk") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("dow_seasonality")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("dow") ->
        ((r.getAs[Long]("n_orders"), r.getAs[Double]("seasonal_index")))).toMap
    val orders = graft.sources.Tables.orders(spark, sf0001)
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("ed"),
        col("o_totalprice").cast("decimal(12,2)").as("tp")).collect()
      .map(r => ((r.getAs[Long]("ed") + 3) % 7,
        BigDecimal(r.getAs[java.math.BigDecimal]("tp"))))
    val nt = orders.length.toLong
    val st = orders.map(_._2).sum
    val truth = orders.groupBy(_._1).map { case (d, xs) =>
      val n = xs.length.toLong
      val s = xs.map(_._2).sum
      d -> ((n, q6((s * nt).toDouble / (BigDecimal(n) * st).toDouble)))
    }
    assert(got === truth)
    assert(got.size === 7)
    // the weighted mean of the indexes is exactly 1 by construction
    val wmean = got.map { case (d, (n, idx)) => idx * n }.sum / nt.toDouble
    assert(math.abs(wmean - 1.0) < 1e-3)
  }

  test("phrase_search posting intersection equals a driver-side trigram scan") {
    val got = SparkEntry.queries("phrase_search")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("phrase"), r.getAs[Long]("n_occurrences")))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" ", -1))
    val grams = docs.flatMap { case (id, tk) =>
      tk.sliding(3).filter(_.length == 3).map(g => (id, g.mkString(" ")))
    }
    val top = grams.groupBy(_._2).map { case (g, xs) => (g, xs.length) }
      .toSeq.minBy { case (g, c) => (-c, g) }._1
    val truth = grams.filter(_._2 == top).groupBy(_._1)
      .map { case (id, xs) => id -> ((top, xs.length.toLong)) }
    assert(got === truth)
    // the phrase genuinely occurs in >1 document at this fixture
    assert(truth.size > 1)
  }

  test("events_ks_drift matches a driver-side two-sample KS walk") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("events_ks_drift")(spark, sf0001).collect()(0)
    val rows = graft.sources.Tables.events(spark, sf0001)
      .filter(col("value").isNotNull)
      .select(unix_micros(col("ts")).as("us"), col("value")).collect()
      .map(r => (r.getAs[Long]("us"), r.getAs[Double]("value")))
    val mid = (rows.map(_._1).min + rows.map(_._1).max) / 2
    val a = rows.filter(_._1 < mid).map(_._2)
    val b = rows.filter(_._1 >= mid).map(_._2)
    val (na, nb) = (a.length.toLong, b.length.toLong)
    assert(got.getAs[Long]("n_first") === na)
    assert(got.getAs[Long]("n_second") === nb)
    val support = (a ++ b).distinct.sorted
    val diffs = support.map { v =>
      v -> math.abs(a.count(_ <= v).toLong * nb - b.count(_ <= v).toLong * na)
    }
    val mx = diffs.map(_._2).max
    assert(got.getAs[Double]("ks_stat") === q6(mx.toDouble / (na.toDouble * nb.toDouble)))
    assert(got.getAs[Double]("ks_at") === diffs.filter(_._2 == mx).map(_._1).min)
  }

  test("events_changepoint matches a driver-side CUSUM walk") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("events_changepoint")(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[String]("change_day"), r.getAs[Double]("cusum_stat")))).toMap
    val daily = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"), date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day")))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.size.toLong) }
      .toSeq.groupBy(_._1)
    val truth = daily.map { case (t, xs) =>
      val ordered = xs.sortBy(_._2)
      val n = ordered.size.toLong
      val tot = ordered.map(_._3).sum
      var cum = BigInt(0)
      val cus = ordered.map { case (_, d, c) => cum += BigInt(c) * n - tot; (d, cum.abs) }
      val mx = cus.map(_._2).max
      t -> ((cus.filter(_._2 == mx).map(_._1).min,
        q6(mx.toDouble / (n.toDouble * n.toDouble))))
    }
    assert(got === truth)
  }

  test("gini_diversity matches the rational impurity form") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("gini_diversity")(spark, sf0001).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_langs"),
          r.getAs[Double]("gini")))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("source"), col("lang")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("lang")))
    val truth = docs.groupBy(_._1).map { case (s, xs) =>
      val byLang = xs.groupBy(_._2).map(_._2.length.toLong)
      val n = xs.length.toLong
      val ss = byLang.map(l => BigInt(l) * l).sum
      s -> ((n, byLang.size.toLong,
        q6((BigInt(n) * n - ss).toDouble / (BigInt(n) * n).toDouble)))
    }
    assert(got === truth)
    // impurity bounds: [0, 1 - 1/|langs|]
    got.values.foreach { case (_, nl, g) => assert(g >= 0.0 && g <= 1.0 - 1.0 / nl + 1e-9) }
  }

  test("span_corrupt masks exactly the md5-selected positions") {
    def md5 = graft.functions.Portable.md5Hex _
    val got = SparkEntry.queries("span_corrupt")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_masked"),
          r.getAs[String]("corrupted_hash")))).toMap
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val truth = docs.map { case (id, t) =>
      val tk = t.split(" ", -1)
      val ck = tk.zipWithIndex.map { case (x, i0) =>
        if ("01".contains(md5(s"${id}_${i0 + 1}").head)) "<X>" else x
      }
      id -> ((tk.length.toLong, ck.count(_ == "<X>").toLong, md5(ck.mkString(" "))))
    }.toMap
    assert(got === truth)
    // the deterministic nibble rule masks 2/16 of tokens in expectation
    val (tot, masked) = (truth.values.map(_._1).sum, truth.values.map(_._2).sum)
    val rate = masked.toDouble / tot.toDouble
    assert(rate > 0.08 && rate < 0.17, s"mask rate $rate implausible for 2/16 nibbles")
  }

  /** Reference BPE trainer: sequential greedy left-to-right merges —
    * the textbook formulation the island-parity window trick must
    * equal. Returns (merges, final vocabulary). */
  private def sequentialBpe(rounds: Int)
      : (Seq[(Long, String, String, String, Long)], Map[String, (Vector[String], Long)]) = {
    var vocab: Map[String, (Vector[String], Long)] =
      graft.sources.Tables.documents(spark, sf0001)
        .select(col("text")).collect()
        .flatMap(_.getAs[String]("text").split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity)
        .map { case (w, xs) => w -> ((w.map(_.toString).toVector, xs.length.toLong)) }
    val merges = (1 to rounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (s, f) =>
        s.zip(s.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      val ((l, rr), w) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.map { case (word, (s, f)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == rr) {
            out += (l + rr); i += 2
          } else { out += s(i); i += 1 }
        }
        word -> ((out.result(), f))
      }
      (r.toLong, l, rr, l + rr, w)
    }
    (merges, vocab)
  }

  test("bpe_merges matches a driver-side sequential BPE trainer") {
    val got = SparkEntry.queries("bpe_merges")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[String]("merged"),
        r.getAs[Long]("weight"))).sortBy(_._1)
    val (truth, _) = sequentialBpe(3)
    assert(got.toSeq === truth)
    // three distinct merges, strictly useful (every weight >= 2)
    assert(truth.map(_._4).distinct.size === 3)
    assert(truth.forall(_._5 >= 2L))
  }

  test("bpe_encode compression stats match the sequentially trained vocabulary") {
    def q6(x: Double) = math.floor(x * 1000000.0) / 1000000.0
    val got = SparkEntry.queries("bpe_encode")(spark, sf0001).collect()(0)
    val (_, vocab) = sequentialBpe(3)
    val nOcc = vocab.values.map(_._2).sum
    val nChars = vocab.map { case (w, (_, f)) => f * w.length }.sum
    val nSyms = vocab.values.map { case (s, f) => f * s.length }.sum
    assert(got.getAs[Long]("n_word_occurrences") === nOcc)
    assert(got.getAs[Long]("n_chars") === nChars)
    assert(got.getAs[Long]("n_symbols") === nSyms)
    assert(got.getAs[Double]("chars_per_symbol") === q6(nChars.toDouble / nSyms.toDouble))
    // merging strictly compresses: fewer symbols than chars
    assert(nSyms < nChars)
  }

  test("mode_agg matches a driver-side census and breaks ties low") {
    val got = SparkEntry.queries("mode_agg")(spark, sf0001).collect()
      .map(r => r.getAs[String]("segment") ->
        ((r.getAs[String]("mode_priority"), r.getAs[Long]("n_orders")))).toMap
    val cust = graft.sources.Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("c_mktsegment")).toMap
    val counts = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_custkey"), col("o_orderpriority")).collect()
      .map(r => (cust(r.getAs[Long]("o_custkey")), r.getAs[String]("o_orderpriority")))
      .groupBy(identity).map { case (k, xs) => (k, xs.size.toLong) }
    val truth = counts.groupBy(_._1._1).map { case (seg, m) =>
      val mx = m.values.max
      seg -> ((m.filter(_._2 == mx).keys.map(_._2).min, mx))
    }
    assert(got === truth)
  }
  test("url_canonical: normalization strips every noise class and loses no docs") {
    val rows = SparkEntry.queries("url_canonical")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val urls = rows.map(_.getAs[String]("canonical_url"))
    urls.foreach { u =>
      assert(u.startsWith("https://"), s"scheme not lowered: $u")
      assert(!u.contains("#"), s"fragment kept: $u")
      assert(!u.contains("utm"), s"tracking param kept: $u")
      assert(!u.contains("ref="), s"ref param kept: $u")
      assert(!u.contains(":443"), s"default port kept: $u")
      assert(!u.contains("://www."), s"www kept: $u")
      assert(!u.contains("Example"), s"host not lowered: $u")
      assert(!u.substring(0, u.indexOf('?')).endsWith("/"), s"trailing slash kept: $u")
      assert(u.contains("?id="), s"real param lost: $u")
    }
    // dedup is total: every doc lands under exactly one canonical url
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    assert(rows.length < total, "canonicalization found no case/param collisions")
  }

  test("attribution credits match a brute-force per-user replay") {
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .collect()
      // microsecond precision (getTime is ms-truncated): the query
      // orders by the full timestamp, so an ms-collapsed replay could
      // mis-order same-ms events and flip a credit
      .map { r =>
        val ts = r.getAs[java.sql.Timestamp]("ts")
        val micros = ts.getTime / 1000 * 1000000L + ts.getNanos / 1000
        (r.getAs[Long]("event_id"), micros,
          r.getAs[Long]("user_id"), r.getAs[String]("event_type"))
      }
    val byUser = ev.groupBy(_._3)
    val expected = ev.filter(_._4 == "purchase").map { case (pid, pts, uid, _) =>
      val touches = byUser(uid)
        .filter(e => (e._4 == "view" || e._4 == "click")
          && (e._2 < pts || (e._2 == pts && e._1 < pid)))
        .sortBy(e => (e._2, e._1))
      (pid, (touches.headOption.map(_._1).getOrElse(-1L),
        touches.lastOption.map(_._1).getOrElse(-1L)))
    }.toMap
    val got = SparkEntry.queries("attribution")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("purchase_id"),
        (r.getAs[Long]("first_touch"), r.getAs[Long]("last_touch")))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (pid, credits) =>
      assert(credits === expected(pid), s"purchase $pid")
    }
    assert(got.values.exists(_._1 != -1L), "no purchase ever got a credit")
  }

  test("source_overlap equals a driver-side shingle-set sweep") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val sets = docs.groupBy(_._1).map { case (src, ds) =>
      src -> ds.flatMap { case (_, text) =>
        val tk = text.split(" ")
        val starts = math.min(math.max(tk.length - 5, 0), 4095)
        (0 to starts).map(i => tk.slice(i, i + 5).mkString(" "))
      }.toSet
    }
    val expected = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      common = (sa & sb).size if common > 0
    } yield (a, b) -> ((common.toLong,
      math.floor(common.toDouble / (sa.size + sb.size - common) * 1e6) / 1e6))).toMap
    val got = SparkEntry.queries("source_overlap")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
        -> ((r.getAs[Long]("n_common"), r.getAs[Double]("jaccard")))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("source_sketch matches a driver-side minhash fold, every pair present") {
    def md5 = graft.functions.Portable.md5Hex _
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val sketches = docs.groupBy(_._1).map { case (src, ds) =>
      val hw = ds.flatMap { case (_, text) =>
        val tk = text.split(" ")
        val starts = math.min(math.max(tk.length - 5, 0), 4095)
        (0 to starts).map { i =>
          val h = md5(tk.slice(i, i + 5).mkString(" "))
          (java.lang.Long.parseLong(h.substring(0, 8), 16),
            java.lang.Long.parseLong(h.substring(8, 16), 16))
        }
      }
      src -> (0 until 24).map(k =>
        hw.map { case (h1, h2) => (h1 + k.toLong * h2) % 4294967296L }.min)
    }
    val expected = (for {
      (a, sa) <- sketches; (b, sb) <- sketches if a < b
      agree = (0 until 24).count(k => sa(k) == sb(k))
    } yield (a, b) -> ((agree.toLong,
      math.floor(agree.toDouble / 24 * 1e6) / 1e6))).toMap
    val got = SparkEntry.queries("source_sketch")(spark, sf0001).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"))
        -> ((r.getAs[Long]("n_agree"), r.getAs[Double]("est_jaccard")))).toMap
    assert(got === expected)
    // unlike the exact matrix, a zero-agreement pair is a RESULT row
    val ns = sketches.size
    assert(got.size === ns * (ns - 1) / 2)
  }

  test("ann_cell_census conserves the corpus and its cells are the seed set") {
    def md5 = graft.functions.Portable.md5Hex _
    val got = SparkEntry.queries("ann_cell_census")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("cid") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Double]("share"))))
    val ids = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id")).collect().map(_.getLong(0))
    val n = ids.length.toLong
    // every vector lands in exactly one cell
    assert(got.map(_._2._1).sum === n)
    got.foreach { case (_, (nv, share)) =>
      assert(share === math.floor(nv.toDouble / n * 1e6) / 1e6)
    }
    // the occupied cells are EXACTLY the md5-order centroid seed: a
    // centroid is its own nearest cell (cosine(c,c) = 1, lowest-cid
    // tie-break), so no seeded cell can come back empty. That relies
    // on a DATA assumption (r13 advice): no two seed vectors may be
    // quant6-cosine-identical — a duplicate/near-identical embedding
    // among the seeds would tie at 1.0 and route the higher-cid seed
    // to the lower cid, emptying its own cell. Assert it explicitly so
    // a future dataset change fails with a clear message instead of a
    // baffling set mismatch.
    val seeds = ids.sortBy(id => (md5(id.toString), id)).take(16).toSet
    val seedVecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id").isin(seeds.toSeq: _*))
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    def q6cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      math.floor(dot / (na * nb) * 1e6) / 1e6
    }
    for {
      (ia, va) <- seedVecs; (ib, vb) <- seedVecs if ia < ib
    } assert(q6cos(va, vb) < 1.0,
      s"seed centroids $ia and $ib are quant6-cosine-identical — the " +
        "seed-set assertion below assumes distinct seeds (dataset changed?)")
    assert(got.map(_._1).toSet === seeds)
  }

  test("embed_drift matches a driver-side exact recomputation and conserves the corpus") {
    def md5 = graft.functions.Portable.md5Hex _
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    val dims = vecs.head._2.length
    def q(x: Float): Long = math.floor(x.toDouble * 1000000).toLong
    val expected = (1 to dims).map { j =>
      val (a, b) = vecs.partition { case (id, _) => md5("h" + id).charAt(0) < '8' }
      val (na, nb) = (a.length.toLong, b.length.toLong)
      val sa = a.map(v => q(v._2(j - 1))).sum
      val sb = b.map(v => q(v._2(j - 1))).sum
      val ma = sa.toDouble / (na * 1000000L).toDouble
      val mb = sb.toDouble / (nb * 1000000L).toDouble
      def q6(x: Double) = math.floor(x * 1e6) / 1e6
      j.toLong -> ((na, nb, q6(ma), q6(mb), q6(ma - mb)))
    }.toMap
    val got = SparkEntry.queries("embed_drift")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("component") ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Double]("mean_a"),
          r.getAs[Double]("mean_b"), r.getAs[Double]("drift")))).toMap
    assert(got === expected)
    assert(got.size === dims)
    // both halves populated and conserving: n_a + n_b = corpus size
    got.values.foreach { case (na, nb, _, _, _) =>
      assert(na > 0 && nb > 0 && na + nb === vecs.length.toLong)
    }
  }

  test("embed_pca returns a unit top-direction that dominates random probes") {
    val rows = SparkEntry.queries("embed_pca")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Double]("loading"),
        r.getAs[Double]("var_share"))).sortBy(_._1)
    assert(rows.length === 64)
    val l = rows.map(_._2)
    // unit vector up to the 1e-6 quantization; sign anchored at
    // component 1 (non-negative by construction)
    assert(math.abs(l.map(x => x * x).sum - 1.0) < 1e-3)
    assert(l(0) >= 0.0)
    // var_share is one constant in (0, 1]
    val shares = rows.map(_._3).distinct
    assert(shares.length === 1 && shares(0) > 0.0 && shares(0) <= 1.0)
    // the returned direction must carry more variance than ANY of 32
    // md5-seeded random unit probes — the "top component" property,
    // measured on the raw data rather than trusted from the algorithm
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("embedding")).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    def variance(dir: Array[Double]): Double = {
      val proj = vecs.map(v => v.indices.map(i => v(i) * dir(i)).sum)
      val m = proj.sum / proj.length
      proj.map(p => (p - m) * (p - m)).sum / proj.length
    }
    val got = variance(l)
    val rnd = (0 until 32).map { s =>
      val raw = Array.tabulate(64)(i =>
        java.lang.Long.parseLong(
          graft.functions.Portable.md5Hex(s"pca_$s" + "_" + i).substring(0, 6), 16)
          .toDouble / 16777216.0 - 0.5)
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / n)
    }
    rnd.foreach(p => assert(variance(p) < got,
      f"a random probe carries ${variance(p)}%.4f variance >= the returned direction's $got%.4f"))
  }

  test("embed_pca_topk deflation yields near-orthogonal axes with descending shares") {
    val rows = SparkEntry.queries("embed_pca_topk")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("pc"), r.getAs[Long]("component"),
        r.getAs[Double]("loading"), r.getAs[Double]("var_share")))
    assert(rows.length === 3 * 64)
    val byPc = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byPc.keySet === Set(1L, 2L, 3L))
    val loadings = (1L to 3L).map(pc => byPc(pc).map(_._3).toArray)
    // each axis is unit up to the 1e-6 quantization
    loadings.foreach(l => assert(math.abs(l.map(x => x * x).sum - 1.0) < 1e-3))
    // deflation must produce near-orthogonal axes (10 fixed power
    // iterations are deliberately not run to convergence, so allow a
    // modest residual rather than machine epsilon)
    for (a <- 0 until 3; b <- a + 1 until 3) {
      val d = math.abs(loadings(a).zip(loadings(b)).map { case (x, y) => x * y }.sum)
      assert(d < 0.15, f"axes ${a + 1} and ${b + 1} not orthogonal: |dot| = $d%.4f")
    }
    // var_share: one constant per pc, in (0, 1], and descending down
    // the spectrum WITHIN the iteration residual — the test corpus is
    // near-isotropic (spectrum nearly flat), and 10 deliberately
    // fixed, non-converged power iterations give Rayleigh estimates
    // that can cross by the residual; exact ordering is only a
    // convergence property, never a parity one
    val shares = (1L to 3L).map { pc =>
      val s = byPc(pc).map(_._4).distinct
      assert(s.length === 1 && s(0) > 0.0 && s(0) <= 1.0)
      s(0)
    }
    for (i <- 0 until 2)
      assert(shares(i + 1) <= shares(i) + 0.005,
        s"var_share rose beyond the iteration residual down the spectrum: $shares")
    // component 1 is byte-identical to the standalone embed_pca seat
    val pc1 = byPc(1L).map(r => (r._2, r._3, r._4))
    val standalone = SparkEntry.queries("embed_pca")(spark, sf0001).collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Double]("loading"),
        r.getAs[Double]("var_share"))).sortBy(_._1).toSeq
    assert(pc1.toSeq === standalone)
  }

  test("embed_axis_drift matches a driver-side exact KS recomputation") {
    val got = SparkEntry.queries("embed_axis_drift")(spark, sf0001).collect()
    assert(got.length === 1)
    val r = got(0)
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    // recompute from raw data: project onto the embed_pca axis (its
    // own spec pins that axis), quantize, exact integer KS
    val axis = SparkEntry.queries("embed_pca")(spark, sf0001).collect()
      .map(x => (x.getAs[Long]("component"), x.getAs[Double]("loading")))
      .sortBy(_._1).map(_._2)
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(x => (x.getAs[Long]("vec_id"),
        x.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray))
    assert(na + nb === vecs.length.toLong, "halves must conserve the corpus")
    assert(na > 0 && nb > 0)
    def md5s = graft.functions.Portable.md5Hex _
    val proj = vecs.map { case (id, v) =>
      val inA = md5s("h" + id).charAt(0) < '8'
      // NOTE: the quantized axis from the published seat differs from
      // the engine's full-precision axis by <1e-6 per component; the
      // projections can therefore differ in the last quantized digit,
      // so this recomputation checks the KS STATISTIC's value against
      // a tolerance, not bit equality (the oracle hash compare is the
      // bit-equality gate)
      (inA, math.floor(v.indices.map(i => v(i) * axis(i)).sum * 1e6).toLong)
    }
    val groups = proj.groupBy(_._2).toSeq.sortBy(_._1)
    var (ca, cb) = (0L, 0L)
    var mx = BigInt(0)
    groups.foreach { case (_, rows) =>
      ca += rows.count(_._1); cb += rows.count(!_._1)
      val d = (BigInt(ca) * nb - BigInt(cb) * na).abs
      if (d > mx) mx = d
    }
    val expected = mx.toDouble / (na.toDouble * nb.toDouble)
    val ks = r.getAs[Double]("ks_stat")
    assert(math.abs(ks - expected) < 0.02,
      f"ks_stat $ks%.6f vs driver recomputation $expected%.6f")
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("filter_attribution is the exact census of corpus_keep's own flags") {
    val flags = SparkEntry.queries("corpus_keep")(spark, sf0001).collect()
      .map(r => (r.getAs[Boolean]("q_pass"), r.getAs[Boolean]("rep_pass"),
        r.getAs[Boolean]("lang_pass"), r.getAs[Boolean]("contam_pass"),
        r.getAs[Boolean]("dedup_keep")))
    val n = flags.length.toLong
    def c(p: ((Boolean, Boolean, Boolean, Boolean, Boolean)) => Boolean) =
      flags.count(p).toLong
    val expected = Map[Long, (String, Long, Long, Long)](
      1L -> (("quality", c(!_._1), c(!_._1), c(_._1))),
      2L -> (("repetition", c(!_._2), c(f => f._1 && !f._2), c(f => f._1 && f._2))),
      3L -> (("langid", c(!_._3), c(f => f._1 && f._2 && !f._3),
        c(f => f._1 && f._2 && f._3))),
      4L -> (("contamination", c(!_._4), c(f => f._1 && f._2 && f._3 && !f._4),
        c(f => f._1 && f._2 && f._3 && f._4))),
      5L -> (("dedup", c(!_._5), c(f => f._1 && f._2 && f._3 && f._4 && !f._5),
        c(f => f._1 && f._2 && f._3 && f._4 && f._5))))
    val got = SparkEntry.queries("filter_attribution")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("rule_no") ->
        ((r.getAs[String]("rule"), r.getAs[Long]("n_fail"),
          r.getAs[Long]("n_first_fail"), r.getAs[Long]("n_surviving")))).toMap
    assert(got === expected)
    // attribution partitions the corpus: every doc is killed by
    // exactly one rule or survives the whole cascade
    assert(got.values.map(_._3).sum + got(5L)._4 === n)
    // survivors are monotone down the cascade
    val surv = (1L to 5L).map(got(_)._4)
    assert(surv === surv.sorted.reverse)
  }
}
