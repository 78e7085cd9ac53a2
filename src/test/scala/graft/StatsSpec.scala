package graft

import org.apache.spark.sql.functions._

/** Statistical analytics (SURVEY.md §2.2 A25–A27): exact-moment
  * correlation, equi-width histogram, global ntile binning. The DuckDB
  * hash gate is dev/check.sh; these pin the semantics offline —
  * against Spark's OWN streaming-moment builtins (which agree to ~1e-9
  * at this scale; the decimal-sum form exists for order-independence,
  * not different math) and against the SQL ntile bucket-size law.
  */
class StatsSpec extends SparkSuite {

  test("stats_corr matches Spark's corr/covar/stddev builtins to 1e-6") {
    val got = SparkEntry.queries("stats_corr")(spark, sf0001)
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    val want = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(
        corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_quantity")).as("sq"),
        stddev_samp(col("l_extendedprice")).as("sp"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (flag, g) =>
      val w = want(flag)
      assert(math.abs(g.getAs[Double]("corr_qty_price") - w.getAs[Double]("c")) < 1e-6, flag)
      // covar is ~1e2-1e3 in magnitude: compare relatively
      assert(math.abs(g.getAs[Double]("covar_qty_price") - w.getAs[Double]("cv"))
        <= 1e-6 * math.max(1.0, math.abs(w.getAs[Double]("cv"))), flag)
      assert(math.abs(g.getAs[Double]("stddev_qty") - w.getAs[Double]("sq")) < 1e-6, flag)
      assert(math.abs(g.getAs[Double]("stddev_price") - w.getAs[Double]("sp"))
        <= 1e-6 * math.abs(w.getAs[Double]("sp")), flag)
    }
    // the synthetic generator draws quantity and price independently
    // (measured corr ≈ ±0.02), so there's no sign to pin — just the
    // Cauchy-Schwarz bound and positive dispersions
    assert(got.values.forall(r => math.abs(r.getAs[Double]("corr_qty_price")) <= 1.0))
    assert(got.values.forall(_.getAs[Double]("stddev_qty") > 0.0))
  }

  test("events_histogram conserves mass and tiles [lo, hi] without gaps") {
    val bins = SparkEntry.queries("events_histogram")(spark, sf0001)
      .orderBy("bin").collect()
    val nonNull = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("value").isNotNull).count()
    assert(bins.map(_.getAs[Long]("n")).sum === nonNull, "histogram loses/duplicates rows")
    assert(bins.forall { r => val b = r.getAs[Long]("bin"); b >= 0 && b <= 19 })
    // edges tile: bin b's hi == bin b+1's lo (same quantized arithmetic)
    bins.sliding(2).foreach {
      case Array(a, b) if b.getAs[Long]("bin") === a.getAs[Long]("bin") + 1 =>
        assert(a.getAs[Double]("bin_hi") === b.getAs[Double]("bin_lo"))
      case _ => ()
    }
    assert(bins.forall(r => r.getAs[Double]("bin_hi") > r.getAs[Double]("bin_lo")))
  }

  test("events_winsor matches a local nearest-rank reference exactly") {
    val got = SparkEntry.queries("events_winsor")(spark, sf0001)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val data = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got.keySet === data.keySet)
    got.foreach { case (tpe, row) =>
      val s = data(tpe)
      val n = s.length
      val p05 = s(math.ceil(0.05 * n).toInt - 1)
      val p95 = s(math.ceil(0.95 * n).toInt - 1)
      assert(row.getAs[Long]("n") === n.toLong, tpe)
      assert(row.getAs[Double]("p05") === p05, tpe)
      assert(row.getAs[Double]("p95") === p95, tpe)
      val clipped = s.map(v => math.min(math.max(v, p05), p95))
      assert(math.abs(row.getAs[Double]("mean_winsor") - clipped.sum / n) < 1e-6, tpe)
      assert(math.abs(row.getAs[Double]("mean_raw") - s.sum / n) < 1e-6, tpe)
      assert(row.getAs[Long]("n_clipped") === s.count(v => v < p05 || v > p95).toLong, tpe)
      // the winsorized mean lives inside the clip band
      assert(row.getAs[Double]("mean_winsor") >= p05 && row.getAs[Double]("mean_winsor") <= p95, tpe)
    }
  }

  test("events_ntile obeys the SQL ntile law: sizes q/q+1, larger buckets first, ranges ordered") {
    val rows = SparkEntry.queries("events_ntile")(spark, sf0001).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val totals = spark.read.parquet(s"$sf0001/events.parquet")
      .filter(col("value").isNotNull)
      .groupBy("event_type").count()
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    assert(byType.keySet === totals.keySet)
    byType.foreach { case (tpe, rs) =>
      val n = totals(tpe)
      val sorted = rs.sortBy(_.getAs[Long]("decile"))
      assert(sorted.map(_.getAs[Long]("decile")).toSeq === (1L to 10L), tpe)
      assert(sorted.map(_.getAs[Long]("n_rows")).sum === n, tpe)
      val q = n / 10
      val r = n % 10
      sorted.foreach { row =>
        val expected = if (row.getAs[Long]("decile") <= r) q + 1 else q
        assert(row.getAs[Long]("n_rows") === expected,
          s"$tpe decile ${row.getAs[Long]("decile")}")
      }
      // deciles partition the value axis in order: each decile's min
      // is ≥ the previous decile's min (equal values can straddle a
      // boundary, so compare lo-to-lo, not hi-to-lo)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Double]("lo_value") >= a.getAs[Double]("lo_value"), tpe)
        case _ => ()
      }
    }
  }

  test("events_autocorr agrees with Spark's builtin corr over the lagged pairs") {
    val got = SparkEntry.queries("events_autocorr")(spark, sf0001).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("autocorr")))).toMap
    val daily = graft.sources.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    val ref = daily
      .withColumn("y", lead(col("c"), 1).over(w))
      .filter(col("y").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), corr(col("c").cast("double"), col("y").cast("double")).as("r"))
      .collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n"), x.getAs[Double]("r")))).toMap
    assert(got.keySet === ref.keySet)
    got.foreach { case (t, (n, a)) =>
      assert(n === ref(t)._1, s"$t pairs")
      assert(math.abs(a - ref(t)._2) < 1e-6, s"$t autocorr $a vs builtin ${ref(t)._2}")
      assert(a >= -1.0 && a <= 1.0, s"$t out of range")
    }
  }

  test("events_chisq matches a driver-side fold over the full contingency grid") {
    val row = SparkEntry.queries("events_chisq")(spark, sf0001).collect()(0)
    val (n, dof, chi2) = (row.getAs[Long]("n"), row.getAs[Long]("dof"),
      row.getAs[Double]("chi2"))
    val cells = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 86400000000 + 4) % 7").as("dow"))
      .groupBy("event_type", "dow").count().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow")) ->
        r.getAs[Long]("count")).toMap
    val types = cells.keys.map(_._1).toSeq.distinct.sorted
    val dows = cells.keys.map(_._2).toSeq.distinct.sorted
    val nn = cells.values.sum
    assert(n === nn)
    assert(dof === (types.size - 1).toLong * (dows.size - 1))
    val ri = types.map(t => t -> dows.map(d => cells.getOrElse((t, d), 0L)).sum).toMap
    val cj = dows.map(d => d -> types.map(t => cells.getOrElse((t, d), 0L)).sum).toMap
    var acc = 0.0
    for (t <- types; d <- dows) {
      val e = (ri(t) * cj(d)).toDouble / nn.toDouble
      val o = cells.getOrElse((t, d), 0L).toDouble
      acc += (o - e) * (o - e) / e
    }
    assert(chi2 === math.floor(acc * 1e6) / 1e6)
  }
}
