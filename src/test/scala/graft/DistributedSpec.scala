package graft

import graft.operators.Distributed
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix-aggregation primitive behind
  * events_quantiles and text_pack: range-sharded local windows +
  * broadcast prefix offsets must reproduce the naive single-window
  * computation exactly — including across shard boundaries, which is
  * where an off-by-one in the offsets would hide. */
class DistributedSpec extends SparkSuite {

  test("globalRunning equals the single-window reference on unique order keys") {
    import spark.implicits._
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val ords = rnd.shuffle((0 until 500).toVector)
      val rows = ords.map(o => (s"g${rnd.nextInt(4)}", o.toLong, rnd.nextInt(50).toLong))
      val df = rows.toDF("g", "ord", "v")
      val w = Window.partitionBy("g").orderBy("ord")
      val ref = df
        .withColumn("r_rank", row_number().over(w))
        .withColumn("r_run", sum("v").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("r_n", count(lit(1)).over(Window.partitionBy("g")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val got = Distributed.globalRunning(df, Seq("g"), Seq("ord"), Some("v"))
      val joined = got.join(ref, Seq("g", "ord", "v")).cache()
      assert(joined.count() === 500, s"seed $seed: row loss")
      assert(joined.filter(col("g_rank") =!= col("r_rank")
        || col("g_run") =!= col("r_run") || col("g_n") =!= col("r_n")).count() === 0,
        s"seed $seed: rank/run/total mismatch vs the window reference")
    }
  }

  test("globalRunning handles ties like the reference: value-at-rank is well-defined") {
    import spark.implicits._
    // heavy duplicate order keys (the events_quantiles case, where the
    // order key IS the value): rank order among ties is arbitrary, but
    // the value and running sum AT each rank are fully determined
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map(_ => (s"g${rnd.nextInt(3)}", rnd.nextInt(40).toLong))
    val df = rows.toDF("g", "ord").withColumn("v", col("ord"))
    val w = Window.partitionBy("g").orderBy("ord")
    val ref = df
      .withColumn("rank", row_number().over(w))
      .withColumn("r_run", sum("v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("g"), col("rank"), col("ord").as("r_ord"), col("r_run"))
    val got = Distributed.globalRunning(df, Seq("g"), Seq("ord"), Some("v"))
      .select(col("g"), col("g_rank").as("rank"), col("ord"), col("g_run"))
    val joined = got.join(ref, Seq("g", "rank")).cache()
    assert(joined.count() === 400)
    assert(joined.filter(col("ord") =!= col("r_ord")
      || col("g_run") =!= col("r_run")).count() === 0,
      "value-at-rank or run-at-rank diverged from the window reference")
  }

  test("multi-column group keys partition independently") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val ords = rnd.shuffle((0 until 300).toVector)
    val rows = ords.map(o =>
      (s"a${rnd.nextInt(2)}", s"b${rnd.nextInt(3)}", o.toLong, rnd.nextInt(20).toLong))
    val df = rows.toDF("g1", "g2", "ord", "v")
    val w = Window.partitionBy("g1", "g2").orderBy("ord")
    val ref = df
      .withColumn("r_rank", row_number().over(w))
      .withColumn("r_run", sum("v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = Distributed.globalRunning(df, Seq("g1", "g2"), Seq("ord"), Some("v"))
    val joined = got.join(ref, Seq("g1", "g2", "ord", "v")).cache()
    assert(joined.count() === 300)
    assert(joined.filter(col("g_rank") =!= col("r_rank")
      || col("g_run") =!= col("r_run")).count() === 0,
      "composite-group rank/run mismatch vs the window reference")
  }

  test("null values follow window-SUM semantics: skipped, not poisoning") {
    import spark.implicits._
    // nulls clustered so whole shards can be all-null — the layout
    // where an inclusive-minus-own offset null-poisons entire shards
    val rnd = new scala.util.Random(13)
    val rows = (0 until 400).map { i =>
      val v: java.lang.Long = if (rnd.nextInt(3) == 0) null else rnd.nextInt(20).toLong
      (s"g${rnd.nextInt(3)}", i.toLong, v)
    }
    val df = rows.toDF("g", "ord", "v")
    val w = Window.partitionBy("g").orderBy("ord")
    val ref = df.withColumn("r_run", sum("v").over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = Distributed.globalRunning(df, Seq("g"), Seq("ord"), Some("v"))
    val joined = got.join(ref, Seq("g", "ord")).cache()
    assert(joined.count() === 400)
    assert(joined.filter(!(col("g_run") <=> col("r_run"))).count() === 0,
      "running sum over nullable values diverged from the window reference")
  }

  test("passenger columns are rejected loudly, not silently mis-ranked") {
    import spark.implicits._
    // an extra column would let column pruning split the single range
    // shuffle into two independently-sampled ones (mismatched __pid)
    val df = (0 until 10).map(i => ("g", i.toLong, i.toLong, s"doc$i"))
      .toDF("g", "ord", "v", "passenger")
    val e = intercept[IllegalArgumentException] {
      Distributed.globalRunning(df, Seq("g"), Seq("ord"), Some("v"))
    }
    assert(e.getMessage.contains("passenger"))
  }

  test("rank-only mode needs no value column and emits no g_run") {
    import spark.implicits._
    val df = (0 until 100).map(i => ("g", i.toLong)).toDF("g", "ord")
    val got = Distributed.globalRunning(df, Seq("g"), Seq("ord"))
    assert(!got.columns.contains("g_run"))
    assert(got.filter(col("g_rank") =!= col("ord") + 1).count() === 0)
  }
}
