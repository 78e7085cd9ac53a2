package graft

import java.sql.Timestamp

import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** L13: Structured Streaming twins driven synchronously through
  * MemoryStream + processAllAvailable. */
class StreamingSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp = new Timestamp(1704067200000L + minute * 60000L)

  test("streaming state runs on the RocksDB provider, not the in-memory default") {
    // every stateful test below exercises it; this guards the config
    // from silently reverting to the in-memory provider
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .endsWith("RocksDBStateStoreProvider"))
    Class.forName("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  }

  test("hourlyCounts aggregates windows with a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 3.0))
    val q = EventsStreaming.hourlyCounts(input.toDF())
      .writeStream.outputMode("update").format("memory").queryName("hourly").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("hourly").select(col("event_type"), col("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("click") === 2L)
    assert(out("view") === 1L)
  }

  test("file-source ingestion: readStream over a parquet drop-zone") {
    import org.apache.spark.sql.functions.{count => fcount}
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
    val batch = graft.sources.Tables.events(spark, sf0001)
    batch.write.mode("overwrite").parquet(s"$dir/drop")
    val stream = spark.readStream
      .schema(batch.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/drop")
      .groupBy("event_type").agg(fcount(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("filesrc").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("filesrc").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = batch.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === expected)
  }

  test("slidingCounts agrees with the batch sliding-window aggregate on real events") {
    val batch = graft.sources.Tables.events(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_slide_src").toString
    batch.write.mode("overwrite").parquet(s"$dir/drop")
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/drop")
    val q = EventsStreaming.slidingCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("sliding").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sliding")
      .select(col("window.start").as("ws"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = batch
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed === expected)
    // every event lands in 4 overlapping windows
    assert(streamed.values.sum === 4L * batch.count())
  }

  test("streaming exact dedup drops repeats within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // streaming twin of dedup_exact: dropDuplicatesWithinWatermark
    // bounds the dedup state by event time so it is evictable at scale
    // (plain dropDuplicates without the time column keeps state forever)
    val q = input.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .groupBy("event_type").count()
      .writeStream.outputMode("update").format("memory").queryName("dedup_s").start()
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 1, "click", 2.0), // dup of (1, click)
      Event(3, ts(2), 2, "click", 3.0),
      Event(4, ts(3), 2, "click", 4.0)) // dup of (2, click)
    q.processAllAvailable()
    q.stop()
    val n = spark.table("dedup_s").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n("click") === 2L) // one per distinct (user, type)
  }

  test("stream-static join enriches the stream with a broadcastable dim") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val severity = Seq(("error", 3), ("purchase", 2), ("click", 1))
      .toDF("event_type", "severity")
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "error", 1.0),
      Event(2, ts(1), 1, "click", 1.0),
      Event(3, ts(2), 2, "error", 1.0))
    val q = input.toDF().join(severity, "event_type")
      .groupBy("severity").count()
      .writeStream.outputMode("update").format("memory").queryName("sev").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sev").collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(3) === 2L && out(1) === 1L)
  }

  test("stream-stream interval join attributes prior events to purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.purchaseAttribution(input.toDF(), 30)
      .writeStream.outputMode("append").format("memory").queryName("attrib").start()
    input.addData(
      Event(1, ts(0), 1, "click", 1.0), // within 30 min of purchase 3 → match
      Event(2, ts(40), 2, "click", 1.0), // other user → no match
      Event(3, ts(10), 1, "purchase", 9.0),
      Event(4, ts(50), 1, "click", 1.0), // AFTER the purchase → no match
      Event(5, ts(100), 1, "purchase", 5.0)) // nearest prior click 50 min away → no match
    q.processAllAvailable()
    q.stop()
    val out = spark.table("attrib").collect()
      .map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("e_id")))
    assert(out.toSet === Set((3L, 1L)))
  }

  test("foreachBatch bridges the stream into the batch warehouse sink (R8)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = s"${java.nio.file.Files.createTempDirectory("graft_wh").toString}/warehouse"
    val input = MemoryStream[Event]
    val q = EventsStreaming.warehouseSink(input.toDF(), dir)
    input.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0))
    q.processAllAvailable()
    input.addData(Event(3, ts(2), 2, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(dir)
    assert(back.count() === 3) // WRITE_APPEND accumulated both micro-batches
    assert(back.select("event_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("restart from the checkpoint replays a batch exactly once into the warehouse") {
    // the first operational question at scale: kill a stream between
    // the sink write and the checkpoint commit — does the warehouse
    // hold each event exactly once afterwards? Simulated faithfully:
    // Spark writes offsets/N BEFORE executing batch N and commits/N
    // after, so deleting the newest commit marker reproduces a crash
    // in that window; the restart re-executes that batch with the
    // same batchId and rows.
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_eo").toString
    val sch = StructType(Seq(StructField("event_id", LongType)))
    def addFile(ids: Seq[Long]): Unit = {
      import spark.implicits._
      ids.toDF("event_id").repartition(1).write.mode("append").parquet(s"$root/drop")
    }
    def stream() = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/drop")
    def dropNewestCommit(ck: String): Unit = {
      val dir = new java.io.File(s"$ck/commits")
      val newest = dir.listFiles().filter(_.getName.forall(_.isDigit))
        .sortBy(_.getName.toInt).last
      // the local checksum FS keeps a shadow .N.crc — remove it too or
      // the replayed commit's rename fails where HDFS would succeed
      new java.io.File(dir, s".${newest.getName}.crc").delete()
      newest.delete()
    }

    addFile(1L to 10L)
    addFile(11L to 20L)
    val q1 = EventsStreaming.warehouseSinkExactlyOnce(stream(), s"$root/wh", s"$root/ck")
    q1.processAllAvailable(); q1.stop()
    dropNewestCommit(s"$root/ck") // crash before the batch-1 commit marker
    addFile(21L to 30L)
    val q2 = EventsStreaming.warehouseSinkExactlyOnce(stream(), s"$root/wh", s"$root/ck")
    q2.processAllAvailable(); q2.stop() // replays batch 1, then batch 2
    val back = spark.read.parquet(s"$root/wh").select("event_id")
    assert(back.count() === 30, "idempotent sink must absorb the replayed batch")
    assert(back.distinct().count() === 30)
    assert(back.collect().map(_.getLong(0)).toSet === (1L to 30L).toSet)

    // negative control: the plain WRITE_APPEND bridge is at-least-once —
    // the SAME crash window appends the replayed batch a second time.
    // This is what the exactly-once variant exists to fix (and proves
    // this spec would catch a sink that duplicates on replay).
    val naive = (ck: String) => stream().writeStream
      .outputMode("append")
      .option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.sources.Sinks.appendParquet(b, s"$root/wh_naive")
      }.start()
    val n1 = naive(s"$root/ck_naive")
    n1.processAllAvailable(); n1.stop()
    dropNewestCommit(s"$root/ck_naive")
    val n2 = naive(s"$root/ck_naive")
    n2.processAllAvailable(); n2.stop()
    val nb = spark.read.parquet(s"$root/wh_naive").select("event_id")
    assert(nb.count() === 40, "append sink should have duplicated the replayed batch")
    assert(nb.distinct().count() === 30)
  }

  test("AvailableNow backfill drains the backlog in bounded runs that terminate on their own") {
    // the cron-shaped ingest: each run drains exactly the files
    // present at start (in maxFilesPerTrigger-sized batches), lands
    // them exactly-once, and terminates — no long-lived query
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_an").toString
    val sch = StructType(Seq(StructField("event_id", LongType)))
    def addFile(ids: Seq[Long]): Unit = {
      import spark.implicits._
      ids.toDF("event_id").repartition(1).write.mode("append").parquet(s"$root/drop")
    }
    def stream() = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/drop")

    addFile(1L to 10L); addFile(11L to 20L); addFile(21L to 30L)
    val q1 = EventsStreaming.backfillAvailableNow(stream(), s"$root/wh", s"$root/ck")
    assert(q1.awaitTermination(120000),
      "an AvailableNow run must terminate by itself once the backlog drains")
    val firstRun = spark.read.parquet(s"$root/wh").select("event_id")
    assert(firstRun.collect().map(_.getLong(0)).toSet === (1L to 30L).toSet)
    // rate limiting survives under AvailableNow (unlike legacy
    // Trigger.Once): the 3-file backlog landed as ≥3 batch dirs
    val batchDirs = new java.io.File(s"$root/wh").listFiles()
      .count(_.getName.startsWith("batch_id="))
    assert(batchDirs >= 3, s"expected per-file micro-batches, saw $batchDirs dirs")

    // a later invocation resumes from the checkpoint: only NEW files
    // process, the re-landed table stays exactly-once
    addFile(31L to 40L)
    val q2 = EventsStreaming.backfillAvailableNow(stream(), s"$root/wh", s"$root/ck")
    assert(q2.awaitTermination(120000))
    val back = spark.read.parquet(s"$root/wh").select("event_id")
    assert(back.count() === 40)
    assert(back.collect().map(_.getLong(0)).toSet === (1L to 40L).toSet)
  }

  test("the per-row quality gate scores a document stream identically to batch") {
    // the hygiene gates are pure projections, so ONE projection serves
    // text_quality and a readStream over a drop-zone — score documents
    // as they land instead of nightly rescans
    val docs = graft.sources.Tables.documents(spark, sf0001).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_qstream").toString
    docs.write.mode("overwrite").parquet(s"$dir/drop")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/drop")
    val q = graft.operators.TextOps.scoreQuality(stream)
      .writeStream.outputMode("append").format("memory").queryName("qstream").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("qstream")
    val batch = SparkEntry.queries("text_quality")(spark, sf0001)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("dedup STATE survives a restart: repeats arriving after it are still dropped") {
    // sink idempotence (test above) is half the exactly-once story;
    // the other half is the RocksDB state store restoring across
    // restart — a repeat arriving in the post-restart half must hit
    // the pre-restart dedup state
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft_state").toString
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType)))
    def addFile(ids: Seq[Long]): Unit = {
      import spark.implicits._
      ids.map(i => (i, ts(i.toInt))).toDF("event_id", "ts")
        .repartition(1).write.mode("append").parquet(s"$root/drop")
    }
    def deduped() = spark.readStream.schema(sch)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/drop")
      .withWatermark("ts", "10 hours")
      .dropDuplicatesWithinWatermark("event_id")
    addFile(1L to 10L)
    val q1 = EventsStreaming.warehouseSinkExactlyOnce(deduped(), s"$root/wh", s"$root/ck")
    q1.processAllAvailable(); q1.stop()
    addFile(6L to 15L) // 6-10 are repeats only the RESTORED state can drop
    val q2 = EventsStreaming.warehouseSinkExactlyOnce(deduped(), s"$root/wh", s"$root/ck")
    q2.processAllAvailable(); q2.stop()
    val back = spark.read.parquet(s"$root/wh").select("event_id")
    assert(back.count() === 15, "restored dedup state must drop cross-restart repeats")
    assert(back.collect().map(_.getLong(0)).toSet === (1L to 15L).toSet)
  }

  test("a session spanning a restart closes exactly once from restored state") {
    // flatMapGroupsWithState keeps (session, timer) state in RocksDB;
    // a restart must restore BOTH: the pre-restart open session has to
    // close via the gap rule when the post-restart event arrives. Lost
    // state would swallow the first session; replayed state would
    // emit it twice.
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sess_restart").toString
    def addFile(evs: Seq[Event]): Unit =
      evs.toDF().repartition(1).write.mode("append").parquet(s"$root/drop")
    def query() = {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Event]].schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/drop").as[Event]
      // the SHIPPED exactly-once sink, so this test keeps covering it
      EventsStreaming.warehouseSinkExactlyOnce(
        EventsStreaming.sessionize(stream, 30, "30 minutes").toDF(),
        s"$root/wh", s"$root/ck")
    }
    // pre-restart: user 7 opens a session (0..10); nothing closes
    addFile(Seq(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(10), 7, "click", 2.0)))
    val q1 = query(); q1.processAllAvailable(); q1.stop()
    // post-restart: ts(60) passes the 30-min gap → the RESTORED session
    // must close; ts(300) advances the watermark well past it
    addFile(Seq(Event(3, ts(60), 7, "view", 5.0), Event(4, ts(300), 8, "click", 1.0)))
    val q2 = query(); q2.processAllAvailable(); q2.stop()
    val sessions = spark.read.parquet(s"$root/wh")
      .select("user_id", "session_start", "session_end", "n_events")
      .filter(col("user_id") === 7 && col("session_start") === ts(0)).collect()
    assert(sessions.length === 1, "the spanning session must close exactly once")
    assert(sessions(0).getTimestamp(2) === ts(10))
    assert(sessions(0).getLong(3) === 2L)
  }

  test("stream-stream as-of join agrees with the batch feature_asof query on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch query's own two inputs, replayed as streams: daily
    // feature snapshots and purchase labels from the same events
    val ev = graft.sources.Tables.events(spark, sf0001)
    val feats = ev.groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("feat_n"), sum(col("value").cast("decimal(12,2)")).as("fv"))
      .select(col("user_id"), (col("day") + expr("interval 1 day")).as("feat_ts"),
        col("feat_n"), col("fv").cast("double").as("feat_value"))
      .as[EventsStreaming.Feature].collect()
    val labels = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .as[EventsStreaming.Label].collect()
    val maxT = (feats.map(_.feat_ts.getTime) ++ labels.map(_.ts.getTime)).max

    val fIn = MemoryStream[EventsStreaming.Feature]
    val lIn = MemoryStream[EventsStreaming.Label]
    // huge freshness bound isolates the JOIN rule (eviction is the
    // test below); the 40-day watermark delay exceeds the fixture's
    // span so the deliberately out-of-order arrivals are never dropped
    val q = EventsStreaming.asofFeatureJoin(fIn.toDS(), lIn.toDS(),
      watermarkDelaySec = 40L * 86400, maxFeatureAgeSec = 3650L * 86400)
      .writeStream.outputMode("append").format("memory").queryName("asof_eq").start()

    // worst-case arrival order: ALL labels first, then the features
    // they must join — only watermark-sealed folding gets this right
    lIn.addData(labels.toSeq)
    q.processAllAvailable()
    fIn.addData(feats.toSeq)
    q.processAllAvailable()
    // sentinel far past maxT + delay flushes every pending instant
    fIn.addData(EventsStreaming.Feature(-999L,
      new java.sql.Timestamp(maxT + 100L * 86400 * 1000), 0L, 0.0))
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(r.fieldIndex("event_id")),
        r.getString(r.fieldIndex("event_time")),
        Option(r.getString(r.fieldIndex("feat_ts"))),
        Option(r.get(r.fieldIndex("feat_n"))),
        Option(r.get(r.fieldIndex("feat_value"))))
    val got = spark.table("asof_eq")
      .select(col("event_id"),
        graft.functions.Portable.fmtTs(col("event_time")).as("event_time"),
        graft.functions.Portable.fmtTs(col("feat_ts")).as("feat_ts"),
        col("feat_n"), col("feat_value"))
      .collect().map(key).toSet
    val want = SparkEntry.queries("feature_asof")(spark, sf0001)
      .select(col("event_id"), col("event_time"), col("feat_ts"),
        col("feat_n"), col("feat_value"))
      .collect().map(key).toSet
    assert(want.nonEmpty && got === want,
      s"missing: ${(want -- got).take(3)}; extra: ${(got -- want).take(3)}")
  }

  test("as-of snapshot expires past the freshness bound; a later label gets NULL features") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fIn = MemoryStream[EventsStreaming.Feature]
    val lIn = MemoryStream[EventsStreaming.Label]
    // delay 60s, freshness 600s
    val q = EventsStreaming.asofFeatureJoin(fIn.toDS(), lIn.toDS(),
      watermarkDelaySec = 60, maxFeatureAgeSec = 600)
      .writeStream.outputMode("append").format("memory").queryName("asof_fresh").start()
    // user 7's snapshot publishes at minute 0; the sentinel label
    // pushes the watermark to m29 — past snapT + 10m, so the snapshot
    // is evicted as stale
    fIn.addData(EventsStreaming.Feature(7L, ts(0), 3L, 9.0))
    lIn.addData(EventsStreaming.Label(900L, -999L, ts(30)))
    q.processAllAvailable()
    // a label at m31 would have joined the m0 snapshot under batch
    // semantics; the freshness contract serves NULL instead
    lIn.addData(EventsStreaming.Label(1L, 7L, ts(31)))
    q.processAllAvailable()
    lIn.addData(EventsStreaming.Label(901L, -999L, ts(95)))
    q.processAllAvailable()
    q.stop()
    val row = spark.table("asof_fresh").filter(col("event_id") === 1L).collect()
    assert(row.length === 1, "the label must still be emitted (left semantics)")
    assert(row(0).isNullAt(row(0).fieldIndex("feat_ts")),
      "an expired snapshot must not serve features")
  }

  test("streaming sessionize agrees with the batch sessionize query on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.sessionize(input.toDS(), 30, "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sessions_eq").start()

    val events = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect()
    input.addData(events.toSeq)
    q.processAllAvailable()
    // sentinel beyond every event + delay + gap: the watermark passes
    // every session's end + gap, so EVERY batch session (finals
    // included) must seal, close, and flush
    val mx = events.map(_.ts.getTime).max
    input.addData(Event(-1L, new Timestamp(mx + 86400000L), 999999999L, "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val batch = SparkEntry.queries("sessionize")(spark, sf0001)
    val got = spark.table("sessions_eq")
      .filter(col("user_id") =!= 999999999L)
      .select(col("user_id"),
        graft.functions.Portable.fmtTs(col("session_start")).as("session_start"),
        graft.functions.Portable.fmtTs(col("session_end")).as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start").collect()
    val want = batch
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .orderBy("user_id", "session_start").collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("sessionize folds an admissible out-of-order arrival into the batch session") {
    // the r9 regression case: the pre-buffering fold processed each
    // micro-batch eagerly, so events 10:00 then 10:45 closed
    // [10:00,10:00] while the watermark (10:15) still admitted a 10:20
    // arrival — which the batch query BRIDGES into one session
    // [10:00,10:45] (10:20→10:45 is inside the gap). The sealed-fold
    // must produce exactly that single bridged session.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.sessionize(input.toDS(), 30, "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sessions_ooo").start()
    input.addData(Event(1, ts(0), 7, "click", 1.0))
    q.processAllAvailable()
    input.addData(Event(2, ts(45), 7, "click", 1.0))
    q.processAllAvailable()
    input.addData(Event(3, ts(20), 7, "click", 1.0)) // admissible: wm is ts(15)
    q.processAllAvailable()
    input.addData(Event(99, ts(300), 8, "view", 1.0)) // flush sentinel
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions_ooo").as[EventsStreaming.Session].collect()
      .filter(_.user_id == 7L)
    assert(got.length === 1,
      s"expected the one bridged batch session, got ${got.toSeq}")
    assert(got(0).session_start === ts(0) && got(0).session_end === ts(45))
    assert(got(0).n_events === 3L)
  }

  test("streaming sessionize with timeouts emits only true batch sessions, including finals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.sessionize(input.toDS(), 30, "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sessions_to").start()

    val events = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect()
    input.addData(events.toSeq)
    q.processAllAvailable()
    // advance the watermark far enough that timeouts close the FINAL
    // sessions the gap rule alone never reaches
    val mx = events.map(_.ts.getTime).max
    input.addData(Event(-1L, new Timestamp(mx + 86400000L), 999999999L, "view", 0.0))
    q.processAllAvailable()
    q.stop()

    // batch emits second-precision strings (Portable.fmtTs) — compare
    // in that space, like the equivalence test above
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(r.fieldIndex("user_id")),
        r.getString(r.fieldIndex("session_start")),
        r.getString(r.fieldIndex("session_end")),
        r.getLong(r.fieldIndex("n_events")))
    val batch = SparkEntry.queries("sessionize")(spark, sf0001).cache()
    val batchKeys = batch
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(key).toSet
    val got = spark.table("sessions_to")
      .filter(col("user_id") =!= 999999999L)
      .select(col("user_id"),
        graft.functions.Portable.fmtTs(col("session_start")).as("session_start"),
        graft.functions.Portable.fmtTs(col("session_end")).as("session_end"),
        col("n_events"))
      .collect().map(key)
    // every emitted session is a real batch session, none emitted twice
    assert(got.toSet.subsetOf(batchKeys))
    assert(got.length === got.toSet.size)
    // timeouts emit FINAL sessions the gap rule alone never closes:
    // strictly more than the non-final count must come out
    val nUsers = batch.select("user_id").distinct().count()
    val nonFinal = batch.count() - nUsers
    assert(got.length > nonFinal)
  }

  test("an idle user's session is emitted via timeout and its state dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.sessionize(input.toDS(), 30, "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sessions_idle").start()

    // user 7 goes idle with an open session (0..10)
    input.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(10), 7, "click", 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions_idle").count() === 0)

    // another user's event advances the watermark to ts(110), past the
    // idle session's end(10) + gap(30): timeout emits it WITHOUT any
    // further event from user 7
    input.addData(Event(3, ts(120), 8, "view", 1.0))
    q.processAllAvailable()
    val afterTimeout = spark.table("sessions_idle").as[EventsStreaming.Session].collect()
    assert(afterTimeout.length === 1)
    assert(afterTimeout(0).user_id === 7L && afterTimeout(0).n_events === 2L)
    assert(afterTimeout(0).session_start === ts(0) && afterTimeout(0).session_end === ts(10))

    // state was dropped: user 7's next event starts a FRESH session —
    // surviving state would re-emit the old (0..10) session on the gap
    input.addData(Event(4, ts(130), 7, "click", 1.0))
    q.processAllAvailable()
    input.addData(Event(5, ts(250), 7, "click", 1.0)) // gap-closes (130..130)
    q.processAllAvailable()
    q.stop()
    val all = spark.table("sessions_idle").as[EventsStreaming.Session].collect()
      .filter(_.user_id == 7L).sortBy(_.session_start.getTime)
    assert(all.length === 2) // no duplicate emission of the timed-out session
    assert(all(1).session_start === ts(130) && all(1).n_events === 1L)
  }

  test("sessionize splits on the 30-minute gap and carries state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.sessionize(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()

    // batch 1: two events 10 min apart (same session, still open)
    input.addData(Event(1, ts(0), 7, "click", 1.0), Event(2, ts(10), 7, "click", 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions").count() === 0) // nothing closed yet

    // batch 2: 50 min later → the gap will close session 1 once the
    // watermark seals it (nothing emits yet: wm is only ts(30))
    input.addData(Event(3, ts(60), 7, "view", 5.0))
    q.processAllAvailable()
    assert(spark.table("sessions").count() === 0)

    // batch 3: another user's event drags the watermark to ts(90) —
    // past session 1's end(10) + gap(30) — sealing ts(60) and closing
    // session 1; session 2 ([60,60]) stays open (wm is not > 60+30)
    input.addData(Event(4, ts(120), 8, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sessions").as[EventsStreaming.Session].collect()
      .filter(_.user_id == 7L)
    assert(sessions.length === 1)
    val s = sessions(0)
    assert(s.user_id === 7L)
    assert(s.n_events === 2L)
    assert(s.session_value === 3.0)
    assert(s.session_start === ts(0) && s.session_end === ts(10))
  }

  test("streaming debounce decides out-of-order arrivals like the in-order chain") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.debounce(input.toDS(), gapSec = 300, watermarkDelaySec = 1800)
      .writeStream.outputMode("append").format("memory").queryName("deb_ooo").start()
    // user 7's events arrive OUT OF ORDER: in event time the survivor
    // chain is 0 min (kept) → 4 min (suppressed) → 6 min (kept);
    // naive arrival-order processing would keep 4 and suppress 6
    input.addData(
      Event(2, ts(4), 7, "click", 1.0),
      Event(1, ts(0), 7, "click", 1.0),
      Event(3, ts(6), 7, "click", 1.0))
    q.processAllAvailable()
    // a far-future sentinel (other user) drags the watermark past the
    // buffered events so their decisions flush via timeout
    input.addData(Event(99, ts(10000), 8, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("deb_ooo").as[Event].collect()
      .filter(_.user_id == 7L).map(_.event_id).sorted
    assert(kept.toSeq === Seq(1L, 3L))
  }

  test("debounce does not seal the watermark's own second early") {
    // the r9 boundary regression: the old seal rule decided any event
    // whose FLOORED second was <= floor(wm/1000) — an event up to
    // 999 ms NEWER than the watermark. A same-second, lower-id arrival
    // in a later micro-batch (admissible: its ts is above the
    // watermark) then folded AFTER the already-decided event, flipping
    // both survivor verdicts vs the batch (second, id) order. A second
    // may only seal once it lies ENTIRELY below the watermark.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L
    val input = MemoryStream[Event]
    val q = EventsStreaming.debounce(input.toDS(), gapSec = 300, watermarkDelaySec = 1800)
      .writeStream.outputMode("append").format("memory").queryName("deb_sec").start()
    // batch 1: user 7's id=7 at base+10.9s; a sentinel pins the
    // watermark at exactly base+10.5s — INSIDE id=7's second
    input.addData(
      Event(7, new Timestamp(base + 10900), 7, "click", 1.0),
      Event(90, new Timestamp(base + 10500 + 1800000L), 8, "view", 1.0))
    q.processAllAvailable()
    // batch 2: an unrelated trigger (watermark unchanged) — the old
    // rule sealed and KEPT id=7 here; the fixed rule must hold it
    input.addData(Event(91, new Timestamp(base + 10500 + 1800000L), 9, "view", 1.0))
    q.processAllAvailable()
    // batch 3: id=3 lands in the SAME second, 300 ms above the
    // watermark — admissible, and first in (second, id) order
    input.addData(Event(3, new Timestamp(base + 10600), 7, "click", 1.0))
    q.processAllAvailable()
    input.addData(Event(92, new Timestamp(base + 86400000L), 10, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("deb_sec").as[Event].collect()
      .filter(_.user_id == 7L).map(_.event_id)
    assert(kept.toSeq === Seq(3L),
      s"the batch fold keeps the lowest id in the second; got ${kept.toSeq}")
  }

  test("streaming debounce agrees with the batch events_debounce query on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventsStreaming.debounce(input.toDS(), gapSec = 300, watermarkDelaySec = 1800)
      .writeStream.outputMode("append").format("memory").queryName("deb_eq").start()
    val events = graft.sources.Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect()
    input.addData(events.toSeq)
    q.processAllAvailable()
    // sentinel beyond every real event + the watermark delay: every
    // buffered decision must flush (real user_ids are << 1e9)
    val mx = events.map(_.ts.getTime).max
    input.addData(Event(-1L, new Timestamp(mx + 86400000L), 999999999L, "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("deb_eq").as[Event].collect()
      .filter(_.user_id != 999999999L)
      .groupBy(_.user_id).map { case (u, xs) => u -> xs.length.toLong }
    val batch = SparkEntry.queries("events_debounce")(spark, sf0001).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_kept")).toMap
    assert(got === batch)
  }
}
