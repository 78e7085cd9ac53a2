package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators
  * (SURVEY.md §2.3 L13): the same semantics as `events_hourly` and
  * `sessionize`, expressed as incremental queries.
  *
  * State lives in the streaming state store, keyed by window or
  * user_id — partitioned across executors, nothing on the driver, so
  * the operators scale with the shuffle like their batch twins.
  */
object EventsStreaming {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, value: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, session_value: Double)

  /** Windowed counts with a watermark — streaming `events_hourly`.
    * Late data beyond 2 hours is dropped; state for closed windows is
    * evicted automatically. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** SLIDING windowed aggregate — the streaming twin of the batch
    * `events_moving` RANGE-frame query: per event_type, counts and
    * value sums over overlapping 1-hour windows advancing every 15
    * minutes. Each event lands in 4 overlapping windows (Spark expands
    * map-side); the watermark closes and EVICTS each window's state
    * once event time passes its end + the lateness bound, so state is
    * bounded by (windows in flight × keys), never by the stream. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Stream-STREAM interval join — the streaming twin of the batch
    * `range_join` query: every purchase joined to the same user's
    * events in the preceding `windowMinutes`. Both sides carry
    * watermarks and the join condition is time-bounded in both
    * directions, so Spark can size the join state and EVICT rows the
    * watermark has passed — an unbounded-state stream-stream join
    * never drains at scale. */
  def purchaseAttribution(events: DataFrame, windowMinutes: Int = 30): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", s"$windowMinutes minutes")
    val prior = events
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"),
        col("ts").as("e_ts"), col("value"))
      .withWatermark("e_ts", s"$windowMinutes minutes")
    purchases.join(prior,
      col("p_user") === col("e_user")
        && col("e_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES")
        && col("e_ts") < col("p_ts"))
      .select(col("p_id"), col("p_user").as("user_id"), col("e_id"), col("value"))
  }

  /** Streaming → warehouse: append each micro-batch through the SAME
    * batch sink the reference's load side uses (R8, WRITE_APPEND) —
    * `foreachBatch` is the bridge that reuses batch writers from a
    * stream. Returns the started query.
    *
    * Delivery is AT-LEAST-ONCE: a crash after the append commits but
    * before the checkpoint records the batch replays the batch into a
    * SECOND append on restart. Use [[warehouseSinkExactlyOnce]] when
    * duplicates matter (StreamingSpec demonstrates both behaviors
    * under a forced replay). */
  def warehouseSink(events: DataFrame, path: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.Sinks.appendParquet(batch, path)
      }
      .start()

  /** EXACTLY-ONCE streaming → warehouse: checkpointed offsets +
    * IDEMPOTENT batch writes. Spark guarantees foreachBatch replays a
    * batch with the SAME batchId and the SAME rows (file-source
    * offsets are logged before execution), so landing each batch in
    * its own deterministic partition directory with mode=overwrite
    * makes the replay overwrite itself instead of appending a
    * duplicate — the standard idempotent-sink recipe, and the same
    * end-to-end contract Delta's transactional sink provides. The
    * warehouse stays one parquet table partitioned by `batch_id`
    * (directory-pruned like any partition column; compact with
    * [[graft.sources.Sinks.appendParquetSized]] downstream when batch
    * dirs accumulate). */
  def warehouseSinkExactlyOnce(
      events: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .start()

  /** Bounded BACKFILL run of the exactly-once warehouse sink:
    * `Trigger.AvailableNow` processes every file present when the run
    * starts — still split into rate-limited micro-batches by
    * `maxFilesPerTrigger`, unlike the legacy one-giant-batch
    * `Trigger.Once` — then TERMINATES on its own. This is the
    * cron-shaped deployment of a 100 TB ingest: each invocation
    * resumes from the checkpoint, drains exactly the backlog, lands
    * each batch idempotently (same batch_id=N overwrite recipe as
    * [[warehouseSinkExactlyOnce]]), and releases the cluster. A
    * backlog of months replays with streaming semantics — watermarks,
    * offsets, exactly-once — without a long-lived query. */
  def backfillAvailableNow(
      events: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")
      }
      .start()

  case class Feature(user_id: Long, feat_ts: Timestamp, feat_n: Long, feat_value: Double)
  case class Label(event_id: Long, user_id: Long, ts: Timestamp)
  case class FeatureAsof(event_id: Long, user_id: Long, event_time: Timestamp,
      feat_ts: Option[Timestamp], feat_n: Option[Long], feat_value: Option[Double])
  // public like the other state classes: Catalyst's generated
  // (de)serializers cannot touch a private case class
  case class AsofIn(user_id: Long, t: Timestamp, is_feat: Int, event_id: Long,
      feat_n: Long, feat_value: Double)
  case class AsofState(snapT: Long, snapN: Long, snapV: Double, pending: List[AsofIn])

  /** Stream-STREAM as-of join — the streaming twin of the batch
    * `feature_asof` point-in-time join (A17b): every label joins the
    * user's LATEST feature snapshot with feat_ts ≤ label ts, so a
    * training example can never see its own day's data (the temporal-
    * leakage contract), now maintained incrementally over two live
    * streams.
    *
    * Spark's built-in stream-stream joins can't express "latest prior
    * row" (that is an ORDER-sensitive reduction, not an interval
    * predicate — an interval join would emit EVERY prior snapshot in
    * the bound, and a max-per-label post-aggregate would need a second
    * stateful operator). So the operator reuses the BATCH query's own
    * trick — union the two sides into one tagged per-user stream —
    * and folds it in `flatMapGroupsWithState`, exactly like
    * [[debounce]]: arrivals BUFFER in state until the event-time
    * watermark seals them, then fold in (t, feature-first, id) order —
    * the same total order as the batch window's (t, is_feat DESC,
    * event_id) — so a feature and a label arriving out of order
    * across micro-batches still resolve identically to the batch
    * plan (spec-asserted batch equivalence, including the tie rule:
    * a snapshot is visible AT its publication instant).
    *
    * State per user is one O(1) snapshot plus the watermark-bounded
    * pending buffer. The snapshot cannot live forever (billions of
    * one-label users would pin the store): `maxFeatureAgeSec` is the
    * feature-FRESHNESS contract — once the watermark passes
    * snapT + maxAge, no future label may use the snapshot (it would
    * be stale), so the timeout evicts the entry; a later label gets
    * NULL features, which is what a feature store serves for a user
    * whose features expired. Labels with no admissible snapshot keep
    * NULL features (left semantics), matching the batch query. */
  def asofFeatureJoin(
      features: Dataset[Feature], labels: Dataset[Label],
      watermarkDelaySec: Long = 1800,
      maxFeatureAgeSec: Long = 30L * 86400): Dataset[FeatureAsof] = {
    import features.sparkSession.implicits._
    val tagged = features.toDF()
      .select(col("user_id"), col("feat_ts").as("t"), lit(1).as("is_feat"),
        lit(-1L).as("event_id"), col("feat_n"), col("feat_value"))
      .unionByName(labels.toDF()
        .select(col("user_id"), col("ts").as("t"), lit(0).as("is_feat"),
          col("event_id"), lit(-1L).as("feat_n"), lit(0.0).as("feat_value")))
      .as[AsofIn]
      .withWatermark("t", s"$watermarkDelaySec seconds")
    tagged
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, FeatureAsof](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[AsofIn], state: GroupState[AsofState]) =>
          // a TIMEOUT invocation is not an eviction signal by itself:
          // for a pending buffer it is the watermark-advance tick that
          // SEALS it, so both paths run the same fold (with an empty
          // arrival set on timeout) and eviction falls out of the
          // retention rules at the end
          val (next, out, wake) = asofStep(uid,
            state.getOption.getOrElse(AsofState(-1L, 0L, 0.0, Nil)),
            if (state.hasTimedOut) Nil else batch.toList,
            state.getCurrentWatermarkMs(), maxFeatureAgeSec)
          next match {
            case Some(s) => state.update(s); wake.foreach(state.setTimeoutTimestamp)
            case None => state.remove()
          }
          out.iterator
      }
  }

  /** One seal-and-fold step of [[asofFeatureJoin]] — PURE state
    * transition (prev state, this batch's arrivals, current watermark)
    * → (next state or eviction, emissions, timeout instant), extracted
    * so the randomized arrival-order property sweep (PropertiesSpec)
    * can drive the decision logic through a simulated micro-batch
    * protocol without paying a streaming query per shuffle. The
    * streaming closure is a thin adapter around this. */
  private[graft] def asofStep(uid: Long, prev: AsofState, arrivals: List[AsofIn],
      wmMs: Long, maxFeatureAgeSec: Long): (Option[AsofState], Seq[FeatureAsof], Option[Long]) = {
    val all = prev.pending ++ arrivals
    // decide everything the watermark has STRICTLY passed. The exact
    // boundary row is the one spot Spark's contract is ambiguous on
    // (StreamOrderPropertySpec's fidelity run measured a row at
    // exactly the watermark being DROPPED as late) — strict sealing
    // is safe under either reading: if such a row were admitted,
    // sealing `<= wm` would fold it after an equal-instant row it
    // should precede under the (t, feature-first, id) order; since
    // it is in fact dropped, strictness merely holds the boundary
    // instant pending one extra tick.
    val (ripe, stillPending) = all.partition(_.t.getTime < wmMs)
    var snapT = prev.snapT; var snapN = prev.snapN; var snapV = prev.snapV
    val out = Seq.newBuilder[FeatureAsof]
    ripe.sortBy(e => (e.t.getTime, -e.is_feat, e.event_id)).foreach { e =>
      if (e.is_feat == 1) {
        // sealed instants are monotone across batches, but keep
        // the guard: a newer snapshot must never regress
        if (e.t.getTime >= snapT) {
          snapT = e.t.getTime; snapN = e.feat_n; snapV = e.feat_value
        }
      } else {
        val has = snapT >= 0
        out += FeatureAsof(e.event_id, uid, e.t,
          if (has) Some(new Timestamp(snapT)) else None,
          if (has) Some(snapN) else None,
          if (has) Some(snapV) else None)
      }
    }
    if (stillPending.nonEmpty) {
      // wake just past the oldest pending instant (or the next
      // watermark tick) to seal it
      (Some(AsofState(snapT, snapN, snapV, stillPending)), out.result(),
        Some(math.max(stillPending.map(_.t.getTime).min + 1000, wmMs + 1000)))
    } else if (snapT >= 0 && snapT + maxFeatureAgeSec * 1000 > wmMs) {
      // fresh snapshot, empty buffer: keep serving until the
      // freshness horizon, then the timeout evicts it
      (Some(AsofState(snapT, snapN, snapV, Nil)), out.result(),
        Some(snapT + maxFeatureAgeSec * 1000))
    } else {
      (None, out.result(), None)
    }
  }

  case class DebounceState(lastKeptSec: Long, pending: List[Event])

  /** Refractory debounce via flatMapGroupsWithState — streaming twin
    * of the batch `events_debounce` query: an event SURVIVES iff more
    * than `gapSec` have passed since the user's last survivor. The
    * chain is order-sensitive and non-associative ("since the last
    * KEPT", not "since the last event"), so an out-of-order arrival
    * could flip every later decision — arrivals are therefore
    * BUFFERED in state and decided only once the event-time watermark
    * passes them, in (second, event_id) order; the decisions are then
    * identical to the batch fold regardless of arrival order. The
    * buffer is bounded by the watermark delay × the user's own rate.
    *
    * State is evictable: while events are pending the timeout fires
    * just past the oldest one; once the buffer drains, the entry only
    * matters while an admissible future event could still land inside
    * the refractory window (sec ≥ wm − delay AND sec ≤ lastKept +
    * gap), so the timeout at (lastKept + gap + delay) removes it —
    * after that, any event Spark still admits is automatically a
    * survivor and a fresh chain starts. An idle user cannot pin state
    * forever (the sessionize eviction argument). */
  def debounce(
      events: Dataset[Event],
      gapSec: Long = 300,
      watermarkDelaySec: Long = 1800): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$watermarkDelaySec seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[DebounceState, Event](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, batch: Iterator[Event], state: GroupState[DebounceState]) =>
          val (next, out, wake) = debounceStep(
            state.getOption.getOrElse(DebounceState(-1L, Nil)),
            batch.toList, state.getCurrentWatermarkMs(), gapSec, watermarkDelaySec)
          next match {
            case Some(s) => state.update(s); wake.foreach(state.setTimeoutTimestamp)
            case None => state.remove()
          }
          out.iterator
      }
  }

  /** One seal-and-fold step of [[debounce]] — pure state transition,
    * extracted for the arrival-order property sweep (see [[asofStep]]). */
  private[graft] def debounceStep(prev: DebounceState, arrivals: List[Event],
      wmMs: Long, gapSec: Long, watermarkDelaySec: Long): (Option[DebounceState], Seq[Event], Option[Long]) = {
    val wmSec = wmMs / 1000
    val pending = prev.pending ++ arrivals
    // decide a SECOND only once the whole second is strictly
    // below the watermark ((sec+1)*1000 <= wm): the fold runs in
    // (second, event_id) order, and a second that merely
    // CONTAINS the watermark can still receive arrivals (a row
    // strictly above the watermark is never late) — sealing it
    // early would decide a later event_id before an admissible
    // earlier one, flipping both survivor verdicts vs the batch fold
    val (ripe, stillPending) =
      pending.partition(e => (e.ts.getTime / 1000 + 1) * 1000 <= wmMs)
    var lastKept = prev.lastKeptSec
    val out = Seq.newBuilder[Event]
    ripe.sortBy(e => (e.ts.getTime / 1000, e.event_id)).foreach { e =>
      val sec = e.ts.getTime / 1000
      if (lastKept < 0 || sec - lastKept > gapSec) { lastKept = sec; out += e }
    }
    if (stillPending.nonEmpty) {
      (Some(DebounceState(lastKept, stillPending)), out.result(),
        Some(math.max(stillPending.map(_.ts.getTime).min + 1000, (wmSec + 1) * 1000)))
    } else if (lastKept >= 0 && (lastKept + gapSec + watermarkDelaySec) > wmSec) {
      (Some(DebounceState(lastKept, Nil)), out.result(),
        Some((lastKept + gapSec + watermarkDelaySec) * 1000))
    } else {
      (None, out.result(), None)
    }
  }

  case class SessionBufState(hasOpen: Boolean, start: Long, end: Long,
      n: Long, value: Double, pending: List[Event])

  /** Gap-based sessionization via flatMapGroupsWithState — streaming
    * twin of the batch `sessionize` query (30-minute gap).
    *
    * The gap fold is ORDER-SENSITIVE (an event either extends the open
    * session or closes it and starts the next — which, depends on
    * everything before it), so arrivals BUFFER in state and are folded
    * only once the event-time watermark has STRICTLY passed them — the
    * [[debounce]]/[[asofFeatureJoin]] discipline. The pre-r9 form
    * folded each micro-batch immediately: an admissible out-of-order
    * arrival (newer than the watermark, older than the last folded
    * event) then landed in the WRONG session — e.g. gap 30m, events
    * 10:00 then 10:45 folded eagerly close [10:00,10:00] while the
    * watermark still admits a 10:20 arrival, which the batch query
    * puts in the FIRST session but the eager fold glued to 10:45.
    * Sealed-then-fold makes every decision final only when Spark can
    * no longer admit an earlier row (seal is STRICT `< watermark` —
    * safe under either reading of the boundary instant, which Spark
    * was measured to drop; see StreamOrderPropertySpec).
    *
    * A closed session is emitted when a SEALED event passes the gap —
    * no pending (unsealed) arrival can contradict that close, because
    * any pending ts ≥ watermark > the sealed closer, which is itself
    * past the gap — or when the watermark passes `end + gap` (no
    * admissible arrival can extend it). State is then pruned, and an
    * idle user cannot pin state forever: the timeout wakes at the
    * earliest of (oldest pending + 1) and (end + gap + 1) to seal /
    * close, and an empty state is removed. The buffer is bounded by
    * the watermark delay × the user's own event rate. */
  def sessionize(
      events: Dataset[Event],
      gapMinutes: Int = 30,
      watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBufState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionBufState]) =>
          val (next, out, wake) = sessionizeStep(userId,
            state.getOption.getOrElse(SessionBufState(false, 0L, 0L, 0L, 0.0, Nil)),
            if (state.hasTimedOut) Nil else batch.toList,
            state.getCurrentWatermarkMs(), gapMs)
          next match {
            case Some(s) => state.update(s); wake.foreach(state.setTimeoutTimestamp)
            case None => state.remove()
          }
          out.iterator
      }
  }

  /** One seal-and-fold step of [[sessionize]] — pure state transition,
    * extracted for the arrival-order property sweep (see [[asofStep]]). */
  private[graft] def sessionizeStep(userId: Long, prev: SessionBufState,
      arrivals: List[Event], wmMs: Long, gapMs: Long): (Option[SessionBufState], Seq[Session], Option[Long]) = {
    val all = prev.pending ++ arrivals
    val (ripe, stillPending) = all.partition(_.ts.getTime < wmMs)
    var open: Option[SessionState] =
      if (prev.hasOpen) Some(SessionState(prev.start, prev.end, prev.n, prev.value))
      else None
    val out = Seq.newBuilder[Session]
    ripe.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val t = e.ts.getTime
      open match {
        case Some(s) if t - s.end > gapMs =>
          out += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.value)
          open = Some(SessionState(t, t, 1, e.value))
        case Some(s) =>
          open = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.value + e.value))
        case None =>
          open = Some(SessionState(t, t, 1, e.value))
      }
    }
    // close once NO admissible arrival can extend: extenders have
    // ts ≤ end + gap, possible only while watermark ≤ end + gap
    open match {
      case Some(s) if wmMs > s.end + gapMs =>
        out += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.value)
        open = None
      case _ => ()
    }
    if (open.isEmpty && stillPending.isEmpty) {
      (None, out.result(), None)
    } else {
      val st = SessionBufState(open.isDefined,
        open.map(_.start).getOrElse(0L), open.map(_.end).getOrElse(0L),
        open.map(_.n).getOrElse(0L), open.map(_.value).getOrElse(0.0),
        stillPending)
      val wake = (stillPending.map(_.ts.getTime + 1) ++
        open.map(_.end + gapMs + 1)).min
      (Some(st), out.result(), Some(math.max(wake, wmMs + 1)))
    }
  }
}
