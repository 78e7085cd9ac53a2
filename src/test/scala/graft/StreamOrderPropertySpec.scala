package graft

import java.sql.Timestamp
import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.{AsofIn, AsofState, DebounceState, Event,
  FeatureAsof, Session, SessionBufState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Randomized admissible-arrival-order property sweep for the three
  * order-sensitive streaming folds (sessionize / debounce / as-of) —
  * the r9 watermark fixes were pinned by CRAFTED arrival triples; this
  * sweep asserts batch-equivalence under ≥100 deterministic random
  * interleavings per operator.
  *
  * The decision logic lives in the pure step functions
  * (EventsStreaming.sessionizeStep / debounceStep / asofStep — the
  * streaming closures are thin adapters), so each shuffle drives them
  * through a SIMULATED micro-batch protocol that models exactly what
  * Spark guarantees:
  *  - the watermark for batch k is max event time through batch k−1
  *    minus the delay (updated between batches, never within one);
  *  - a row at or above the watermark is admitted, below it dropped
  *    (the generator only emits admissible orders, and the harness
  *    asserts no drop ever happens);
  *  - event-time timeouts fire for stateful keys once the watermark
  *    passes their requested instant, with an empty arrival set.
  * A final eviction loop plays the far-future sentinel every e2e test
  * uses. The protocol itself is validated against REAL MemoryStream
  * executions on a handful of seeds (same batches, same outputs), so
  * the 100-seed sweep inherits e2e fidelity at simulation speed. */
class StreamOrderPropertySpec extends SparkSuite {

  private val Base = 1704067200000L

  // ---------------------------------------------------------------
  // simulated micro-batch protocol
  // ---------------------------------------------------------------

  /** Drive a pure step function through the micro-batch protocol.
    * Returns all emissions. `step(key, prevOrInit, arrivals, wmMs)`. */
  private def runProtocol[S, E, O](batches: Seq[Seq[E]], tsOf: E => Long,
      keyOf: E => Long, delayMs: Long, init: S,
      step: (Long, S, List[E], Long) => (Option[S], Seq[O], Option[Long])): Seq[O] = {
    var wm = 0L // Spark's initial watermark (epoch 0, below all test data)
    var maxSeen = Long.MinValue
    val states = scala.collection.mutable.Map[Long, (S, Option[Long])]()
    val out = Seq.newBuilder[O]

    def tick(key: Long): Unit = {
      val (st, _) = states(key)
      val (next, os, wake) = step(key, st, Nil, wm)
      out ++= os
      next match {
        case Some(s) => states(key) = (s, wake)
        case None => states.remove(key)
      }
    }

    for (b <- batches) {
      // late filter: the generator must never produce a late row —
      // a dropped row would make "equivalence" vacuous
      assert(b.forall(e => tsOf(e) >= wm),
        s"generator produced a LATE row (wm=$wm): ${b.filter(e => tsOf(e) < wm)}")
      // keys with data this batch
      b.groupBy(keyOf).foreach { case (key, arrivals) =>
        val (st, _) = states.getOrElse(key, (init, None))
        val (next, os, wake) = step(key, st, arrivals.toList, wm)
        out ++= os
        next match {
          case Some(s) => states(key) = (s, wake)
          case None => states.remove(key)
        }
      }
      // event-time timeouts for stateful keys without data
      val dataKeys = b.map(keyOf).toSet
      states.keys.toSeq.filterNot(dataKeys)
        .filter(k => states(k)._2.exists(_ < wm)).foreach(tick)
      // watermark advances BETWEEN batches
      if (b.nonEmpty) maxSeen = math.max(maxSeen, b.map(tsOf).max)
      if (maxSeen != Long.MinValue) wm = maxSeen - delayMs
    }
    // final sentinel: watermark far past everything, tick until drained
    // (an asof snapshot reschedules once for its freshness horizon)
    wm = if (maxSeen == Long.MinValue) wm else maxSeen + delayMs + 365L * 86400000L
    var rounds = 0
    while (states.nonEmpty && rounds < 4) {
      states.keys.toSeq.foreach(tick)
      rounds += 1
    }
    assert(states.isEmpty, s"state not drained by the sentinel: ${states.keys}")
    out.result()
  }

  /** Admissible random arrival order: repeatedly pick 1–3 of the
    * remaining events such that no pick ever strands another remaining
    * event below the next watermark. The min-ts event is always safe,
    * so the generator cannot wedge; picks inside the delay window give
    * genuine out-of-order interleavings. */
  private def admissibleBatches[E](events: Seq[E], tsOf: E => Long, delayMs: Long,
      rnd: scala.util.Random): Seq[Seq[E]] = {
    var remaining = events.toVector
    var maxSeen = Long.MinValue
    var wm = 0L
    val batches = Seq.newBuilder[Seq[E]]
    while (remaining.nonEmpty) {
      val n = 1 + rnd.nextInt(3)
      var picked = Vector.empty[E]
      for (_ <- 0 until n if remaining.nonEmpty) {
        // candidate must be admissible now AND not strand any other
        // remaining event behind the watermark its pick implies
        // (earlier picks in this batch count toward that future max)
        // STRICTLY above the watermark on both sides: the e2e fidelity
        // test measured Spark dropping a row at exactly the watermark
        // (seed 77: events at precisely maxSeen − delay vanished), so
        // an order is only guaranteed admissible if every arrival and
        // every stranded remainder stays > the implied watermark
        val batchMax = if (picked.isEmpty) Long.MinValue else picked.map(tsOf).max
        val cands = remaining.filter { e =>
          tsOf(e) > wm && {
            val newMax = math.max(math.max(maxSeen, batchMax), tsOf(e))
            remaining.forall(r => (r eq e.asInstanceOf[AnyRef]) || tsOf(r) > newMax - delayMs)
          }
        }
        // the min-ts remaining event is always safe, so never wedged
        val pick = if (cands.nonEmpty) cands(rnd.nextInt(cands.length))
          else remaining.minBy(tsOf)
        picked = picked :+ pick
        remaining = {
          val i = remaining.indexWhere(_.asInstanceOf[AnyRef] eq pick.asInstanceOf[AnyRef])
          remaining.patch(i, Nil, 1)
        }
      }
      // within-batch max only moves the watermark AFTER the batch
      maxSeen = math.max(maxSeen, picked.map(tsOf).max)
      wm = maxSeen - delayMs
      batches += picked
    }
    batches.result()
  }

  // ---------------------------------------------------------------
  // ground-truth batch folds (plain Scala, total (ts, id) order)
  // ---------------------------------------------------------------

  private def batchSessions(events: Seq[Event], gapMs: Long): Seq[(Long, Long, Long, Long, Double)] =
    events.groupBy(_.user_id).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
      val out = Seq.newBuilder[(Long, Long, Long, Long, Double)]
      var cur: Option[(Long, Long, Long, Double)] = None
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some((s0, e0, n, v)) if t - e0 > gapMs =>
            out += ((u, s0, e0, n, v)); cur = Some((t, t, 1L, e.value))
          case Some((s0, e0, n, v)) =>
            cur = Some((s0, math.max(e0, t), n + 1, v + e.value))
          case None => cur = Some((t, t, 1L, e.value))
        }
      }
      cur.foreach { case (s0, e0, n, v) => out += ((u, s0, e0, n, v)) }
      out.result()
    }

  private def batchDebounce(events: Seq[Event], gapSec: Long): Seq[Long] =
    events.groupBy(_.user_id).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e.ts.getTime / 1000, e.event_id))
      var lastKept = -1L
      sorted.flatMap { e =>
        val sec = e.ts.getTime / 1000
        if (lastKept < 0 || sec - lastKept > gapSec) { lastKept = sec; Some(e.event_id) }
        else None
      }
    }

  private def batchAsof(rows: Seq[AsofIn]): Map[Long, Option[(Long, Long, Double)]] =
    rows.groupBy(_.user_id).toSeq.flatMap { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.t.getTime, -r.is_feat, r.event_id))
      var snap: Option[(Long, Long, Double)] = None
      sorted.flatMap { r =>
        if (r.is_feat == 1) { snap = Some((r.t.getTime, r.feat_n, r.feat_value)); None }
        else Some(r.event_id -> snap)
      }
    }.toMap

  // ---------------------------------------------------------------
  // event-set generators: timestamps engineered to hit the seal
  // boundaries (same second, exact gap, gap±1, equal instants)
  // ---------------------------------------------------------------

  private def genEvents(rnd: scala.util.Random, gapMs: Long): Seq[Event] = {
    val nUsers = 2 + rnd.nextInt(3)
    var id = 0L
    (1 to nUsers).flatMap { u =>
      var t = Base + rnd.nextInt(5000)
      val n = 8 + rnd.nextInt(8)
      (1 to n).map { _ =>
        id += 1
        // step mix: same-ms, same-second, sub-gap, exactly-gap, past-gap
        val step = rnd.nextInt(6) match {
          case 0 => 0L
          case 1 => 1L + rnd.nextInt(999)
          case 2 => 1000L + rnd.nextInt(5000)
          case 3 => gapMs
          case 4 => gapMs + 1 + rnd.nextInt(5000)
          case _ => rnd.nextInt(gapMs.toInt).toLong
        }
        t += step
        Event(id, new Timestamp(t), u.toLong, "click", (id % 7).toDouble)
      }
    }
  }

  // ---------------------------------------------------------------
  // the sweeps
  // ---------------------------------------------------------------

  private val Seeds = 0 until 110

  test("sessionize: batch-equivalent under 110 random admissible arrival orders") {
    val gapMs = 60000L
    val delayMs = 120000L
    var midStreamSeals = 0
    for (seed <- Seeds) {
      val rnd = new scala.util.Random(seed)
      val events = genEvents(rnd, gapMs)
      val batches = admissibleBatches[Event](events, _.ts.getTime, delayMs, rnd)
      val got = runProtocol[SessionBufState, Event, Session](
        batches, _.ts.getTime, _.user_id, delayMs,
        SessionBufState(false, 0L, 0L, 0L, 0.0, Nil),
        (uid, st, arr, wm) => EventsStreaming.sessionizeStep(uid, st, arr, wm, gapMs))
      // non-degeneracy: an event span past the delay forces the
      // watermark over early events mid-protocol, so seals (and the
      // r9 boundary rules) are exercised before the final sentinel
      val span = events.map(_.ts.getTime).max - events.map(_.ts.getTime).min
      if (span > delayMs) midStreamSeals += 1
      val want = batchSessions(events, gapMs)
        .map { case (u, s, e, n, v) => (u, s, e, n, v) }.sorted
      val gotK = got.map(s => (s.user_id, s.session_start.getTime,
        s.session_end.getTime, s.n_events, s.session_value)).sorted
      assert(gotK === want, s"seed $seed: sessionize diverged from the batch fold")
    }
    info(s"${Seeds.length} seeds green; $midStreamSeals had spans forcing mid-stream seals")
    assert(midStreamSeals > Seeds.length / 2, "sweep degenerated: nothing sealed mid-stream")
  }

  test("debounce: batch-equivalent under 110 random admissible arrival orders") {
    val gapSec = 5L
    val delaySec = 30L
    for (seed <- Seeds) {
      val rnd = new scala.util.Random(1000 + seed)
      // tighter time base so same-second and refractory-boundary cases
      // dominate: steps in ms across a few hundred seconds
      val events = genEvents(rnd, gapMs = gapSec * 1000)
      val batches = admissibleBatches[Event](events, _.ts.getTime, delaySec * 1000, rnd)
      val got = runProtocol[DebounceState, Event, Event](
        batches, _.ts.getTime, _.user_id, delaySec * 1000,
        DebounceState(-1L, Nil),
        (_, st, arr, wm) => EventsStreaming.debounceStep(st, arr, wm, gapSec, delaySec))
      val want = batchDebounce(events, gapSec).sorted
      assert(got.map(_.event_id).sorted === want,
        s"seed $seed: debounce diverged from the batch fold")
    }
    info(s"${Seeds.length} seeds green")
  }

  test("as-of join: batch-equivalent under 110 random admissible arrival orders") {
    val delayMs = 120000L
    for (seed <- Seeds) {
      val rnd = new scala.util.Random(2000 + seed)
      val nUsers = 2 + rnd.nextInt(2)
      var id = 0L
      val rows: Seq[AsofIn] = (1 to nUsers).flatMap { u =>
        var t = Base + rnd.nextInt(5000)
        var lastFeatT = Long.MinValue
        (1 to 10 + rnd.nextInt(6)).map { _ =>
          id += 1
          t += (rnd.nextInt(4) match {
            case 0 => 0L // equal instants: the feature-first tie rule
            case 1 => 1L + rnd.nextInt(999)
            case _ => 1000L * (1 + rnd.nextInt(90))
          })
          // two FEATURES of one user at one instant are unordered in
          // the stream (features carry no id), so which one "wins" is
          // arrival-dependent by construction — a feature store must
          // not publish two same-instant snapshots. The generator
          // therefore never emits them; an equal-instant feature
          // becomes a label (which reads, not writes, the snapshot).
          if (rnd.nextBoolean() && t > lastFeatT) {
            lastFeatT = t
            AsofIn(u.toLong, new Timestamp(t), 1, -1L, id, id * 0.5)
          } else
            AsofIn(u.toLong, new Timestamp(t), 0, id, -1L, 0.0)
        }
      }
      val labels = rows.filter(_.is_feat == 0)
      val batches = admissibleBatches[AsofIn](rows, _.t.getTime, delayMs, rnd)
      val got = runProtocol[AsofState, AsofIn, FeatureAsof](
        batches, _.t.getTime, _.user_id, delayMs,
        AsofState(-1L, 0L, 0.0, Nil),
        (uid, st, arr, wm) => EventsStreaming.asofStep(uid, st, arr, wm, 30L * 86400))
      assert(got.length === labels.length, s"seed $seed: label count diverged")
      val want = batchAsof(rows)
      got.foreach { fa =>
        val exp = want(fa.event_id)
        val g = fa.feat_ts.map(t => (t.getTime, fa.feat_n.get, fa.feat_value.get))
        assert(g === exp, s"seed $seed label ${fa.event_id}: snapshot diverged")
      }
    }
    info(s"${Seeds.length} seeds green")
  }

  test("the simulated protocol matches a real MemoryStream execution (harness fidelity)") {
    // 3 seeds through the REAL streaming sessionize with the exact
    // batches the generator produced (one addData per micro-batch plus
    // the usual far-future sentinel): same emissions as the simulation
    // ⇒ the 110-seed sweep above inherits end-to-end fidelity.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 60000L
    for (seed <- Seq(3, 41, 77)) {
      val rnd = new scala.util.Random(seed)
      val events = genEvents(rnd, gapMs)
      // real watermark delay must match the simulated one: 2 minutes
      val batches = admissibleBatches[Event](events, _.ts.getTime, 120000L, rnd)
      val sim = runProtocol[SessionBufState, Event, Session](
        batches, _.ts.getTime, _.user_id, 120000L,
        SessionBufState(false, 0L, 0L, 0L, 0.0, Nil),
        (uid, st, arr, wm) => EventsStreaming.sessionizeStep(uid, st, arr, wm, gapMs))
      val input = MemoryStream[Event]
      val q = EventsStreaming.sessionize(input.toDS(), 1, "2 minutes")
        .writeStream.outputMode("append").format("memory")
        .queryName(s"order_prop_$seed").start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val mx = events.map(_.ts.getTime).max
      input.addData(Event(-1L, new Timestamp(mx + 365L * 86400000L), 999999999L, "view", 0.0))
      q.processAllAvailable()
      q.stop()
      val real = spark.table(s"order_prop_$seed").as[Session].collect()
        .filter(_.user_id != 999999999L)
        .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
          s.n_events, s.session_value)).sorted.toSeq
      val simK = sim.map(s => (s.user_id, s.session_start.getTime,
        s.session_end.getTime, s.n_events, s.session_value)).sorted
      assert(real === simK, s"seed $seed: simulation diverged from the real stream")
    }
  }
}
