package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One event for the timer-session processor: `ts` (Timestamp) carries
  * the watermark, `ts_us` the exact microseconds the session arithmetic
  * uses (Timestamp.getTime would truncate to ms).
  */
case class SessIn(user_id: Long, event_id: Long,
    ts: java.sql.Timestamp, ts_us: Long)

/** The open session per key: [start_us, end_us], n events so far. */
case class SessRun(start_us: Long, end_us: Long, n: Long)

/** A CLOSED session — emitted inline when a successor event opens the
  * next session, or by the EVENT-TIME TIMER when the watermark passes
  * the session tail + gap (the row no successor would ever flush).
  */
case class SessOut(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long)

/** EVENT-TIME TIMERS via Spark 4's transformWithState — the timer half
  * of the StatefulProcessor API (DedupRunningAgg grades the typed-state
  * half): gap-based sessionization where a session CLOSES two ways, (a)
  * inline, when a row ≥ 30 min past the tail opens the successor, and
  * (b) by `handleExpiredTimer`, when the watermark passes tail + 30 min
  * — the mechanism a production pipeline relies on to flush the LAST
  * session of an idle key, which no successor row will ever close.
  * Exactly ONE timer stays registered per key (re-armed to the current
  * tail on every batch that touches the key; stale timers are deleted,
  * and the expiry guard re-checks the live tail so an undeleted stale
  * timer can never flush a still-open session). A MapState of seen
  * event ids absorbs the replay source's planted first-hour redelivery
  * (belt to the watermark's late-drop braces).
  *
  * Gap semantics match session_window's half-open contract: a row at
  * EXACTLY tail + 30 min starts a new session (diff >= gap), so the
  * batch oracle's lag-based break flag uses >= on microseconds.
  */
class TimerSessions extends StatefulProcessor[Long, SessIn, SessOut] {
  private val GapUs = 1800000000L
  private val GapMs = 1800000L

  // event_id -> event ts_us: the value lets handleExpiredTimer purge
  // entries the watermark has passed (Spark drops later deliveries of
  // those rows upstream, so they can never reach the dedup check again)
  // — per-key state stays bounded by the OPEN session's event count
  // instead of growing with total history (r19 ADVICE).
  @transient private var seen: MapState[Long, Long] = _
  @transient private var cur: ValueState[SessRun] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seen = getHandle.getMapState[Long, Long](
      "seen", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
    cur = getHandle.getValueState[SessRun](
      "cur", Encoders.product[SessRun], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[SessIn],
      tv: TimerValues): Iterator[SessOut] = {
    // per-batch rows arrive unordered: impose the total (ts, event_id)
    // order so the fold is batch-split invariant (the source replays
    // ts-range files in order, so cross-batch order is already total)
    val fresh = rows.filter(r => !seen.containsKey(r.event_id))
      .toArray.sortBy(r => (r.ts_us, r.event_id))
    val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
    var c = if (cur.exists()) cur.get() else null
    fresh.foreach { r =>
      seen.updateValue(r.event_id, r.ts_us)
      if (c == null) c = SessRun(r.ts_us, r.ts_us, 1L)
      else if (r.ts_us - c.end_us < GapUs)
        c = SessRun(c.start_us, math.max(c.end_us, r.ts_us), c.n + 1)
      else {
        out += SessOut(key, c.start_us, c.end_us, c.n)
        c = SessRun(r.ts_us, r.ts_us, 1L)
      }
    }
    if (c != null && fresh.nonEmpty) {
      cur.update(c)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(c.end_us / 1000L + GapMs)
    }
    out.iterator
  }

  override def handleExpiredTimer(key: Long, tv: TimerValues,
      info: ExpiredTimerInfo): Iterator[SessOut] = {
    // purge dedup entries the watermark has passed: the engine drops
    // late rows before they reach this processor, so an entry older
    // than the watermark can never be consulted again (collect stale
    // keys first — removing while iterating the state store is unsafe)
    val wmUs = tv.getCurrentWatermarkInMs() * 1000L
    val stale = seen.iterator().collect {
      case (id, tsUs) if tsUs < wmUs => id }.toArray
    stale.foreach(seen.removeKey)
    if (cur.exists()) {
      val c = cur.get()
      // guard against a stale timer racing a same-batch extension: only
      // the timer matching the LIVE tail may flush
      if (c.end_us / 1000L + GapMs <= info.getExpiryTimeInMs) {
        cur.clear()
        return Iterator.single(SessOut(key, c.start_us, c.end_us, c.n))
      }
    }
    Iterator.empty
  }
}
