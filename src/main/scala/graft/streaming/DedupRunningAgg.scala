package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One event after the exact-decimal money conversion (value is carried
  * as integer cents so the processor only ever adds longs — no float
  * summation order can differ from the batch oracle).
  */
case class EvIn(user_id: Long, event_id: Long, ts_us: Long, cents: Long)

/** Running per-user aggregate; re-emitted each micro-batch that changes
  * the key. `n_events` is strictly monotone in emissions for a key, so
  * the final state is `max(struct(n_events, …))` over the update log.
  */
case class EvAgg(user_id: Long, n_events: Long, cents: Long,
    last_ts_us: Long, last_event_id: Long)

/** Arbitrary keyed state via Spark 4's transformWithState API
  * (StatefulProcessor + typed state variables over the RocksDB store):
  * an EXACTLY-ONCE running aggregate over an AT-LEAST-ONCE source.
  *
  * Per user, a MapState of seen event ids filters redelivered rows
  * BEFORE they touch the running (count, cent-sum, latest-event)
  * ValueState — the keyed-dedup + aggregate fusion every idempotent
  * consumer runs, here as ONE state operator instead of a
  * dropDuplicates stage feeding a separate aggregation (one state
  * store, one shuffle, half the per-batch state round-trips).
  *
  * Scale shape: state is partitioned by user across the store's
  * shuffle partitions and bounded by (users × their event ids); in a
  * production deployment the seen-set carries a TTL matched to the
  * source's redelivery horizon (TTLConfig here is NONE only because
  * the replay is finite), which bounds it to the horizon's width
  * regardless of history length.
  */
class DedupRunningAgg extends StatefulProcessor[Long, EvIn, EvAgg] {

  @transient private var seen: MapState[Long, Boolean] = _
  @transient private var agg: ValueState[EvAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    seen = getHandle.getMapState[Long, Boolean](
      "seen", Encoders.scalaLong, Encoders.scalaBoolean, TTLConfig.NONE)
    agg = getHandle.getValueState[EvAgg](
      "agg", Encoders.product[EvAgg], TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[EvIn],
      tv: TimerValues): Iterator[EvAgg] = {
    var cur =
      if (agg.exists()) agg.get()
      else EvAgg(key, 0L, 0L, Long.MinValue, Long.MinValue)
    var changed = false
    rows.foreach { r =>
      if (!seen.containsKey(r.event_id)) {
        seen.updateValue(r.event_id, true)
        val later = r.ts_us > cur.last_ts_us ||
          (r.ts_us == cur.last_ts_us && r.event_id > cur.last_event_id)
        cur = EvAgg(key, cur.n_events + 1, cur.cents + r.cents,
          if (later) r.ts_us else cur.last_ts_us,
          if (later) r.event_id else cur.last_event_id)
        changed = true
      }
    }
    if (changed) { agg.update(cur); Iterator.single(cur) }
    else Iterator.empty
  }
}
