package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Event-time TIMER surface of Spark 4's `transformWithState`:
  * per-key inactivity detection. Each key holds (lastSeen, count) in
  * ValueState and one registered event-time timer at lastSeen + gap;
  * new activity re-arms the timer, and when the WATERMARK crosses an
  * armed timer the key's "visit" closes — `handleExpiredTimer` emits
  * exactly one (key, n_events, last_ts) row and clears the state.
  *
  * This is the push-based complement to [[Sessions]]' pull-based
  * flatMapGroupsWithState sessionization: there the group function
  * must be CALLED to notice a timeout; here the state store's timer
  * queue fires keys the stream never touches again — the shape that
  * stays O(expired keys) per batch at 10⁹ tracked keys. State per key
  * is 16 bytes + one timer entry, watermark-bounded by construction. */
class InactivityProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Timestamp, Double), (Long, Long, Timestamp)] {

  @transient private var seen: ValueState[(Long, Long)] = _ // (lastSeenMs, n)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState(
      "seen",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Timestamp, Double)],
      timers: TimerValues): Iterator[(Long, Long, Timestamp)] = {
    val prev = if (seen.exists()) seen.get() else (Long.MinValue, 0L)
    var last = prev._1
    var n = prev._2
    rows.foreach { r =>
      last = math.max(last, r._2.getTime)
      n += 1
    }
    seen.update((last, n))
    // re-arm: one live timer per key
    val it = getHandle.listTimers()
    while (it.hasNext) getHandle.deleteTimer(it.next().asInstanceOf[Long])
    getHandle.registerTimer(last + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[(Long, Long, Timestamp)] = {
    val (last, n) = seen.get()
    seen.clear()
    Iterator((key, n, new Timestamp(last)))
  }
}

object InactivityMonitor {

  /** Closed visits per key: events keyed by user with an event-time
    * watermark; a visit emits when `gap` of event time passes with no
    * activity. */
  def closedVisits(events: Dataset[(Long, Timestamp, Double)],
      gapMs: Long, watermarkDelay: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF("user_id", "ts", "value")
      .withWatermark("ts", watermarkDelay)
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .transformWithState(new InactivityProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "n_events", "last_ts")
  }
}
