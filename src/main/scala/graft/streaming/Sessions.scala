package graft.streaming

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Event-time sessionization with custom streaming state — the
  * `flatMapGroupsWithState` tier of the engine's streaming surface,
  * beyond what windowed aggregation can express (sessions have dynamic,
  * data-dependent extents; tumbling/sliding windows do not).
  *
  * Semantics: per user, events sorted by (ts, event_id) are grouped into
  * sessions separated by gaps > [[Sessions.GapUs]]; each session reports
  * its start, end and event count. A session closes either when a
  * later event opens the next one (emitted in-batch) or when the event
  * -time watermark passes its end + gap (emitted via EventTimeTimeout).
  *
  * Scale shape: one hash-partition shuffle by user_id into per-executor
  * state stores; state per key is O(1) (the single open session), bounded
  * by the timeout — nothing grows with history. This is the pattern the
  * reference's trip-lifecycle feed (trip_events keyed by trip_id,
  * /root/reference/gcp_infrastructure/init_cloud_sql.sql:73-94) needs at
  * 100 TB: per-trip state machines instead of a whole-history shuffle.
  *
  * Verification: under `Trigger.AvailableNow` the final open session per
  * key would never time out (the watermark stops at the last real
  * event), so the stream is unioned with a far-future `__flush` sentinel
  * row for a negative user id. The sentinel advances the watermark past
  * every real session's timeout and is itself discarded inside
  * [[Sessions.sessionize]] — making the streaming result equal, row for
  * row, to batch sessionization (the DuckDB oracle's window-function
  * formulation).
  */
object Sessions {

  /** Session gap: a pause longer than this starts a new session. */
  val GapUs: Long = 24L * 3600 * 1000 * 1000
  private val GapMs: Long = GapUs / 1000

  /** `ts` carries the watermark tag (required by the analyzer for
    * EventTimeTimeout); the logic uses the exact-microsecond `ts_us`. */
  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp, ts_us: Long)

  /** The O(1) per-key state: sessions already emitted + the open one. */
  case class Open(emitted: Int, startUs: Long, endUs: Long, n: Long)

  case class Session(user_id: Long, session_id: Int, start_us: Long, end_us: Long, n_events: Long)

  /** The state-transition function. Pure Scala fold over the batch's
    * events for one key, merged with the open session carried in state. */
  def sessionize(userId: Long, events: Iterator[Ev], state: GroupState[Open]): Iterator[Session] = {
    if (userId < 0) { // watermark-advancing sentinel: consume, keep no state
      events.foreach(_ => ())
      return Iterator.empty
    }
    val evs = events.toArray.sortBy(e => (e.ts_us, e.event_id))
    if (evs.isEmpty) {
      if (state.hasTimedOut && state.exists) {
        val s = state.get
        state.remove()
        Iterator.single(Session(userId, s.emitted + 1, s.startUs, s.endUs, s.n))
      } else Iterator.empty
    } else {
      val out = Seq.newBuilder[Session]
      var (emitted, cur) =
        if (state.exists) { val s = state.get; (s.emitted, Option((s.startUs, s.endUs, s.n))) }
        else (0, Option.empty[(Long, Long, Long)])
      evs.foreach { e =>
        cur match {
          case Some((st, en, n)) if e.ts_us - en <= GapUs =>
            cur = Some((st, math.max(en, e.ts_us), n + 1))
          case Some((st, en, n)) =>
            emitted += 1
            out += Session(userId, emitted, st, en, n)
            cur = Some((e.ts_us, e.ts_us, 1L))
          case None =>
            cur = Some((e.ts_us, e.ts_us, 1L))
        }
      }
      val (st, en, n) = cur.get
      state.update(Open(emitted, st, en, n))
      // close when the watermark passes end + gap; clamp above the current
      // watermark (required by the API when a session is already overdue)
      state.setTimeoutTimestamp(
        math.max(en / 1000 + GapMs + 1000, state.getCurrentWatermarkMs() + 1))
      out.result().iterator
    }
  }

  /** The sentinel row, written as a one-row parquet side input with the
    * events schema (ts in raw nanos, like the source file). */
  private def writeSentinel(spark: SparkSession, dir: String): String = {
    import spark.implicits._
    val maxUs = Tables.events(spark, dir)
      .agg(max(unix_micros(col("ts")))).as[Long].head()
    val flushNs = (maxUs + GapUs + 2L * 3600 * 1000 * 1000) * 1000
    val tmp = java.nio.file.Files.createTempDirectory("graft-flush-").toString
    Seq((-1L, flushNs, -1L, "__flush", 0.0, null: String))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    tmp
  }

  private def sentinelStream(spark: SparkSession, tmp: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.readStream.schema(schema).parquet(tmp)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Streaming sessionization of the events feed; equals the batch
    * window-function answer (see class doc for the flush mechanics). */
  val qSessionize: QueryDef = QueryDef.sql(
    "q_stream_sessionize",
    """WITH o AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR ts - lag(ts) OVER w > INTERVAL 24 HOUR THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id
      |  FROM o
      |)
      |SELECT user_id, session_id,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events
      |FROM s GROUP BY user_id, session_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val tmp = writeSentinel(spark, dir)
    val in = Streams.eventsStream(spark, dir)
      .unionByName(sentinelStream(spark, tmp))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[Ev]
    val sessions = in.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionize)
      .select(col("user_id"), col("session_id"),
        timestamp_micros(col("start_us")).as("session_start"),
        timestamp_micros(col("end_us")).as("session_end"),
        col("n_events"))
    Streams.runToMemory(sessions, "q_stream_sessionize_sink", "append")
  }

  /** Native `session_window` sessionization (batch form; the same call
    * works under readStream with a watermark) — the declarative
    * complement to [[qSessionize]]'s explicit-state formulation. Spark's
    * convention: a session's end is last-event + gap, and an event at
    * exactly the end starts a NEW session (merge iff diff < gap) — the
    * oracle mirrors that strictness. */
  val qSessionWindow: QueryDef = QueryDef.sql(
    "q_session_window",
    """WITH o AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w >= INTERVAL 24 HOUR
      |      THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT user_id, t,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o
      |)
      |SELECT user_id,
      |  min(t) AS session_start,
      |  max(t) + INTERVAL 24 HOUR AS session_end,
      |  count(*) AS n_events
      |FROM s GROUP BY user_id, sid""".stripMargin) { (spark, dir) =>
    graft.Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "24 hours").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
  }

  val all: Seq[QueryDef] = Seq(qSessionize, qSessionWindow)
}
