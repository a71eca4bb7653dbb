package graft

import graft.streaming.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import java.nio.file.Files

/** Sessionization state machine: the open session must merge across
  * micro-batches, close in-batch on a gap, and close via event-time
  * timeout when the watermark passes end + gap. */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private val gapS = Sessions.GapUs / 1000000L // 24h in seconds
  private val base = 1700000000L

  test("sessions merge across batches, close on gap, and time out on watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)] // (user_id, event_id, epoch seconds)
    val in = ms.toDF().toDF("user_id", "event_id", "secs")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("event_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[Sessions.Ev]
    val sessions = in.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        Sessions.sessionize)
    val ckpt = Files.createTempDirectory("graft-sess-spec-").toString
    val q = sessions.writeStream
      .queryName("sess_spec_sink").outputMode("append")
      .format("memory").option("checkpointLocation", ckpt)
      .start()
    try {
      def rows() = spark.table("sess_spec_sink")
        .select(col("user_id"), col("session_id"), col("n_events"))
        .as[(Long, Int, Long)].collect().toSet

      // batch 1: user 1 opens a session (2 events), user 2 opens one
      ms.addData((1L, 1L, base), (1L, 2L, base + 10), (2L, 10L, base))
      q.processAllAvailable()
      assert(rows().isEmpty, "no session may close while within gap and watermark")

      // batch 2: user 1 continues the SAME session (state carried across
      // batches), then an event beyond the gap closes it in-batch with the
      // merged count of 3. The watermark jump also times out user 2's idle
      // session.
      ms.addData((1L, 3L, base + 20), (1L, 4L, base + 20 + gapS + 1))
      q.processAllAvailable()
      assert(rows() == Set((1L, 1, 3L), (2L, 1, 1L)))

      // flush sentinel (negative user): advances the watermark past user
      // 1's open session, emits nothing for itself
      ms.addData((-1L, 99L, base + 4 * gapS))
      q.processAllAvailable()
      assert(rows() == Set((1L, 1, 3L), (2L, 1, 1L), (1L, 2, 1L)))
    } finally q.stop()
  }

  test("hot key (90% of events): correct under skew, per-task burst bounded by batch admission") {
    // flatMapGroupsWithState keys state by user_id, so one hot key is
    // irreducibly ONE task per micro-batch — AQE's skew handling does not
    // apply to stateful streaming. The bound that holds at 100 TB is
    // per-batch ADMISSION (the source's maxOffsetsPerTrigger / file cap):
    // a hot task's burst is one micro-batch's share of the hot key, never
    // the key's accumulated history, and state stays O(1) (the single
    // open session) regardless of how many events the key absorbs. This
    // spec feeds 90% of a 1,000-event stream to one key across 10
    // micro-batches and asserts (a) sessionization under skew equals the
    // hand-computed truth and (b) no task of any stateful stage shuffles
    // in more than one micro-batch's rows.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    val in = ms.toDF().toDF("user_id", "event_id", "secs")
      .withColumn("ts", timestamp_seconds(col("secs")))
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("event_id"), col("ts"), unix_micros(col("ts")).as("ts_us"))
      .as[Sessions.Ev]
    val sessions = in.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        Sessions.sessionize)
    val maxTaskRecords = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) {
          val r = t.taskMetrics.shuffleReadMetrics.recordsRead
          maxTaskRecords.updateAndGet(m => math.max(m, r))
          ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val ckpt = Files.createTempDirectory("graft-sess-skew-").toString
    val q = sessions.writeStream
      .queryName("sess_skew_sink").outputMode("append")
      .format("memory").option("checkpointLocation", ckpt)
      .start()
    try {
      val hot = 7L
      for (b <- 0 until 10) {
        val batch = (0 until 100).map { i =>
          val u = if (i < 90) hot else (i % 5) + 1L
          (u, b * 100L + i, base + b * 600L + i)
        }
        ms.addData(batch: _*)
        q.processAllAvailable()
      }
      ms.addData((-1L, 9999L, base + 4 * gapS)) // flush sentinel
      q.processAllAvailable()
      val got = spark.table("sess_skew_sink")
        .select(col("user_id"), col("session_id"), col("n_events"))
        .as[(Long, Int, Long)].collect().toSet
      // all events inside one gap → one session per user: 900 for the hot
      // key, 20 for each of the five cold keys
      val want = Set((hot, 1, 900L)) ++ (1L to 5L).map(u => (u, 1, 20L))
      assert(got == want, got.toString)
      org.apache.spark.GraftCoreShim.drainListenerBus(spark.sparkContext, 30000)
      val m = maxTaskRecords.get()
      assert(m <= 101, s"a task absorbed $m records — more than one micro-batch's rows")
      assert(m >= 90, s"expected the hot key's 90-row batch share in one task, saw $m")
    } finally {
      q.stop()
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
