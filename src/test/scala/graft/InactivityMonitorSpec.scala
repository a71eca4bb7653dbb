package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.{InactivityMonitor, StatefulTopK}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time timers under `transformWithState`
  * ([[graft.streaming.InactivityProcessor]]): a key's visit closes when
  * the WATERMARK crosses its re-armed inactivity timer — including keys
  * the stream never touches again. */
class InactivityMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("visits close on watermark passage; activity re-arms the timer") {
    StatefulTopK.withRocksDb(spark) {
      implicit val sq = spark.sqlContext
      val in = MemoryStream[(Long, Timestamp, Double)]
      // 5-minute gap, zero watermark delay: watermark = max event time seen
      val out = InactivityMonitor.closedVisits(in.toDS(), gapMs = 5 * 60 * 1000L,
        watermarkDelay = "0 seconds")
      val ckpt = Files.createTempDirectory("graft-inact-").toString
      val q = out.writeStream.queryName("visits").outputMode("append")
        .format("memory").option("checkpointLocation", ckpt).start()
      def rows(): Set[(Long, Long, Timestamp)] =
        spark.table("visits").as[(Long, Long, Timestamp)].collect().toSet
      try {
        // batch 1: users 1 and 2 active around 10:00
        in.addData((1L, ts(0), 1.0), (1L, ts(2), 1.0), (2L, ts(1), 1.0))
        q.processAllAvailable()
        assert(rows().isEmpty, "nothing closes while the watermark is behind")

        // batch 2: user 1 keeps going at 10:06 (re-arms before its 10:07
        // timer is crossed); watermark -> 10:06, past user 2's 10:06 timer
        in.addData((1L, ts(6), 1.0))
        q.processAllAvailable()
        // timer expiry lands on the NEXT micro-batch after the watermark
        // update; push one more batch to flush
        in.addData((3L, ts(7), 1.0))
        q.processAllAvailable()
        val afterTwo = rows()
        assert(afterTwo.contains((2L, 1L, ts(1))), afterTwo)
        assert(!afterTwo.exists(_._1 == 1L), s"user 1 re-armed: $afterTwo")

        // batch 3: far-future event closes user 1 (last 10:06, 2+1 events)
        // and user 3
        in.addData((9L, ts(40), 1.0))
        q.processAllAvailable()
        in.addData((9L, ts(41), 1.0))
        q.processAllAvailable()
        val fin = rows()
        assert(fin.contains((1L, 3L, ts(6))), fin)
        assert(fin.contains((3L, 1L, ts(7))), fin)
      } finally q.stop()
    }
  }
}
