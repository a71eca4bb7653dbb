package graft

import graft.quality.Expectations
import graft.streaming.StreamMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-micro-batch quality metrics: counters ride each batch's job and
  * surface through observedMetrics; Fail rules gate after the run. */
class StreamMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Expectations.Expectation("value_present", "value IS NOT NULL", Expectations.Track),
    Expectations.Expectation("amount_positive", "amount > 0", Expectations.Fail))

  test("violation counters are reported per micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Option[String], Double)]
    val df = StreamMonitor.monitored(
      ms.toDF().toDF("value", "amount"), "quality", rules)
    val q = df.writeStream.format("memory").queryName("mon_sink")
      .outputMode("append").start()
    try {
      ms.addData((Some("a"), 1.0), (None, 2.0), (None, 3.0))
      q.processAllAvailable()
      ms.addData((Some("b"), 4.0))
      q.processAllAvailable()
      val batches = StreamMonitor.batchMetrics(q, "quality")
      assert(batches.size == 2, s"expected 2 observed batches, got $batches")
      assert(batches.head == Map("rows_seen" -> 3L, "value_present" -> 2L,
        "amount_positive" -> 0L))
      assert(batches(1) == Map("rows_seen" -> 1L, "value_present" -> 0L,
        "amount_positive" -> 0L))
      StreamMonitor.assertFailRules(q, "quality", rules) // no violations
    } finally q.stop()
  }

  test("a Fail-rule violation in any batch trips the post-run gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Option[String], Double)]
    val df = StreamMonitor.monitored(
      ms.toDF().toDF("value", "amount"), "quality", rules)
    val q = df.writeStream.format("memory").queryName("mon_sink_fail")
      .outputMode("append").start()
    try {
      ms.addData((Some("a"), 1.0), (Some("b"), -5.0))
      q.processAllAvailable()
      val e = intercept[IllegalArgumentException] {
        StreamMonitor.assertFailRules(q, "quality", rules)
      }
      assert(e.getMessage.contains("amount_positive"))
    } finally q.stop()
  }
}
