package graft

import java.nio.file.Files

import graft.sources.DeltaLog
import org.apache.spark.sql.functions._

/** commitInfo `operationMetrics` (delta-spark's string-valued map):
  * numFiles / numOutputRows / numOutputBytes / numRemovedFiles fall out
  * of commit-time state — no extra jobs — and surface in
  * DESCRIBE HISTORY. */
class OperationMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("write/append/overwrite metrics land in history") {
    val t = Files.createTempDirectory("graft-opm-").toString + "/t"
    DeltaLog.write(spark,
      spark.range(0, 100).select(col("id").as("k")).repartition(2), t)
    DeltaLog.write(spark, Seq(500L, 501L).toDF("k"), t, "append")
    val h = DeltaLog.history(spark, t)
      .select(col("version"), col("operationMetrics"))
      .as[(Long, Map[String, String])].collect().toMap
    assert(h(0L)("numFiles") == "2", h(0L))
    assert(h(0L)("numOutputRows") == "100", h(0L))
    assert(h(0L)("numRemovedFiles") == "0", h(0L))
    assert(h(0L)("numOutputBytes").toLong > 0L, h(0L))
    assert(h(1L)("numOutputRows") == "2", h(1L))
    // an overwrite removes the previous three files
    DeltaLog.write(spark, Seq(9L).toDF("k"), t)
    val h2 = DeltaLog.history(spark, t)
      .select(col("version"), col("operationMetrics"))
      .as[(Long, Map[String, String])].collect().toMap
    val expectRemoved = h(0L)("numFiles").toLong + h(1L)("numFiles").toLong
    assert(h2(2L)("numRemovedFiles") == expectRemoved.toString, h2(2L))
    assert(h2(2L)("numOutputRows") == "1", h2(2L))
  }
}
