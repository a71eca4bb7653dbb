package graft

import graft.sources.DeltaLog
import org.apache.spark.sql.functions._

/** Row tracking (Delta writer feature `rowTracking`): fresh baseRowId
  * ranges per add, the `delta.rowTracking` domain high-water mark, the
  * `_row_id` read surface, DV-delete preservation, and the explicit
  * refusal of un-materialized rewrites. */
class RowTrackingSpec extends SparkSpec {

  private val rt = Map(DeltaLog.RowTrackingKey -> "true")

  test("appends allocate contiguous non-overlapping baseRowId ranges") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-rt1-").toString + "/t"
    DeltaLog.write(spark, spark.range(0L, 100L).toDF("x").repartition(4), t,
      properties = rt)
    DeltaLog.write(spark, spark.range(100L, 150L).toDF("x").repartition(2), t,
      mode = "append")
    val snap = DeltaLog.snapshot(spark, t)
    val files = snap.allFiles
      .select("path", "baseRowId", "defaultRowCommitVersion")
      .collect().sortBy(_.getLong(1))
    assert(files.forall(!_.isNullAt(1)), "every add carries baseRowId")
    // ranges from stats numRecords: contiguous from 0, no overlap
    val withN = snap.allFiles
      .select(col("baseRowId"),
        get_json_object(col("stats"), "$.numRecords").cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var expect = 0L
    withN.foreach { case (base, n) =>
      assert(base == expect, s"range must start at $expect, got $base")
      expect = base + n
    }
    assert(expect == 150L, "high end covers every row")
    // the domain records the high-water mark
    assert(snap.domainMetadata.get(DeltaLog.RowTrackingDomain)
      .exists(_.contains("\"rowIdHighWaterMark\":149")),
      s"domain: ${snap.domainMetadata}")
    // protocol carries the writer features
    val proto = snap.protocolJson.get
    assert(proto.contains("rowTracking") && proto.contains("domainMetadata"), proto)
    // the two commits stamp their own defaultRowCommitVersion
    val dcvs = files.map(_.getLong(2)).distinct.sorted
    assert(dcvs.sameElements(Array(0L, 1L)), dcvs.toSeq.toString)
  }

  test("readWithRowIds: ids are unique, stable, and DV deletes preserve them") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-rt2-").toString + "/t"
    DeltaLog.write(spark,
      spark.range(0L, 60L).toDF("x").repartition(3), t, properties = rt)
    val ids1 = DeltaLog.readWithRowIds(spark, t)
      .select("x", "_row_id").as[(Long, Long)].collect().toMap
    assert(ids1.size == 60 && ids1.values.toSeq.distinct.size == 60,
      "one unique row id per row")
    assert(ids1.values.min == 0L && ids1.values.max == 59L, "dense ids from 0")
    // stable across re-reads
    val ids2 = DeltaLog.readWithRowIds(spark, t)
      .select("x", "_row_id").as[(Long, Long)].collect().toMap
    assert(ids1 == ids2, "row ids must be stable across reads")
    // DV delete: survivors keep their ids (no bytes rewritten)
    DeltaLog.deleteWhere(spark, t, $"x" % 3 === 0L)
    val after = DeltaLog.readWithRowIds(spark, t)
      .select("x", "_row_id").as[(Long, Long)].collect().toMap
    assert(after.keySet == ids1.keySet.filterNot(_ % 3 == 0))
    assert(after.forall { case (x, id) => ids1(x) == id },
      "surviving rows keep their pre-delete row ids")
  }

  test("un-materialized rewrites refuse; appends after that still allocate") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-rt3-").toString + "/t"
    DeltaLog.write(spark,
      spark.range(0L, 40L).toDF("x").repartition(4), t, properties = rt)
    val e = intercept[RuntimeException] {
      DeltaLog.optimize(spark, t, targetFiles = 1)
    }
    assert(e.getMessage.contains("row-tracked"), e.getMessage)
    // the refusal left no partial state: next append continues the range
    DeltaLog.write(spark, Seq(100L).toDF("x").coalesce(1), t, mode = "append")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.domainMetadata.get(DeltaLog.RowTrackingDomain)
      .exists(_.contains("\"rowIdHighWaterMark\":40")),
      s"domain: ${snap.domainMetadata}")
  }

  test("row ids survive checkpoint + JSON vacuum replay") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-rt4-").toString + "/t"
    DeltaLog.write(spark,
      spark.range(0L, 30L).toDF("x").repartition(2), t, properties = rt)
    DeltaLog.write(spark, spark.range(30L, 50L).toDF("x").coalesce(1), t,
      mode = "append")
    val before = DeltaLog.readWithRowIds(spark, t)
      .select("x", "_row_id").as[(Long, Long)].collect().toMap
    DeltaLog.checkpoint(spark, t)
    // drop the JSON commits: replay must come from the checkpoint alone
    val f = new org.apache.hadoop.fs.Path(t + "/_delta_log")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L to 1L).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(t + f"/_delta_log/$v%020d.json"), false)
    }
    val after = DeltaLog.readWithRowIds(spark, t)
      .select("x", "_row_id").as[(Long, Long)].collect().toMap
    assert(after == before, "checkpoint replay must preserve row ids")
    // and the domain survives too: the next append continues, not restarts
    DeltaLog.write(spark, Seq(999L).toDF("x").coalesce(1), t, mode = "append")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.domainMetadata.get(DeltaLog.RowTrackingDomain)
      .exists(_.contains("\"rowIdHighWaterMark\":50")),
      s"domain: ${snap.domainMetadata}")
  }
}
