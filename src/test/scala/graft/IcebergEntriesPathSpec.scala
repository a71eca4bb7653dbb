package graft

import java.nio.file.Files

import graft.sources.IcebergTable
import org.apache.spark.sql.functions._

/** The small-metadata DRIVER-LOCAL entries path and the DISTRIBUTED
  * entries frame must be interchangeable: same reads, same changelog,
  * same DML results. `spark.graft.iceberg.driverManifestBytes` = 0
  * forces every operation through the distributed path (no manifest
  * list ever totals <= 0 bytes), which default-threshold specs no
  * longer exercise. */
class IcebergEntriesPathSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-icepath-").toString + "/t"

  private def forcedDistributed[T](f: => T): T = {
    spark.conf.set("spark.graft.iceberg.driverManifestBytes", "0")
    try f finally spark.conf.unset("spark.graft.iceberg.driverManifestBytes")
  }

  test("read / changelog / count agree between local and distributed paths") {
    val t = fresh()
    IcebergTable.writeAppend(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), t)
    IcebergTable.writeAppend(spark, Seq((4L, "d")).toDF("k", "v"), t)
    IcebergTable.deleteWhere(spark, t, col("k") === 2L)
    IcebergTable.updateWhere(spark, t, col("k") === 3L, Map("v" -> lit("C")))
    IcebergTable.deleteEquals(spark, t, Seq("d").toDF("v"))

    val localRead = IcebergTable.read(spark, t)
      .as[(Long, String)].collect().toSet
    val localChanges = IcebergTable.changes(spark, t)
      .as[(Long, String, String, Int)].collect().toSet
    val localCount = IcebergTable.countRows(spark, t)

    forcedDistributed {
      assert(IcebergTable.read(spark, t)
        .as[(Long, String)].collect().toSet == localRead)
      assert(IcebergTable.changes(spark, t)
        .as[(Long, String, String, Int)].collect().toSet == localChanges)
      assert(IcebergTable.countRows(spark, t) == localCount)
    }
    // and the expected values themselves, so the parity is not
    // vacuously two wrong answers agreeing
    assert(localRead == Set((1L, "a"), (3L, "C")))
    assert(localCount == 2L)
  }

  test("DML through the distributed path matches the local-path result") {
    def build(forceDistributed: Boolean): Set[(Long, Long, String)] = {
      val t = fresh()
      def go[T](f: => T): T =
        if (forceDistributed) forcedDistributed(f) else f
      go {
        IcebergTable.writeAppend(spark,
          Seq((1L, 10L, "a"), (2L, 10L, "b")).toDF("k", "ver", "v"), t)
        IcebergTable.deleteWhere(spark, t, col("k") === 1L)
        IcebergTable.updateWhere(spark, t, col("k") === 2L,
          Map("v" -> lit("B")))
        IcebergTable.mergeUpsert(spark, t,
          Seq((2L, 20L, "newer"), (3L, 5L, "ins")).toDF("k", "ver", "v"),
          Seq("k"), "ver")
        IcebergTable.read(spark, t).as[(Long, Long, String)].collect().toSet
      }
    }
    val expected = Set((2L, 20L, "newer"), (3L, 5L, "ins"))
    assert(build(forceDistributed = false) == expected)
    assert(build(forceDistributed = true) == expected)
  }
}
