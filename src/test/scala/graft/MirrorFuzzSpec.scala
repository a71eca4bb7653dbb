package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, IcebergTable}
import org.apache.spark.sql.functions._

/** UniForm mirror fuzz: after EVERY random Delta mutation — appends,
  * copy-on-write updates, deletion-vector deletes, OPTIMIZE — the table
  * is re-mirrored as Iceberg metadata over the same parquet bytes, and
  * the two stacks must read identically. The DV steps are the point:
  * each sidecar bitmap must expand to exactly the position-delete rows
  * an Iceberg reader needs, commit after commit, including after an
  * OPTIMIZE purges the DVs a previous mirror exported.
  */
class MirrorFuzzSpec extends SparkSpec {
  import spark.implicits._

  private type R = (Long, String, Double)

  test("every Delta commit mirrors to an identical Iceberg read") {
    val rnd = new scala.util.Random(9001)
    val t = Files.createTempDirectory("graft-mirrorfuzz-").toString + "/t"
    val segs = Vector("A", "B", "C")
    var nextKey = 0L
    def batch(n: Int): Seq[R] = (1 to n).map { _ =>
      nextKey += 1
      (nextKey, segs(rnd.nextInt(segs.size)), (rnd.nextInt(1000) + 1).toDouble)
    }
    def df(rows: Seq[R]) =
      rows.toDF("k", "seg", "amt").repartition(1 + rnd.nextInt(3))

    DeltaLog.write(spark, df(batch(8)), t)

    for (step <- 1 to 14) {
      rnd.nextInt(6) match {
        case 0 | 1 =>
          DeltaLog.write(spark, df(batch(1 + rnd.nextInt(5))), t, mode = "append")
        case 2 => // deletion-vector delete: the mirror must export the mask
          DeltaLog.deleteWhere(spark, t, col("amt") < (rnd.nextInt(900) + 1).toDouble)
        case 3 =>
          DeltaLog.updateWhere(spark, t, col("seg") === segs(rnd.nextInt(segs.size)),
            Map("amt" -> (col("amt") + 100.0)))
        case 4 => // purges DVs; the next mirror must drop its delete manifest
          DeltaLog.optimize(spark, t)
        case 5 =>
          DeltaLog.checkpoint(spark, t)
      }
      IcebergTable.mirrorDelta(spark, t)
      val delta = DeltaLog.read(spark, t).select("k", "seg", "amt")
        .as[R].collect().toVector.sorted
      val ice = IcebergTable.read(spark, t).select("k", "seg", "amt")
        .as[R].collect().toVector.sorted
      assert(delta == ice, s"step $step: Iceberg read diverged from Delta " +
        s"(delta=${delta.size} rows, iceberg=${ice.size} rows)")
      // the metadata-only count agrees through both stacks
      assert(IcebergTable.countRows(spark, t) == delta.size.toLong, s"step $step count")
    }
  }
}
