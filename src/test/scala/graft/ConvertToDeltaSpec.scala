package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** CONVERT TO DELTA ([[graft.sources.DeltaLog.convertToDelta]]): mint a
  * `_delta_log` over an existing plain-parquet directory in place —
  * no data movement — with per-file zone-map stats, partition-dir
  * discovery, and full writability afterwards. */
class ConvertToDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-convert-").toString + "/t"

  test("flat directory converts in place: same rows, stats prune, DML works") {
    val t = fresh()
    spark.range(0, 1000).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartition(4).write.parquet(t)
    val before = spark.read.parquet(t).as[(Long, Long)].collect().toSet

    val v = DeltaLog.convertToDelta(spark, t)
    assert(v == 0L)
    assert(DeltaLog.isDeltaTable(spark, t))
    // zero data movement: the original parquet files are the table
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.files.size == 4, snap.files)
    assert(DeltaLog.read(spark, t).as[(Long, Long)].collect().toSet == before)
    // stats landed → the zone-map COUNT(*) fast path works
    assert(DeltaLog.countRows(spark, t) == 1000L)
    // the converted table is a first-class writable table
    DeltaLog.write(spark, Seq((5000L, 1L)).toDF("k", "v"), t, "append")
    assert(DeltaLog.read(spark, t).count() == 1001L)
    DeltaLog.deleteWhere(spark, t, col("k") === 5000L)
    assert(DeltaLog.read(spark, t).as[(Long, Long)].collect().toSet == before)
  }

  test("partitioned k=v layout: declared partitioning, pruning, refusals") {
    val t = fresh()
    spark.range(0, 300)
      .select(col("id").as("k"), (col("id") % 3).cast("int").as("p"))
      .write.partitionBy("p").parquet(t)
    // a partitioned layout without declared partitioning refuses
    val e = intercept[IllegalArgumentException](DeltaLog.convertToDelta(spark, t))
    assert(e.getMessage.contains("PARTITIONED BY"), e.getMessage)

    DeltaLog.convertToDelta(spark, t, partitionBy = Seq("p"))
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.partitionColumns == Seq("p"))
    assert(DeltaLog.read(spark, t).count() == 300L)
    assert(DeltaLog.read(spark, t).where(col("p") === 1).count() == 100L)
    // partition pruning happens at the FILE level: one partition's files
    val pruned = DeltaLog.readPruned(spark, t, col("p") === 1)
    assert(pruned.as[(Long, Int)].collect().forall(_._2 == 1))
    // converting again refuses — the log exists now
    val e2 = intercept[IllegalArgumentException](
      DeltaLog.convertToDelta(spark, t, partitionBy = Seq("p")))
    assert(e2.getMessage.contains("already carries"), e2.getMessage)
  }

  test("SQL verb: CONVERT TO DELTA parquet.`path` PARTITIONED BY, NO STATISTICS") {
    val t = fresh()
    spark.range(0, 60)
      .select(col("id").as("k"), (col("id") % 2).cast("int").as("p"))
      .write.partitionBy("p").parquet(t)
    GraftSql.exec(spark,
      s"CONVERT TO DELTA parquet.`$t` PARTITIONED BY (p int) NO STATISTICS")
    assert(DeltaLog.read(spark, t).count() == 60L)
    // NO STATISTICS: adds carry no stats JSON
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.fileEntries.nonEmpty)
    val raw = {
      val p = new org.apache.hadoop.fs.Path(t + "/_delta_log/00000000000000000000.json")
      val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(!raw.contains("\"stats\""), raw.take(500))
    assert(raw.contains("\"operation\":\"CONVERT\""))
  }
}
