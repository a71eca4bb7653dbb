package graft

import java.nio.file.Files

import graft.sources.{Checksum, DeltaLog}
import org.apache.spark.sql.functions._

/** Per-version `.crc` checksums ([[graft.sources.Checksum]]): every
  * commit leaves a VersionChecksum sidecar whose aggregate state
  * (numFiles/tableSizeBytes/metadata/protocol) must equal what log
  * replay computes — appends increment with zero Spark jobs, DML
  * recomputes, and validation catches a tampered file. */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-crc-").toString + "/t"

  private def df(lo: Long, n: Long) =
    spark.range(lo, lo + n).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))

  test("every commit writes a crc; append increments match replayed state") {
    val t = fresh()
    DeltaLog.write(spark, df(0, 100).coalesce(2), t)
    DeltaLog.write(spark, df(100, 50).coalesce(1), t, "append")
    DeltaLog.write(spark, df(150, 50).coalesce(1), t, "append")
    (0L to 2L).foreach { v =>
      assert(Checksum.read(spark, t, v).isDefined, s"missing crc for version $v")
    }
    val crc = Checksum.read(spark, t, 2L).get
    val snap = DeltaLog.snapshot(spark, t)
    assert(crc.numFiles == snap.files.size.toLong)
    val actualSize = snap.allFiles.agg(sum("size")).head.getLong(0)
    assert(crc.tableSizeBytes == actualSize)
    val report = Checksum.validate(spark, t).get
    assert(report.values.forall(identity), report.toString)
  }

  test("remove-carrying commits (DELETE, OPTIMIZE) recompute and stay valid") {
    val t = fresh()
    DeltaLog.write(spark, df(0, 200).repartition(4), t)
    DeltaLog.deleteWhere(spark, t, col("k") < 50L)
    assert(Checksum.validate(spark, t).get.values.forall(identity))
    DeltaLog.optimize(spark, t, targetFiles = 1)
    assert(Checksum.validate(spark, t).get.values.forall(identity))
    // metadata commits carry the new metadata into the crc
    DeltaLog.alterSetProperties(spark, t, Map("delta.appendOnly" -> "false"))
    val report = Checksum.validate(spark, t).get
    assert(report.values.forall(identity), report.toString)
  }

  test("validation flags a tampered checksum; a missing one is not an error") {
    val t = fresh()
    DeltaLog.write(spark, df(0, 100).coalesce(1), t)
    val snap = DeltaLog.snapshot(spark, t)
    val p = new org.apache.hadoop.fs.Path(t + "/_delta_log",
      f"${snap.version}%020d.crc")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // tamper: double the recorded numFiles
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p); try in.readFully(0, buf) finally in.close()
    val bad = new String(buf, "UTF-8").replace("\"numFiles\":1", "\"numFiles\":2")
    fs.delete(p, false)
    val o = fs.create(p, false); try o.write(bad.getBytes("UTF-8")) finally o.close()
    val report = Checksum.validate(spark, t).get
    assert(!report("numFiles"), "tampered numFiles must fail validation")
    assert(report("tableSizeBytes"))
    // absent crc: validation yields None, reads proceed untouched
    fs.delete(p, false)
    assert(Checksum.validate(spark, t).isEmpty)
    assert(DeltaLog.read(spark, t).count() == 100L)
  }

  test("a table with a crc gap self-heals at the next commit") {
    val t = fresh()
    DeltaLog.write(spark, df(0, 100).coalesce(1), t)
    val p = new org.apache.hadoop.fs.Path(t + "/_delta_log",
      f"${0L}%020d.crc")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    // next append has no baseline → full recompute, valid again
    DeltaLog.write(spark, df(100, 100).coalesce(1), t, "append")
    assert(Checksum.validate(spark, t).get.values.forall(identity))
  }

  test("expired-log cleanup reclaims crc sidecars with their commits") {
    val t = fresh()
    DeltaLog.write(spark, df(0, 10).coalesce(1), t)
    for (i <- 1 to 3)
      DeltaLog.write(spark, df(i * 10L, 10).coalesce(1), t, "append")
    DeltaLog.checkpoint(spark, t)
    val n = DeltaLog.cleanupLog(spark, t, retainMillis = Some(0L))
    assert(n > 0)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (0L until n.toLong).foreach { v =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(t + "/_delta_log",
        f"$v%020d.crc")), s"crc for cleaned version $v must be gone")
    }
    // surviving versions keep theirs
    assert(Checksum.read(spark, t, 3L).isDefined)
  }
}
