package graft

import java.nio.file.Files

import graft.sources.IcebergTable
import org.apache.spark.sql.functions._

/** Iceberg interop ([[graft.sources.IcebergTable]]): v1 append
  * round-trip, snapshot time travel, metadata-only counts, reader
  * guards (delete manifests refuse), and version-hint-less discovery. */
class IcebergSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-iceberg-").toString + "/t"

  test("append round-trip: two snapshots, time travel, metadata count") {
    val t = fresh()
    val a = spark.range(0, 100)
      .select(col("id").as("k"), (col("id") % 3).cast("int").as("v"),
        concat(lit("row-"), col("id")).as("s"))
    val s1 = IcebergTable.writeAppend(spark, a, t)
    assert(IcebergTable.isIcebergTable(spark, t))
    assert(IcebergTable.read(spark, t).count() == 100L)
    val b = spark.range(100, 150)
      .select(col("id").as("k"), (col("id") % 3).cast("int").as("v"),
        concat(lit("row-"), col("id")).as("s"))
    val s2 = IcebergTable.writeAppend(spark, b, t)
    assert(s2 != s1)
    // current = both appends; the first snapshot still readable
    assert(IcebergTable.read(spark, t).count() == 150L)
    assert(IcebergTable.read(spark, t, snapshotId = Some(s1)).count() == 100L)
    assert(IcebergTable.countRows(spark, t) == 150L)
    // values survive exactly
    val back = IcebergTable.read(spark, t)
      .agg(sum("k"), countDistinct("s")).as[(Long, Long)].head()
    assert(back == ((149L * 150 / 2), 150L), back)
    // schema mismatch refuses
    intercept[IllegalArgumentException] {
      IcebergTable.writeAppend(spark, Seq(1).toDF("other"), t)
    }
  }

  test("timestamp travel via snapshot-log; discovery without version-hint") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq(1L, 2L).toDF("k"), t)
    val afterFirst = System.currentTimeMillis()
    Thread.sleep(10)
    IcebergTable.writeAppend(spark, Seq(3L).toDF("k"), t)
    assert(IcebergTable.read(spark, t, asOfMillis = Some(afterFirst))
      .count() == 2L)
    assert(IcebergTable.read(spark, t).count() == 3L)
    // drop the hint: the reader falls back to the highest v*.metadata.json
    val hint = new org.apache.hadoop.fs.Path(t + "/metadata/version-hint.text")
    hint.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hint, false)
    assert(IcebergTable.read(spark, t).count() == 3L)
  }

  test("CONVERT iceberg -> delta in place: manifests drive the file set, not listing") {
    val t = fresh()
    // two appends; the Iceberg data/ dir will NOT contain dead files,
    // so also leave a stray parquet that a naive lister would pick up
    graft.sources.IcebergTable.writeAppend(spark,
      spark.range(0, 60).select(col("id").as("k")), t)
    graft.sources.IcebergTable.writeAppend(spark,
      spark.range(60, 100).select(col("id").as("k")), t)
    spark.range(9000, 9100).select(col("id").as("k"))
      .coalesce(1).write.parquet(t + "/stray")
    graft.sources.DeltaLog.convertIcebergToDelta(spark, t)
    assert(graft.sources.DeltaLog.isDeltaTable(spark, t))
    // the delta view equals the ICEBERG live set — the stray dir is invisible
    assert(graft.sources.DeltaLog.read(spark, t).count() == 100L)
    // manifest record counts became numRecords stats: metadata-only COUNT works
    assert(graft.sources.DeltaLog.countRows(spark, t) == 100L)
    // the converted table is writable as Delta
    graft.sources.DeltaLog.write(spark, Seq(7777L).toDF("k"), t, "append")
    assert(graft.sources.DeltaLog.read(spark, t).count() == 101L)
  }

  test("mirrorDelta: UniForm shape — Iceberg readers see the Delta state") {
    val t = fresh()
    graft.sources.DeltaLog.write(spark,
      spark.range(0, 80).select(col("id").as("k"), (col("id") * 2).as("v"))
        .repartition(2), t)
    graft.sources.IcebergTable.mirrorDelta(spark, t)
    assert(IcebergTable.read(spark, t).count() == 80L)
    assert(IcebergTable.countRows(spark, t) == 80L)
    assert(IcebergTable.read(spark, t).agg(sum("v")).as[Long].head() == 6320L)
    // delta evolves; a re-mirror catches the iceberg view up
    graft.sources.DeltaLog.write(spark,
      Seq((500L, 0L)).toDF("k", "v"), t, "append")
    assert(IcebergTable.read(spark, t).count() == 80L) // stale until re-mirror
    graft.sources.IcebergTable.mirrorDelta(spark, t)
    assert(IcebergTable.read(spark, t).count() == 81L)
    // DV-carrying tables refuse (Iceberg can't express the mask)
    graft.sources.DeltaLog.deleteWhere(spark, t, col("k") === 0L)
    val e = intercept[IllegalArgumentException](
      graft.sources.IcebergTable.mirrorDelta(spark, t))
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
  }

  test("v2 delete manifests refuse loudly") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq(1L, 2L, 3L).toDF("k"), t)
    // hand-flip the manifest list to claim a DELETE manifest (content=1):
    // rewrite the current snapshot's list with an extra content field
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string"},
        {"name":"manifest_length","type":"long"},
        {"name":"partition_spec_id","type":"int"},
        {"name":"content","type":"int"}]}""")
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(t + "/metadata")
    val lists = f.listStatus(mdir).map(_.getPath)
      .filter(_.getName.startsWith("snap-"))
    val rec = new GenericData.Record(schema)
    rec.put("manifest_path", "whatever.avro")
    rec.put("manifest_length", 1L)
    rec.put("partition_spec_id", 0)
    rec.put("content", 1)
    val local = java.io.File.createTempFile("graft-del-", ".avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, local)
    w.append(rec); w.close()
    f.copyFromLocalFile(false, true,
      new org.apache.hadoop.fs.Path(local.getAbsolutePath), lists.head)
    val e = intercept[IllegalArgumentException](IcebergTable.read(spark, t))
    assert(e.getMessage.contains("DELETE manifests"), e.getMessage)
  }
}
