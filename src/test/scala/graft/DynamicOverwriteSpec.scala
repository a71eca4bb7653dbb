package graft

import java.io.File
import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** Dynamic partition overwrite (`spark.sql.sources.partitionOverwriteMode
  * =dynamic` honored on protocol tables): an overwrite replaces ONLY the
  * partitions the incoming frame carries — the nightly partition-reload
  * shape with no replaceWhere predicate to spell. */
class DynamicOverwriteSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {
  import spark.implicits._

  override def afterEach(): Unit = {
    spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    super.afterEach()
  }

  private def fresh(): String =
    Files.createTempDirectory("graft-dynov-").toString + "/t"

  private def parquetState(dir: File): Map[String, Long] =
    Option(dir.listFiles).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified).toMap

  test("overwrite replaces only the incoming partitions") {
    val t = fresh()
    DeltaLog.write(spark, (0L until 30L).map(i => (i, s"d${i % 3}"))
      .toDF("k", "day").repartition(1), t, partitionBy = Seq("day"))
    val untouched = parquetState(new File(t, "day=d0"))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    DeltaLog.write(spark, Seq((100L, "d1"), (101L, "d1")).toDF("k", "day"),
      t, mode = "overwrite", partitionBy = Seq("day"))
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    val want = ((0L until 30L).filter(_ % 3 != 1).map(i => (i, s"d${i % 3}")) ++
      Seq((100L, "d1"), (101L, "d1"))).toSet
    assert(got == want)
    // d0's parquet not even re-listed, let alone rewritten
    assert(parquetState(new File(t, "day=d0")) == untouched)
    // incoming-partition types coerce: an INT day value matches too
    DeltaLog.write(spark, Seq((7, "d1")).toDF("k", "day"),
      t, mode = "overwrite", partitionBy = Seq("day"))
    assert(DeltaLog.read(spark, t).where(col("day") === "d1").count() == 1L)
  }

  test("static overwrite still truncates; unset conf means static") {
    val t = fresh()
    DeltaLog.write(spark, (0L until 10L).map(i => (i, s"d${i % 2}"))
      .toDF("k", "day"), t, partitionBy = Seq("day"))
    DeltaLog.write(spark, Seq((42L, "d0")).toDF("k", "day"),
      t, mode = "overwrite", partitionBy = Seq("day"))
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((42L, "d0")))
  }

  test("null partition values match exactly the null tuple") {
    val t = fresh()
    DeltaLog.write(spark,
      Seq((1L, "a"), (2L, null), (3L, "b")).toDF("k", "p"),
      t, partitionBy = Seq("p"))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    DeltaLog.write(spark, Seq((20L, null.asInstanceOf[String])).toDF("k", "p"),
      t, mode = "overwrite", partitionBy = Seq("p"))
    val got = DeltaLog.read(spark, t).as[(Long, Option[String])].collect().toSet
    assert(got == Set((1L, Some("a")), (3L, Some("b")), (20L, None)))
  }

  test("generated partition columns: the frame needs only the base column") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (ts TIMESTAMP, v STRING,
         |d DATE GENERATED ALWAYS AS (CAST(ts AS DATE)))
         |PARTITIONED BY (d)""".stripMargin)
    def row(day: Int, v: String) =
      (java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), v)
    DeltaLog.write(spark, Seq(row(1, "a"), row(2, "b")).toDF("ts", "v"),
      t, mode = "append")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    DeltaLog.write(spark, Seq(row(2, "B2")).toDF("ts", "v"),
      t, mode = "overwrite")
    val got = DeltaLog.read(spark, t).select("v").as[String].collect().toSet
    assert(got == Set("a", "B2"))
  }

  test("10k-file overwrite streams removes from the file frame") {
    // The wide-overwrite scale shape: replacing a 10,000-file table (or
    // a fat slice of its partitions) must stream the remove actions
    // into the commit via toLocalIterator — the driver never holds the
    // replaced set. Synthetic log, no physical parquet for the old
    // files: reading any of them would throw, so the assertions below
    // prove the overwrite is metadata-only on the remove side.
    val t = fresh()
    val n = 10000
    val schema = new org.apache.spark.sql.types.StructType()
      .add("k", "long").add("day", "string")
    val esc = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val actions =
      Seq("""{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"ow10k","format":{"provider":"parquet","options":{}},"schemaString":"$esc","partitionColumns":["day"],"configuration":{},"createdTime":1700000000000}}""") ++
      (0 until n).map { i =>
        f"""{"add":{"path":"day=d${i % 4}%d/part-$i%05d.parquet","partitionValues":{"day":"d${i % 4}%d"},"size":1000,"modificationTime":1700000000000,"dataChange":true}}"""
      }
    val logDir = new File(t, "_delta_log"); logDir.mkdirs()
    Files.write(new File(logDir, f"${0L}%020d.json").toPath,
      (actions.mkString("\n") + "\n").getBytes("UTF-8"))

    // dynamic overwrite of ONE of the four partitions: 2500 removes
    // stream, the other 7500 files stay live
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val v1 = DeltaLog.write(spark,
      Seq((1L, "d1"), (2L, "d1")).toDF("k", "day").coalesce(1),
      t, mode = "overwrite", partitionBy = Seq("day"))
    assert(v1 == 1L)
    val commit1 = scala.io.Source.fromFile(
      new File(logDir, f"${1L}%020d.json")).getLines().toSeq
    assert(commit1.count(_.contains("\"remove\"")) == n / 4)
    assert(commit1.head.contains("commitInfo"), "commitInfo must stay first")
    val snap1 = DeltaLog.snapshot(spark, t)
    assert(snap1.allFiles.count() == (n - n / 4).toLong + 1L)
    assert(snap1.allFiles
      .where(element_at(col("partitionValues"), "day") === "d1")
      .count() == 1L)

    // full overwrite: every remaining file's remove streams
    spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val v2 = DeltaLog.write(spark,
      Seq((9L, "dx")).toDF("k", "day").coalesce(1), t, mode = "overwrite")
    assert(v2 == 2L)
    val commit2 = scala.io.Source.fromFile(
      new File(logDir, f"${2L}%020d.json")).getLines().toSeq
    assert(commit2.count(_.contains("\"remove\"")) == n - n / 4 + 1)
    assert(DeltaLog.read(spark, t).count() == 1L)
    // the crc stayed incremental AND correct through both wide commits
    val report = graft.sources.Checksum.validate(spark, t).get
    assert(report.values.forall(identity), report.toString)
  }
}
