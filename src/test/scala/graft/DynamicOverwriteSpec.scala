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
}
