package graft

import java.io.File
import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level DDL over the protocol: RENAME COLUMN and DROP COLUMN
  * (metadata-only, possible only under column mapping — the stable
  * physicalName/columnId is what lets the logical name move while every
  * data file stays untouched), ADD/DROP CONSTRAINT, and SYNC IDENTITY.
  * The no-resurrection property is the load-bearing assertion: dropping
  * a column and re-adding the same logical name must NOT bring the old
  * data back, because the re-add mints a fresh physicalName. */
class ColumnDdlSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-coldd-").toString + "/t"

  private def mappedTable(): String = {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT, city STRING, amount DOUBLE)
         |TBLPROPERTIES ('delta.columnMapping.mode'='name')""".stripMargin)
    DeltaLog.write(spark,
      Seq((1L, "paris", 10.0), (2L, "tokyo", 20.0), (3L, "paris", 30.0))
        .toDF("id", "city", "amount"),
      t, mode = "append")
    t
  }

  test("RENAME COLUMN is metadata-only: data survives, time travel keeps the old name") {
    val t = mappedTable()
    val v = DeltaLog.latestVersion(spark, t).get
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` RENAME COLUMN city TO town")
    val back = DeltaLog.read(spark, t)
    assert(back.schema.fieldNames.toSeq == Seq("id", "town", "amount"))
    assert(back.select("id", "town").as[(Long, String)].collect().toMap ==
      Map(1L -> "paris", 2L -> "tokyo", 3L -> "paris"))
    // no data file was touched
    assert(DeltaLog.snapshot(spark, t).files ==
      DeltaLog.snapshot(spark, t, Some(v)).files)
    // pre-rename versions still read under the OLD name
    val old = DeltaLog.read(spark, t, versionAsOf = Some(v))
    assert(old.schema.fieldNames.contains("city"))
    // and writes under the new name land
    DeltaLog.write(spark, Seq((4L, "oslo", 40.0)).toDF("id", "town", "amount"),
      t, mode = "append")
    assert(DeltaLog.read(spark, t).count() == 4L)
  }

  test("RENAME COLUMN refuses without mapping and when an expression references it") {
    val plain = fresh()
    DeltaLog.write(spark, Seq((1L, "x")).toDF("id", "v"), plain)
    val e1 = intercept[IllegalArgumentException] {
      DeltaLog.alterRenameColumn(spark, plain, "v", "w")
    }
    assert(e1.getMessage.contains("column mapping"))

    val t = mappedTable()
    GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` ADD CONSTRAINT pos CHECK (amount > 0)")
    val e2 = intercept[IllegalArgumentException] {
      GraftSql.exec(spark, s"ALTER TABLE delta.`$t` RENAME COLUMN amount TO amt")
    }
    assert(e2.getMessage.contains("CHECK constraint"))
    // dropping the constraint unblocks the rename
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` DROP CONSTRAINT pos")
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` RENAME COLUMN amount TO amt")
    assert(DeltaLog.snapshot(spark, t).schema.get.fieldNames.contains("amt"))
  }

  test("DROP COLUMN then re-ADD the same name does not resurrect old data") {
    val t = mappedTable()
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` DROP COLUMN city")
    val dropped = DeltaLog.read(spark, t)
    assert(dropped.schema.fieldNames.toSeq == Seq("id", "amount"))
    assert(dropped.count() == 3L)
    // re-add the SAME logical name: fresh physicalName → all null
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` ADD COLUMNS (city STRING)")
    val readd = DeltaLog.read(spark, t)
    assert(readd.where(col("city").isNotNull).count() == 0L)
    // while new writes fill it normally
    DeltaLog.write(spark, Seq((9L, 90.0, "rome")).toDF("id", "amount", "city"),
      t, mode = "append")
    assert(DeltaLog.read(spark, t).where(col("city") === "rome").count() == 1L)
  }

  test("ADD CONSTRAINT validates existing rows and gates later writes") {
    val t = fresh()
    DeltaLog.write(spark, Seq((1L, 5.0), (2L, -1.0)).toDF("id", "amount"), t)
    // existing data violates → refused, nothing recorded
    val e = intercept[IllegalArgumentException] {
      GraftSql.exec(spark,
        s"ALTER TABLE delta.`$t` ADD CONSTRAINT pos CHECK (amount > 0)")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(!DeltaLog.snapshot(spark, t).configuration.contains("delta.constraints.pos"))
    // clean the data, add, and the gate arms
    DeltaLog.deleteWhere(spark, t, col("amount") < 0)
    GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` ADD CONSTRAINT pos CHECK (amount > 0)")
    intercept[IllegalArgumentException] {
      DeltaLog.write(spark, Seq((3L, -7.0)).toDF("id", "amount"), t, mode = "append")
    }
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` DROP CONSTRAINT pos")
    DeltaLog.write(spark, Seq((3L, -7.0)).toDF("id", "amount"), t, mode = "append")
    assert(DeltaLog.read(spark, t).count() == 2L)
  }

  test("SYNC IDENTITY re-seats the high-water mark of a foreign-written table") {
    // a foreign writer declared the identity column but never maintained
    // the mark: hand-built log, data file carries ids 1..5
    val t = fresh()
    val md = new MetadataBuilder()
      .putLong("delta.identity.start", 1L).putLong("delta.identity.step", 1L)
      .putBoolean("delta.identity.allowExplicitInsert", true).build()
    val schema = StructType(Seq(
      StructField("sk", LongType, nullable = true, md),
      StructField("v", StringType)))
    val tmp = Files.createTempDirectory("graft-sync-part-").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")).toDF("sk", "v")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    new File(t).mkdirs()
    Files.move(part.toPath, new File(t, "part-0000-foreign.snappy.parquet").toPath)
    val esc = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val logDir = new File(t, "_delta_log"); logDir.mkdirs()
    Files.write(new File(logDir, f"${0L}%020d.json").toPath, (Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":6}}""",
      s"""{"metaData":{"id":"sync-fixture","format":{"provider":"parquet","options":{}},"schemaString":"$esc","partitionColumns":[],"configuration":{},"createdTime":1700000000000}}""",
      """{"add":{"path":"part-0000-foreign.snappy.parquet","partitionValues":{},"size":1,"modificationTime":1700000000000,"dataChange":true}}"""
    ).mkString("\n") + "\n").getBytes("UTF-8"))

    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` SYNC IDENTITY")
    val hwm = DeltaLog.snapshot(spark, t).schema.get("sk").metadata
      .getLong("delta.identity.highWaterMark")
    assert(hwm == 5L)
    // the next allocation starts above the synced mark
    DeltaLog.write(spark, Seq("f", "g").toDF("v"), t, mode = "append")
    val ids = DeltaLog.read(spark, t).select("sk").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 7L))
    // already-synced mark: no-op, no new commit
    val v = DeltaLog.latestVersion(spark, t).get
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` SYNC IDENTITY")
    assert(DeltaLog.latestVersion(spark, t).get == v)
  }
}
