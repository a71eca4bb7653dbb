package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type widening (table feature `typeWidening`, reader+writer): under
  * `delta.enableTypeWidening=true` a column's type may WIDEN in place —
  * the old narrow parquet files keep reading under the widened schema
  * with zero rewrite (verified pair-by-pair against this Spark build's
  * parquet reader), `delta.typeChanges` records the provenance, and
  * the protocol upgrades so pre-feature readers refuse rather than
  * misparse. The narrow direction (appending an int frame into a long
  * column) upcasts before staging, so no reader ever meets a
  * mixed-type file set. */
class TypeWideningSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-widen-").toString + "/t"

  test("int column widens to long in place; old files read unrewritten") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id INT, v STRING)
         |TBLPROPERTIES ('delta.enableTypeWidening'='true')""".stripMargin)
    DeltaLog.write(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), t, mode = "append")
    val narrowFiles = DeltaLog.snapshot(spark, t).files
    // a wider append re-declares the column
    DeltaLog.write(spark,
      Seq((3_000_000_000L, "c")).toDF("id", "v"), t, mode = "append")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.get("id").dataType == LongType)
    // the narrow files are still live — no rewrite happened
    assert(narrowFiles.forall(snap.files.contains))
    val back = DeltaLog.read(spark, t).select("id").as[Long].collect().sorted
    assert(back.toSeq == Seq(1L, 2L, 3_000_000_000L))
    // provenance trail + protocol upgrade (both sides)
    val changes = snap.schema.get("id").metadata.getMetadataArray("delta.typeChanges")
    assert(changes.length == 1)
    assert(changes(0).getString("fromType") == "integer")
    assert(changes(0).getString("toType") == "long")
    val proto = snap.protocolJson.get
    assert(proto.contains("\"readerFeatures\""))
    assert(proto.contains("typeWidening"))
  }

  test("narrow append upcasts into the declared wide type, declaration unchanged") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT, x DOUBLE)
         |TBLPROPERTIES ('delta.enableTypeWidening'='true')""".stripMargin)
    // int ids and float xs: both upcast before staging
    DeltaLog.write(spark,
      Seq((1, 1.5f), (2, 2.5f)).toDF("id", "x"), t, mode = "append")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.get("id").dataType == LongType)
    assert(snap.schema.get("x").dataType == DoubleType)
    assert(DeltaLog.read(spark, t).as[(Long, Double)].collect().sorted.toSeq ==
      Seq((1L, 1.5), (2L, 2.5)))
    // no typeChanges entry: the declaration never moved
    assert(!snap.schema.get("id").metadata.contains("delta.typeChanges"))
  }

  test("without the property a type mismatch still refuses") {
    val t = fresh()
    DeltaLog.write(spark, Seq((1, "a")).toDF("id", "v"), t)
    val e = intercept[IllegalArgumentException] {
      DeltaLog.write(spark, Seq((2L, "b")).toDF("id", "v"), t, mode = "append")
    }
    assert(e.getMessage.contains("schema enforcement"))
    assert(e.getMessage.contains("delta.enableTypeWidening"))
  }

  test("chained widenings accumulate provenance; time travel keeps old schemas") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (n SMALLINT)
         |TBLPROPERTIES ('delta.enableTypeWidening'='true')""".stripMargin)
    DeltaLog.write(spark, Seq(1.toShort).toDF("n"), t, mode = "append")   // v1
    DeltaLog.write(spark, Seq(100000).toDF("n"), t, mode = "append")      // v2: short→int
    DeltaLog.write(spark, Seq(5_000_000_000L).toDF("n"), t, mode = "append") // v3: int→long
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.get("n").dataType == LongType)
    val changes = snap.schema.get("n").metadata.getMetadataArray("delta.typeChanges")
    assert(changes.map(c => (c.getString("fromType"), c.getString("toType"))).toSeq ==
      Seq(("short", "integer"), ("integer", "long")))
    assert(DeltaLog.read(spark, t).as[Long].collect().sorted.toSeq ==
      Seq(1L, 100000L, 5_000_000_000L))
    // the pre-widening version still declares (and reads) the narrow type
    val old = DeltaLog.read(spark, t, versionAsOf = Some(1L))
    assert(old.schema("n").dataType == ShortType)
    assert(old.as[Short].collect().toSeq == Seq(1.toShort))
  }

  test("date widens to timestamp_ntz") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (d DATE)
         |TBLPROPERTIES ('delta.enableTypeWidening'='true')""".stripMargin)
    DeltaLog.write(spark,
      Seq(java.sql.Date.valueOf("2024-03-01")).toDF("d"), t, mode = "append")
    DeltaLog.write(spark,
      Seq(java.time.LocalDateTime.parse("2024-04-01T12:30:00")).toDF("d"),
      t, mode = "append")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.get("d").dataType == TimestampNTZType)
    val vals = DeltaLog.read(spark, t).as[java.time.LocalDateTime].collect().sorted
    assert(vals.toSeq == Seq(
      java.time.LocalDateTime.parse("2024-03-01T00:00:00"),
      java.time.LocalDateTime.parse("2024-04-01T12:30:00")))
  }

  test("explicit ALTER COLUMN TYPE widens in place; guards hold") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id INT, v STRING)
         |TBLPROPERTIES ('delta.enableTypeWidening'='true')""".stripMargin)
    DeltaLog.write(spark, Seq((7, "a")).toDF("id", "v"), t, mode = "append")
    val files = DeltaLog.snapshot(spark, t).files
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` ALTER COLUMN id TYPE BIGINT")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.get("id").dataType == LongType)
    assert(snap.files == files, "DDL widening must rewrite nothing")
    assert(snap.protocolJson.get.contains("typeWidening"))
    assert(snap.schema.get("id").metadata.contains("delta.typeChanges"))
    assert(DeltaLog.read(spark, t).select("id").as[Long].head() == 7L)
    // a long append now lands without evolution machinery
    DeltaLog.write(spark, Seq((9_000_000_000L, "b")).toDF("id", "v"), t, "append")
    assert(DeltaLog.read(spark, t).count() == 2L)
    // narrowing refuses; missing the gate property refuses
    val e = intercept[IllegalArgumentException](GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` ALTER COLUMN id TYPE INT"))
    assert(e.getMessage.contains("not a supported widening"), e.getMessage)
    val t2 = fresh()
    GraftSql.exec(spark, s"CREATE TABLE delta.`$t2` (id INT)")
    val e2 = intercept[IllegalArgumentException](GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t2` ALTER COLUMN id TYPE BIGINT"))
    assert(e2.getMessage.contains("enableTypeWidening"), e2.getMessage)
  }
}
