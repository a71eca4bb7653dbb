package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SQL DDL verbs over protocol tables: CREATE TABLE (metadata-only
  * commit 0 — the reference's DDL-first star schema,
  * /root/reference/databricks_DW/02_create_tables.sql:9-184), ALTER
  * TABLE ADD COLUMNS (the reference's own migration,
  * 02_create_tables.sql:187-189), and SET/UNSET TBLPROPERTIES. */
class DdlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-ddl-").toString + "/t"

  test("CREATE TABLE declares schema/partitioning/properties with zero data files") {
    val t = freshTable()
    val v = GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT, amount DECIMAL(12,2), city STRING)
         |PARTITIONED BY (city)
         |TBLPROPERTIES ('delta.appendOnly'='false', 'graft.owner'='ddl-spec')""".stripMargin)
      .collect()(0).getLong(0)
    assert(v == 0L)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.fileEntries.isEmpty)
    assert(snap.partitionColumns == Seq("city"))
    assert(snap.configuration("graft.owner") == "ddl-spec")
    assert(snap.schema.get.fieldNames.toSeq == Seq("id", "amount", "city"))
    assert(snap.schema.get("amount").dataType == DecimalType(12, 2))
    // an empty table reads as an empty frame with the declared schema
    val empty = DeltaLog.read(spark, t)
    assert(empty.count() == 0L)
    assert(empty.schema.fieldNames.toSeq == Seq("id", "amount", "city"))
    // a later append enforces the declared schema and keeps partitioning
    DeltaLog.write(spark,
      Seq((1L, BigDecimal("10.50"), "paris")).toDF("id", "amount", "city")
        .select(col("id"), col("amount").cast(DecimalType(12, 2)), col("city")),
      t, mode = "append")
    assert(DeltaLog.read(spark, t).count() == 1L)
    assert(DeltaLog.snapshot(spark, t).partitionColumns == Seq("city"))
    // and a wrong-typed append refuses
    val e = intercept[Exception] {
      DeltaLog.write(spark, Seq((2L, "oops", "lyon")).toDF("id", "amount", "city"),
        t, mode = "append")
    }
    assert(e.getMessage.contains("schema enforcement"), e.getMessage)
    // re-creating refuses
    val e2 = intercept[Exception] {
      DeltaLog.createTable(spark, t, new StructType().add("x", LongType))
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
  }

  test("CREATE TABLE with column mapping mints per-column ids and physical names") {
    val t = freshTable()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT, v STRING)
         |TBLPROPERTIES ('delta.columnMapping.mode'='name')""".stripMargin)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.columnMappingMode == "name")
    assert(snap.configuration("delta.columnMapping.maxColumnId") == "2")
    snap.schema.get.fields.foreach { f =>
      assert(f.metadata.getString("delta.columnMapping.physicalName")
        .startsWith("col-"), f.name)
    }
    // DML round-trips under logical names on the created mapped table
    DeltaLog.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t,
      mode = "append")
    DeltaLog.deleteWhere(spark, t, col("id") === 1L)
    assert(DeltaLog.read(spark, t).collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet == Set((2L, "b")))
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only, old files surface null") {
    val t = freshTable()
    DeltaLog.write(spark, Seq((1L, "a")).toDF("id", "v"), t)
    val v = GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` ADD COLUMNS (updated_at TIMESTAMP, score DOUBLE)")
      .collect()(0).getLong(0)
    assert(v == 1L)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.schema.get.fieldNames.toSeq == Seq("id", "v", "updated_at", "score"))
    // zero data files were touched by the evolution
    assert(snap.fileEntries == DeltaLog.snapshot(spark, t, Some(0L)).fileEntries)
    val row = DeltaLog.read(spark, t).collect()(0)
    assert(row.isNullAt(2) && row.isNullAt(3))
    // adding an existing column refuses
    val e = intercept[Exception] {
      DeltaLog.alterAddColumns(spark, t, new StructType().add("v", StringType))
    }
    assert(e.getMessage.contains("already present"), e.getMessage)
  }

  test("ADD COLUMNS on a name-mode table mints ids above maxColumnId") {
    val t = freshTable()
    DeltaLog.createTable(spark, t,
      new StructType().add("id", LongType).add("v", StringType),
      properties = Map("delta.columnMapping.mode" -> "name"))
    DeltaLog.write(spark, Seq((1L, "a")).toDF("id", "v"), t, mode = "append")
    DeltaLog.alterAddColumns(spark, t, new StructType().add("extra", LongType))
    val snap = DeltaLog.snapshot(spark, t)
    val f = snap.schema.get("extra")
    assert(f.metadata.getLong("delta.columnMapping.id") == 3L)
    assert(f.metadata.getString("delta.columnMapping.physicalName").startsWith("col-"))
    assert(snap.configuration("delta.columnMapping.maxColumnId") == "3")
    // appends with the new column land under its minted physical name
    DeltaLog.write(spark, Seq((2L, "b", 7L)).toDF("id", "v", "extra"), t,
      mode = "append")
    assert(DeltaLog.read(spark, t).where(col("extra") === 7L).count() == 1L)
  }

  test("SET/UNSET TBLPROPERTIES: live property changes writers enforce") {
    val t = freshTable()
    DeltaLog.write(spark, Seq((1L, "a")).toDF("id", "v"), t)
    GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` SET TBLPROPERTIES ('delta.appendOnly'='true', 'graft.x'='1')")
    assert(DeltaLog.snapshot(spark, t).configuration("delta.appendOnly") == "true")
    // the property takes effect on the very next commit
    val e = intercept[Exception] {
      DeltaLog.deleteWhere(spark, t, col("id") === 1L)
    }
    assert(e.getMessage.contains("appendOnly"), e.getMessage)
    GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` UNSET TBLPROPERTIES ('delta.appendOnly')")
    assert(!DeltaLog.snapshot(spark, t).configuration.contains("delta.appendOnly"))
    DeltaLog.deleteWhere(spark, t, col("id") === 1L)
    assert(DeltaLog.read(spark, t).count() == 0L)
    assert(DeltaLog.snapshot(spark, t).configuration("graft.x") == "1")
  }

  test("SET TBLPROPERTIES enables CDF mid-life: next DML writes change files") {
    val t = freshTable()
    DeltaLog.write(spark, (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v"), t)
    GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` SET TBLPROPERTIES ('delta.enableChangeDataFeed'='true')")
    DeltaLog.deleteWhere(spark, t, col("id") < 3L)
    val txt = new String(Files.readAllBytes(
      new java.io.File(t, f"_delta_log/${2L}%020d.json").toPath), "UTF-8")
    assert(txt.contains("\"cdc\""), txt)
    val got = DeltaLog.changesBetween(spark, t, 1, 2)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((0L, "delete"), (1L, "delete"), (2L, "delete")), got)
  }

  test("CREATE TABLE then streaming append: the DDL-first pipeline shape") {
    val t = freshTable()
    GraftSql.exec(spark, s"CREATE TABLE delta.`$t` (k BIGINT, v STRING)")
    // batch append via the exactly-once sink path works against the
    // pre-declared table (no special-casing of the 0-file snapshot)
    DeltaLog.write(spark, Seq((1L, "x")).toDF("k", "v"), t, mode = "append",
      txn = Some("ddl-stream" -> 0L))
    DeltaLog.write(spark, Seq((2L, "y")).toDF("k", "v"), t, mode = "append",
      txn = Some("ddl-stream" -> 1L))
    assert(DeltaLog.lastTxn(spark, t, "ddl-stream").contains(1L))
    assert(DeltaLog.read(spark, t).count() == 2L)
  }
}
