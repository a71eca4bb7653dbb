package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** Column DEFAULT values (writer feature `allowColumnDefaults`):
  * defaults materialize at WRITE time for columns the insert does not
  * name; existing rows are never backfilled; explicit NULLs stay NULL.
  */
class ColumnDefaultsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-coldef-").toString + "/t"

  test("CREATE TABLE with DEFAULT: missing column fills, explicit values win") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t`
         |(id BIGINT, status STRING DEFAULT 'pending', score INT DEFAULT 10)""".stripMargin)
    // protocol carries the writer feature
    val proto = DeltaLog.snapshot(spark, t).protocolJson.get
    assert(proto.contains("allowColumnDefaults"), proto)
    // append naming only id: both defaults fill
    DeltaLog.write(spark, Seq(1L, 2L).toDF("id"), t, "append")
    // append naming status explicitly (incl. a NULL): explicit wins
    DeltaLog.write(spark,
      Seq((3L, "done"), (4L, null)).toDF("id", "status"), t, "append")
    val rows = DeltaLog.read(spark, t)
      .select("id", "status", "score").as[(Long, String, Int)]
      .collect().sortBy(_._1).toSeq
    assert(rows == Seq(
      (1L, "pending", 10), (2L, "pending", 10),
      (3L, "done", 10), (4L, null, 10)), rows.toString)
  }

  test("SET DEFAULT affects future writes only; DROP DEFAULT reverts to null") {
    val t = fresh()
    GraftSql.exec(spark, s"CREATE TABLE delta.`$t` (id BIGINT, v STRING)")
    DeltaLog.write(spark, Seq(1L).toDF("id"), t, "append")
    GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` ALTER COLUMN v SET DEFAULT 'filled'")
    assert(DeltaLog.snapshot(spark, t).protocolJson.get
      .contains("allowColumnDefaults"))
    DeltaLog.write(spark, Seq(2L).toDF("id"), t, "append")
    GraftSql.exec(spark, s"ALTER TABLE delta.`$t` ALTER COLUMN v DROP DEFAULT")
    DeltaLog.write(spark, Seq(3L).toDF("id"), t, "append")
    val rows = DeltaLog.read(spark, t).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    // row 1 predates the default: NOT backfilled
    assert(rows == Seq((1L, null), (2L, "filled"), (3L, null)), rows.toString)
  }

  test("non-literal defaults evaluate at write time; bad combos refuse") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (id BIGINT, tag STRING DEFAULT upper('ab'))""")
    DeltaLog.write(spark, Seq(1L).toDF("id"), t, "append")
    assert(DeltaLog.read(spark, t).select("tag").head.getString(0) == "AB")
    // DEFAULT on a generated column refuses
    val t2 = fresh()
    intercept[Exception] {
      GraftSql.exec(spark,
        s"""CREATE TABLE delta.`$t2`
           |(id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING)""".stripMargin)
      DeltaLog.alterColumnDefault(spark, t2, "id", Some("7"))
    }
    // a typo'd default expression refuses at DDL time
    val t3 = fresh()
    intercept[Exception] {
      GraftSql.exec(spark,
        s"CREATE TABLE delta.`$t3` (id BIGINT, v STRING DEFAULT nonsense((())")
    }
  }

  test("defaults compose with generated columns in one table") {
    val t = fresh()
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t`
         |(id BIGINT, twice BIGINT GENERATED ALWAYS AS (id * 2),
         | src STRING DEFAULT 'ingest')""".stripMargin)
    DeltaLog.write(spark, Seq(5L).toDF("id"), t, "append")
    val r = DeltaLog.read(spark, t).select("id", "twice", "src").head
    assert((r.getLong(0), r.getLong(1), r.getString(2)) == ((5L, 10L, "ingest")))
  }
}
