package graft

import java.io.File
import java.nio.file.Files

import graft.sources.DeltaLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Read interop with the open Delta transaction-log protocol, against
  * hand-built `_delta_log` fixtures (JSON commits, partitioned layout,
  * parquet checkpoint + `_last_checkpoint`). */
class DeltaLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-delta-").toString + "/t"

  /** Drop a single-file parquet at `rel` under the table root. */
  private def writeDataFile(df: DataFrame, table: String, rel: String): Unit = {
    val tmp = Files.createTempDirectory("graft-delta-part-").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(table, rel)
    dest.getParentFile.mkdirs()
    Files.move(part.toPath, dest.toPath)
  }

  private def commit(table: String, v: Long, actions: Seq[String]): Unit = {
    val dir = new File(table, "_delta_log"); dir.mkdirs()
    Files.write(new File(dir, f"$v%020d.json").toPath,
      (actions.mkString("\n") + "\n").getBytes("UTF-8"))
  }

  private val xSchema = new StructType().add("x", "long")
  private def metaAction(schema: StructType, partCols: Seq[String] = Seq.empty) = {
    val esc = schema.json.replace("\\", "\\\\").replace("\"", "\\\"")
    val pc = partCols.map("\"" + _ + "\"").mkString("[", ",", "]")
    s"""{"metaData":{"id":"fixture","format":{"provider":"parquet","options":{}},"schemaString":"$esc","partitionColumns":$pc,"configuration":{},"createdTime":1700000000000}}"""
  }
  private def addAction(path: String) =
    s"""{"add":{"path":"$path","partitionValues":{},"size":1,"modificationTime":1700000000000,"dataChange":true}}"""
  private def removeAction(path: String) =
    s"""{"remove":{"path":"$path","deletionTimestamp":1700000001000,"dataChange":true}}"""

  test("replay of add/remove actions yields the live file set, with time travel") {
    val t = freshTable()
    writeDataFile(Seq(1L, 2L).toDF("x"), t, "part-0000-a.snappy.parquet")
    writeDataFile(Seq(3L).toDF("x"), t, "part-0001-b.snappy.parquet")
    writeDataFile(Seq(9L).toDF("x"), t, "part-0002-c.snappy.parquet")
    commit(t, 0, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaAction(xSchema),
      addAction("part-0000-a.snappy.parquet")))
    commit(t, 1, Seq(
      """{"commitInfo":{"operation":"WRITE"}}""",
      addAction("part-0001-b.snappy.parquet")))
    commit(t, 2, Seq( // overwrite: drop a, keep b, add c
      removeAction("part-0000-a.snappy.parquet"),
      addAction("part-0002-c.snappy.parquet")))

    assert(DeltaLog.listVersions(spark, t) == Seq(0L, 1L, 2L))
    assert(DeltaLog.read(spark, t).as[Long].collect().sorted.toSeq == Seq(3L, 9L))
    assert(DeltaLog.read(spark, t, Some(0)).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(DeltaLog.read(spark, t, Some(1)).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.version == 2 && snap.files.toSet ==
      Set("part-0001-b.snappy.parquet", "part-0002-c.snappy.parquet"))
    assert(snap.schema.contains(xSchema))
  }

  test("partitioned layout surfaces partition columns through basePath") {
    val t = freshTable()
    writeDataFile(Seq(1L).toDF("x"), t, "lang=en/part-0000.snappy.parquet")
    writeDataFile(Seq(2L).toDF("x"), t, "lang=fr/part-0001.snappy.parquet")
    commit(t, 0, Seq(
      metaAction(new StructType().add("x", "long").add("lang", "string"), Seq("lang")),
      addAction("lang=en/part-0000.snappy.parquet"),
      addAction("lang=fr/part-0001.snappy.parquet")))
    val df = DeltaLog.read(spark, t)
    assert(df.columns.toSet == Set("x", "lang"))
    assert(df.select("lang", "x").as[(String, Long)].collect().toSet ==
      Set(("en", 1L), ("fr", 2L)))
    assert(DeltaLog.snapshot(spark, t).partitionColumns == Seq("lang"))
    // partition filter prunes to one file (directory-level pruning)
    val pruned = df.where($"lang" === "en")
    assert(pruned.as[(Long, String)].collect().map(_._1).toSeq == Seq(1L))
  }

  test("checkpoint bounds replay: state from parquet + JSON suffix only") {
    val t = freshTable()
    writeDataFile(Seq(3L).toDF("x"), t, "part-0001-b.snappy.parquet")
    writeDataFile(Seq(9L).toDF("x"), t, "part-0002-c.snappy.parquet")
    writeDataFile(Seq(5L).toDF("x"), t, "part-0003-d.snappy.parquet")
    // versions 0..2 exist ONLY in the checkpoint (their JSON was vacuumed):
    // if the reader tried full JSON replay it would find nothing at v<=2
    val cpRows = Seq(
      (Some("part-0001-b.snappy.parquet"), None: Option[(String, Seq[String])]),
      (Some("part-0002-c.snappy.parquet"), None),
      (None, Some((xSchema.json, Seq.empty[String]))))
      .toDF("p", "m")
      .selectExpr("named_struct('path', p) AS add",
        "named_struct('schemaString', m._1, 'partitionColumns', m._2) AS metaData")
    val tmp = Files.createTempDirectory("graft-delta-cp-").toString
    cpRows.coalesce(1).write.mode("overwrite").parquet(tmp)
    val cpFile = new File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    val logDir = new File(t, "_delta_log"); logDir.mkdirs()
    Files.move(cpFile.toPath,
      new File(logDir, f"${2L}%020d.checkpoint.parquet").toPath)
    Files.write(new File(logDir, "_last_checkpoint").toPath,
      """{"version":2,"size":3}""".getBytes("UTF-8"))
    commit(t, 3, Seq( // JSON suffix after the checkpoint
      removeAction("part-0002-c.snappy.parquet"),
      addAction("part-0003-d.snappy.parquet")))

    assert(DeltaLog.read(spark, t).as[Long].collect().sorted.toSeq == Seq(3L, 5L))
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.version == 3 && snap.schema.contains(xSchema))
    // reading AT the checkpoint version needs no JSON at all
    assert(DeltaLog.read(spark, t, Some(2)).as[Long].collect().sorted.toSeq == Seq(3L, 9L))
  }

  test("empty table reads as empty frame with the declared schema") {
    val t = freshTable()
    commit(t, 0, Seq(metaAction(xSchema)))
    val df = DeltaLog.read(spark, t)
    assert(df.schema == xSchema && df.count() == 0)
  }
}
