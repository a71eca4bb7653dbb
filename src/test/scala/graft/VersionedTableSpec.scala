package graft

import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** Time travel, history, copy-free restore, and vacuum over the
  * manifest-logged parquet table. */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("graft-vt-").toString + "/t"

  test("overwrite/append versions and VERSION AS OF reads") {
    val path = freshPath()
    assert(VersionedTable.latestVersion(spark, path).isEmpty)
    val v0 = VersionedTable.write(spark, Seq(1, 2, 3).toDF("x"), path)
    val v1 = VersionedTable.write(spark, Seq(4, 5).toDF("x"), path, "append")
    val v2 = VersionedTable.write(spark, Seq(9).toDF("x"), path) // overwrite
    assert((v0, v1, v2) == (0, 1, 2))
    assert(VersionedTable.read(spark, path).as[Int].collect().sorted.toSeq == Seq(9))
    assert(VersionedTable.read(spark, path, Some(1)).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3, 4, 5))
    assert(VersionedTable.read(spark, path, Some(0)).as[Int].collect().sorted.toSeq
      == Seq(1, 2, 3))
  }

  test("restore is copy-free and preserves history") {
    val path = freshPath()
    VersionedTable.write(spark, Seq(1, 2).toDF("x"), path)
    VersionedTable.write(spark, Seq(3).toDF("x"), path, "append")
    VersionedTable.write(spark, Seq(42).toDF("x"), path)
    val v3 = VersionedTable.restore(spark, path, 1)
    assert(v3 == 3)
    assert(VersionedTable.read(spark, path).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    val hist = VersionedTable.history(spark, path)
    assert(hist.map(_._1) == Seq(3, 2, 1, 0))
    assert(hist.head._2 == "restore(1)")
    // restore wrote no data files: version 3 references version 1's dirs
    assert(hist.head._3 == 2)
  }

  test("vacuum reclaims unreferenced data dirs but keeps shared ones") {
    val path = freshPath()
    VersionedTable.write(spark, Seq(1).toDF("x"), path) // v0: d=0
    VersionedTable.write(spark, Seq(2).toDF("x"), path, "append") // v1: d=0,d=1
    VersionedTable.write(spark, Seq(7).toDF("x"), path) // v2: d=2
    VersionedTable.write(spark, Seq(8).toDF("x"), path, "append") // v3: d=2,d=3
    VersionedTable.vacuum(spark, path, keepVersions = 2) // keep v2, v3
    // v2/v3 still read fine; d=0, d=1 are gone
    assert(VersionedTable.read(spark, path).as[Int].collect().sorted.toSeq == Seq(7, 8))
    assert(VersionedTable.read(spark, path, Some(2)).as[Int].collect().toSeq == Seq(7))
    assert(VersionedTable.history(spark, path).map(_._1) == Seq(3, 2))
    val root = new java.io.File(path)
    assert(!new java.io.File(root, "d=0").exists())
    assert(!new java.io.File(root, "d=1").exists())
    assert(new java.io.File(root, "d=2").exists())
  }

  test("re-vacuum with a larger retention tolerates already-deleted manifests") {
    val path = freshPath()
    (0 to 4).foreach(i => VersionedTable.write(spark, Seq(i).toDF("x"), path))
    VersionedTable.vacuum(spark, path, keepVersions = 1) // only v4 survives
    // the kept range [v1..v4] now has holes — must skip them, not throw
    VersionedTable.vacuum(spark, path, keepVersions = 4)
    assert(VersionedTable.read(spark, path).as[Int].collect().toSeq == Seq(4))
  }

  test("changes() yields the insert/delete delta between versions") {
    val path = freshPath()
    VersionedTable.write(spark, Seq(1, 2, 2, 3).toDF("x"), path)
    VersionedTable.write(spark, Seq(2, 3, 4).toDF("x"), path) // drop 1 and one 2, add 4
    val delta = VersionedTable.changes(spark, path, 0, 1)
      .as[(Int, String)].collect().sorted.toSeq
    assert(delta == Seq((1, "delete"), (2, "delete"), (4, "insert")))
  }

  test("streaming foreachBatch appends commit one version per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = freshPath()
    val input = MemoryStream[Int]
    input.addData(1, 2, 3)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-vt-ckpt-").toString
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        VersionedTable.write(batch.sparkSession, batch, path, "append"); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(VersionedTable.read(spark, path).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // a second run with new data commits a further version, old ones stay readable
    input.addData(4)
    val q2 = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        VersionedTable.write(batch.sparkSession, batch, path, "append"); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(VersionedTable.read(spark, path).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    assert(VersionedTable.read(spark, path, Some(0)).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("optimize compacts into a new version without disturbing history") {
    val path = freshPath()
    // many small appends -> many data dirs
    (1 to 5).foreach(i => VersionedTable.write(spark,
      Seq(i).toDF("x").repartition(3), path, "append"))
    val before = VersionedTable.read(spark, path).as[Int].collect().sorted.toSeq
    val v = VersionedTable.optimize(spark, path, targetFiles = 1)
    assert(VersionedTable.read(spark, path).as[Int].collect().sorted.toSeq == before)
    val hist = VersionedTable.history(spark, path)
    assert(hist.head == ((v, "optimize", 1)))
    // the compacted version reads from ONE dir; the pre-compaction
    // version is still time-travelable
    assert(VersionedTable.read(spark, path, Some(v - 1)).as[Int].collect().sorted.toSeq == before)
    val files = new java.io.File(path, s"d=$v").listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
  }

  test("appends may evolve the schema; merged reads surface the union") {
    val path = freshPath()
    VersionedTable.write(spark, Seq(1, 2).toDF("x"), path)
    VersionedTable.write(spark,
      Seq((3, "new")).toDF("x", "note"), path, "append")
    val merged = VersionedTable.read(spark, path, mergeSchema = true)
    assert(merged.columns.sorted.toSeq == Seq("note", "x"))
    val rows = merged.select(col("x"), col("note"))
      .as[(Int, Option[String])].collect().sortBy(_._1).toSeq
    assert(rows == Seq((1, None), (2, None), (3, Some("new"))))
    // time travel to before the evolution sees the old schema only
    assert(VersionedTable.read(spark, path, Some(0)).columns.toSeq == Seq("x"))
  }

  test("reads push filters and prune columns like any parquet scan") {
    val path = freshPath()
    VersionedTable.write(spark,
      Tables.orders(spark, sfDir), path)
    val df = VersionedTable.read(spark, path)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderpriority), EqualTo(o_orderpriority,1-URGENT)]")
      || plan.contains("EqualTo(o_orderpriority"), plan)
    assert(df.count() > 0)
  }
}
