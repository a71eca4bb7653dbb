package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** DEEP CLONE ([[graft.sources.DeltaLog.cloneDeep]]): an independent
  * copy — bytes owned by the target, executor-side copies, DV sidecars
  * localized, immune to source vacuum/rewrites. */
class DeepCloneSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(n: String): String =
    Files.createTempDirectory(s"graft-deep-$n-").toString + "/t"

  test("deep clone is independent: source overwrite + vacuum cannot break it") {
    val src = fresh("src"); val tgt = fresh("tgt")
    DeltaLog.write(spark,
      spark.range(0, 500).select(col("id").as("k"), (col("id") % 5).as("v"))
        .repartition(3), src)
    DeltaLog.cloneDeep(spark, src, tgt)
    // no absolute references in the clone's log
    val raw = {
      val p = new org.apache.hadoop.fs.Path(tgt + "/_delta_log/00000000000000000000.json")
      val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    // commitInfo records the source as PROVENANCE (like delta-spark);
    // the add actions must not reference it
    val adds = raw.linesIterator.filter(_.contains("\"add\"")).toSeq
    assert(adds.nonEmpty && adds.forall(a => !a.contains(src)),
      "deep clone adds reference the source")
    assert(raw.contains("\"stats\""), "stats not carried")
    // destroy the source's original files entirely
    DeltaLog.write(spark, Seq((-1L, -1L)).toDF("k", "v"), src) // overwrite
    DeltaLog.vacuum(spark, src, retainMillis = 0L)
    // clone reads its own bytes
    assert(DeltaLog.read(spark, tgt).count() == 500L)
    assert(DeltaLog.read(spark, tgt).agg(sum("k")).as[Long].head() == 124750L)
    // and is first-class writable
    DeltaLog.deleteWhere(spark, tgt, col("v") === 0L)
    assert(DeltaLog.read(spark, tgt).count() == 400L)
  }

  test("deep clone at a past version; DV sidecars are copied and localized") {
    val src = fresh("dvsrc"); val tgt = fresh("dvtgt")
    DeltaLog.write(spark,
      spark.range(0, 300).select(col("id").as("k")).repartition(2), src)
    DeltaLog.deleteWhere(spark, src, col("k") % 3 === 0L) // DV delete, v1
    DeltaLog.write(spark,
      spark.range(1000, 1100).select(col("id").as("k")), src, "append") // v2

    // clone the DV'd intermediate version
    DeltaLog.cloneDeep(spark, src, tgt, versionAsOf = Some(1L))
    assert(DeltaLog.read(spark, tgt).count() == 200L)
    assert(DeltaLog.read(spark, tgt).where(col("k") % 3 === 0L).count() == 0L)
    // the DV mask survives the source's total destruction
    DeltaLog.write(spark, Seq(0L).toDF("k"), src)
    DeltaLog.vacuum(spark, src, retainMillis = 0L)
    assert(DeltaLog.read(spark, tgt).count() == 200L)
  }

  test("SQL: bare CLONE is deep (Databricks semantics); shallow still shallow") {
    val src = fresh("sqlsrc"); val deep = fresh("sqldeep"); val shal = fresh("sqlshal")
    DeltaLog.write(spark, spark.range(0, 50).select(col("id").as("k")), src)
    GraftSql.exec(spark, s"CREATE TABLE delta.`$deep` CLONE delta.`$src`")
    GraftSql.exec(spark, s"CREATE TABLE delta.`$shal` SHALLOW CLONE delta.`$src`")
    assert(DeltaLog.read(spark, deep).count() == 50L)
    assert(DeltaLog.read(spark, shal).count() == 50L)
    def log0(t: String): String = {
      val p = new org.apache.hadoop.fs.Path(t + "/_delta_log/00000000000000000000.json")
      val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    def adds(t: String): Seq[String] =
      log0(t).linesIterator.filter(_.contains("\"add\"")).toSeq
    assert(adds(deep).forall(a => !a.contains(src)))
    assert(adds(shal).forall(a => a.contains(src)))
  }

  test("deep clone OF a shallow clone localizes the absolute references") {
    val src = fresh("lsrc"); val shal = fresh("lshal"); val deep = fresh("ldeep")
    DeltaLog.write(spark, spark.range(0, 80).select(col("id").as("k")), src)
    DeltaLog.cloneShallow(spark, src, shal)
    DeltaLog.cloneDeep(spark, shal, deep)
    val raw = {
      val p = new org.apache.hadoop.fs.Path(deep + "/_delta_log/00000000000000000000.json")
      val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    val addLines = raw.linesIterator.filter(_.contains("\"add\"")).toSeq
    assert(addLines.nonEmpty &&
      addLines.forall(a => !a.contains(src) && !a.contains(shal)), addLines)
    // the shallow hop and the original both vanish; the deep copy lives
    DeltaLog.write(spark, Seq(0L).toDF("k"), src)
    DeltaLog.vacuum(spark, src, retainMillis = 0L)
    assert(DeltaLog.read(spark, deep).agg(sum("k")).as[Long].head() == 3160L)
  }
}
