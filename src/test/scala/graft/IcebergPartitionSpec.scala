package graft

import java.nio.file.Files

import graft.sources.{IcebergPartition, IcebergTable}
import org.apache.spark.sql.functions._

/** Iceberg hidden partitioning ([[graft.sources.IcebergPartition]]):
  * spec-vector bucket hashing, literal≡column transform parity, the
  * partitioned write/read round trip, and manifest-tuple pruning. */
class IcebergPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-icepart-").toString + "/t"

  test("bucket hash matches the spec's published vectors (Appendix B)") {
    import IcebergPartition._
    // int and long hash identically (both as little-endian longs)
    assert(hashLong(34L) == 2017239379, s"long 34 -> ${hashLong(34L)}")
    assert(murmur3("iceberg".getBytes("UTF-8")) == 1210000089,
      s"'iceberg' -> ${murmur3("iceberg".getBytes("UTF-8"))}")
    val days = java.time.LocalDate.parse("2017-11-16").toEpochDay
    assert(hashLong(days) == -653330422, s"date 2017-11-16 -> ${hashLong(days)}")
    val micros = java.time.Instant.parse("2017-11-16T22:31:08Z")
      .getEpochSecond * 1000000L
    assert(hashLong(micros) == -2047944441, s"ts -> ${hashLong(micros)}")
    // bucket index: non-negative, stable
    assert(bucketOf(hashLong(34L), 16) == (2017239379 & Int.MaxValue) % 16)
  }

  test("transform columns agree with the literal path on every row") {
    val df = spark.range(-50, 50).select(
      col("id").cast("int").as("i"),
      (col("id") * 977L).as("l"),
      concat(lit("v"), col("id")).as("s"),
      timestamp_seconds(col("id") * 100000L).as("ts"))
      .withColumn("d", col("ts").cast("date"))
    val cases: Seq[(String, String)] = Seq(
      "i" -> "bucket[7]", "l" -> "bucket[5]", "s" -> "bucket[4]",
      "ts" -> "bucket[3]",
      "i" -> "truncate[10]", "l" -> "truncate[1000]", "s" -> "truncate[2]",
      "ts" -> "year", "ts" -> "month", "ts" -> "day", "ts" -> "hour",
      "d" -> "year", "d" -> "month", "d" -> "day",
      "i" -> "identity", "s" -> "identity")
    cases.foreach { case (src, tname) =>
      val t = IcebergPartition.parseTransform(tname)
      val srcType = df.schema(src).dataType
      val rows = df.select(col(src),
        IcebergPartition.column(t, col(src), srcType).as("p")).collect()
      rows.foreach { r =>
        val expect = IcebergPartition.applyLiteral(t, r.get(0), srcType)
        assert(r.get(1) == expect,
          s"$src $tname: value ${r.get(0)} column=${r.get(1)} literal=$expect")
      }
    }
  }

  test("truncate floors negatives per spec") {
    assert(IcebergPartition.applyLiteral(
      IcebergPartition.Truncate(10), -1, org.apache.spark.sql.types.IntegerType) == -10)
    assert(IcebergPartition.applyLiteral(
      IcebergPartition.Truncate(3), "abcde", org.apache.spark.sql.types.StringType) == "abc")
  }

  test("partitioned write/read round trip; appends adopt the spec") {
    val t = fresh()
    val ev = Tables.events(spark, sfDir)
    val (h1, h2) = (ev.where(col("event_id") % 2 === 0),
      ev.where(col("event_id") % 2 =!= 0))
    IcebergTable.writeAppend(spark, h1, t,
      partition = Seq("user_id" -> "bucket[4]", "ts" -> "day"))
    // second append declares nothing — it must ADOPT the table's spec
    IcebergTable.writeAppend(spark, h2, t)
    val st = IcebergTable.state(spark, t)
    assert(st.specFields.map(f => f.source -> f.transform.name) ==
      Seq("user_id" -> "bucket[4]", "ts" -> "day"))
    assert(st.partitionTuples.size == st.dataFiles.size)
    assert(st.partitionTuples.forall(_.isDefined),
      "every data file must carry its manifest partition tuple")
    val back = IcebergTable.read(spark, t)
    assert(back.count() == ev.count())
    val (a, b) = (
      back.agg(sum("event_id"), sum(col("value").cast("decimal(38,10)"))).head(),
      ev.agg(sum("event_id"), sum(col("value").cast("decimal(38,10)"))).head())
    assert(a == b, s"$a vs $b")
    // a conflicting spec refuses
    intercept[IllegalArgumentException] {
      IcebergTable.writeAppend(spark, h1, t,
        partition = Seq("user_id" -> "bucket[8]"))
    }
  }

  test("manifest tuples prune data files; readPruned stays exact") {
    val t = fresh()
    val ev = Tables.events(spark, sfDir)
    IcebergTable.writeAppend(spark, ev, t,
      partition = Seq("user_id" -> "bucket[4]", "ts" -> "day"))
    val st = IcebergTable.state(spark, t)
    assert(st.dataFiles.size > 4, s"fixture too narrow: ${st.dataFiles.size}")

    // bucket equality prunes to ~1/4 of the files
    val keyPred = col("user_id") === 7L
    val pk = IcebergTable.pruneState(spark, st, keyPred)
    assert(pk.dataFiles.size < st.dataFiles.size,
      s"bucket pruning kept everything (${st.dataFiles.size})")
    assert(IcebergTable.readPruned(spark, t, keyPred).count() ==
      IcebergTable.read(spark, t).where(keyPred).count())

    // day range prunes and the residual filter keeps exactness
    val lo = ev.agg(min("ts")).head().getTimestamp(0).toInstant
    val cut = java.sql.Timestamp.from(lo.plusSeconds(3 * 86400))
    val tsPred = col("ts") >= lit(cut)
    val pt = IcebergTable.pruneState(spark, st, tsPred)
    assert(pt.dataFiles.size < st.dataFiles.size,
      s"day pruning kept everything (${st.dataFiles.size})")
    val got = IcebergTable.readPruned(spark, t, tsPred)
      .agg(count(lit(1)), sum("event_id")).head()
    val want = IcebergTable.read(spark, t).where(tsPred)
      .agg(count(lit(1)), sum("event_id")).head()
    assert(got == want, s"$got vs $want")

    // conjunction prunes along BOTH fields
    val both = IcebergTable.pruneState(spark, st, keyPred && tsPred)
    assert(both.dataFiles.size <= math.min(pk.dataFiles.size, pt.dataFiles.size))

    // an unhandled predicate shape never prunes (kept conservative)
    val odd = IcebergTable.pruneState(spark, st, col("user_id") % 2 === 1)
    assert(odd.dataFiles.size == st.dataFiles.size)
  }

  test("pruned reads compose with merge-on-read deletes") {
    val t = fresh()
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts")
    IcebergTable.writeAppend(spark, ev, t,
      partition = Seq("user_id" -> "bucket[4]"))
    IcebergTable.deleteWhere(spark, t, col("event_id") % 5 === 0)
    val pred = col("user_id") === 7L
    val got = IcebergTable.readPruned(spark, t, pred)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    val want = ev.where(pred && col("event_id") % 5 =!= 0)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    assert(got == want)
  }
}
