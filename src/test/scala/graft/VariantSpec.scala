package graft

import java.nio.file.Files

import graft.sources.DeltaLog
import org.apache.spark.sql.functions._

/** VARIANT columns on the Delta protocol (table feature `variantType`,
  * reader+writer): semi-structured data stored in Spark 4's binary
  * variant encoding, declared as `"variant"` in the schema string, with
  * the protocol upgraded on both sides so pre-feature readers refuse
  * rather than misparse the physical struct<metadata,value> layout. */
class VariantSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-variant-").toString + "/t"

  test("variant column round-trips the protocol; feature declared both sides") {
    val t = fresh()
    val df = Seq(
      (1L, """{"kind":"click","n":3,"tags":["a","b"]}"""),
      (2L, """{"kind":"view","n":7}"""),
      (3L, """{"kind":"click","nested":{"x":1.5}}""")).toDF("id", "raw")
      .select(col("id"), parse_json(col("raw")).as("props"))
    DeltaLog.write(spark, df, t)
    val proto = DeltaLog.snapshot(spark, t).protocolJson.get
    assert(proto.contains("variantType"), proto)
    assert(proto.contains("\"minReaderVersion\":3") &&
      proto.contains("\"minWriterVersion\":7"), proto)
    // the declared schema carries the variant type
    assert(DeltaLog.snapshot(spark, t).schema.get("props").dataType ==
      org.apache.spark.sql.types.VariantType)
    // read back and extract typed paths
    val back = DeltaLog.read(spark, t)
      .select(col("id"),
        variant_get(col("props"), "$.kind", "string").as("kind"),
        variant_get(col("props"), "$.n", "int").as("n"),
        variant_get(col("props"), "$.nested.x", "double").as("x"))
      .as[(Long, String, Option[Int], Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(back == Seq(
      (1L, "click", Some(3), None),
      (2L, "view", Some(7), None),
      (3L, "click", None, Some(1.5))), back.toString)
  }

  test("variant survives appends, checkpoints, and time travel") {
    val t = fresh()
    val mk = (id: Long, raw: String) => Seq((id, raw)).toDF("id", "raw")
      .select(col("id"), parse_json(col("raw")).as("props"))
    DeltaLog.write(spark, mk(1L, """{"v":1}"""), t)
    DeltaLog.write(spark, mk(2L, """{"v":2}"""), t, "append")
    DeltaLog.checkpoint(spark, t)
    DeltaLog.write(spark, mk(3L, """{"v":3}"""), t, "append")
    val vals = DeltaLog.read(spark, t)
      .select(variant_get(col("props"), "$.v", "long").as("v"))
      .as[Long].collect().sorted.toSeq
    assert(vals == Seq(1L, 2L, 3L))
    assert(DeltaLog.read(spark, t, Some(0L)).count() == 1L)
    // the upgrade happened ONCE: later commits carry no protocol action
    val f = new org.apache.hadoop.fs.Path(t + "/_delta_log/00000000000000000002.json")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = f.open(new org.apache.hadoop.fs.Path(
      t + "/_delta_log/00000000000000000002.json"))
    val raw = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(!raw.contains("\"protocol\""), raw)
  }
}
