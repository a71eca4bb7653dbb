package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium CDC envelope parsing — the reference's bronze-layer front door
  * (/root/reference/pipelines/bronze_pipeline.py:84-195).
  *
  * The envelope is a two-level JSON document: the outer `payload` struct
  * carries CDC metadata (`op`, `ts_ms`, `source.*`) and the row images
  * `before`/`after` as ESCAPED JSON STRINGS, which are parsed a second
  * time against the per-table payload schema. Works identically on batch
  * DataFrames and streaming micro-batches (the parse is a stateless narrow
  * projection — no shuffle, stays inside whole-stage codegen).
  */
object Debezium {

  /** Outer envelope: `before`/`after` kept as StringType on purpose — the
    * row-image schema varies per table and is applied in a second pass
    * (bronze_pipeline.py:84-103). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", StringType),
      StructField("after", StringType),
      StructField("source", StructType(Seq(
        StructField("version", StringType),
        StructField("connector", StringType),
        StructField("name", StringType),
        StructField("ts_ms", LongType),
        StructField("snapshot", StringType),
        StructField("db", StringType),
        StructField("schema", StringType),
        StructField("table", StringType),
        StructField("txId", LongType),
        StructField("lsn", LongType)))),
      StructField("op", StringType),
      StructField("ts_ms", LongType))))))

  /** CDC metadata columns every bronze table carries
    * (bronze_pipeline.py:185-187). */
  def cdcColumns(parsed: Column): Seq[Column] = Seq(
    parsed.getField("payload").getField("op").as("cdc_operation"),
    timestamp_millis(parsed.getField("payload").getField("ts_ms")).as("cdc_timestamp"),
    parsed.getField("payload").getField("source").getField("snapshot").as("cdc_snapshot"))

  /** Two-level parse: raw JSON string column → flattened `after` image
    * (per `afterSchema`) + CDC metadata. Epoch-millis fields in the after
    * image are the caller's to convert (they are table-specific). */
  def parseEnvelope(df: DataFrame, rawJson: Column, afterSchema: StructType): DataFrame = {
    val env = from_json(rawJson, envelopeSchema)
    val after = from_json(env.getField("payload").getField("after"), afterSchema)
    val afterCols = afterSchema.fields.map(f => after.getField(f.name).as(f.name))
    df.select(afterCols ++ cdcColumns(env): _*)
  }

  /** Wrap a row image (already serialized as a JSON string) into a full
    * Debezium envelope string — the inverse of [[parseEnvelope]], used to
    * build deterministic test/bench fixtures without a Kafka broker.
    * The inner JSON is escaped exactly as Debezium does (quote → \"). */
  def wrapEnvelope(innerJson: Column, op: Column, tsMs: Column, table: String): Column =
    concat(
      lit("""{"payload":{"before":null,"after":""""),
      regexp_replace(innerJson, "\"", "\\\\\""),
      lit("""","source":{"version":"2.5.4","connector":"postgresql","name":"src","ts_ms":"""),
      tsMs.cast("string"),
      lit(s""","snapshot":"false","db":"app","schema":"public","table":"$table","txId":1,"lsn":1},"op":""""),
      op,
      lit("""","ts_ms":"""),
      tsMs.cast("string"),
      lit("}}"))
}
