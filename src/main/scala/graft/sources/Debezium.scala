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
    * image are the caller's to convert (they are table-specific).
    *
    * Staged as three selects on purpose: `JsonToStructs` is a
    * codegen-fallback expression, and referencing one `from_json` from
    * several output columns in a single projection makes Catalyst evaluate
    * the parse once PER REFERENCING COLUMN (CollapseProject keeps the
    * multi-referenced alias, but a single wide select would inline it).
    * Parsing the envelope into one struct column first guarantees each
    * JSON document is parsed exactly twice (envelope + after image), not
    * 4–5 times. */
  def parseEnvelope(df: DataFrame, rawJson: Column, afterSchema: StructType): DataFrame = {
    val env = df.select(from_json(rawJson, envelopeSchema).as("env"))
    val after = env.select(
      from_json(col("env.payload.after"), afterSchema).as("after"),
      col("env.payload.op").as("cdc_operation"),
      timestamp_millis(col("env.payload.ts_ms")).as("cdc_timestamp"),
      col("env.payload.source.snapshot").as("cdc_snapshot"))
    val afterCols = afterSchema.fields.map(f => col(s"after.${f.name}").as(f.name))
    after.select(afterCols ++ Seq(
      col("cdc_operation"), col("cdc_timestamp"), col("cdc_snapshot")): _*)
  }

  /** Wrap a row image (already serialized as a JSON string) into a full
    * Debezium envelope string — the inverse of [[parseEnvelope]], used to
    * build deterministic test/bench fixtures without a Kafka broker.
    * JSON-string escaping: backslashes FIRST (so the quote escapes we add
    * next aren't double-escaped), then quotes, then the common control
    * chars (\n, \r, \t). Other control chars (<0x20) don't occur in
    * to_json/concat-built fixtures. */
  def wrapEnvelope(innerJson: Column, op: Column, tsMs: Column, table: String): Column = {
    val escaped = Seq("\\\\" -> "\\\\\\\\", "\"" -> "\\\\\"", "\n" -> "\\\\n",
      "\r" -> "\\\\r", "\t" -> "\\\\t")
      .foldLeft(innerJson) { case (c, (from, to)) => regexp_replace(c, from, to) }
    concat(
      lit("""{"payload":{"before":null,"after":""""),
      escaped,
      lit("""","source":{"version":"2.5.4","connector":"postgresql","name":"src","ts_ms":"""),
      tsMs.cast("string"),
      lit(s""","snapshot":"false","db":"app","schema":"public","table":"$table","txId":1,"lsn":1},"op":""""),
      op,
      lit("""","ts_ms":"""),
      tsMs.cast("string"),
      lit("}}"))
  }
}
