package graft.operators

import graft.{QueryDef, Tables}
import graft.sources.Debezium
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON operators — SURVEY.md §2.8 F-json: `get_json_object`, `from_json`
  * (flat and struct-in-struct Debezium envelope).
  *
  * Scale notes: JSON parsing is a narrow per-row projection — it pipelines
  * inside whole-stage codegen with the scan. The envelope roundtrip query
  * deliberately builds the envelope and reparses it in one stage: at
  * 100 TB the cost is one pass, no shuffle.
  */
object JsonOps {

  /** F-json: `get_json_object` path extraction over the events `props`
    * column (a JSON string like {"k": 42}). */
  val qJsonProps: QueryDef = QueryDef.sql(
    "q_json_props_extract",
    """SELECT event_id, event_type,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
      |  CAST(json_extract_string(props, '$.missing') AS BIGINT) AS prop_missing
      |FROM events""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir).select(
      col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("long").as("prop_k"),
      get_json_object(col("props"), "$.missing").cast("long").as("prop_missing"))
  }

  /** Per-table row-image schema for the synthetic orders CDC feed. */
  private val orderAfterSchema = StructType(Seq(
    StructField("order_id", LongType),
    StructField("cust_id", LongType),
    StructField("status", StringType),
    StructField("total_cents", LongType),
    StructField("created_ms", LongType)))

  /** F-json + P1/ST6: full Debezium envelope roundtrip — build the
    * two-level envelope (inner row image escaped into a JSON string field,
    * as Debezium emits it), then parse it back with the two-pass
    * `from_json` of the reference bronze pipeline
    * (bronze_pipeline.py:148-195): envelope parse → after-image parse →
    * flatten + epoch-ms→timestamp + CDC metadata columns. */
  val qDebeziumRoundtrip: QueryDef = QueryDef.sql(
    "q_bronze_debezium_parse",
    """WITH inner_json AS (
      |  SELECT
      |    '{"order_id":' || o_orderkey || ',"cust_id":' || o_custkey ||
      |    ',"status":"' || o_orderstatus || '","total_cents":' ||
      |    CAST(round(o_totalprice * 100) AS BIGINT) ||
      |    ',"created_ms":' || epoch_ms(o_orderdate) || '}' AS ij,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'c'
      |         WHEN o_orderkey % 3 = 1 THEN 'u' ELSE 'd' END AS op,
      |    epoch_ms(o_orderdate) + 1000 AS ts_ms
      |  FROM orders
      |), env AS (
      |  SELECT '{"payload":{"before":null,"after":"' || replace(ij, '"', '\"') ||
      |    '","source":{"version":"2.5.4","connector":"postgresql","name":"src","ts_ms":' ||
      |    ts_ms ||
      |    ',"snapshot":"false","db":"app","schema":"public","table":"orders","txId":1,"lsn":1},"op":"' ||
      |    op || '","ts_ms":' || ts_ms || '}}' AS raw_json
      |  FROM inner_json
      |), parsed AS (
      |  SELECT json_extract_string(raw_json, '$.payload.after') AS after_json,
      |    json_extract_string(raw_json, '$.payload.op') AS cdc_operation,
      |    CAST(json_extract_string(raw_json, '$.payload.ts_ms') AS BIGINT) AS cdc_ms,
      |    json_extract_string(raw_json, '$.payload.source.snapshot') AS cdc_snapshot
      |  FROM env
      |)
      |SELECT
      |  CAST(json_extract_string(after_json, '$.order_id') AS BIGINT) AS order_id,
      |  CAST(json_extract_string(after_json, '$.cust_id') AS BIGINT) AS cust_id,
      |  json_extract_string(after_json, '$.status') AS status,
      |  CAST(json_extract_string(after_json, '$.total_cents') AS BIGINT) AS total_cents,
      |  make_timestamp(CAST(json_extract_string(after_json, '$.created_ms') AS BIGINT) * 1000) AS created_at,
      |  cdc_operation,
      |  make_timestamp(cdc_ms * 1000) AS cdc_timestamp,
      |  cdc_snapshot
      |FROM parsed""".stripMargin) { (spark, dir) =>
    val orders = Tables.orders(spark, dir)
    val innerJson = concat(
      lit("""{"order_id":"""), col("o_orderkey").cast("string"),
      lit(""","cust_id":"""), col("o_custkey").cast("string"),
      lit(""","status":""""), col("o_orderstatus"),
      lit("""","total_cents":"""), round(col("o_totalprice") * 100).cast("long").cast("string"),
      lit(""","created_ms":"""), unix_millis(col("o_orderdate").cast("timestamp")).cast("string"),
      lit("}"))
    val op = when(col("o_orderkey") % 3 === 0, "c")
      .when(col("o_orderkey") % 3 === 1, "u").otherwise("d")
    val tsMs = unix_millis(col("o_orderdate").cast("timestamp")) + 1000L
    // spread (gated): a real Kafka topic has N partitions and the parse
    // runs one task per partition; the single-file parquet fixture would
    // otherwise funnel the (codegen-fallback) JSON parse into 1-2 tasks.
    // Spread the NARROW source columns, then synthesize the envelope
    // post-exchange — the shuffle carries 5 scalars per row, not the
    // fat JSON string it is about to become.
    val withEnvelope = graft.Tables.spread(orders.select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate")))
      .select(Debezium.wrapEnvelope(innerJson, op, tsMs, "orders").as("raw_json"))
    Debezium.parseEnvelope(withEnvelope, col("raw_json"), orderAfterSchema)
      .select(
        col("order_id"), col("cust_id"), col("status"), col("total_cents"),
        timestamp_millis(col("created_ms")).as("created_at"),
        col("cdc_operation"), col("cdc_timestamp"), col("cdc_snapshot"))
  }

  val all: Seq[QueryDef] = Seq(qJsonProps, qDebeziumRoundtrip)
}
