package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract runs as a
  * JVM function over the bytes; frame sampling is columnar arithmetic
  * over byte offsets.
  *
  * The decode step is a STUB by design (no image/audio codecs in this
  * environment): [[decodeStub]] derives deterministic fake dimensions
  * from an md5 of the payload. Everything around it — the binary column,
  * the struct-typed metadata, the UDF signature over `Array[Byte]`, the
  * per-row batch shape, and the offset sampling — is the real plumbing a
  * production decoder (JNI/codec UDF) would drop into.
  *
  * Scale notes: payload bytes never shuffle; features are extracted in
  * the scan stage and the (small) feature columns are what any
  * downstream groupBy/join moves. That is the core rule for 100 TB
  * multimodal tables: shuffle metadata, not media.
  */
object Multimodal {

  /** Fake image metadata produced by the stub decoder. */
  case class FakeImageMeta(width: Int, height: Int, format: String)

  /** The deterministic stand-in decode: dimensions from the payload md5
    * (shared by the UDF and mapPartitions paths so they agree exactly). */
  private def fakeDecode(digest: Array[Byte]): FakeImageMeta = {
    val hex = digest.take(4).map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex, 16)
    FakeImageMeta((64 + h % 1856).toInt, (64 + (h / 256) % 1016).toInt, "rgb8")
  }

  /** STUB decoder — stands in for a real image decode. Deterministic:
    * dimensions derive from the payload's md5, so the DuckDB oracle can
    * reproduce them exactly. A real implementation would parse the codec
    * header here; the signature (bytes in, typed struct out) would not
    * change. */
  val decodeStub = udf { bytes: Array[Byte] =>
    fakeDecode(java.security.MessageDigest.getInstance("MD5").digest(bytes))
  }

  case class Asset(doc_id: Long, payload: Array[Byte])
  case class Features(doc_id: Long, byte_size: Long, checksum: String,
      width: Int, height: Int, format: String)

  /** Batched extraction via mapPartitions — the Scala analogue of a
    * vectorized (mapInPandas-style) UDF: ONE decoder instance per
    * partition amortized over its whole batch, iterator-to-iterator so
    * nothing materializes. This is the shape a real codec (JNI handle,
    * model session) needs — per-row UDFs would re-init it every call.
    * Agrees with [[qFeatures]]'s expression path row for row
    * (MultimodalSpec). */
  def extractBatched(assets: org.apache.spark.sql.Dataset[Asset]): org.apache.spark.sql.Dataset[Features] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5") // per partition, not per row
      it.map { a =>
        md.reset()
        val digest = md.digest(a.payload)
        val meta = fakeDecode(digest)
        Features(a.doc_id, a.payload.length.toLong,
          digest.map(b => f"$b%02x").mkString, meta.width, meta.height, meta.format)
      }
    }
  }

  /** Feature extraction over binary payloads: size, checksum, decoded
    * dimensions (stub), and frame-offset sampling (one frame per KiB). */
  val qFeatures: QueryDef = QueryDef.sql(
    "q_multimodal_features",
    s"""SELECT doc_id,
       |  octet_length(encode(text)) AS byte_size,
       |  md5(text) AS checksum,
       |  CAST(64 + h % 1856 AS INT) AS width,
       |  CAST(64 + (h // 256) % 1016 AS INT) AS height,
       |  'rgb8' AS format,
       |  CAST(64 + h % 1856 AS DOUBLE) / CAST(64 + (h // 256) % 1016 AS INT) AS aspect_ratio,
       |  octet_length(encode(text)) // 1000 + 1 AS n_frames,
       |  array_to_string([ (i * 1000)::BIGINT for i in generate_series(0, octet_length(encode(text)) // 1000) ], ',') AS frame_offsets
       |FROM (SELECT doc_id, text, ${Portable.h32Sql("text")} AS h FROM documents)""".stripMargin) { (spark, dir) =>
    val assets = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    // The stub decode is pure md5 arithmetic, so the query path computes it
    // as codegen'd column expressions (md5 evaluated once, shared by
    // checksum and dimensions) — no ScalaUDF in the projection (asserted by
    // PlanSpec). [[decodeStub]]/[[extractBatched]] remain the documented
    // slots where a real codec (which IS opaque bytes-in, struct-out)
    // plugs in.
    val decoded = assets
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("byte_size"),
        md5(col("payload")).as("checksum"))
      .withColumn("h", conv(substring(col("checksum"), 1, 8), 16, 10).cast("long"))
      .withColumn("width", (lit(64) + col("h") % 1856).cast("int"))
      .withColumn("height", (lit(64) + expr("h div 256") % 1016).cast("int"))
    decoded.select(
      col("doc_id"), col("byte_size"), col("checksum"),
      col("width"), col("height"),
      lit("rgb8").as("format"),
      (col("width").cast("double") / col("height")).as("aspect_ratio"),
      (expr("byte_size div 1000") + 1).as("n_frames"),
      // CSV-joined, not ARRAY: the verification gate canonicalizes rows in
      // pandas, where an array cell is unhashable/unsortable. The sampling
      // itself is still columnar arithmetic over byte offsets.
      array_join(transform(sequence(lit(0L), expr("byte_size div 1000")), i => i * 1000), ",")
        .as("frame_offsets"))
  }

  /** Frame-level extraction: explode each payload into its sampled
    * frames (1 KiB stride) and compute per-frame features over the
    * SLICED bytes — binary substring is the real plumbing a video/audio
    * frame extractor runs on (seek + bounded read), and the explode
    * multiplies rows, not payload copies: each output row carries only
    * its 1 KiB slice and small metadata. The empty-payload edge is
    * guarded (one empty frame, not a descending sequence). */
  val qFrames: QueryDef = QueryDef.sql(
    "q_multimodal_frames",
    """SELECT doc_id, i AS frame_idx, i * 1000 AS frame_offset,
      |  length(substring(payload_hex, CAST(i * 2000 + 1 AS BIGINT), 2000)) // 2 AS frame_len,
      |  md5(lower(substring(payload_hex, CAST(i * 2000 + 1 AS BIGINT), 2000))) AS frame_md5
      |FROM (
      |  SELECT doc_id, payload_hex,
      |    unnest(generate_series(0::BIGINT, greatest((length(payload_hex) // 2 - 1) // 1000, 0)::BIGINT)) AS i
      |  FROM (SELECT doc_id, hex(encode(text)) AS payload_hex FROM documents))""".stripMargin) {
    (spark, dir) =>
      // frame identity = md5 of the slice's lowercase hex encoding (the
      // oracle engine cannot hash raw blobs; hex chars are ASCII so the
      // digest input is byte-identical across engines)
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .withColumn("byte_size", length(col("payload")).cast("long"))
        .withColumn("frame_idx",
          explode(sequence(lit(0L), greatest(lit(0L), expr("(byte_size - 1) div 1000")))))
        .withColumn("frame_bytes",
          expr("substring(payload, CAST(frame_idx * 1000 + 1 AS INT), 1000)"))
        .select(
          col("doc_id"), col("frame_idx"),
          (col("frame_idx") * 1000).as("frame_offset"),
          length(col("frame_bytes")).cast("long").as("frame_len"),
          md5(lower(hex(col("frame_bytes")))).as("frame_md5"))
  }

  val all: Seq[QueryDef] = Seq(qFeatures, qFrames)
}
