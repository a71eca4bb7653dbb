package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract runs over the
  * bytes; frame sampling is columnar arithmetic over byte offsets.
  *
  * The header decode is REAL byte parsing — no codec needed: PNG
  * dimensions come from the IHDR chunk (fixed offsets, parsed with
  * `substring`/`conv` column expressions that stay inside codegen) and
  * JPEG dimensions from the SOF0 frame header, which sits after a
  * VARIABLE-length segment chain (APP0, COM, …) and so needs a walking
  * parser — that runs in the batched `mapPartitions` slot, the same
  * place a full pixel decoder (JNI codec handle, model session) would
  * plug in. Payload fixtures are built columnar from the `documents`
  * table (spec-compliant PNG/JFIF headers + the text as body), so the
  * DuckDB oracle can compute the expected dimensions from the same
  * fields and the decode is hash-gated end to end.
  *
  * Scale notes: payload bytes never shuffle; features are extracted in
  * the scan stage and the (small) feature columns are what any
  * downstream groupBy/join moves. That is the core rule for 100 TB
  * multimodal tables: shuffle metadata, not media.
  */
object Multimodal {

  // fixture dimensions derive from doc_id — the knob the payload
  // builder writes into the headers and the oracle recomputes directly
  private def widthOf(docId: Column): Column = (lit(64) + docId % 1856).cast("int")
  private def heightOf(docId: Column): Column = (lit(64) + (docId * 7) % 1016).cast("int")

  /** `n`-byte big-endian binary encoding of a non-negative int column. */
  private def beBytes(c: Column, n: Int): Column = unhex(lpad(hex(c), 2 * n, "0"))

  /** `n`-byte little-endian binary encoding (RIFF/WAV fields): the
    * big-endian hex's byte pairs re-concatenated in reverse order. */
  private def leBytes(c: Column, n: Int): Column = {
    val h = lpad(hex(c), 2 * n, "0")
    unhex(concat((n - 1 to 0 by -1).map(i => substring(h, 2 * i + 1, 2)): _*))
  }

  private val pngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
  /** PNG header length: 8 signature + 25 IHDR chunk (4 len + 4 tag +
    * 13 data + 4 crc). */
  val PngHeaderLen = 33

  /** Spec-layout PNG payload: signature, IHDR (width/height big-endian
    * at offsets 16/20, 8-bit RGB), then `body` bytes. The chunk CRC is
    * zeroed — computing CRC32 needs a scalar loop, and no header field
    * depends on it. */
  def pngPayload(docId: Column, body: Column): Column = concat(
    lit(pngSig),
    lit(Array[Byte](0, 0, 0, 13)), lit("IHDR").cast("binary"),
    beBytes(widthOf(docId), 4), beBytes(heightOf(docId), 4),
    lit(Array[Byte](8, 2, 0, 0, 0)),
    lit(Array[Byte](0, 0, 0, 0)),
    body.cast("binary"))

  /** JFIF payload whose SOF0 sits after a VARIABLE-length segment chain
    * — SOI, APP0/JFIF, a COM comment of `doc_id % 23` bytes, then SOF0
    * carrying height/width — so a correct decoder MUST walk segments by
    * their recorded lengths (fixed-offset peeking reads garbage). */
  def jpegPayload(docId: Column, body: Column): Column = {
    val comment = expr("repeat('a', CAST(doc_id % 23 AS INT))")
    concat(
      lit(Array(0xFF, 0xD8).map(_.toByte)),                       // SOI
      lit(Array(0xFF, 0xE0, 0x00, 0x10).map(_.toByte)),           // APP0, len 16
      lit("JFIF").cast("binary"),
      lit(Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)),             // v1.1, 1:1, no thumb
      lit(Array(0xFF, 0xFE).map(_.toByte)),                       // COM
      beBytes(length(comment) + 2, 2),
      comment.cast("binary"),
      lit(Array(0xFF, 0xC0, 0x00, 0x11, 0x08).map(_.toByte)),     // SOF0, len 17, 8-bit
      beBytes(heightOf(docId), 2), beBytes(widthOf(docId), 2),
      lit(Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)),    // 3 components
      body.cast("binary"))
  }

  // audio fixture knobs, mirrored by the oracle the same way the image
  // dimensions are: channel count and sample rate derive from doc_id
  private def channelsOf(docId: Column): Column = (lit(1) + docId % 2).cast("int")
  private def rateOf(docId: Column): Column = (lit(8000) * (lit(1) + docId % 3)).cast("int")

  /** Spec-layout RIFF/WAVE payload whose `fmt ` chunk hides behind a
    * VARIABLE-length LIST chunk — and that LIST's size is often ODD, so
    * a correct reader must apply RIFF's even-padding rule (chunks start
    * on even offsets; an odd-sized chunk is followed by one pad byte)
    * or every later field lands one byte off. 16-bit PCM; the `data`
    * chunk carries `body` verbatim (plus a final pad byte when odd,
    * excluded from the recorded size — readers must honor the size, not
    * the remaining bytes). */
  def wavPayload(docId: Column, body: Column): Column = {
    val listLen = (lit(5) + docId % 9).cast("int") // 5..13, odd sizes included
    val listPad = (listLen % 2).cast("int")
    val ch = channelsOf(docId)
    val rate = rateOf(docId)
    val data = body.cast("binary")
    val dataLen = length(data)
    val dataPad = (dataLen % 2).cast("int")
    val pad = lit(Array[Byte](0))
    val noPad = lit(Array.empty[Byte])
    val riffSize = lit(4) + (lit(8) + listLen + listPad) + lit(24) +
      (lit(8) + dataLen + dataPad)
    concat(
      lit("RIFF").cast("binary"), leBytes(riffSize, 4), lit("WAVE").cast("binary"),
      lit("LIST").cast("binary"), leBytes(listLen, 4),
      lit("INFO").cast("binary"),
      repeat(lit("x"), (lit(1) + docId % 9).cast("int")).cast("binary"), // listLen - 4
      when(listPad === 1, pad).otherwise(noPad),
      lit("fmt ").cast("binary"), leBytes(lit(16), 4),
      leBytes(lit(1), 2),                    // PCM
      leBytes(ch, 2),
      leBytes(rate, 4),
      leBytes(rate * ch * 2, 4),             // byte rate
      leBytes(ch * 2, 2),                    // block align
      leBytes(lit(16), 2),                   // bits per sample
      lit("data").cast("binary"), leBytes(dataLen, 4), data,
      when(dataPad === 1, pad).otherwise(noPad))
  }

  /** Parsed WAV fmt/data facts (-1s when undecodable). `dataLen` is the
    * chunk's RECORDED size — the trailing pad byte of an odd chunk is
    * not content. */
  case class WavMeta(channels: Int, sampleRate: Int, bitDepth: Int,
      dataStart: Int, dataLen: Int)

  /** RIFF chunk walker: skips unknown chunks by their recorded size plus
    * the even-padding byte, captures `fmt ` PCM fields (little-endian),
    * stops at `data`. Pure byte code, shared by the batched extractor
    * and the specs. */
  def parseWavHeader(b: Array[Byte]): WavMeta = {
    def u(i: Int) = b(i) & 0xFF
    def le2(i: Int) = u(i) | (u(i + 1) << 8)
    def le4(i: Int) = u(i) | (u(i + 1) << 8) | (u(i + 2) << 16) | (u(i + 3) << 24)
    def tag(i: Int) = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
    val bad = WavMeta(-1, -1, -1, -1, -1)
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return bad
    var i = 12
    var ch = -1; var rate = -1; var bits = -1
    while (i + 8 <= b.length) {
      val id = tag(i); val sz = le4(i + 4)
      // a recorded size >= 2^31 reads back negative: advancing by
      // 8 + sz + (sz & 1) would stall (sz = -8) or walk backwards —
      // undecodable input must degrade, never hang an executor
      if (sz < 0) return bad
      if (id == "fmt " && i + 24 <= b.length) {
        ch = le2(i + 10); rate = le4(i + 12); bits = le2(i + 22)
      } else if (id == "data") {
        return if (ch < 0 || i.toLong + 8 + sz > b.length) bad
        else WavMeta(ch, rate, bits, i + 8, sz)
      }
      // long arithmetic: i + 8 + sz can overflow Int for a near-2^31
      // recorded size even when sz itself is non-negative
      val next = i.toLong + 8 + sz + (sz & 1) // RIFF even-padding rule
      if (next > b.length) return bad // truncated chunk: nothing parseable beyond
      i = next.toInt
    }
    bad
  }

  /** Parsed header: format, width, height, and the offset where the
    * content body starts (-1 dims when undecodable). */
  case class HeaderMeta(format: String, width: Int, height: Int, bodyStart: Int)

  /** The real header parser — pure byte arithmetic, shared by the
    * batched extractor and the specs. PNG reads IHDR at fixed offsets;
    * JPEG walks the segment chain by each segment's recorded length
    * until a start-of-frame marker (C0–CF minus C4/C8/CC, covering
    * baseline AND progressive) and reads its height/width. */
  def parseHeader(b: Array[Byte]): HeaderMeta = {
    def u(i: Int) = b(i) & 0xFF
    def be2(i: Int) = (u(i) << 8) | u(i + 1)
    def be4(i: Int) = (u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    if (b.length >= PngHeaderLen && pngSig.indices.forall(i => b(i) == pngSig(i)))
      HeaderMeta("png", be4(16), be4(20), PngHeaderLen)
    else if (b.length >= 4 && u(0) == 0xFF && u(1) == 0xD8) {
      var i = 2
      while (i + 9 < b.length && u(i) == 0xFF) {
        val m = u(i + 1)
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
          return HeaderMeta("jpeg", be2(i + 7), be2(i + 5), i + 2 + be2(i + 2))
        i += 2 + be2(i + 2)
      }
      HeaderMeta("jpeg", -1, -1, -1)
    } else HeaderMeta("unknown", -1, -1, 0)
  }

  case class Asset(doc_id: Long, payload: Array[Byte])
  case class Features(doc_id: Long, byte_size: Long, checksum: String,
      width: Int, height: Int, format: String)

  /** Batched extraction via mapPartitions — the Scala analogue of a
    * vectorized (mapInPandas-style) UDF: ONE decoder/digest instance
    * per partition amortized over its whole batch, iterator-to-iterator
    * so nothing materializes. This is the slot a full pixel codec (JNI
    * handle, model session) occupies; today it runs [[parseHeader]] for
    * real dimensions plus an md5 of the content body. Agrees with
    * [[qFeatures]]'s expression path row for row (MultimodalSpec). */
  def extractBatched(assets: org.apache.spark.sql.Dataset[Asset]): org.apache.spark.sql.Dataset[Features] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5") // per partition, not per row
      it.map { a =>
        val meta = parseHeader(a.payload)
        md.reset()
        val body =
          if (meta.bodyStart <= 0) a.payload
          else java.util.Arrays.copyOfRange(a.payload, meta.bodyStart, a.payload.length)
        Features(a.doc_id, a.payload.length.toLong,
          md.digest(body).map(b => f"$b%02x").mkString,
          meta.width, meta.height, meta.format)
      }
    }
  }

  case class AudioFeatures(doc_id: Long, format: String, channels: Int,
      sample_rate: Int, bit_depth: Int, n_samples: Long, duration_ms: Long,
      data_md5: String)

  /** Batched WAV extraction — same decoder slot as [[extractBatched]]:
    * one digest per partition, iterator-to-iterator. Sample count and
    * duration are integer arithmetic over the chunk facts; the body
    * digest reads exactly `dataLen` bytes (a trailing RIFF pad byte must
    * not leak into content). */
  def extractAudioBatched(assets: org.apache.spark.sql.Dataset[Asset])
      : org.apache.spark.sql.Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val m = parseWavHeader(a.payload)
        if (m.channels < 0)
          AudioFeatures(a.doc_id, "unknown", -1, -1, -1, -1L, -1L, "")
        else {
          val frame = m.channels * (m.bitDepth / 8)
          val nSamples = if (frame > 0) m.dataLen.toLong / frame else -1L
          val durMs = if (m.sampleRate > 0) nSamples * 1000L / m.sampleRate else -1L
          md.reset()
          val body = java.util.Arrays.copyOfRange(
            a.payload, m.dataStart, m.dataStart + m.dataLen)
          AudioFeatures(a.doc_id, "wav", m.channels, m.sampleRate, m.bitDepth,
            nSamples, durMs, md.digest(body).map(b => f"$b%02x").mkString)
        }
      }
    }
  }

  /** Audio decode through the batched parser: every field below comes
    * from WALKING the RIFF chunk chain (variable-length LIST before
    * `fmt `, odd sizes forcing the even-padding rule) — the oracle
    * recomputes channels/rate from the doc_id knobs and the digest from
    * the text, so a mis-stepped walk or a pad byte leaking into the
    * data chunk hash-mismatches. */
  val qAudio: QueryDef = QueryDef.sql(
    "q_multimodal_audio",
    """SELECT doc_id, 'wav' AS format,
      |  CAST(1 + doc_id % 2 AS INT) AS channels,
      |  CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
      |  CAST(16 AS INT) AS bit_depth,
      |  octet_length(encode(text)) // (2 * (1 + doc_id % 2)) AS n_samples,
      |  octet_length(encode(text)) // (2 * (1 + doc_id % 2)) * 1000
      |    // (8000 * (1 + doc_id % 3)) AS duration_ms,
      |  md5(text) AS data_md5
      |FROM documents""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val assets = Tables.documents(spark, dir)
      .select(col("doc_id"),
        wavPayload(col("doc_id"), col("text")).as("payload"))
      .as[Asset]
    extractAudioBatched(assets).toDF()
  }

  /** Documents as PNG assets — shared fixture frame. */
  def pngAssets(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      pngPayload(col("doc_id"), col("text")).as("payload"))

  /** Feature extraction over binary payloads: size, content checksum,
    * REAL decoded dimensions (IHDR bytes via substring/conv — pure
    * codegen expressions, no UDF), and frame-offset sampling. */
  val qFeatures: QueryDef = QueryDef.sql(
    "q_multimodal_features",
    """SELECT doc_id,
      |  octet_length(encode(text)) + 33 AS byte_size,
      |  md5(text) AS checksum,
      |  CAST(64 + doc_id % 1856 AS INT) AS width,
      |  CAST(64 + (doc_id * 7) % 1016 AS INT) AS height,
      |  'png' AS format,
      |  CAST(64 + doc_id % 1856 AS DOUBLE) / CAST(64 + (doc_id * 7) % 1016 AS INT) AS aspect_ratio,
      |  (octet_length(encode(text)) + 33) // 1000 + 1 AS n_frames,
      |  array_to_string([ (i * 1000)::BIGINT for i in generate_series(0, (octet_length(encode(text)) + 33) // 1000) ], ',') AS frame_offsets
      |FROM documents""".stripMargin) { (spark, dir) =>
    // The dimensions are parsed FROM THE PAYLOAD BYTES (offsets 16/20 of
    // the IHDR chunk, big-endian), not recomputed from doc_id — the
    // oracle recomputes from doc_id, so a parser bug hash-mismatches.
    // All projection, zero UDFs (asserted by PlanSpec).
    val decoded = pngAssets(spark, dir)
      .withColumn("byte_size", length(col("payload")).cast("long"))
      .withColumn("width",
        conv(hex(substring(col("payload"), 17, 4)), 16, 10).cast("int"))
      .withColumn("height",
        conv(hex(substring(col("payload"), 21, 4)), 16, 10).cast("int"))
      .withColumn("format",
        when(hex(substring(col("payload"), 1, 8)) === "89504E470D0A1A0A", "png")
          .otherwise("unknown"))
      .withColumn("checksum",
        md5(substring(col("payload"), PngHeaderLen + 1, Int.MaxValue)))
    decoded.select(
      col("doc_id"), col("byte_size"), col("checksum"),
      col("width"), col("height"), col("format"),
      (col("width").cast("double") / col("height")).as("aspect_ratio"),
      (expr("byte_size div 1000") + 1).as("n_frames"),
      // CSV-joined, not ARRAY: the verification gate canonicalizes rows in
      // pandas, where an array cell is unhashable/unsortable. The sampling
      // itself is still columnar arithmetic over byte offsets.
      array_join(transform(sequence(lit(0L), expr("byte_size div 1000")), i => i * 1000), ",")
        .as("frame_offsets"))
  }

  /** Mixed-container decode through the BATCHED parser: even doc_ids
    * are PNG, odd are JFIF whose SOF0 hides behind a variable-length
    * comment segment — the walking decode no fixed-offset expression
    * can do. The oracle recomputes the dimensions each header carries,
    * so the segment walk itself is hash-gated. */
  val qDecode: QueryDef = QueryDef.sql(
    "q_multimodal_decode",
    """SELECT doc_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
      |  CAST(64 + doc_id % 1856 AS INT) AS width,
      |  CAST(64 + (doc_id * 7) % 1016 AS INT) AS height
      |FROM documents""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val assets = Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, pngPayload(col("doc_id"), col("text")))
          .otherwise(jpegPayload(col("doc_id"), col("text"))).as("payload"))
      .as[Asset]
    extractBatched(assets).toDF()
      .select("doc_id", "format", "width", "height")
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

  val all: Seq[QueryDef] = Seq(qFeatures, qDecode, qFrames, qAudio)
}
