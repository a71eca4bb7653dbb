package graft

import graft.llm.Multimodal
import org.apache.spark.sql.functions._

/** The batched (mapPartitions) extractor and the expression path must
  * produce identical features — two physical strategies for the same
  * operator — and the header parser must decode exactly the dimensions
  * the payload builders wrote, including a JPEG whose SOF0 hides
  * behind variable-length segments. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions batch extraction equals the expression path") {
    val assets = Multimodal.pngAssets(spark, sfDir).as[Multimodal.Asset]
    val batched = Multimodal.extractBatched(assets).toDF()
    val viaExpr = SparkEntry.queries("q_multimodal_features")(spark, sfDir)
      .select("doc_id", "byte_size", "checksum", "width", "height", "format")
    assert(batched.count() > 0)
    assert(viaExpr.exceptAll(batched).count() == 0)
    assert(batched.exceptAll(viaExpr).count() == 0)
  }

  test("PNG parse reads IHDR; JPEG parse WALKS segments to SOF0") {
    // hand-rolled payloads, no Spark: the parser is plain byte code
    def be2(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be4(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    val png = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte) ++
      Array[Byte](0, 0, 0, 13) ++ "IHDR".getBytes ++ be4(640) ++ be4(480) ++
      Array[Byte](8, 2, 0, 0, 0) ++ Array[Byte](0, 0, 0, 0) ++ "body".getBytes
    val m = Multimodal.parseHeader(png)
    assert((m.format, m.width, m.height) == ("png", 640, 480))
    assert(new String(png.drop(m.bodyStart)) == "body")

    // JPEG: APP0 (16) then TWO comment segments of different lengths
    // before SOF0 — fixed-offset peeking would misread
    def seg(marker: Int, content: Array[Byte]) =
      Array(0xFF.toByte, marker.toByte) ++ be2(content.length + 2) ++ content
    val jpeg = Array(0xFF, 0xD8).map(_.toByte) ++
      seg(0xE0, "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)) ++
      seg(0xFE, "a short comment".getBytes) ++
      seg(0xFE, ("x" * 200).getBytes) ++
      seg(0xC0, Array[Byte](8) ++ be2(1080) ++ be2(1920) ++
        Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)) ++
      "trailer".getBytes
    val j = Multimodal.parseHeader(jpeg)
    assert((j.format, j.width, j.height) == ("jpeg", 1920, 1080))
    assert(new String(jpeg.drop(j.bodyStart)) == "trailer")

    // undecodable input degrades, never throws
    assert(Multimodal.parseHeader("not an image".getBytes).format == "unknown")
    assert(Multimodal.parseHeader(Array(0xFF, 0xD8, 0x00).map(_.toByte)).width == -1)
  }

  test("WAV parse walks LIST-before-fmt chunks with the even-padding rule") {
    def le2(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le4(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, content: Array[Byte]) =
      id.getBytes ++ le4(content.length) ++ content ++
        (if (content.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def fmt(ch: Int, rate: Int, bits: Int) =
      le2(1) ++ le2(ch) ++ le4(rate) ++ le4(rate * ch * bits / 8) ++
        le2(ch * bits / 8) ++ le2(bits)
    // ODD-size LIST (7) before fmt: a walker without the pad rule lands
    // one byte off and never finds `fmt `
    val body = "0123456789abc".getBytes // odd length too
    val inner = chunk("LIST", "INFOxxx".getBytes) ++
      chunk("fmt ", fmt(2, 16000, 16)) ++ chunk("data", body)
    val wav = "RIFF".getBytes ++ le4(4 + inner.length) ++ "WAVE".getBytes ++ inner
    val m = Multimodal.parseWavHeader(wav)
    assert((m.channels, m.sampleRate, m.bitDepth, m.dataLen) == (2, 16000, 16, 13))
    assert(new String(wav.slice(m.dataStart, m.dataStart + m.dataLen)) == "0123456789abc")
    // the recorded size, not the remaining bytes, bounds the data chunk:
    // the final pad byte is not content
    assert(wav.length == m.dataStart + m.dataLen + 1)

    // undecodable inputs degrade, never throw
    assert(Multimodal.parseWavHeader("RIFFxxxxNOPE".getBytes).channels == -1)
    assert(Multimodal.parseWavHeader(Array[Byte](1, 2, 3)).channels == -1)
    // data before any fmt: refused (fields would be garbage)
    val orphan = "RIFF".getBytes ++ le4(16) ++ "WAVE".getBytes ++ chunk("data", body)
    assert(Multimodal.parseWavHeader(orphan).channels == -1)

    // hostile recorded sizes: 0xFFFFFFF8 reads back as le4 = -8, which
    // would advance the walker by ZERO bytes (infinite loop) without the
    // negative-size guard; 0x7FFFFFF0 is positive but i+8+sz overflows
    // Int — both must degrade to -1, never hang or throw
    def hostile(sz: Int) =
      "RIFF".getBytes ++ le4(100) ++ "WAVE".getBytes ++
        "JUNK".getBytes ++ le4(sz) ++ new Array[Byte](16)
    assert(Multimodal.parseWavHeader(hostile(0xFFFFFFF8)).channels == -1)
    assert(Multimodal.parseWavHeader(hostile(0x7FFFFFF0)).channels == -1)
    // a negative recorded size on the data chunk itself: refused too
    val negData = "RIFF".getBytes ++ le4(60) ++ "WAVE".getBytes ++
      chunk("fmt ", fmt(1, 8000, 16)) ++
      ("data".getBytes ++ le4(0xFFFFFFF8) ++ body)
    assert(Multimodal.parseWavHeader(negData).channels == -1)
  }

  test("columnar WAV builder round-trips through the batched extractor") {
    val feats = SparkEntry.queries("q_multimodal_audio")(spark, sfDir)
      .orderBy("doc_id").limit(64).collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "wav", s"doc $id format")
      assert(r.getInt(2) == (1 + id % 2).toInt, s"doc $id channels")
      assert(r.getInt(3) == (8000 * (1 + id % 3)).toInt, s"doc $id rate")
      assert(r.getInt(4) == 16, s"doc $id bits")
      assert(r.getLong(5) >= 0 && r.getLong(6) >= 0, s"doc $id counts")
    }
  }

  test("columnar payload builders emit headers the parser round-trips") {
    val rows = Tables.documents(spark, sfDir).limit(50)
      .select(col("doc_id"),
        Multimodal.pngPayload(col("doc_id"), col("text")).as("png"),
        Multimodal.jpegPayload(col("doc_id"), col("text")).as("jpeg"),
        length(col("text")).as("tlen"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = (64 + id % 1856).toInt; val h = (64 + (id * 7) % 1016).toInt
      val p = Multimodal.parseHeader(r.getAs[Array[Byte]](1))
      assert((p.format, p.width, p.height) == ("png", w, h), s"doc $id png")
      val j = Multimodal.parseHeader(r.getAs[Array[Byte]](2))
      assert((j.format, j.width, j.height) == ("jpeg", w, h), s"doc $id jpeg")
      // both carry the full text as body
      assert(r.getAs[Array[Byte]](1).length - Multimodal.PngHeaderLen == r.getInt(3))
    }
  }
}
