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
