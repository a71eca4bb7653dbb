package graft

import graft.llm.Multimodal
import org.apache.spark.sql.functions._

/** The batched (mapPartitions) extractor and the expression/UDF path must
  * produce identical features — they are two physical strategies for the
  * same operator. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("mapPartitions batch extraction equals the expression path") {
    val assets = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[Multimodal.Asset]
    val batched = Multimodal.extractBatched(assets).toDF()
    val viaExpr = SparkEntry.queries("q_multimodal_features")(spark, sfDir)
      .select("doc_id", "byte_size", "checksum", "width", "height", "format")
    assert(batched.count() > 0)
    assert(viaExpr.exceptAll(batched).count() == 0)
    assert(batched.exceptAll(viaExpr).count() == 0)
  }
}
