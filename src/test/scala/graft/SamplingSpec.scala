package graft

import graft.llm.Sampling
import org.apache.spark.sql.functions._

/** The shuffle-shard training-export writer ([[graft.llm.Sampling
  * .writeShards]]): exactly one file per shard, deterministic content,
  * intra-file pseudorandom order matching the q_corpus_shuffle rank. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("writeShards: one file per shard, seeded order, lossless union") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("graft-shards-").toString
    Sampling.writeShards(docs, out, shards = 4, seed = "graft:shuffle:42")

    val dirs = Option(new java.io.File(out).listFiles()).toSeq.flatten
      .filter(_.getName.startsWith("shard="))
    assert(dirs.map(_.getName).sorted ==
      (0 until 4).map(i => s"shard=$i"), dirs.map(_.getName))
    // one exchange → one writing task per shard → ONE file per shard dir
    dirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName}: ${parts.length} files")
    }

    // lossless: reading all shards back reproduces the corpus
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq ==
      docs.select("doc_id").as[Long].collect().sorted.toSeq)

    // intra-file order = the seeded hash rank (what q_corpus_shuffle
    // declares): each file's doc_id sequence matches the key order
    val skey = graft.llm.Portable.h60(
      concat(col("doc_id").cast("string"), lit(":graft:shuffle:42")))
    dirs.foreach { d =>
      val inFile = spark.read.parquet(d.getAbsolutePath)
        .select("doc_id").as[Long].collect().toSeq // parquet row order
      val expected = docs
        .where((skey % 4) === d.getName.stripPrefix("shard=").toInt)
        .select(col("doc_id"), skey.as("k"))
        .orderBy(col("k"), col("doc_id"))
        .select("doc_id").as[Long].collect().toSeq
      assert(inFile == expected, s"${d.getName} order diverged")
    }

    // deterministic: a second export writes byte-identical shard contents
    val out2 = java.nio.file.Files.createTempDirectory("graft-shards2-").toString
    Sampling.writeShards(docs, out2, shards = 4, seed = "graft:shuffle:42")
    (0 until 4).foreach { i =>
      val a = spark.read.parquet(s"$out/shard=$i").select("doc_id")
        .as[Long].collect().toSeq
      val b = spark.read.parquet(s"$out2/shard=$i").select("doc_id")
        .as[Long].collect().toSeq
      assert(a == b, s"shard $i not reproducible")
    }
  }
}
