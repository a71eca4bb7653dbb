package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._

/** Distributed BPE ([[graft.llm.Bpe]]): the Sennrich golden example,
  * the left-to-right non-overlap scan law, train→encode round-trip,
  * and partitioning determinism. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("Sennrich golden corpus learns the published first merges") {
    // the worked example from the BPE paper (freqs via repetition):
    // low x5, lower x2, newest x6, widest x3
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = words.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val merges = Bpe.train(docs, col("text"), k = 4, minCount = 2L)
    // published sequence: (e,s)->es x9, (es,t)->est x9, (est,</w>) x9,
    // then (l,o) x7
    assert(merges.map(m => (m.a, m.b)) == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")), merges)
    // encode under the learned table
    val enc = Bpe.encodeWord(col("w"), merges)
    val got = Seq("lowest", "newer").toDF("w").select(enc.as("t"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(
      Seq("lo", "w", "est</w>"),
      Seq("n", "e", "w", "e", "r", "</w>")), got)
  }

  test("merge scan is left-to-right non-overlapping: [a,a,a] -> [aa, a]") {
    val merges = Seq(Bpe.Merge("a", "a", 0))
    val got = Seq("aaa", "aaaa", "aa").toDF("w")
      .select(col("w"), Bpe.encodeWord(col("w"), merges).as("t"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("aaa") == Seq("aa", "a", "</w>"), got)
    assert(got("aaaa") == Seq("aa", "aa", "</w>"), got)
    assert(got("aa") == Seq("aa", "</w>"), got)
  }

  test("driver fast path and distributed rounds learn identical merge tables") {
    // same semantics, two physical paths: driverVocabMax = 0 forces the
    // distributed per-round aggregation; the default collects the vocab
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val golden = words.grouped(4).map(_.mkString(" ")).toSeq.toDF("text")
    val gLocal = Bpe.train(golden, col("text"), k = 4, minCount = 2L)
    val gDist = Bpe.train(golden, col("text"), k = 4, minCount = 2L,
      driverVocabMax = 0)
    assert(gLocal == gDist, s"$gLocal vs $gDist")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val local = Bpe.train(docs, col("text"), k = 6)
    val dist = Bpe.train(docs, col("text"), k = 6, driverVocabMax = 0)
    assert(local == dist, s"$local vs $dist")
  }

  test("encode round-trips: concatenated tokens reproduce each word; stats deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = Bpe.train(docs, col("text"), k = 8)
    assert(merges.size == 8, merges)
    // every token sequence concatenates back to word + sentinel
    val words = docs.select(explode(graft.llm.Portable.tokens(col("text"))).as("w"))
      .distinct()
    val bad = words
      .select(col("w"), concat_ws("", Bpe.encodeWord(col("w"), merges)).as("j"))
      .where(col("j") =!= concat(col("w"), lit("</w>"))).count()
    assert(bad == 0L)
    // doc-level stats identical across partitionings
    val a = Bpe.encodeStats(docs.repartition(1), col("text"), merges)
      .orderBy("doc_id").collect().toSeq
    val b = Bpe.encodeStats(docs.repartition(7), col("text"), merges)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // tokens never exceed characters (merges only shrink)
    val over = Bpe.encodeStats(docs, col("text"), merges)
      .where(col("n_tokens") > col("n_chars") + 1).count()
    assert(over == 0L)
  }

  test("q_text_bpe_tokens matches the committed golden fixture (hash gate)") {
    // The one query DuckDB cannot oracle (the merge fold is not SQL-
    // expressible): its gate is this golden parquet, generated ONCE
    // from the Sennrich-spec'd path at sf0.001 and committed. Any
    // change to tokenizer behavior — merge order, tie-breaks, sentinel
    // handling, per-doc md5 — mismatches here exactly like a DuckDB
    // hash gate would.
    val url = getClass.getResource("/golden/bpe_tokens_sf0001.parquet")
    assert(url != null, "golden fixture missing from test resources")
    val golden = spark.read.parquet(url.getPath)
    val live = SparkEntry.queries("q_text_bpe_tokens")(spark, sfDir)
      .select(golden.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      .select(golden.schema.fields.map(f =>
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
    assert(golden.count() == 500L)
    assert(live.count() == golden.count())
    assert(live.exceptAll(golden).count() == 0L, "live output not in golden")
    assert(golden.exceptAll(live).count() == 0L, "golden rows missing from live")
  }
}
