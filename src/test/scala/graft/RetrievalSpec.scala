package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Dedicated spec for the retrieval-family queries — r11 verdict asked
  * for a named golden test for `q_text_hard_negatives` (it shipped in
  * the round-11 snapshot with only the registry-wide QueriesSpec run)
  * plus an assertion that its plan is the shape the scaladoc claims:
  * broadcast seeds × corpus scan (BroadcastNestedLoopJoin — the exact
  * brute-force side), candidate-only anti-join, no cartesian product.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-computable fixture: 8 docs / 8 embeddings, 64-dim near-basis
    * vectors so every cosine is obvious on paper.
    *   v0=e1  v1=e2  v2=e3        (the three query seeds)
    *   v3=e1+e2  (cos .7071 to seeds 0 and 1)
    *   v4=e1     (cos 1.0 to seed 0)
    *   v5=e2     (cos 1.0 to seed 1)
    *   v6=e1+3·e4 (cos .3162 to seed 0)
    *   v7=e3     (cos 1.0 to seed 2)
    * Docs 3/4/5 are the ONLY lexical hits of the three fixed benchmark
    * queries, so they must be anti-joined away from the semantic side.
    */
  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft-retr-").toString
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      parts.foreach { case (i, v) => a(i) = v }
      a
    }
    val vecs = Seq(
      0L -> vec(0 -> 1f),
      1L -> vec(1 -> 1f),
      2L -> vec(2 -> 1f),
      3L -> vec(0 -> 1f, 1 -> 1f),
      4L -> vec(0 -> 1f),
      5L -> vec(1 -> 1f),
      6L -> vec(0 -> 1f, 3 -> 3f),
      7L -> vec(2 -> 1f))
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        vecs.map { case (id, v) => Row(id, v.toSeq, 0) }, 2),
      embSchema).write.parquet(s"$dir/embeddings.parquet")
    val docs = Seq(
      (0L, "alpha", "en", "web", 5L),
      (1L, "beta", "en", "web", 4L),
      (2L, "gamma", "en", "web", 5L),
      (3L, "scan fast column", "en", "web", 16L),
      (4L, "join merge hash", "en", "web", 15L),
      (5L, "stream batch window", "en", "web", 19L),
      (6L, "delta", "en", "web", 5L),
      (7L, "epsilon", "en", "web", 7L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("hard negatives: golden result on the hand-computed fixture") {
    val out = graft.llm.Retrieval.qHardNegatives.build(spark, fixtureDir)
      .select("qid", "doc_id", "neg_rnk", "cosine")
      .as[(String, Long, Int, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(r => (r._2, r._3)).toSeq).toMap
    // q_scan_perf (seed v0): semantic order v4(1.0) v3(.7071) v6(.3162)
    // then cos-0 docs by id; lexical hit doc 3 is REMOVED by the
    // anti-join even though it is the 2nd-nearest neighbor
    assert(out("q_scan_perf") ==
      Seq((4L, 1), (6L, 2), (1L, 3), (2L, 4), (5L, 5)), out("q_scan_perf"))
    // q_join_shape (seed v1): v5(1.0) v3(.7071) then zeros; lexical hit
    // doc 4 removed from the zero tail
    assert(out("q_join_shape") ==
      Seq((5L, 1), (3L, 2), (0L, 3), (2L, 4), (6L, 5)), out("q_join_shape"))
    // q_stream (seed v2): v7(1.0) then zeros; lexical hit doc 5 removed
    assert(out("q_stream") ==
      Seq((7L, 1), (0L, 2), (1L, 3), (3L, 4), (4L, 5)), out("q_stream"))

    // spot-check the cosines the ordering hinges on
    val cos = graft.llm.Retrieval.qHardNegatives.build(spark, fixtureDir)
      .filter($"qid" === "q_scan_perf")
      .select("doc_id", "cosine").as[(Long, Double)].collect().toMap
    assert(math.abs(cos(4L) - 1.0) < 1e-12, cos)
    assert(math.abs(cos(6L) - 1.0 / math.sqrt(10.0)) < 1e-12, cos)
  }

  test("hard negatives: plan is broadcast-NLJ scan + candidate anti-join") {
    val plan = graft.llm.Retrieval.qHardNegatives.build(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the exact brute-force semantic side: tiny seed frame broadcast
    // against the partition-parallel corpus scan (a non-equi join —
    // vec_id =!= seed_id — so it plans as BroadcastNestedLoopJoin)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    // the lexical candidates are anti-joined off the semantic
    // candidates — candidate-sized inputs, never the corpus
    assert(plan.contains("LeftAnti"), plan)
    // nothing all-pairs: no cartesian product anywhere
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("hard negatives: negatives are disjoint from lexical top-k at sf0.001") {
    val negs = graft.llm.Retrieval.qHardNegatives.build(spark, sfDir)
    val rows = negs.select("qid", "doc_id").as[(String, Long)].collect()
    assert(rows.length == 15, s"3 queries x 5 negatives, got ${rows.length}")
    // per query: exactly 5, all distinct
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length == 5 && rs.map(_._2).distinct.length == 5, (q, rs.toSeq))
    }
  }
}
