package graft

import graft.llm.QualityClassifier
import org.apache.spark.sql.functions._

/** Model-based quality filtering ([[graft.llm.QualityClassifier]]):
  * a char-3-gram logistic classifier trained reference-vs-junk must
  * separate held-out documents, and its RELATIONAL scoring path
  * (explode → broadcast coefficient join → aggregate → sigmoid) must
  * reproduce the ml pipeline's probabilities — the model is just data.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Real documents as the "good" corpus; a deterministic corruption
    * (vowels and spaces stripped, so the char-gram distribution
    * collapses) as the "bad" corpus. */
  private lazy val docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text")).where(length(col("text")) > 50)
  private lazy val bad = docs
    .select((col("doc_id") + 1000000L).as("doc_id"),
      regexp_replace(col("text"), "[aeiou ]", "").as("text"))

  private def hashSplit(df: org.apache.spark.sql.DataFrame, train: Boolean) = {
    val h = pmod(hash(col("doc_id")), lit(5))
    df.where(if (train) h < 4 else h === 4)
  }

  test("classifier separates held-out reference from junk (accuracy >= 0.9)") {
    val model = QualityClassifier.train(
      hashSplit(docs, train = true), hashSplit(bad, train = true))
    val heldGood = QualityClassifier.score(model, hashSplit(docs, train = false))
    val heldBad = QualityClassifier.score(model, hashSplit(bad, train = false))
    val accGood = heldGood.where(col("quality_score") > 0.5).count().toDouble /
      heldGood.count()
    val accBad = heldBad.where(col("quality_score") < 0.5).count().toDouble /
      heldBad.count()
    assert(accGood >= 0.9, s"good-side accuracy $accGood")
    assert(accBad >= 0.9, s"bad-side accuracy $accBad")
    // gate keeps (mostly) the good side
    val mixed = hashSplit(docs, train = false)
      .unionByName(hashSplit(bad, train = false))
    val kept = QualityClassifier.gate(model, mixed, 0.5)
    assert(kept.count() > 0)
    assert(kept.where(col("doc_id") >= 1000000L).count().toDouble /
      kept.count() <= 0.1, "gate must pass through almost no junk")
  }

  test("relational scoring path reproduces the ml pipeline bit-for-bit-ish") {
    val model = QualityClassifier.train(
      hashSplit(docs, train = true), hashSplit(bad, train = true))
    val sample = hashSplit(docs, train = false).limit(50)
      .unionByName(hashSplit(bad, train = false).limit(50))
    val viaMl = QualityClassifier.score(model, sample)
      .select(col("doc_id"), col("quality_score").as("s_ml"))
    val viaSql = QualityClassifier.scoreRelational(model, sample, "doc_id")
      .select(col("doc_id"), col("quality_score").as("s_rel"))
    val joined = viaMl.join(viaSql, "doc_id")
      .select(abs(col("s_ml") - col("s_rel")).as("d"))
    val maxD = joined.agg(max("d")).head.getDouble(0)
    assert(maxD < 1e-6,
      s"relational and ml scores diverge: max |diff| = $maxD " +
        "(HashingTF bucket hash must equal pmod(hash(gram), F))")
  }

  test("featurization is UDF-free column arithmetic; the ngram column is exact") {
    val g = spark.sql("SELECT 1").select(
      QualityClassifier.charNgrams(lit("abcde"), 3).as("g"))
      .head.getSeq[String](0)
    assert(g == Seq("abc", "bcd", "cde"))
    val short = spark.sql("SELECT 1").select(
      QualityClassifier.charNgrams(lit("ab"), 3).as("g"))
      .head.getSeq[String](0)
    assert(short == Seq("ab"))
    val none = spark.sql("SELECT 1").select(
      QualityClassifier.charNgrams(lit(null).cast("string"), 3).as("g"))
      .head.getSeq[String](0)
    assert(none == Seq.empty)
    // the relational scorer's plan carries no ScalaUDF (the ml path's
    // HashingTF UDF is quarantined to score/train)
    val model = QualityClassifier.train(docs.limit(200), bad.limit(200))
    val plan = QualityClassifier
      .scoreRelational(model, docs.limit(10), "doc_id")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("UDF"), "relational scoring must stay UDF-free")
  }
}
