package graft.llm

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality classifier — the CCNet / GPT-3-family
  * "quality filter": train a linear classifier to distinguish a trusted
  * reference corpus ("good": wiki-like, curated) from raw crawl
  * ("bad"), then keep raw documents the model scores reference-like.
  * (CCNet, Wenzek et al. 2019; GPT-3 appendix A — both public.)
  *
  * Spark-first shape:
  *  - Featurization is pure column arithmetic: char-3-gram sliding
  *    window (`transform(sequence(...))` + `Column.substr`) hashed to
  *    2^15 buckets with the SQL `hash` function — no UDF. The ml
  *    pipeline receives the PRE-BUCKETED tokens, so the engine-side
  *    hash, not ml's internal one, defines the feature space; that is
  *    what lets [[scoreRelational]] reproduce the model exactly.
  *  - Training is one `LogisticRegression` fit: per-iteration
  *    treeAggregate over the feature vectors — rows never shuffle, the
  *    only driver state is the 2^15-dim coefficient vector.
  *  - Scoring has TWO equivalent paths: [[score]] runs the fitted
  *    pipeline (per-row transform, embarrassingly parallel), and
  *    [[scoreRelational]] re-expresses the SAME model relationally —
  *    explode bucket ids, broadcast-join the coefficient TABLE, one
  *    partial-aggregated sum per doc, sigmoid — proving the model is
  *    just data: at 100 TB the weights ride a broadcast and the score
  *    is an ordinary aggregation, no model server anywhere.
  */
object QualityClassifier {

  val NumFeatures: Int = 1 << 15

  /** Sliding char n-grams as a column expression (no UDF): positions
    * 0..len-n, each sliced with `substr`. Short texts yield their whole
    * prefix gram; null texts yield an empty array. */
  def charNgrams(text: Column, n: Int = 3): Column =
    when(text.isNull, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), greatest(length(text) - n, lit(0))),
        i => text.substr(i + 1, lit(n))))

  /** Engine-side feature buckets: DISTINCT `pmod(hash(gram), 2^15)` per
    * document (binary presence features). This is the canonical feature
    * id — both scoring paths derive from it. */
  def bucketIds(text: Column, n: Int = 3): Column =
    array_distinct(transform(charNgrams(text, n),
      g => pmod(hash(g), lit(NumFeatures))))

  /** Bucket ids rendered as tokens for ml's HashingTF (which re-hashes
    * them internally — a pure RELABELING of the engine's buckets; the
    * [[coefficientTable]] inverts it via `HashingTF.indexOf`). */
  private def withBucketTokens(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__btoks",
      transform(bucketIds(col(textCol)), b => b.cast("string")))

  /** Fit the quality model: `good` vs `bad` frames (any schema carrying
    * `textCol`). Deterministic given the input data. */
  def train(good: DataFrame, bad: DataFrame, textCol: String = "text"): PipelineModel = {
    val labeled = withBucketTokens(good.select(col(textCol)), textCol)
      .withColumn("label", lit(1.0))
      .unionByName(withBucketTokens(bad.select(col(textCol)), textCol)
        .withColumn("label", lit(0.0)))
    val tf = new HashingTF().setInputCol("__btoks").setOutputCol("__features")
      .setNumFeatures(NumFeatures).setBinary(true)
    val lr = new LogisticRegression().setMaxIter(30).setRegParam(1e-4)
      .setLabelCol("label").setFeaturesCol("__features")
    new Pipeline().setStages(Array(tf, lr)).fit(labeled)
  }

  /** Score via the fitted pipeline: adds `quality_score` = P(reference-
    * like). Per-row transform, no shuffle. */
  def score(model: PipelineModel, df: DataFrame,
      textCol: String = "text"): DataFrame =
    model.transform(withBucketTokens(df, textCol))
      .withColumn("quality_score",
        vector_to_array(col("probability")).getItem(1))
      .drop("__btoks", "__features", "rawPrediction", "probability", "prediction")

  /** The model AS A TABLE: `(bucket, tf_bucket, weight)` rows — engine
    * bucket id, the HashingTF slot it landed in (via the PUBLIC
    * `indexOf`, computed once on the driver: 2^15 hashes), and that
    * slot's learned weight. What a 100 TB scorer broadcasts. */
  def coefficientTable(model: PipelineModel, df: DataFrame): DataFrame = {
    val tf = model.stages.head.asInstanceOf[HashingTF]
    val lr = model.stages.last.asInstanceOf[LogisticRegressionModel]
    val coef = lr.coefficients.toArray
    val rows = (0 until NumFeatures).flatMap { b =>
      val slot = tf.indexOf(b.toString)
      val w = coef(slot)
      if (w != 0.0) Some((b, slot, w)) else None
    }
    val spark = df.sparkSession
    import spark.implicits._
    rows.toDF("bucket", "tf_bucket", "weight")
  }

  /** Relational scoring — numerically identical model, zero ml code in
    * the hot path: per-doc DISTINCT engine buckets, broadcast-join the
    * coefficient table, dedup on the TF SLOT (two engine buckets
    * colliding into one HashingTF slot count once — exactly the binary
    * semantics the ml path saw), partial-aggregated weight sum,
    * sigmoid(intercept + sum). One shuffle keyed by doc id whose rows
    * are (id, slot, weight) triples — never text. */
  def scoreRelational(model: PipelineModel, df: DataFrame, idCol: String,
      textCol: String = "text"): DataFrame = {
    val lr = model.stages.last.asInstanceOf[LogisticRegressionModel]
    val coefs = coefficientTable(model, df)
    val buckets = df.select(col(idCol),
      explode(bucketIds(col(textCol))).as("bucket"))
    val summed = buckets.join(broadcast(coefs), Seq("bucket"))
      .select(col(idCol), col("tf_bucket"), col("weight"))
      .distinct()
      .groupBy(idCol)
      .agg(sum(col("weight")).as("__w"))
    df.join(summed, Seq(idCol), "left")
      .withColumn("quality_score",
        lit(1.0) / (lit(1.0) +
          exp(-coalesce(col("__w"), lit(0.0)) - lit(lr.intercept))))
      .drop("__w")
  }

  /** Keep documents the model scores at or above `threshold`. */
  def gate(model: PipelineModel, df: DataFrame, threshold: Double,
      textCol: String = "text"): DataFrame =
    score(model, df, textCol).where(col("quality_score") >= threshold)
}
