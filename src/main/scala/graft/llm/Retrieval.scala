package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-style scoring over the documents corpus — the query-driven
  * half of a training-data pipeline: BM25 ranking (eval-set retrieval,
  * contamination probes, targeted corpus carving) and a bigram-LM
  * fluency score (CCNet-shaped model-free quality signal).
  *
  * Scale design (the inverted-index shape): tokenization fans out to a
  * (doc, term) frame; every aggregate and join after that keys on
  * `term` or `(doc, term)` — hashes and counts cross the shuffle, never
  * document text. Query sets are tiny literal frames and broadcast.
  * Nothing here is all-pairs: scoring touches only the posting lists of
  * the query's terms, so a 3-term query against 100 TB reads three
  * posting lists, not the corpus.
  *
  * Engine parity: scores avoid transcendentals entirely (JVM `ln` and
  * DuckDB `ln` differ in ULPs) — BM25 uses the rational idf variant
  * `(N-df+0.5)/(df+0.5)` and the LM score averages raw transition
  * probabilities; per-document sums fold over per-term lists sorted on
  * a unique key, so float addition order is pinned on both engines and
  * results are bit-identical.
  */
object Retrieval {
  import Portable._

  /** The deterministic benchmark query set (terms all present in the
    * synthetic corpus; distinct terms per query). */
  private val querySet: Seq[(String, Seq[String])] = Seq(
    "q_scan_perf" -> Seq("scan", "fast", "column"),
    "q_join_shape" -> Seq("join", "merge", "hash"),
    "q_stream" -> Seq("stream", "batch", "window"))

  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 5

  /** BM25 CTE chain through `scored(qid, doc_id, n_terms_hit, score)` —
    * shared by the BM25 ranking and the hybrid-fusion oracle. */
  private def bm25ScoredSql: String = {
    val valuesSql = querySet.flatMap { case (q, ts) =>
      ts.map(t => s"('$q', '$t')")
    }.mkString(", ")
    s"""tokd AS (
       |  SELECT doc_id, unnest(${tokensSql("text")}) AS term FROM documents
       |), dl AS (
       |  SELECT doc_id, count(*) AS dl FROM tokd GROUP BY 1
       |), corpus AS (
       |  SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokd GROUP BY 1, 2
       |), df AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY 1
       |), qs(qid, term) AS (VALUES $valuesSql),
       |contribs AS (
       |  SELECT qs.qid, tf.doc_id, tf.term,
       |    ((n - df + 0.5e0) / (df + 0.5e0)) *
       |      (tf * (${K1}e0 + 1.0e0) /
       |        (tf + ${K1}e0 * ((1.0e0 - ${B}e0) + ${B}e0 * (dl / avgdl)))) AS contrib
       |  FROM qs JOIN tf USING (term) JOIN df USING (term)
       |    JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN corpus
       |), scored AS (
       |  SELECT qid, doc_id, count(*) AS n_terms_hit,
       |    list_reduce(
       |      list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(list_sort(list({t: term, c: contrib})),
       |          s -> s.c)),
       |      (a, b) -> a + b) AS score
       |  FROM contribs GROUP BY 1, 2
       |)""".stripMargin
  }

  /** Spark side of [[bm25ScoredSql]]: `(qid, doc_id, n_terms_hit, score)`.
    *
    * The oracle SQL materializes the FULL inverted index (every
    * (doc, term) pair, aggregated twice) and only then prunes it with
    * the query set. That is O(corpus tokens) of shuffle for a 9-term
    * query set known at plan time, so the Spark side prunes BEFORE the
    * exchange instead (guide §2.3 "project before the exchange" /
    * §2.4 "remove shuffles outright"):
    *   - `dl` (per-doc token count) is `size(tokens(text))` — computed
    *     map-side, no explode, no shuffle of token rows at all;
    *   - posting rows are filtered to the query terms by a codegen'd
    *     `isin` in the SAME stage as the explode, so the (doc, term)
    *     exchange carries O(hits), not O(corpus tokens);
    *   - `df`/`tf` aggregate the pruned frame; their values for the
    *     query terms are identical to the full-index aggregates.
    * Every surviving row (tf, df, dl, n, avgdl) is bit-identical to the
    * oracle's, so scores and ranks are unchanged. */
  private def bm25Scored(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qTerms = querySet.flatMap(_._2).distinct
    val docs = Tables.spread(Tables.documents(spark, dir))
    // doc length map-side (no explode); posting rows filtered to the
    // query terms in the SAME codegen stage as the explode, so the
    // exchange carries O(hits)
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
      .where(col("dl") >= 1)
    val corpus = dl.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
      .where(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qs = querySet.flatMap { case (q, ts) => ts.map(q -> _) }
      .toDF("qid", "term")
    val contribs = broadcast(qs).join(tf, "term").join(broadcast(dfTbl), "term")
      .join(dl, "doc_id").crossJoin(broadcast(corpus))
      .select(col("qid"), col("doc_id"), col("term"),
        (((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(K1 + 1.0) /
            (col("tf") + lit(K1) * (lit(1.0 - B) +
              lit(B) * (col("dl") / col("avgdl"))))))
          .as("contrib"))
    contribs.groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        aggregate(
          sort_array(collect_list(struct(col("term").as("t"), col("contrib").as("c")))),
          lit(0.0),
          (acc, s) => acc + s.getField("c")).as("score"))
  }

  /** BM25 top-k: rank documents for each benchmark query via the
    * inverted index. k1=1.2, b=0.75, rational idf (no ln — see parity
    * note above); ties broken by doc_id so the cut is deterministic. */
  val qBm25TopK: QueryDef =
    QueryDef.sql(
      "q_text_bm25_topk",
      s"""WITH $bm25ScoredSql
         |SELECT qid, doc_id, n_terms_hit, score,
         |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
         |FROM scored QUALIFY rnk <= $TopK""".stripMargin) { (spark, dir) =>
      bm25Scored(spark, dir)
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))))
        .where(col("rnk") <= TopK)
    }

  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al., RRF):
    * each benchmark query gets a LEXICAL candidate list (BM25 top-20 over
    * the inverted index) and a SEMANTIC one (cosine top-20 against a seed
    * embedding — query i's seed is vector i, the standard bi-encoder
    * stand-in), fused as Σ 1/(60 + rank) over the systems that returned
    * the document. The production RAG/eval-retrieval shape: neither list
    * needs scores on a shared scale, so fusion survives engine swaps.
    *
    * Scale: both candidate generators are already bounded (posting lists
    * pruned by the broadcast query set; ANN candidates per probe cell);
    * fusion joins two ≤k·|queries| frames — trivially broadcastable at
    * any corpus size. Engine parity: 1/(60+rank) is one exact division,
    * the fused score sums TWO doubles in fixed (lex, sem) order. */
  val qHybridRrf: QueryDef = {
    val fuseK = 60 // Cormack's constant: dampens rank-1 dominance
    val candK = 20 // per-system candidate depth
    val seedsSql = querySet.map(_._1).zipWithIndex
      .map { case (q, i) => s"('$q', $i)" }.mkString(", ")
    val dotSql =
      "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1,64), " +
        "i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)), (x,y) -> x+y)"
    QueryDef.sql(
      "q_text_hybrid_rrf",
      s"""WITH $bm25ScoredSql,
         |lex AS (
         |  SELECT qid, doc_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS lex_rnk
         |  FROM scored QUALIFY lex_rnk <= $candK
         |), nrms AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(generate_series(1,64),
         |        i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)), (x,y) -> x+y)) AS nrm
         |  FROM embeddings
         |), seeds(qid, seed_id) AS (VALUES $seedsSql),
         |sem AS (
         |  SELECT qid, doc_id, sem_rnk FROM (
         |    SELECT s.qid, c.vec_id AS doc_id,
         |      row_number() OVER (PARTITION BY s.qid
         |        ORDER BY $dotSql / (q.nrm * c.nrm) DESC, c.vec_id) AS sem_rnk
         |    FROM seeds s
         |    JOIN nrms q ON q.vec_id = s.seed_id
         |    JOIN nrms c ON c.vec_id <> s.seed_id)
         |  WHERE sem_rnk <= $candK
         |)
         |SELECT qid, doc_id, lex_rnk, sem_rnk, rrf,
         |  row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id) AS rnk
         |FROM (
         |  SELECT coalesce(l.qid, s.qid) AS qid,
         |    coalesce(l.doc_id, s.doc_id) AS doc_id,
         |    l.lex_rnk AS lex_rnk, s.sem_rnk AS sem_rnk,
         |    coalesce(1.0e0 / ($fuseK + l.lex_rnk), 0.0e0) +
         |      coalesce(1.0e0 / ($fuseK + s.sem_rnk), 0.0e0) AS rrf
         |  FROM lex l FULL JOIN sem s ON l.qid = s.qid AND l.doc_id = s.doc_id)
         |QUALIFY rnk <= $TopK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val lex = bm25Scored(spark, dir)
        .withColumn("lex_rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))))
        .where(col("lex_rnk") <= candK)
        .select(col("qid"), col("doc_id"), col("lex_rnk"))
      def dot(a: Column, b: Column): Column = Similarity.dot(a, b)
      val nrms = Tables.embeddings(spark, dir).select(
        col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      val seeds = querySet.map(_._1).zipWithIndex.toDF("qid", "seed_id")
      val seedVecs = broadcast(seeds)
        .join(nrms, col("seed_id") === col("vec_id"))
        .select(col("qid"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"),
          col("seed_id"))
      // seed side broadcasts; the corpus scan stays partition-parallel
      val sem = nrms.join(broadcast(seedVecs), col("vec_id") =!= col("seed_id"))
        .select(col("qid"), col("vec_id").as("doc_id"),
          (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
        .withColumn("sem_rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("doc_id"))))
        .where(col("sem_rnk") <= candK)
        .select(col("qid"), col("doc_id"), col("sem_rnk"))
      val fused = lex.join(sem, Seq("qid", "doc_id"), "full_outer")
        .select(col("qid"), col("doc_id"), col("lex_rnk"), col("sem_rnk"),
          (coalesce(lit(1.0) / (lit(fuseK) + col("lex_rnk")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(fuseK) + col("sem_rnk")), lit(0.0))).as("rrf"))
      fused.withColumn("rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("doc_id"))))
        .where(col("rnk") <= TopK)
    }
  }

  /** Contrastive hard-negative mining: for each query seed, the
    * embedding-space nearest neighbors that the LEXICAL retriever does
    * NOT surface — semantically close, term-unrelated documents, the
    * negatives a dual-encoder trains against (random negatives are too
    * easy; BM25-visible ones are often positives). The op is the
    * anti-join of two candidate generators: EXACT brute-force cosine
    * top-k (the seed side broadcasts, the corpus scans once,
    * partition-parallel — exactness is what keeps this oracle-checkable
    * bit-for-bit against the SQL) minus BM25 top-k, re-ranked by
    * cosine. At 100 TB swap the semantic generator for
    * [[Similarity.ivfSearch]] (same (qid, doc_id, cosine) candidate
    * shape, approximate recall instead of a full scan); the anti-join
    * and rerank below are generator-agnostic.
    *
    * Scale shape: both candidate lists are per-query top-k (bounded),
    * the query/seed side broadcasts while the corpus scan stays
    * partition-parallel, and the anti-join + final rank key on
    * (qid, doc) — candidates, never the corpus, shuffle. */
  val qHardNegatives: QueryDef = {
    val candK = 20 // per-system candidate depth
    val negK = 5   // hard negatives kept per query
    val seedsSql = querySet.map(_._1).zipWithIndex
      .map { case (q, i) => s"('$q', $i)" }.mkString(", ")
    val dotSql =
      "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1,64), " +
        "i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)), (x,y) -> x+y)"
    QueryDef.sql(
      "q_text_hard_negatives",
      s"""WITH $bm25ScoredSql,
         |lex AS (
         |  SELECT qid, doc_id,
         |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS lex_rnk
         |  FROM scored QUALIFY lex_rnk <= $candK
         |), nrms AS (
         |  SELECT vec_id, embedding,
         |    sqrt(list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(generate_series(1,64),
         |        i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE)), (x,y) -> x+y)) AS nrm
         |  FROM embeddings
         |), seeds(qid, seed_id) AS (VALUES $seedsSql),
         |sem AS (
         |  SELECT qid, doc_id, cosine FROM (
         |    SELECT s.qid, c.vec_id AS doc_id,
         |      $dotSql / (q.nrm * c.nrm) AS cosine,
         |      row_number() OVER (PARTITION BY s.qid
         |        ORDER BY $dotSql / (q.nrm * c.nrm) DESC, c.vec_id) AS sem_rnk
         |    FROM seeds s
         |    JOIN nrms q ON q.vec_id = s.seed_id
         |    JOIN nrms c ON c.vec_id <> s.seed_id)
         |  WHERE sem_rnk <= $candK
         |)
         |SELECT qid, doc_id, cosine,
         |  row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, doc_id) AS neg_rnk
         |FROM (
         |  SELECT m.qid, m.doc_id, m.cosine FROM sem m
         |  LEFT JOIN lex l ON l.qid = m.qid AND l.doc_id = m.doc_id
         |  WHERE l.doc_id IS NULL)
         |QUALIFY neg_rnk <= $negK""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val lex = bm25Scored(spark, dir)
        .withColumn("lex_rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))))
        .where(col("lex_rnk") <= candK)
        .select(col("qid"), col("doc_id"))
      def dot(a: Column, b: Column): Column = Similarity.dot(a, b)
      val nrms = Tables.embeddings(spark, dir).select(
        col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      val seeds = querySet.map(_._1).zipWithIndex.toDF("qid", "seed_id")
      val seedVecs = broadcast(seeds)
        .join(nrms, col("seed_id") === col("vec_id"))
        .select(col("qid"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"),
          col("seed_id"))
      val sem = nrms.join(broadcast(seedVecs), col("vec_id") =!= col("seed_id"))
        .select(col("qid"), col("vec_id").as("doc_id"),
          (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
        .withColumn("sem_rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("doc_id"))))
        .where(col("sem_rnk") <= candK)
        .select(col("qid"), col("doc_id"), col("cosine"))
      sem.join(lex, Seq("qid", "doc_id"), "left_anti")
        .withColumn("neg_rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("doc_id"))))
        .where(col("neg_rnk") <= negK)
        .select(col("qid"), col("doc_id"), col("cosine"), col("neg_rnk"))
    }
  }

  /** Bigram-LM fluency: the mean corpus transition probability
    * p(wᵢ | wᵢ₋₁) = C(wᵢ₋₁ wᵢ) / C(wᵢ₋₁ ·) over a document's bigrams —
    * high for prose made of common continuations, low for shuffled or
    * templated junk. The model-free stand-in for CCNet's LM-perplexity
    * filter (no weights, no ln — raw probabilities keep engine parity).
    *
    * Shape: one explode to (doc, pos, bigram), two count aggregates
    * (bigram counts; prefix counts — both key on strings, tiny rows),
    * one join back, one per-doc fold sorted by position. All shuffles
    * carry hashes/counts. */
  val qLmScore: QueryDef = QueryDef.sql(
    "q_text_lm_score",
    """WITH bigr AS (
       |  SELECT doc_id, unnest([{i: i, w1: toks[i], w2: toks[i+1]}
       |      for i in generate_series(1, len(toks) - 1)]) AS b
       |  FROM (SELECT doc_id,
       |      list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS toks
       |    FROM documents)
       |  WHERE len(toks) >= 2
       |), flat AS (
       |  SELECT doc_id, b.i::BIGINT AS pos, b.w1 AS w1, b.w2 AS w2 FROM bigr
       |), c2 AS (
       |  SELECT w1, w2, count(*) AS c2 FROM flat GROUP BY 1, 2
       |), c1 AS (
       |  SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1
       |), probs AS (
       |  SELECT doc_id, pos, CAST(c2 AS DOUBLE) / c1 AS p
       |  FROM flat JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
       |)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  list_reduce(
       |    list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(list_sort(list({i: pos, p: p})), s -> s.p)),
       |    (a, b) -> a + b) / count(*) AS avg_transition_p
       |FROM probs GROUP BY doc_id""".stripMargin) { (spark, dir) =>
    val docs = Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)
    // bigrams computed array-side (no self-join): zip the token list
    // against itself shifted by one, keep the 1-based position
    val bigr = docs.select(col("doc_id"),
        posexplode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col.w1").as("w1"), col("col.w2").as("w2"))
    val c2 = bigr.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val probs = bigr.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col("doc_id"), col("pos"),
        (col("c2").cast("double") / col("c1")).as("p"))
    probs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (aggregate(
          sort_array(collect_list(struct(col("pos").as("i"), col("p").as("p")))),
          lit(0.0),
          (acc, s) => acc + s.getField("p")) / count(lit(1)))
          .as("avg_transition_p"))
  }

  /** DSIR-style importance weights: how much more likely is each
    * document under the TARGET distribution (here: the `lang='en'`
    * slice) than under the raw corpus, measured on hashed bigram
    * features — the data-selection weight behind importance resampling
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling"). weight(doc) = Π over its bigrams of
    * (p̂_target(bucket) / p̂_raw(bucket)) with add-one smoothing over
    * B=64 hash buckets.
    *
    * Engine parity without logs: the per-bucket ratio is two pinned
    * divisions, and the per-doc product folds over POSITION-sorted
    * ratios, so multiplication order is identical in both engines (the
    * product of ≤100 ratios in [1/65, 65] stays comfortably inside
    * double range; corpus-scale docs would switch to the log-sum form
    * at the cost of oracle bit-parity).
    *
    * Scale: two count aggregates keyed on a 64-value bucket id (tiny),
    * broadcast back; everything else is per-row. */
  val qDsirWeights: QueryDef = {
    val B = 64
    QueryDef.sql(
      "q_corpus_dsir",
      s"""WITH bigr AS (
         |  SELECT doc_id, lang, unnest([{i: i, g: toks[i] || ' ' || toks[i+1]}
         |      for i in generate_series(1, len(toks) - 1)]) AS b
         |  FROM (SELECT doc_id, lang,
         |      list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS toks
         |    FROM documents)
         |  WHERE len(toks) >= 2
         |), feats AS (
         |  SELECT doc_id, lang, b.i::BIGINT AS pos,
         |    ${h32Sql("b.g")} % $B AS bucket
         |  FROM bigr
         |), raw_c AS (
         |  SELECT bucket, count(*) AS c FROM feats GROUP BY 1
         |), tgt_c AS (
         |  SELECT bucket, count(*) AS c FROM feats WHERE lang = 'en' GROUP BY 1
         |), tot AS (
         |  SELECT (SELECT count(*) FROM feats) AS n_raw,
         |    (SELECT count(*) FROM feats WHERE lang = 'en') AS n_tgt
         |), ratios AS (
         |  SELECT r.bucket,
         |    (CAST(coalesce(t.c, 0) + 1 AS DOUBLE) / (n_tgt + $B)) /
         |      (CAST(r.c + 1 AS DOUBLE) / (n_raw + $B)) AS ratio
         |  FROM raw_c r LEFT JOIN tgt_c t ON r.bucket = t.bucket CROSS JOIN tot
         |)
         |SELECT f.doc_id, count(*) AS n_feats,
         |  list_reduce(
         |    list_prepend(CAST(1.0 AS DOUBLE),
         |      list_transform(list_sort(list({i: pos, r: ratio})), s -> s.r)),
         |    (a, b) -> a * b) AS dsir_weight
         |FROM feats f JOIN ratios USING (bucket)
         |GROUP BY f.doc_id""".stripMargin) { (spark, dir) =>
      val docs = Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 2)
      val feats = docs.select(col("doc_id"), col("lang"),
          posexplode(zip_with(
            slice(col("toks"), lit(1), size(col("toks")) - 1),
            slice(col("toks"), lit(2), size(col("toks")) - 1),
            (a, b) => concat(a, lit(" "), b))))
        .select(col("doc_id"), col("lang"), (col("pos") + 1).cast("long").as("pos"),
          (h32(col("col")) % B).as("bucket"))
      val rawC = feats.groupBy(col("bucket")).agg(count(lit(1)).as("c_raw"))
      val tgtC = feats.where(col("lang") === "en")
        .groupBy(col("bucket")).agg(count(lit(1)).as("c_tgt"))
      val tot = feats.agg(count(lit(1)).as("n_raw"),
        count(when(col("lang") === "en", 1)).as("n_tgt"))
      val ratios = rawC.join(tgtC, Seq("bucket"), "left")
        .crossJoin(broadcast(tot))
        .select(col("bucket"),
          (((coalesce(col("c_tgt"), lit(0L)) + 1).cast("double") /
            (col("n_tgt") + B)) /
            ((col("c_raw") + 1).cast("double") / (col("n_raw") + B))).as("ratio"))
      feats.join(broadcast(ratios), "bucket")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feats"),
          aggregate(
            sort_array(collect_list(struct(col("pos").as("i"), col("ratio").as("r")))),
            lit(1.0),
            (acc, s) => acc * s.getField("r")).as("dsir_weight"))
    }
  }

  val all: Seq[QueryDef] =
    Seq(qBm25TopK, qHybridRrf, qHardNegatives, qLmScore, qDsirWeights)
}
