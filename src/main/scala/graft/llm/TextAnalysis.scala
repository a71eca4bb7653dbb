package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language-ID heuristics and document
  * fingerprinting over the `documents` table.
  *
  * All of these are narrow per-row projections — at 100 TB they pipeline
  * with the parquet scan (no shuffle, no state), so throughput is
  * scan-bound; the only wide operation in this family is a final
  * aggregation if the caller wants corpus-level stats.
  *
  * Heuristics follow the shapes used by public corpus-cleaning pipelines
  * (C4/Gopher-style length+stopword+diversity rules): no external models,
  * pure column arithmetic.
  */
object TextAnalysis {
  import Portable._

  private val stopwords = Seq("the", "a", "is", "of", "and")
  private def stopwordsSqlList = stopwords.map(s => s"'$s'").mkString(", ")

  /** Token/char statistics: whitespace tokens, BPE-ish regex tokens,
    * type-token ratio, average token length, stopword ratio. */
  val qTextStats: QueryDef = QueryDef.sql(
    "q_text_stats",
    s"""SELECT doc_id, lang, n_chars,
       |  len(toks) AS n_tokens,
       |  len(list_distinct(toks)) AS n_distinct_tokens,
       |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_subtokens,
       |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio,
       |  CAST(list_reduce(list_prepend(0::BIGINT, list_transform(toks, t -> length(t)::BIGINT)), (a, b) -> a + b) AS DOUBLE) / len(toks) AS avg_token_len,
       |  CAST(len(list_filter(toks, t -> t IN ($stopwordsSqlList))) AS DOUBLE) / len(toks) AS stopword_ratio
       |FROM (SELECT doc_id, lang, n_chars, text, ${tokensSql("text")} AS toks FROM documents)""".stripMargin) { (spark, dir) =>
    val toks = tokens(col("text"))
    Tables.documents(spark, dir)
      .withColumn("toks", toks)
      .select(
        col("doc_id"), col("lang"), col("n_chars"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).as("n_subtokens"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks"))).as("type_token_ratio"),
        (aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double") /
          size(col("toks"))).as("avg_token_len"),
        (size(filter(col("toks"), t => t.isInCollection(stopwords))).cast("double") /
          size(col("toks"))).as("stopword_ratio"))
  }

  /** Language-ID by marker-word scoring — the classic n-gram/profile
    * heuristic reduced to deterministic word-marker counts with a fixed
    * precedence order for ties ('und' when nothing matches). */
  val qTextLangId: QueryDef = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "is"),
      "de" -> Seq("der", "die", "und"),
      "es" -> Seq("el", "los", "y"),
      "fr" -> Seq("le", "la", "et"),
      "zh" -> Seq("的", "是"))
    val scoreSql = markers.map { case (l, ws) =>
      s"len(list_filter(toks, t -> t IN (${ws.map(w => s"'$w'").mkString(", ")}))) AS score_$l"
    }.mkString(",\n       |  ")
    QueryDef.sql(
      "q_text_langid",
      s"""SELECT doc_id, lang AS labeled_lang, score_en, score_de, score_es, score_fr, score_zh,
         |  CASE WHEN greatest(score_en, score_de, score_es, score_fr, score_zh) = 0 THEN 'und'
         |       WHEN score_en = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'en'
         |       WHEN score_de = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'de'
         |       WHEN score_es = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'es'
         |       WHEN score_fr = greatest(score_en, score_de, score_es, score_fr, score_zh) THEN 'fr'
         |       ELSE 'zh' END AS predicted_lang
         |FROM (SELECT doc_id, lang,
         |  $scoreSql
         |FROM (SELECT doc_id, lang, ${tokensSql("text")} AS toks FROM documents))""".stripMargin) { (spark, dir) =>
      val toks = tokens(col("text"))
      val scored = Tables.documents(spark, dir)
        .withColumn("toks", toks)
        .select(col("doc_id") +: col("lang").as("labeled_lang") +:
          markers.map { case (l, ws) =>
            size(filter(col("toks"), t => t.isInCollection(ws))).as(s"score_$l")
          }: _*)
      val best = greatest(markers.map { case (l, _) => col(s"score_$l") }: _*)
      scored.withColumn("predicted_lang",
        when(best === 0, "und")
          .when(col("score_en") === best, "en")
          .when(col("score_de") === best, "de")
          .when(col("score_es") === best, "es")
          .when(col("score_fr") === best, "fr")
          .otherwise("zh"))
    }
  }

  /** Document fingerprints: a polynomial rolling hash over token hashes
    * (order-sensitive — distinguishes permutations) plus a whole-content
    * 60-bit hash (order-insensitive dedup key is in Dedup.qExact). */
  val qTextFingerprint: QueryDef = QueryDef.sql(
    "q_text_fingerprint",
    s"""SELECT doc_id,
       |  ${h60Sql("text")} AS content_hash,
       |  list_reduce(
       |    list_prepend(0::BIGINT, list_transform(${tokensSql("text")}, t -> ${h32Sql("t")})),
       |    (acc, h) -> (acc * 31 + h) % ${FingerprintPrime}) AS rolling_fp,
       |  len(${tokensSql("text")}) AS fp_tokens
       |FROM documents""".stripMargin) { (spark, dir) =>
    val toks = tokens(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      h60(col("text")).as("content_hash"),
      aggregate(transform(toks, h32(_)), lit(0L),
        (acc, h) => (acc * 31 + h) % FingerprintPrime).as("rolling_fp"),
      size(toks).as("fp_tokens"))
  }

  /** Gopher-style quality gate: length bounds, lexical diversity,
    * stopword presence, mean token length — each rule surfaces as a flag
    * plus the final keep decision, so downstream filtering is one
    * pushed-down predicate. */
  val qTextQuality: QueryDef = QueryDef.sql(
    "q_text_quality",
    s"""SELECT doc_id, n_chars, n_tokens, type_token_ratio, avg_token_len, stopword_ratio,
       |  n_chars < 100 AS flag_too_short,
       |  n_chars > 20000 AS flag_too_long,
       |  type_token_ratio < 0.2 AS flag_low_diversity,
       |  avg_token_len < 2.0 OR avg_token_len > 12.0 AS flag_bad_token_len,
       |  stopword_ratio < 0.01 AS flag_no_stopwords,
       |  NOT (n_chars < 100 OR n_chars > 20000 OR type_token_ratio < 0.2
       |       OR avg_token_len < 2.0 OR avg_token_len > 12.0 OR stopword_ratio < 0.01) AS keep
       |FROM (
       |  SELECT doc_id, n_chars,
       |    len(toks) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio,
       |    CAST(list_reduce(list_prepend(0::BIGINT, list_transform(toks, t -> length(t)::BIGINT)), (a, b) -> a + b) AS DOUBLE) / len(toks) AS avg_token_len,
       |    CAST(len(list_filter(toks, t -> t IN ($stopwordsSqlList))) AS DOUBLE) / len(toks) AS stopword_ratio
       |  FROM (SELECT doc_id, n_chars, ${tokensSql("text")} AS toks FROM documents))""".stripMargin) { (spark, dir) =>
    val toks = tokens(col("text"))
    val base = Tables.documents(spark, dir)
      .withColumn("toks", toks)
      .select(
        col("doc_id"), col("n_chars"),
        size(col("toks")).as("n_tokens"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks"))).as("type_token_ratio"),
        (aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t).cast("long")).cast("double") /
          size(col("toks"))).as("avg_token_len"),
        (size(filter(col("toks"), t => t.isInCollection(stopwords))).cast("double") /
          size(col("toks"))).as("stopword_ratio"))
    val flags = Seq(
      (col("n_chars") < 100).as("flag_too_short"),
      (col("n_chars") > 20000).as("flag_too_long"),
      (col("type_token_ratio") < 0.2).as("flag_low_diversity"),
      (col("avg_token_len") < 2.0 || col("avg_token_len") > 12.0).as("flag_bad_token_len"),
      (col("stopword_ratio") < 0.01).as("flag_no_stopwords"))
    val drop = col("n_chars") < 100 || col("n_chars") > 20000 ||
      col("type_token_ratio") < 0.2 ||
      col("avg_token_len") < 2.0 || col("avg_token_len") > 12.0 ||
      col("stopword_ratio") < 0.01
    base.select(col("doc_id") +: col("n_chars") +: col("n_tokens") +:
      col("type_token_ratio") +: col("avg_token_len") +: col("stopword_ratio") +:
      flags :+ (!drop).as("keep"): _*)
  }

  /** The complete published Gopher document-filter rule set (Rae et al.
    * 2021, the quality gate most open-web pipelines start from), one
    * boolean per rule plus the conjunction: word count ∈ [50, 100k],
    * mean word length ∈ [3, 10], symbol-to-word (# + …) ≤ 0.1, ≤90% of
    * lines bullet-led, ≤30% ellipsis-ended, ≥80% of words alphabetic,
    * ≥2 of the 8 canonical stopwords present. Pure column arithmetic —
    * zero UDFs, zero shuffles beyond the scan. */
  val qGopherRules: QueryDef = {
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHitsSql = gopherStops
      .map(s => s"(CASE WHEN list_contains(toks, '$s') THEN 1 ELSE 0 END)")
      .mkString(" + ")
    QueryDef.sql(
      "q_text_gopher_rules",
      s"""SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
         |  bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio, n_stop_hits,
         |  n_words >= 50 AND n_words <= 100000 AS rule_word_count,
         |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS rule_mean_word_len,
         |  symbol_word_ratio <= 0.1 AS rule_symbol_ratio,
         |  bullet_line_ratio <= 0.9 AS rule_bullets,
         |  ellipsis_line_ratio <= 0.3 AS rule_ellipsis,
         |  alpha_word_ratio >= 0.8 AS rule_alpha_words,
         |  n_stop_hits >= 2 AS rule_stopwords,
         |  (n_words >= 50 AND n_words <= 100000) AND
         |    (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AND
         |    symbol_word_ratio <= 0.1 AND bullet_line_ratio <= 0.9 AND
         |    ellipsis_line_ratio <= 0.3 AND alpha_word_ratio >= 0.8 AND
         |    n_stop_hits >= 2 AS keep
         |FROM (
         |  SELECT doc_id,
         |    len(toks) AS n_words,
         |    CAST(list_reduce(list_prepend(0::BIGINT, list_transform(toks, t -> length(t)::BIGINT)), (a, b) -> a + b) AS DOUBLE) / len(toks) AS mean_word_len,
         |    (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) +
         |      CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3.0) / len(toks) AS symbol_word_ratio,
         |    CAST(len(list_filter(lns, l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•'))) AS DOUBLE) / len(lns) AS bullet_line_ratio,
         |    CAST(len(list_filter(lns, l -> right(rtrim(l), 3) = '...' OR right(rtrim(l), 1) = '…')) AS DOUBLE) / len(lns) AS ellipsis_line_ratio,
         |    CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE) / len(toks) AS alpha_word_ratio,
         |    $stopHitsSql AS n_stop_hits
         |  FROM (SELECT doc_id, text, ${tokensSql("text")} AS toks,
         |          string_split(text, chr(10)) AS lns
         |        FROM documents)
         |  WHERE len(toks) > 0)""".stripMargin) { (spark, dir) =>
      val base = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"),
          split(col("text"), "\n", -1).as("lns"))
        .where(size(col("toks")) > 0)
        .select(col("doc_id"),
          size(col("toks")).as("n_words"),
          (aggregate(col("toks"), lit(0L), (a, t) => a + length(t).cast("long"))
            .cast("double") / size(col("toks"))).as("mean_word_len"),
          (((length(col("text")) - length(regexp_replace(col("text"), "#", "")))
            .cast("double") +
            (length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", "")))
              .cast("double") / 3.0) / size(col("toks"))).as("symbol_word_ratio"),
          (size(filter(col("lns"), l =>
            substring(ltrim(l), 1, 1).isInCollection(Seq("-", "*", "•"))))
            .cast("double") / size(col("lns"))).as("bullet_line_ratio"),
          (size(filter(col("lns"), l =>
            substring(rtrim(l), -3, 3) === "..." || substring(rtrim(l), -1, 1) === "…"))
            .cast("double") / size(col("lns"))).as("ellipsis_line_ratio"),
          (size(filter(col("toks"), t => t.rlike("[a-zA-Z]")))
            .cast("double") / size(col("toks"))).as("alpha_word_ratio"),
          gopherStops.map(s =>
            when(array_contains(col("toks"), s), 1).otherwise(0))
            .reduce(_ + _).as("n_stop_hits"))
      val rules = Seq(
        (col("n_words") >= 50 && col("n_words") <= 100000).as("rule_word_count"),
        (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0).as("rule_mean_word_len"),
        (col("symbol_word_ratio") <= 0.1).as("rule_symbol_ratio"),
        (col("bullet_line_ratio") <= 0.9).as("rule_bullets"),
        (col("ellipsis_line_ratio") <= 0.3).as("rule_ellipsis"),
        (col("alpha_word_ratio") >= 0.8).as("rule_alpha_words"),
        (col("n_stop_hits") >= 2).as("rule_stopwords"))
      base.select(Seq(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("symbol_word_ratio"), col("bullet_line_ratio"),
        col("ellipsis_line_ratio"), col("alpha_word_ratio"), col("n_stop_hits")) ++
        rules :+
        ((col("n_words") >= 50 && col("n_words") <= 100000) &&
          (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0) &&
          col("symbol_word_ratio") <= 0.1 && col("bullet_line_ratio") <= 0.9 &&
          col("ellipsis_line_ratio") <= 0.3 && col("alpha_word_ratio") >= 0.8 &&
          col("n_stop_hits") >= 2).as("keep"): _*)
    }
  }

  /** PII redaction — the scrub pass a training corpus runs before
    * anything else: emails, phone-shaped digit runs, and IPv4 literals
    * replaced by typed placeholder tokens. Patterns stay in the regex
    * subset Java and RE2 interpret identically (explicit classes, no
    * backrefs/lookarounds), so the oracle applies the same scrub. A
    * narrow per-row projection: pipelines with the scan, shuffles
    * nothing, and downstream ops see only redacted text. */
  val qTextRedact: QueryDef = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
    val ip = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
    val phone = "[+]?[0-9][0-9()  -]{6,}[0-9]"
    QueryDef.sql(
      "q_text_redact",
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '$email')) AS n_emails,
         |  len(regexp_extract_all(text, '$ip')) AS n_ips,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$email', '<EMAIL>', 'g'),
         |    '$ip', '<IP>', 'g'),
         |    '$phone', '<PHONE>', 'g')) AS redacted_md5
         |FROM documents""".stripMargin) { (spark, dir) =>
      val redacted = regexp_replace(regexp_replace(regexp_replace(col("text"),
        email, "<EMAIL>"),
        ip, "<IP>"),
        phone, "<PHONE>")
      Tables.documents(spark, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(ip), lit(0))).as("n_ips"),
        md5(redacted).as("redacted_md5"))
    }
  }

  /** Repetition ratio — the Gopher-family repetition filter the simple
    * length/diversity gates miss: share of all bigrams taken by the
    * single most frequent one (templated/spammy text scores high).
    * Explode+count rather than a per-row histogram map: the shuffle key
    * is (doc, bigram) so hot documents spread across tasks, and the
    * ratio is one exact-integer division at the end. */
  val qTextRepetition: QueryDef = QueryDef.sql(
    "q_text_repetition",
    s"""WITH b AS (
       |  SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)]) AS g
       |  FROM (SELECT doc_id, ${tokensSql("text")} AS t FROM documents)
       |  WHERE len(t) >= 2
       |), c AS (
       |  SELECT doc_id, g, count(*) AS n FROM b GROUP BY doc_id, g
       |)
       |SELECT doc_id,
       |  CAST(max(n) AS BIGINT) AS max_bigram_count,
       |  CAST(sum(n) AS BIGINT) AS n_bigrams,
       |  CAST(max(n) AS DOUBLE) / CAST(sum(n) AS BIGINT) AS repetition_ratio
       |FROM c GROUP BY doc_id""".stripMargin) { (spark, dir) =>
    val t = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), t.as("t"))
      .where(size(col("t")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("t")) - 1),
        i => concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1)))).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("max_bigram_count"),
        sum(col("n")).as("n_bigrams"),
        (max(col("n")).cast("double") / sum(col("n"))).as("repetition_ratio"))
  }

  /** Characteristic terms per document (TF-IDF family): term frequency ×
    * corpus-size-over-document-frequency, top 3 per doc for the first 100
    * docs. The score is `tf·N / df` — the log-free idf variant — chosen
    * deliberately: integer multiply + one double division are exactly
    * rounded in IEEE and therefore bit-identical across engines, whereas
    * `ln()` is correctly-rounded in neither and would make ranks
    * engine-dependent on near-ties. Plan shape at 100 TB: explode →
    * map-side-combined tf/df aggregations (df over the FULL corpus, tf
    * only over the queried docs) → broadcast-joinable df dimension →
    * per-doc top-k window partitioned by doc. */
  val qTopTerms: QueryDef = QueryDef.sql(
    "q_text_top_terms",
    s"""WITH tokd AS (
       |  SELECT doc_id, unnest(${tokensSql("text")}) AS term FROM documents
       |), df AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM tokd GROUP BY 1
       |), tf AS (
       |  SELECT doc_id, term, count(*) AS tf FROM tokd
       |  WHERE doc_id < 100 AND len(term) >= 4 GROUP BY 1, 2
       |), n AS (SELECT count(*) AS n FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf, df, CAST(tf * n AS DOUBLE) / df AS score
       |  FROM tf JOIN df USING (term) CROSS JOIN n
       |)
       |SELECT doc_id, term, tf, df, score,
       |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
       |FROM scored
       |QUALIFY rnk <= 3""".stripMargin) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val tokd = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val dfTbl = tokd.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val tf = tokd.where(col("doc_id") < 100 && length(col("term")) >= 4)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(dfTbl, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf") * col("n")).cast("double") / col("df")).as("score"))
    scored
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))))
      .where(col("rnk") <= 3)
  }

  /** Character-bigram coverage: the fraction of a document's bigrams
    * that fall in the corpus-wide top-K bigram vocabulary — a language-
    * model-flavored quality proxy (natural prose is dominated by common
    * bigrams; binary junk, mojibake, and boilerplate tables are not)
    * that needs no model weights and no transcendental math, so the
    * score is bit-identical across engines (integer counts + one
    * correctly-rounded division).
    *
    * Scale design: two aggregations over a narrow (doc_id, 2-char)
    * projection. The vocabulary aggregate's key space is tiny (bigrams,
    * not documents), so the top-K is a TakeOrdered on the agg output —
    * no global sort — and joins back as a broadcast; the per-doc
    * aggregate shuffles by doc_id only. Ties in the top-K cut are broken
    * by the bigram itself, so the vocabulary is deterministic.
    *
    * K=50 is sized to the synthetic fixture (114 distinct bigrams —
    * K=50 spreads scores 0.42–0.76 where K=200 saturates at 1.0); a real
    * corpus has a much larger bigram space and a correspondingly larger
    * K, but the plan shape is K-independent. */
  val qBigramCoverage: QueryDef = {
    val topK = 50
    QueryDef.sql(
      "q_text_bigram_coverage",
      s"""WITH grams AS (
         |  SELECT doc_id,
         |    unnest([substr(text, i, 2) for i in generate_series(1, n_chars - 1)]) AS g
         |  FROM documents WHERE n_chars >= 2
         |), top AS (
         |  SELECT g FROM grams GROUP BY g ORDER BY count(*) DESC, g LIMIT $topK
         |)
         |SELECT gr.doc_id, count(*) AS n_bigrams, count(t.g) AS n_top,
         |  CAST(count(t.g) AS DOUBLE) / count(*) AS top_coverage
         |FROM grams gr LEFT JOIN top t ON gr.g = t.g
         |GROUP BY gr.doc_id""".stripMargin) { (spark, dir) =>
      // single-file local fixture scans as one task; the explode fans
      // every doc out ~n_chars× and the per-gram work happens below it,
      // so spread the scan (gated: a pre-partitioned corpus skips this)
      val grams = Tables.spread(Tables.documents(spark, dir))
        .where(col("n_chars") >= 2)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), col("n_chars").cast("int") - 1)).as("pos"))
        .select(col("doc_id"), expr("substring(text, pos, 2)").as("g"))
      val top = grams.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("g")).limit(topK)
        .select(col("g"), lit(1).as("is_top"))
      grams.join(broadcast(top), Seq("g"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), count(col("is_top")).as("n_top"))
        .withColumn("top_coverage", col("n_top").cast("double") / col("n_bigrams"))
    }
  }

  val all: Seq[QueryDef] = Seq(qTextStats, qTextLangId, qTextFingerprint, qTextQuality,
    qGopherRules,
    qTextRedact, qTextRepetition, qTopTerms, qBigramCoverage)
}
