package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training pipelines: deterministic
  * splits and sequence packing.
  *
  * Both are pure per-row / single-window computations — no sampling
  * state, no driver participation — because at 100 TB the split must be
  * (a) reproducible run-over-run, (b) stable under re-partitioning and
  * incremental appends (a doc's split never changes when other docs
  * arrive), and (c) computable independently on every executor. A
  * `rand()`-based split has none of these properties; a content-hash
  * split has all three.
  */
object Sampling {
  import Portable._

  /** Deterministic train/val/test split by content-hash bucket
    * (80/10/10): the split is a pure function of doc identity, so it is
    * reproducible, append-stable, and needs no coordination. Bucket =
    * hash mod 100; the md5-derived hash makes the oracle bit-identical. */
  val qSplit: QueryDef = QueryDef.sql(
    "q_corpus_split",
    s"""SELECT doc_id, bucket,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
       |FROM (SELECT doc_id, ${h60Sql("text")} % 100 AS bucket FROM documents)""".stripMargin) {
    (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"), (h60(col("text")) % 100).as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
  }

  /** Sequence packing: assign docs to fixed token-budget packs by
    * offset (pack = which budget-sized stripe the doc's token span
    * starts in, over a canonical doc_id order). One window prefix-sum
    * PER LANGUAGE SHARD — packs never mix languages, and the window is
    * partitioned, so no single-partition global sort exists at any
    * corpus size (the shard key is whatever already shards the corpus).
    * Greedy first-fit packing would be inherently sequential and is
    * deliberately not reproduced. */
  val qPacking: QueryDef = {
    val budget = 2048
    QueryDef.sql(
      "q_corpus_packing",
      // DuckDB's window sum over BIGINT yields HUGEINT (int128); without the
      // CAST the driver's dtype-sensitive hash sees int128 vs Spark's int64
      // even though the values agree. Cast back to BIGINT before the
      // floor-div/mod so both engines emit int64.
      s"""SELECT doc_id, lang, n_tokens,
         |  (CAST(sum(n_tokens) OVER w AS BIGINT) - n_tokens) // $budget AS pack_id,
         |  (CAST(sum(n_tokens) OVER w AS BIGINT) - n_tokens) % $budget AS pack_offset
         |FROM (SELECT doc_id, lang, len(${tokensSql("text")}) AS n_tokens FROM documents)
         |WINDOW w AS (PARTITION BY lang ORDER BY doc_id ROWS UNBOUNDED PRECEDING)""".stripMargin) {
      (spark, dir) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"))
          .orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"),
            size(tokens(col("text"))).cast("long").as("n_tokens"))
          .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
          .select(col("doc_id"), col("lang"), col("n_tokens"),
            expr(s"start_tok div $budget").as("pack_id"),
            (col("start_tok") % budget).as("pack_offset"))
    }
  }

  /** Proportional stratified sample: exactly ⌊n_lang/10⌋ docs per
    * language shard, chosen by content-hash rank — deterministic and
    * coordination-free like [[qSplit]], but with an exact per-stratum
    * count (hash-threshold sampling only hits the rate in expectation).
    * The rank window is partitioned by the shard key, so no global sort
    * exists at any corpus size; the count window shares the same
    * partitioning (one exchange serves both). */
  val qStratified: QueryDef = QueryDef.sql(
    "q_corpus_stratified",
    s"""WITH ranked AS (
       |  SELECT doc_id, lang,
       |    row_number() OVER (PARTITION BY lang ORDER BY ${h60Sql("text")}, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n_lang
       |  FROM documents
       |)
       |SELECT doc_id, lang, rn FROM ranked WHERE rn * 10 <= n_lang""".stripMargin) {
    (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"),
          row_number().over(w.orderBy(h60(col("text")), col("doc_id"))).as("rn"),
          count(lit(1)).over(w).as("n_lang"))
        .where(col("rn") * 10 <= col("n_lang"))
        .select(col("doc_id"), col("lang"), col("rn"))
  }

  /** Temperature resampling weights (the multilingual-corpus rebalance
    * recipe: sample language l proportionally to p_l^α instead of p_l,
    * α=0.5, so low-resource languages are up-weighted). Emits per
    * language the doc count, the natural share p_l, the tempered weight
    * p_l^α, and the per-doc sampling boost p_l^(α-1) that a downstream
    * sampler multiplies into each doc's base rate.
    *
    * α is fixed at 1/2 so the tempering is `sqrt` — correctly rounded in
    * IEEE-754, hence bit-identical across engines, unlike pow/exp/ln.
    * The normalization constant Σ p^α is deliberately NOT applied: it is
    * a float sum whose value depends on accumulation order across
    * shards; downstream applies it once on the (tiny) per-language
    * output instead. Scale: one count per language + a 1-row broadcast
    * total — nothing here grows with corpus size except the count scan. */
  val qTemperature: QueryDef = QueryDef.sql(
    "q_corpus_temperature",
    """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c)
      |SELECT lang, n_docs,
      |  CAST(n_docs AS DOUBLE) / total AS share,
      |  sqrt(CAST(n_docs AS DOUBLE) / total) AS temp_weight,
      |  sqrt(CAST(n_docs AS DOUBLE) / total) / (CAST(n_docs AS DOUBLE) / total) AS sample_boost
      |FROM c CROSS JOIN t""".stripMargin) { (spark, dir) =>
    val c = Tables.documents(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val t = c.agg(sum(col("n_docs")).as("total"))
    c.crossJoin(broadcast(t))
      .withColumn("share", col("n_docs").cast("double") / col("total"))
      .withColumn("temp_weight", sqrt(col("share")))
      .withColumn("sample_boost", col("temp_weight") / col("share"))
      .select(col("lang"), col("n_docs"), col("share"), col("temp_weight"), col("sample_boost"))
  }

  /** Context-window chunking: split each document into fixed token
    * windows with overlap (window=128, stride=96 → 32-token overlap),
    * the standard prep step that turns variable-length documents into
    * model-sized training sequences. Emits per chunk its token span and
    * a content hash of the exact token slice, so downstream dedup can
    * run at chunk granularity.
    *
    * Scale design: a narrow per-row explode — chunk starts are a
    * `sequence(0, n-1, stride)` generator, so a document fans out into
    * exactly its own chunks with no shuffle, no state, and no driver
    * participation; output size is input size × (1 + overlap/stride).
    * The slice is taken once per chunk from the already-tokenized
    * array (tokenization is not repeated per chunk). */
  val qChunking: QueryDef = {
    val window = 128
    val stride = 96
    QueryDef.sql(
      "q_text_chunking",
      s"""WITH tokd AS (
         |  SELECT doc_id, t, len(t) AS n_tokens
         |  FROM (SELECT doc_id, ${tokensSql("text")} AS t FROM documents)
         |  WHERE len(t) > 0
         |)
         |SELECT doc_id, n_tokens,
         |  s // $stride AS chunk_idx,
         |  s + 1 AS tok_start,
         |  least(s + $window, n_tokens) AS tok_end,
         |  least(s + $window, n_tokens) - s AS n_chunk_tokens,
         |  ${h60Sql(s"array_to_string(t[s + 1 : least(s + $window, n_tokens)], ' ')")} AS chunk_hash
         |FROM (SELECT doc_id, t, n_tokens,
         |        unnest(generate_series(0, n_tokens - 1, $stride)) AS s
         |      FROM tokd)""".stripMargin) { (spark, dir) =>
      val toks = tokens(col("text"))
      Tables.documents(spark, dir)
        .select(col("doc_id"), toks.as("t"))
        .withColumn("n_tokens", size(col("t")).cast("long"))
        .where(col("n_tokens") > 0)
        .select(col("doc_id"), col("t"), col("n_tokens"),
          explode(sequence(lit(0L), col("n_tokens") - 1, lit(stride.toLong))).as("s"))
        .select(
          col("doc_id"), col("n_tokens"),
          (col("s") / stride).cast("long").as("chunk_idx"),
          (col("s") + 1).as("tok_start"),
          least(col("s") + window, col("n_tokens")).as("tok_end"),
          (least(col("s") + window, col("n_tokens")) - col("s")).as("n_chunk_tokens"),
          h60(array_join(slice(col("t"), (col("s") + 1).cast("int"),
            (least(col("s") + window, col("n_tokens")) - col("s")).cast("int")), " "))
            .as("chunk_hash"))
    }
  }

  /** Corpus-mix report: per-source composition — doc/token volume,
    * exact-dup rate (docs minus distinct content hashes), language
    * spread, and corpus share. The one-page answer to "what is this
    * corpus made of", grouped by the provenance column a crawl pipeline
    * carries anyway.
    *
    * Scale: one hash-aggregate keyed by source (tiny key space, so the
    * exchange moves partial aggregates, not rows) plus a 1-row broadcast
    * total; the distinct-hash count shuffles (source, hash) pairs —
    * 8 bytes of hash per doc, never the text. Shares are single IEEE
    * divisions of exact integers, so they compare bit-identically. */
  val qCorpusMix: QueryDef = QueryDef.sql(
    "q_corpus_mix",
    s"""WITH per AS (
       |  SELECT source,
       |    count(*) AS n_docs,
       |    count(DISTINCT ${h60Sql("text")}) AS n_unique,
       |    CAST(sum(len(${tokensSql("text")})) AS BIGINT) AS n_tokens,
       |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |    count(DISTINCT lang) AS n_langs
       |  FROM documents GROUP BY source
       |), t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS corpus_docs,
       |                CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens FROM per)
       |SELECT source, n_docs, n_unique,
       |  n_docs - n_unique AS n_exact_dups,
       |  CAST(n_docs - n_unique AS DOUBLE) / n_docs AS dup_ratio,
       |  n_tokens, total_chars, n_langs,
       |  CAST(n_docs AS DOUBLE) / corpus_docs AS doc_share,
       |  CAST(n_tokens AS DOUBLE) / corpus_tokens AS token_share
       |FROM per CROSS JOIN t""".stripMargin) { (spark, dir) =>
    val per = Tables.documents(spark, dir)
      .select(col("source"), col("lang"), col("n_chars"),
        h60(col("text")).as("h"), size(tokens(col("text"))).cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_unique"),
        sum(col("toks")).as("n_tokens"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"))
    val t = per.agg(sum(col("n_docs")).as("corpus_docs"),
      sum(col("n_tokens")).as("corpus_tokens"))
    per.crossJoin(broadcast(t))
      .select(col("source"), col("n_docs"), col("n_unique"),
        (col("n_docs") - col("n_unique")).as("n_exact_dups"),
        ((col("n_docs") - col("n_unique")).cast("double") / col("n_docs")).as("dup_ratio"),
        col("n_tokens"), col("total_chars"), col("n_langs"),
        (col("n_docs").cast("double") / col("corpus_docs")).as("doc_share"),
        (col("n_tokens").cast("double") / col("corpus_tokens")).as("token_share"))
  }

  /** Token-budget data selection: per language shard, admit documents in
    * quality order (here: lexical-diversity proxy, ties broken by
    * doc_id) until a fixed token budget fills — the selection step of
    * data-mixing recipes ("best N tokens per language"), made
    * deterministic and coordination-free. A doc is admitted iff the
    * running token total THROUGH it stays within budget; the first
    * over-budget doc is dropped but later smaller docs may still fit
    * (the standard greedy-by-rank semantics, expressible as a pure
    * window — an exact knapsack would be sequential and is deliberately
    * not reproduced, same reasoning as [[qPacking]]).
    *
    * Scale: one window per language shard (no global sort at any corpus
    * size)… but note the admit test needs a SECOND pass over the
    * running sum (sum of admitted-so-far, which depends on prior admit
    * decisions). The greedy-by-rank approximation here uses the
    * running sum over ALL ranked docs — admit iff cumsum ≤ budget —
    * which is the prefix form with a single window and matches the
    * common "truncate the ranked stream at the budget" recipe. */
  val qBudget: QueryDef = {
    val budget = 4096
    QueryDef.sql(
      "q_corpus_budget",
      s"""WITH scored AS (
         |  SELECT doc_id, lang, len(t) AS n_tokens,
         |    CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS quality
         |  FROM (SELECT doc_id, lang, ${tokensSql("text")} AS t FROM documents)
         |  WHERE len(t) > 0
         |), ranked AS (
         |  SELECT doc_id, lang, n_tokens, quality,
         |    CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens
         |  FROM scored
         |  WINDOW w AS (PARTITION BY lang ORDER BY quality DESC, doc_id
         |               ROWS UNBOUNDED PRECEDING)
         |)
         |SELECT doc_id, lang, n_tokens, quality, cum_tokens
         |FROM ranked WHERE cum_tokens <= $budget""".stripMargin) { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("quality").desc, col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"), tokens(col("text")).as("t"))
        .where(size(col("t")) > 0)
        .select(col("doc_id"), col("lang"),
          size(col("t")).cast("long").as("n_tokens"),
          (size(array_distinct(col("t"))).cast("double") / size(col("t"))).as("quality"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .where(col("cum_tokens") <= budget)
    }
  }

  /** Deterministic global shuffle-shard for training export: the last
    * mile of every pretraining pipeline is "write the corpus as N shards
    * in pseudo-random order". A `rand()` shuffle or `ORDER BY rand()`
    * is neither reproducible nor append-stable, and a true global sort
    * of 100 TB is a needless all-to-all; a seeded content-hash key gives
    * shard = key mod N and an intra-shard order that is pseudorandom,
    * reproducible run-over-run, and computable per-row. The rank window
    * is partitioned by shard, so parallelism = N shards and no global
    * sort exists at any corpus size — the export writer pairs this with
    * `partitionBy(shard)` + `sortWithinPartitions(pos)`, one exchange
    * total. */
  val qShuffleShard: QueryDef = {
    val shards = 8
    val seed = "graft:shuffle:42"
    QueryDef.sql(
      "q_corpus_shuffle",
      s"""SELECT doc_id, shard, row_number() OVER w AS pos
         |FROM (SELECT doc_id,
         |        ${h60Sql(s"(CAST(doc_id AS VARCHAR) || ':$seed')")} % $shards AS shard,
         |        ${h60Sql(s"(CAST(doc_id AS VARCHAR) || ':$seed')")} AS skey
         |      FROM documents)
         |WINDOW w AS (PARTITION BY shard ORDER BY skey, doc_id)""".stripMargin) {
      (spark, dir) =>
        val skey = h60(concat(col("doc_id").cast("string"), lit(s":$seed")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))
        Tables.documents(spark, dir)
          .select(col("doc_id"), (skey % shards).as("shard"), skey.as("skey"))
          .withColumn("pos", row_number().over(w))
          .select(col("doc_id"), col("shard"), col("pos"))
    }
  }

  /** Per-domain contribution caps: pretraining mixes cap how much any
    * one source/domain contributes (a handful of giant crawl domains
    * would otherwise dominate the mixture). Rank within each source by
    * content hash — an unbiased fixed-size uniform sample per domain,
    * equivalent to a seeded reservoir — and keep rank ≤ cap. The window
    * partitions by source, so at web scale (millions of domains) every
    * partition is small and there is no global ordering anywhere; a
    * single pathological mega-domain is exactly the AQE skew-split
    * case, and the rank it computes is still per-domain-local. */
  val qDomainCap: QueryDef = {
    val cap = 10
    QueryDef.sql(
      "q_corpus_domain_cap",
      s"""SELECT doc_id, source, r AS source_rank,
         |  CASE WHEN r <= $cap THEN 'kept' ELSE 'capped' END AS status
         |FROM (SELECT doc_id, source,
         |        row_number() OVER (PARTITION BY source ORDER BY ${h60Sql("text")}, doc_id) AS r
         |      FROM documents)""".stripMargin) {
      (spark, dir) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(h60(col("text")), col("doc_id"))
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"),
            row_number().over(w).as("r"))
          .select(col("doc_id"), col("source"), col("r").as("source_rank"),
            when(col("r") <= cap, "kept").otherwise("capped").as("status"))
    }
  }

  /** The writer behind [[qShuffleShard]]'s plan shape: export `docs` as
    * exactly `shards` parquet files under `outDir/shard=N/`, each
    * internally ordered by the seeded content-hash key — reproducible
    * pseudo-random training order with ONE exchange and no global sort.
    * Every shard hashes to exactly one task, so each shard directory
    * holds one file regardless of the shuffle-partition count. */
  def writeShards(docs: org.apache.spark.sql.DataFrame, outDir: String,
      shards: Int, seed: String): Unit = {
    require(shards > 0, s"shards must be positive: $shards")
    val skey = h60(concat(col("doc_id").cast("string"), lit(s":$seed")))
    docs.withColumn("shard", (skey % shards).cast("int"))
      .withColumn("__skey", skey)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__skey"), col("doc_id"))
      .drop("__skey")
      .write.partitionBy("shard").mode("overwrite").parquet(outDir)
  }

  /** Diversity (cluster-balanced) sampling: assign every embedding to
    * its nearest coarse centroid, then keep a FIXED QUOTA per cluster in
    * deterministic hash order — the embedding-space answer to "don't let
    * one dominant mode fill the training mix" (cluster-uniform selection,
    * the SemDeDup/DSIR-adjacent curation step).
    *
    * The quantizer is the TRAINED fixed-K seeded-Lloyd codebook
    * ([[Similarity.trainCentroids]], the same centroids `q_sim_ivf_trained`
    * searches with): K is a constant (8), so assignment is one map-side
    * pass of K dot products per vector — O(N·K) with K fixed, and the
    * centroid literals ride in the task binary, not a corpus-proportional
    * broadcast. Deterministic end to end: the trainer is seeded, the k·dim
    * doubles embed as literals in BOTH engines (`Double.toString` is the
    * shortest round-trip form, which DuckDB parses back bit-identically),
    * and the per-cell rank hash is md5-derived. Tiebreaks mirror
    * [[Similarity.assignCells]]: argmax cosine, ties to the LARGER cell
    * (hence `c.cell_id DESC` in the oracle).
    *
    * Scale: assignment shuffles nothing; the quota cut is one window
    * keyed by cell — shuffles carry (vec_id, cell, hash), never vectors. */
  lazy val qDiversity: QueryDef = {
    val quota = 10
    val dim = 64
    val cents = Similarity.trainedCentsFixture
    def dotSql(a: String, b: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1,$dim), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x,y) -> x+y)"
    val values = cents.zipWithIndex.map { case (w, ci) =>
      val cnrm = math.sqrt(w.map(x => x * x).sum)
      s"($ci, [${w.mkString(", ")}]::DOUBLE[], $cnrm)"
    }.mkString(",\n         |  ")
    QueryDef.sql(
      "q_corpus_diversity",
      s"""WITH norms AS (
         |  SELECT vec_id, embedding,
         |    sqrt(${dotSql("embedding", "embedding")}) AS nrm
         |  FROM embeddings
         |), cents(cell_id, c_emb, c_nrm) AS (VALUES
         |  $values
         |), assign AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT n.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
         |          c.cell_id DESC) AS rn
         |    FROM norms n CROSS JOIN cents c) WHERE rn = 1
         |)
         |SELECT cell_id, vec_id, rnk FROM (
         |  SELECT cell_id, vec_id,
         |    row_number() OVER (PARTITION BY cell_id
         |      ORDER BY ${h60Sql("vec_id || ':div'")}, vec_id) AS rnk
         |  FROM assign)
         |WHERE rnk <= $quota""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      Similarity.assignCells(emb, cents)
        .select(col("vec_id"), col("cell").as("cell_id"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("cell_id").orderBy(
            h60(concat(col("vec_id").cast("string"), lit(":div"))),
            col("vec_id"))))
        .where(col("rnk") <= quota)
        .select(col("cell_id"), col("vec_id"), col("rnk"))
    }
  }

  /** JSONL corpus interchange: write the documents as JSON Lines (the
    * lingua franca between curation stages and training launchers), read
    * them back under an EXPLICIT schema (inference would be a second
    * full scan — never pay it at corpus scale), and aggregate per
    * source. The oracle computes the same aggregates straight from
    * parquet, so any fidelity loss through the text encode→escape→parse
    * round trip (newlines, quotes, unicode, null fields) changes an md5
    * and hash-mismatches. Export and re-read are both full-parallel:
    * one JSONL part per input partition, no coalesce, no driver data. */
  val qJsonlRoundtrip: QueryDef = QueryDef.sql(
    "q_corpus_jsonl",
    """SELECT source, count(*) AS n_docs,
      |  min(md5(text)) AS min_md5, max(md5(text)) AS max_md5,
      |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
      |FROM documents GROUP BY source""".stripMargin) { (spark, dir) =>
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl-q-").toString
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text", "lang", "source")
    docs.write.mode("overwrite").json(out)
    spark.read.schema(docs.schema).json(out)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        min(md5(col("text").cast("binary"))).as("min_md5"),
        max(md5(col("text").cast("binary"))).as("max_md5"),
        sum(length(col("text").cast("binary"))).cast("long").as("total_bytes"))
  }

  lazy val all: Seq[QueryDef] =
    Seq(qSplit, qPacking, qStratified, qTemperature, qChunking, qCorpusMix,
      qBudget, qShuffleShard, qDomainCap, qDiversity, qJsonlRoundtrip)
}
