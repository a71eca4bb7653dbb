package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` corpus: exact
  * (hash-groupBy), MinHash+LSH near-dup (shingle → minhash → band →
  * bucket-join — never all-pairs), SimHash fingerprints with hamming
  * band keys, and blocked n-gram Jaccard ranking.
  *
  * Scale design (the point of each shape):
  *   - exact dedup: one shuffle on the 60-bit content hash; at 100 TB the
  *     hash is the shuffle key, not the document body.
  *   - minhash-LSH: per-doc signature is a narrow projection; the only
  *     shuffles are the band-bucket equi-join (candidates only — docs
  *     sharing no band never meet) and the pair-verification join by
  *     doc_id. Cost is O(candidates), not O(n²).
  *   - simhash: narrow projection; the 8-bit band keys are the join keys
  *     a hamming-distance dedup would bucket on.
  *   - n-gram Jaccard: the honest quadratic verifier — usable only inside
  *     bounded blocks, demonstrated over a fixed-size audit sample.
  *
  * All hashes route through md5 (Portable.h32/h60) so the DuckDB oracle
  * computes bit-identical values.
  */
object Dedup {
  import Portable._

  /** Fixed multiply-shift minhash parameters (a·h + b mod P); literals are
    * generated from one formula so the Spark plan and the oracle SQL can
    * never drift. */
  private val hashParams: Seq[(Long, Long)] =
    (0 until 16).map(j => (976369L + 104729L * j, 1234567L + 7919L * j))
  private val numBands = 4
  private val rowsPerBand = 4

  /** LSH parameter tuner (MMDS ch. 3, public): pick (bands b, rows r)
    * with b·r ≤ numHashes whose S-curve P(candidate) = 1−(1−s^r)^b best
    * approximates a step at the target Jaccard `threshold` — minimizing
    * the usual asymmetric integral of false positives below the
    * threshold plus false negatives above it. Deterministic closed
    * search over the divisor grid; call once at pipeline-configuration
    * time (the engine's fixed 4×4 default is this tuner's own answer
    * for threshold ≈ 0.75 at 16 hashes). */
  def tuneLsh(threshold: Double, numHashes: Int,
      fpWeight: Double = 0.5): (Int, Int) = {
    require(threshold > 0.0 && threshold < 1.0, s"threshold in (0,1): $threshold")
    require(numHashes >= 2, s"numHashes >= 2: $numHashes")
    def pCand(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    val n = 1000
    val candidates = for {
      r <- 1 to numHashes
      b = numHashes / r
      if b >= 1
    } yield {
      // Riemann error vs the ideal step at `threshold`
      var fp = 0.0; var fn = 0.0
      var i = 0
      while (i < n) {
        val s = (i + 0.5) / n
        val p = pCand(s, b, r)
        if (s < threshold) fp += p else fn += (1.0 - p)
        i += 1
      }
      ((b, r), (fpWeight * fp + (1.0 - fpWeight) * fn) / n)
    }
    candidates.minBy { case ((b, r), err) => (err, -b * r, r) }._1
  }

  /** Exact dedup: canonical id per content-hash group (min doc_id), a
    * flag for the non-canonical members. One shuffle, no text compare. */
  val qExact: QueryDef = QueryDef.sql(
    "q_dedup_exact",
    s"""SELECT doc_id, content_hash,
       |  min(doc_id) OVER (PARTITION BY content_hash) AS canonical_doc_id,
       |  doc_id <> min(doc_id) OVER (PARTITION BY content_hash) AS is_duplicate
       |FROM (SELECT doc_id, ${h60Sql("text")} AS content_hash FROM documents)""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy("content_hash")
    Tables.documents(spark, dir)
      .select(col("doc_id"), h60(col("text")).as("content_hash"))
      .withColumn("canonical_doc_id", min("doc_id").over(w))
      .withColumn("is_duplicate", col("doc_id") =!= col("canonical_doc_id"))
  }

  /** Distinct hashed 3-word shingles per document (Spark side): the
    * native one-pass [[graft.functions.ShingleHash32]] — bit-identical
    * to the composed array_distinct/transform/h32 form the oracle
    * mirrors (PortableSpec asserts equality on the corpus). */
  private def shingleHashes(t: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(graft.functions.ShingleHash32(GraftSqlShim.expression(t)))
  }

  private def shingleHashesSql: String =
    s"""list_distinct(list_transform(
       |    [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in generate_series(1, len(t)-2)],
       |    s -> ${h32Sql("s")}))""".stripMargin

  /** Spark side of the banded-LSH candidate pipeline up to the exact
    * overlap counts: (doc_a, doc_b, n_inter, n_a, n_b) for every
    * candidate pair (doc_a < doc_b) that shared at least one band
    * bucket. [[nearDupPairs]] filters this by symmetric Jaccard;
    * [[qContainment]] by asymmetric containment. */
  /** (doc_id, shash) — distinct hashed 3-shingles per doc; docs under 3
    * tokens have no shingle and are excluded. Pure function of any
    * documents-shaped frame, shared by the one-shot queries and the
    * incremental index ([[IncrementalDedup]]). */
  private[graft] def shingleFrame(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("t"))
      .where(size(col("t")) >= 3)
      .select(col("doc_id"), shingleHashes(col("t")).as("shash"))

  /** (doc_id, bk) — the banded LSH bucket keys from a shingle frame:
    * minhash signatures → `numBands` md5 band keys, exploded one row per
    * band. Two docs are candidates iff they share a `bk`. */
  private[graft] def bandKeys(sh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sigCols = hashParams.zipWithIndex.map { case ((a, b), j) =>
      array_min(transform(col("shash"), h => (h * a + b) % MinhashPrime)).as(s"s$j")
    }
    val sig = sh.select(col("doc_id") +: sigCols: _*)
    val bandCols = (0 until numBands).map { bnd =>
      val cols = (0 until rowsPerBand).map(r => col(s"s${rowsPerBand * bnd + r}").cast("string"))
      md5(concat_ws(",", cols: _*)).as(s"band$bnd")
    }
    sig.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"), explode(array(
        (0 until numBands).map(bnd => concat(lit(bnd.toString), col(s"band$bnd"))): _*)).as("bk"))
  }

  private[graft] def candidateOverlapOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // materialization point: the shingle arrays are the expensive stage
    // and are referenced three times (signatures + both verification
    // sides). The explicit hash-partition exchange makes every later
    // reference a ReusedExchange of ONE computation — without it each
    // reference re-scans the corpus and re-shingles (observed: 12 scans
    // in the corpus-curation plan before this line existed).
    val sh = shingleFrame(docs).repartition(col("doc_id"))
    // second materialization, partitioned on the band key: the LSH
    // self-join reads the SAME exchange for both sides and — being
    // pre-clustered on bk — joins without shuffling either side again.
    val keyed = bandKeys(sh).repartition(col("bk"))
    val pairs = keyed.as("a").join(keyed.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val withSets = pairs
      .join(sh.select(col("doc_id"), col("shash").as("sa")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sh.select(col("doc_id"), col("shash").as("sb")), col("doc_b") === col("doc_id")).drop("doc_id")
    withSets.select(
      col("doc_a"), col("doc_b"),
      size(filter(col("sa"), x => array_contains(col("sb"), x))).as("n_inter"),
      size(col("sa")).as("n_a"), size(col("sb")).as("n_b"))
  }

  private def candidateOverlap(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    // the single-file local fixture scans as 1-2 tasks; the shingle/
    // signature arithmetic is the expensive stage, so spread it —
    // gated: a real multi-file corpus arrives pre-partitioned and skips
    // the exchange (Tables.spread).
    candidateOverlapOf(Tables.spread(Tables.documents(spark, dir)))

  /** Exact-Jaccard verification of the candidate pairs (≥ 0.8). */
  def verifiedPairsOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    candidateOverlapOf(docs)
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .where(col("jaccard") >= 0.8)

  /** MinHash-LSH near-dup pairs verified with exact Jaccard ≥ 0.8
    * (doc_a < doc_b). Shared by the pair query, decontamination, the
    * curation composition, and clustering. */
  def nearDupPairs(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    candidateOverlap(spark, dir)
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
      .where(col("jaccard") >= 0.8)

  /** DuckDB CTE chain ending in `inter(doc_a, doc_b, n_inter, n_a, n_b)`
    * — the oracle twin of [[candidateOverlap]]. */
  private def candidateOverlapSql: String = {
    val sigSqls = hashParams.zipWithIndex.map { case ((a, b), j) =>
      s"list_min(list_transform(shash, h -> ($a*h + $b) % $MinhashPrime)) AS s$j"
    }.mkString(",\n       |    ")
    val bandSqls = (0 until numBands).map { bnd =>
      val cols = (0 until rowsPerBand).map(r => s"CAST(s${rowsPerBand * bnd + r} AS VARCHAR)")
      s"md5(${cols.mkString(" || ',' || ")}) AS band$bnd"
    }.mkString(", ")
    val bandArray = (0 until numBands).map(bnd => s"'$bnd' || band$bnd").mkString("[", ", ", "]")
    s"""toks AS (
         |  SELECT doc_id, ${tokensSql("text")} AS t FROM documents
         |), sh AS (
         |  SELECT doc_id, $shingleHashesSql AS shash
         |  FROM toks WHERE len(t) >= 3
         |), sig AS (
         |  SELECT doc_id, shash,
         |    $sigSqls
         |  FROM sh
         |), banded AS (
         |  SELECT doc_id, $bandSqls FROM sig
         |), pairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM (SELECT doc_id, unnest($bandArray) AS bk FROM banded) a
         |  JOIN (SELECT doc_id, unnest($bandArray) AS bk FROM banded) b
         |    ON a.bk = b.bk AND a.doc_id < b.doc_id
         |), inter AS (
         |  SELECT doc_a, doc_b,
         |    len(list_filter(sa.shash, x -> list_contains(sb.shash, x))) AS n_inter,
         |    len(sa.shash) AS n_a, len(sb.shash) AS n_b
         |  FROM pairs JOIN sh sa ON sa.doc_id = doc_a JOIN sh sb ON sb.doc_id = doc_b
         |)""".stripMargin
  }

  /** DuckDB CTE chain ending in `neardup(doc_a, doc_b, jaccard)` —
    * the oracle twin of [[nearDupPairs]]. */
  private def nearDupPairsSql: String =
    s"""$candidateOverlapSql, neardup AS (
       |  SELECT doc_a, doc_b,
       |    CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
       |  FROM inter
       |  WHERE CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) >= 0.8
       |)""".stripMargin

  /** MinHash + banded LSH near-duplicate pairs, verified with exact
    * Jaccard over the shingle sets. 16 signatures, 4 bands × 4 rows —
    * the standard S-curve puts the detection knee near J ≈ 0.7. */
  val qMinhashLsh: QueryDef = QueryDef.sql(
    "q_dedup_minhash_lsh",
    s"""WITH $nearDupPairsSql
       |SELECT doc_a, doc_b, jaccard FROM neardup""".stripMargin)(
    (spark, dir) => nearDupPairs(spark, dir))

  /** Benchmark decontamination: test-split documents that are NEAR-DUPS
    * (verified shingle-Jaccard ≥ 0.8) of any document outside the test
    * split — the check every training pipeline must run before an eval
    * set is trusted (exact-hash contamination is already impossible by
    * construction here: the split key IS the content hash, so an exact
    * dup can never straddle splits; near-dups can and do). Reuses the
    * banded-LSH pair pipeline — at 100 TB the candidate set comes from
    * the bucket join, never an all-pairs scan — then attaches each side's
    * split bucket and keeps pairs that cross the test boundary. The pair
    * set is tiny, so the planner broadcasts it against the narrow
    * bucket frame. */
  val qSplitContamination: QueryDef = QueryDef.sql(
    "q_split_contamination",
    s"""WITH $nearDupPairsSql,
       |b AS (SELECT doc_id, ${h60Sql("text")} % 100 AS bucket FROM documents)
       |SELECT
       |  CASE WHEN ba.bucket >= 90 THEN n.doc_a ELSE n.doc_b END AS test_doc,
       |  CASE WHEN ba.bucket >= 90 THEN n.doc_b ELSE n.doc_a END AS seen_doc,
       |  jaccard
       |FROM neardup n
       |JOIN b ba ON ba.doc_id = n.doc_a
       |JOIN b bb ON bb.doc_id = n.doc_b
       |WHERE (ba.bucket >= 90) <> (bb.bucket >= 90)""".stripMargin) { (spark, dir) =>
    val buckets = Tables.documents(spark, dir)
      .select(col("doc_id"), (h60(col("text")) % 100).as("bucket"))
    nearDupPairs(spark, dir)
      .join(buckets.select(col("doc_id").as("doc_a"), col("bucket").as("bucket_a")), "doc_a")
      .join(buckets.select(col("doc_id").as("doc_b"), col("bucket").as("bucket_b")), "doc_b")
      .where((col("bucket_a") >= 90) =!= (col("bucket_b") >= 90))
      .select(
        when(col("bucket_a") >= 90, col("doc_a")).otherwise(col("doc_b")).as("test_doc"),
        when(col("bucket_a") >= 90, col("doc_b")).otherwise(col("doc_a")).as("seen_doc"),
        col("jaccard"))
  }

  /** Exact n-gram overlap decontamination (n = 8) — the published
    * GPT-3/PaLM eval-hygiene method, complementary to the near-dup check
    * above: a test-split document is contaminated when ANY of its exact
    * token 8-grams also appears in a non-test document. Per doc the
    * distinct gram set is hashed (h60 of the space-joined window), so
    * every shuffle and the train∩test join carry 8-byte hashes, never
    * text; the train side collapses to a distinct gram-hash set first
    * (hash aggregate), which at 100 TB is the bounded-cardinality side
    * of the join. Output: each contaminated test doc with its distinct
    * gram count, the overlapping-gram count, and the overlap fraction. */
  val qDecontamNgram: QueryDef = {
    val n = 8
    QueryDef.sql(
      "q_decontam_ngram",
      s"""WITH toks AS (
         |  SELECT doc_id, (${h60Sql("text")}) % 100 >= 90 AS is_test,
         |    ${tokensSql("text")} AS t
         |  FROM documents
         |), g AS (
         |  SELECT doc_id, is_test,
         |    unnest(list_distinct(list_transform(generate_series(1, len(t) - ${n - 1}),
         |      i -> ${h60Sql(s"array_to_string(t[i:i+${n - 1}], ' ')")}))) AS gh
         |  FROM toks WHERE len(t) >= $n
         |), train AS (SELECT DISTINCT gh FROM g WHERE NOT is_test
         |), test AS (SELECT doc_id, gh FROM g WHERE is_test
         |), per AS (SELECT doc_id, count(*) AS n_grams FROM test GROUP BY 1
         |), sh AS (
         |  SELECT t.doc_id, count(*) AS n_shared
         |  FROM test t JOIN train USING (gh) GROUP BY 1
         |)
         |SELECT p.doc_id AS test_doc, p.n_grams, s.n_shared,
         |  CAST(s.n_shared AS DOUBLE) / p.n_grams AS shared_frac
         |FROM per p JOIN sh s ON s.doc_id = p.doc_id""".stripMargin) { (spark, dir) =>
      val toked = Tables.documents(spark, dir)
        .select(col("doc_id"), (h60(col("text")) % 100 >= 90).as("is_test"),
          tokens(col("text")).as("t"))
        .where(size(col("t")) >= n)
      val grams = toked.select(col("doc_id"), col("is_test"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("t")) - (n - 1)),
          i => h60(concat_ws(" ", slice(col("t"), i, lit(n))))))).as("gh"))
      val trainG = grams.where(!col("is_test")).select("gh").distinct()
      val testG = grams.where(col("is_test")).select(col("doc_id"), col("gh"))
      val perDoc = testG.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      val shared = testG.join(trainG, "gh")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      perDoc.join(shared, Seq("doc_id"))
        .select(col("doc_id").as("test_doc"), col("n_grams"), col("n_shared"),
          (col("n_shared").cast("double") / col("n_grams")).as("shared_frac"))
    }
  }

  /** End-to-end corpus curation — the composition an LLM training-data
    * pipeline actually runs: Gopher-style quality gate ∧ exact-dup
    * canonicalization ∧ near-dup removal (drop the non-canonical side of
    * every verified MinHash pair). Each stage is the oracle-verified
    * operator above; this query verifies their composition. */
  val qCorpusCuration: QueryDef = QueryDef.sql(
    "q_corpus_curation",
    s"""WITH $nearDupPairsSql,
       |qual AS (
       |  SELECT doc_id, lang, n_chars
       |  FROM (
       |    SELECT doc_id, lang, n_chars,
       |      CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS ttr,
       |      CAST(list_reduce(list_prepend(0::BIGINT, list_transform(t, x -> length(x)::BIGINT)), (a, b) -> a + b) AS DOUBLE) / len(t) AS atl,
       |      CAST(len(list_filter(t, x -> x IN ('the', 'a', 'is', 'of', 'and'))) AS DOUBLE) / len(t) AS swr
       |    FROM (SELECT doc_id, lang, n_chars, ${tokensSql("text")} AS t FROM documents))
       |  WHERE n_chars BETWEEN 100 AND 20000 AND ttr >= 0.2
       |    AND atl BETWEEN 2.0 AND 12.0 AND swr >= 0.01
       |), canon AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY ${Portable.h60Sql("text")}) AS c
       |    FROM documents) WHERE doc_id = c
       |)
       |SELECT q.doc_id, q.lang, q.n_chars
       |FROM qual q
       |JOIN canon c ON c.doc_id = q.doc_id
       |WHERE NOT EXISTS (SELECT 1 FROM neardup n WHERE n.doc_b = q.doc_id)""".stripMargin) {
    (spark, dir) =>
      val toks = tokens(col("text"))
      val stats = Tables.documents(spark, dir)
        .withColumn("t", toks)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("text"),
          (size(array_distinct(col("t"))).cast("double") / size(col("t"))).as("ttr"),
          (aggregate(col("t"), lit(0L), (acc, x) => acc + length(x).cast("long")).cast("double") /
            size(col("t"))).as("atl"),
          (size(filter(col("t"), x => x.isInCollection(Seq("the", "a", "is", "of", "and"))))
            .cast("double") / size(col("t"))).as("swr"))
      val qual = stats.where(
        col("n_chars").between(100, 20000) && col("ttr") >= 0.2 &&
          col("atl").between(2.0, 12.0) && col("swr") >= 0.01)
      // canonical ids computed over the FULL corpus (dedup is independent
      // of the quality gate), exactly as the oracle does
      val canonIds = Tables.documents(spark, dir)
        .withColumn("c", min("doc_id").over(
          org.apache.spark.sql.expressions.Window.partitionBy(h60(col("text")))))
        .where(col("doc_id") === col("c"))
        .select(col("doc_id"))
      val dupLosers = nearDupPairs(spark, dir).select(col("doc_b").as("doc_id")).distinct()
      qual.join(canonIds, Seq("doc_id"))
        .join(dupLosers, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("n_chars"))
  }

  /** 32-bit frequency-weighted SimHash per document plus the four 8-bit
    * band keys a hamming-≤k dedup would bucket-join on. A token with bit
    * i set votes +1, else −1; the bit survives when votes ≥ 0, i.e. when
    * 2·count_set ≥ n. */
  val qSimhash: QueryDef = {
    val bitSqls = (0 until 32).map { i =>
      s"CASE WHEN 2 * len(list_filter(th, h -> (h >> $i) & 1 = 1)) >= len(th) THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")
    QueryDef.sql(
      "q_dedup_simhash",
      s"""SELECT doc_id, simhash,
         |  (simhash >> 0) & 255 AS band0, (simhash >> 8) & 255 AS band1,
         |  (simhash >> 16) & 255 AS band2, (simhash >> 24) & 255 AS band3
         |FROM (
         |  SELECT doc_id, $bitSqls AS simhash
         |  FROM (SELECT doc_id, list_transform(${tokensSql("text")}, t -> ${h32Sql("t")}) AS th
         |        FROM documents))""".stripMargin) { (spark, dir) =>
      val th = transform(tokens(col("text")), h32(_))
      val bits = (0 until 32).map { i =>
        when(size(filter(col("th"), h => shiftright(h, i).bitwiseAND(1) === 1)) * 2 >= size(col("th")),
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), th.as("th"))
        .select(col("doc_id"), bits.as("simhash"))
        .select(col("doc_id"), col("simhash"),
          shiftright(col("simhash"), 0).bitwiseAND(255).as("band0"),
          shiftright(col("simhash"), 8).bitwiseAND(255).as("band1"),
          shiftright(col("simhash"), 16).bitwiseAND(255).as("band2"),
          shiftright(col("simhash"), 24).bitwiseAND(255).as("band3"))
    }
  }

  /** Blocked character-4-gram Jaccard: the quadratic verifier, bounded two
    * ways — a fixed audit sample (doc_id < 200) and length-bucket blocking
    * — then ranked to the global top-20 most-similar pairs. */
  val qNgramJaccard: QueryDef = QueryDef.sql(
    "q_dedup_ngram_jaccard",
    s"""WITH g AS (
       |  SELECT doc_id, n_chars // 100 AS sz,
       |    list_distinct(list_transform(
       |      [substr(text, i, 4) for i in generate_series(1, length(text)-3)],
       |      s -> ${h32Sql("s")})) AS gh
       |  FROM documents WHERE doc_id < 200 AND length(text) >= 4
       |), inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    len(list_filter(a.gh, x -> list_contains(b.gh, x))) AS n_inter,
       |    len(a.gh) AS n_a, len(b.gh) AS n_b
       |  FROM g a JOIN g b ON a.sz = b.sz AND a.doc_id < b.doc_id
       |), scored AS (
       |  SELECT doc_a, doc_b, CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter) AS jaccard
       |  FROM inter
       |)
       |SELECT doc_a, doc_b, jaccard,
       |  row_number() OVER (ORDER BY jaccard DESC, doc_a, doc_b) AS rnk
       |FROM scored
       |QUALIFY rnk <= 20""".stripMargin) { (spark, dir) =>
    val grams = array_distinct(transform(
      sequence(lit(1), length(col("text")) - 3),
      i => h32(col("text").substr(i, lit(4)))))
    val g = Tables.documents(spark, dir)
      .where(col("doc_id") < 200 && length(col("text")) >= 4)
      .select(col("doc_id"), expr("n_chars div 100").as("sz"), grams.as("gh"))
    // the pairwise intersection is the quadratic hot loop: spread the
    // probe side across all cores (gated — no-op on pre-partitioned
    // inputs) before the broadcast join computes it.
    val joined = Tables.spread(g).as("a")
      .join(broadcast(g.as("b")),
        col("a.sz") === col("b.sz") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(filter(col("a.gh"), x => array_contains(col("b.gh"), x))).as("n_inter"),
        size(col("a.gh")).as("n_a"), size(col("b.gh")).as("n_b"))
    val scored = joined.select(col("doc_a"), col("doc_b"),
      (col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))).as("jaccard"))
    // distributed top-k (TakeOrderedAndProject — per-partition heaps, no
    // single-partition window over the full pair set); the rank window
    // then runs over exactly k rows. Total order ⇒ row_number ≡ rank.
    // (the WindowExec single-partition warning this rank emits is
    // intended: it runs over exactly the k TakeOrdered survivors)
    scored
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))))
  }

  /** Near-dup CLUSTERS: connected components over the verified MinHash
    * pairs ([[nearDupPairs]]) via distributed min-label propagation
    * ([[graft.operators.Graph.connectedComponents]]) — pairwise dedup
    * drops only `doc_b` of each pair and can leave chains (A~B, B~C with
    * A≁C) partially deduplicated; component clustering keeps exactly one
    * canonical doc per transitive cluster. The oracle recomputes the
    * fixpoint with a recursive CTE, so the converged labels are checked
    * exactly. */
  val qClusters: QueryDef = QueryDef.sql(
    "q_dedup_clusters",
    s"""WITH RECURSIVE $nearDupPairsSql,
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM neardup
       |  UNION SELECT doc_b, doc_a FROM neardup
       |), reach(id, label) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.a, r.label FROM edges e JOIN reach r ON r.id = e.b
       |)
       |SELECT id AS doc_id, min(label) AS cluster_id,
       |  id = min(label) AS is_canonical
       |FROM reach GROUP BY id""".stripMargin) { (spark, dir) =>
    val vertices = Tables.documents(spark, dir).select(col("doc_id").as("id"))
    val edges = nearDupPairs(spark, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    graft.operators.Graph.connectedComponents(vertices, edges)
      .select(col("id").as("doc_id"), col("component").as("cluster_id"),
        (col("id") === col("component")).as("is_canonical"))
  }

  /** Exact-substring duplication profile (the "dedup repeated spans"
    * family popularized for LLM corpora): sample fixed-length character
    * spans on a stride, hash each span, and flag spans whose hash occurs
    * in MORE THAN ONE document. Per doc: span count, cross-doc-duplicated
    * span count, and the duplicated fraction — the signal a span-level
    * deduplicator would cut on.
    *
    * Scale design: the span rows carry only (doc_id, 60-bit hash) — the
    * text stays in the scan stage and is never shuffled. Both consumers
    * (the duplicate-hash aggregate and the span↔duplicate join) shuffle
    * the SAME narrow projection by `h`, so the exchange is computed once
    * and reused. Cross-doc occurrence is min(doc_id)<max(doc_id) — no
    * count(distinct) state. Cost is O(spans), never O(docs²). */
  val qSubstringDedup: QueryDef = {
    val k = 40     // span length (chars)
    val stride = 10
    QueryDef.sql(
      "q_dedup_substring",
      s"""WITH spans AS (
         |  SELECT doc_id,
         |    unnest([${h60Sql(s"substr(text, i, $k)")}
         |            for i in generate_series(1, n_chars - ${k - 1}, $stride)]) AS h
         |  FROM documents WHERE n_chars >= $k
         |), dup AS (
         |  SELECT h FROM spans GROUP BY h HAVING min(doc_id) < max(doc_id)
         |)
         |SELECT s.doc_id, count(*) AS n_spans, count(d.h) AS n_dup_spans,
         |  CAST(count(d.h) AS DOUBLE) / count(*) AS dup_ratio
         |FROM spans s LEFT JOIN dup d ON s.h = d.h
         |GROUP BY s.doc_id""".stripMargin) { (spark, dir) =>
      // materialized on h: the duplicate-hash aggregate AND the span↔dup
      // join both consume this exact partitioning, so the hashing stage
      // runs once and every later reference is a ReusedExchange
      // (PlanSpec asserts it). This exchange carries (doc_id, long) —
      // it IS the aggregation shuffle, not an extra one.
      val spans = Tables.documents(spark, dir)
        .where(col("n_chars") >= k)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), col("n_chars").cast("int") - lit(k - 1), lit(stride))).as("pos"))
        .select(col("doc_id"), h60(expr(s"substring(text, pos, $k)")).as("h"))
        // h is non-null by construction, but the optimizer can't prove it
        // and infers isnotnull(h) on the join's inner side only — stating
        // it on both keeps the two exchange subplans identical (reusable)
        .where(col("h").isNotNull)
        .repartition(col("h"))
      val dup = spans.groupBy(col("h"))
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .where(col("mn") < col("mx"))
        .select(col("h"), lit(1).as("is_dup"))
      spans.join(dup, Seq("h"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), count(col("is_dup")).as("n_dup_spans"))
        .withColumn("dup_ratio", col("n_dup_spans").cast("double") / col("n_spans"))
    }
  }

  /** Containment near-dup pairs: asymmetric overlap |A∩B|/|A| over the
    * shingle sets, from the SAME banded-LSH candidate stage as the
    * Jaccard pipeline. Containment catches what symmetric Jaccard
    * structurally cannot: a short document embedded in a much longer one
    * (boilerplate inclusion, quotation, page-wrapping) has high
    * containment of the short side but low Jaccard, because the union is
    * dominated by the long side. Emits both directions; a pair qualifies
    * when either side is ≥ 0.9 contained. Same scale shape as
    * [[nearDupPairs]]: O(candidates), never all-pairs. */
  val qContainment: QueryDef = QueryDef.sql(
    "q_dedup_containment",
    s"""WITH $candidateOverlapSql
       |SELECT doc_a, doc_b,
       |  CAST(n_inter AS DOUBLE) / n_a AS containment_a,
       |  CAST(n_inter AS DOUBLE) / n_b AS containment_b
       |FROM inter
       |WHERE greatest(CAST(n_inter AS DOUBLE) / n_a,
       |               CAST(n_inter AS DOUBLE) / n_b) >= 0.9""".stripMargin) {
    (spark, dir) =>
      val ca = col("n_inter").cast("double") / col("n_a")
      val cb = col("n_inter").cast("double") / col("n_b")
      candidateOverlap(spark, dir)
        .select(col("doc_a"), col("doc_b"),
          ca.as("containment_a"), cb.as("containment_b"))
        .where(greatest(col("containment_a"), col("containment_b")) >= 0.9)
  }

  /** Cross-document boilerplate detection: chunk every document into
    * non-overlapping 16-token windows, hash each chunk, and call a chunk
    * boilerplate when its hash appears in ≥2 DISTINCT documents (headers,
    * footers, nav templates, license blocks). Emits the per-document
    * boilerplate ratio — the C4-style signal for stripping or
    * down-weighting template-heavy pages.
    *
    * Scale: chunking is a narrow explode; both aggregations key on the
    * 8-byte chunk hash / doc_id, never the text — so at 100 TB the
    * shuffles move hashes. The hash→n_docs side is a broadcast-sized
    * frequency table only if boilerplate is rare; the general-case plan
    * joins on chunk_hash, which AQE handles skew for (a hash shared by
    * millions of docs is itself the skew case salting handles). */
  val qChunkBoilerplate: QueryDef = {
    val window = 16
    QueryDef.sql(
      "q_dedup_boilerplate",
      s"""WITH chunks AS (
         |  SELECT doc_id,
         |    ${h60Sql(s"array_to_string(t[s + 1 : least(s + $window, len(t))], ' ')")} AS chunk_hash
         |  FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, $window)) AS s
         |        FROM (SELECT doc_id, ${tokensSql("text")} AS t FROM documents)
         |        WHERE len(t) > 0)
         |), freq AS (
         |  SELECT chunk_hash, count(DISTINCT doc_id) AS n_docs FROM chunks GROUP BY 1
         |)
         |SELECT c.doc_id,
         |  count(*) AS n_chunks,
         |  count(CASE WHEN f.n_docs >= 2 THEN 1 END) AS n_boilerplate,
         |  CAST(count(CASE WHEN f.n_docs >= 2 THEN 1 END) AS DOUBLE) / count(*) AS boilerplate_ratio
         |FROM chunks c JOIN freq f USING (chunk_hash)
         |GROUP BY c.doc_id""".stripMargin) { (spark, dir) =>
      val chunks = Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .where(size(col("t")) > 0)
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0), size(col("t")) - 1, lit(window))).as("s"))
        .select(col("doc_id"),
          h60(array_join(slice(col("t"), col("s") + 1,
            least(col("s") + window, size(col("t"))) - col("s")), " "))
            .as("chunk_hash"))
      val freq = chunks.groupBy(col("chunk_hash"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      chunks.join(freq, Seq("chunk_hash"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          count(when(col("n_docs") >= 2, 1)).as("n_boilerplate"))
        .withColumn("boilerplate_ratio",
          col("n_boilerplate").cast("double") / col("n_chunks"))
    }
  }

  /** Boilerplate STRIPPING — the actionable counterpart of
    * [[qChunkBoilerplate]]: rebuild each document from only its
    * non-shared chunks (order preserved), emitting the kept token count
    * and the md5 of the cleaned text. Whitespace is normalized to
    * single spaces by the chunk join — acceptable for model-training
    * text, and what makes the rebuild a pure function both engines
    * compute identically.
    *
    * Scale: chunk text crosses the wire in EXACTLY ONE exchange (the
    * per-doc rebuild aggregation; plan-asserted in PlanSpec). The
    * keep/strip decision is made entirely on the narrow
    * (doc_id, s, chunk_hash) frame — freq join and flag aggregation
    * shuffle 8-byte hashes — and the per-doc flag array then joins the
    * per-doc text array on doc_id, where both sides are already
    * hash-partitioned by doc_id from their aggregations, so the join
    * adds no exchange. The zip of the two s-sorted arrays is
    * partition-local; the collect_lists are per-document (bounded by
    * doc length), never cross-document. */
  val qBoilerplateStrip: QueryDef = {
    val window = 16
    QueryDef.sql(
      "q_dedup_boilerplate_strip",
      s"""WITH chunks AS (
         |  SELECT doc_id, s,
         |    array_to_string(t[s + 1 : least(s + $window, len(t))], ' ') AS ctext
         |  FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 1, $window)) AS s
         |        FROM (SELECT doc_id, ${tokensSql("text")} AS t FROM documents)
         |        WHERE len(t) > 0)
         |), freq AS (
         |  SELECT ${h60Sql("ctext")} AS chunk_hash, count(DISTINCT doc_id) AS n_docs
         |  FROM chunks GROUP BY 1
         |)
         |SELECT doc_id,
         |  count(*) FILTER (WHERE n_docs = 1) AS n_kept_chunks,
         |  CAST(coalesce(sum(len(${tokensSql("ctext")})) FILTER (WHERE n_docs = 1), 0)
         |       AS BIGINT) AS n_kept_tokens,
         |  md5(coalesce(string_agg(ctext, ' ' ORDER BY s) FILTER (WHERE n_docs = 1), ''))
         |    AS clean_md5
         |FROM chunks JOIN freq ON ${h60Sql("ctext")} = chunk_hash
         |GROUP BY doc_id""".stripMargin) { (spark, dir) =>
      val chunks = Tables.spread(Tables.documents(spark, dir))
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .where(size(col("t")) > 0)
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0), size(col("t")) - 1, lit(window))).as("s"))
        .select(col("doc_id"), col("s"),
          array_join(slice(col("t"), col("s") + 1,
            least(col("s") + window, size(col("t"))) - col("s")), " ").as("ctext"))
      // keep/strip decided on the NARROW frame: only (doc_id, s, hash)
      // ever shuffles here
      val narrow = chunks.select(col("doc_id"), col("s"), h60(col("ctext")).as("chunk_hash"))
      val freq = narrow.groupBy(col("chunk_hash"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
      val flags = narrow.join(freq, Seq("chunk_hash"))
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(
          struct(col("s"), (col("n_docs") === 1).as("keep")))).as("fl"))
      // the ONLY exchange carrying ctext: the per-doc rebuild aggregation
      val texts = chunks.groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("s"), col("ctext")))).as("parts"))
      // both sides leave their aggregations hash-partitioned by doc_id →
      // the join adds no exchange; arrays are s-sorted so zip aligns
      texts.join(flags, Seq("doc_id"))
        .select(col("doc_id"),
          filter(zip_with(col("parts"), col("fl"), (p, f) =>
            struct(p.getField("ctext").as("ctext"), f.getField("keep").as("keep"))),
            x => x.getField("keep")).as("kept"))
        .select(col("doc_id"),
          size(col("kept")).cast("long").as("n_kept_chunks"),
          aggregate(col("kept"), lit(0L),
            (acc, x) => acc + size(tokens(x.getField("ctext")))).as("n_kept_tokens"),
          md5(array_join(transform(col("kept"), x => x.getField("ctext")), " "))
            .as("clean_md5"))
    }
  }

  val all: Seq[QueryDef] = Seq(qExact, qMinhashLsh, qSimhash, qNgramJaccard,
    qCorpusCuration, qClusters, qSplitContamination, qDecontamNgram,
    qSubstringDedup, qContainment, qChunkBoilerplate, qBoilerplateStrip)
}
