package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Two shapes:
  *   - brute-force cosine top-k: the exact baseline — broadcast the small
  *     query set against the full corpus scan, rank per query. At 100 TB
  *     the corpus side stays partition-parallel and nothing shuffles but
  *     the (tiny) per-query top-k rows.
  *   - IVF (inverted-file) ANN: a coarse quantizer assigns each vector
  *     to its nearest cell; a query searches only its probe cell(s) —
  *     assignment is a broadcast map-side pass, search touches 1/cells
  *     of the data. The SCALE path trains the quantizer with Lloyd
  *     iterations ([[trainCentroids]], `q_sim_ivf_trained`) for
  *     balanced cells; the deterministic every-50th-vector quantizer
  *     below is the ORACLE-PARITY baseline (DuckDB can reproduce its
  *     centroid choice relationally), kept for the oracle rows, not as
  *     the recommended production quantizer.
  *
  * All dot products are explicit left-folds over index order so Spark and
  * the DuckDB oracle produce bit-identical IEEE doubles (same operations,
  * same order), making cosine values — and therefore ranks — exactly
  * comparable.
  */
object Similarity {

  private val dim = 64

  /** Left-fold dot product of two numeric-array columns in double —
    * the native [[graft.functions.VecDot]] expression (one codegen'd
    * fused loop per row; PortableSpec asserts bit-equality with the
    * interpreted `aggregate(zip_with(...))` composition it replaced). */
  private[graft] def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(graft.functions.VecDot(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
  }

  /** DuckDB: identical fold, identical order. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1,$dim), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x,y) -> x+y)"

  private def norms(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"), col("embedding"),
      sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))

  private val normsSql =
    s"SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings"

  /** Exact cosine top-5 for the first 10 vectors as queries. */
  val qCosineTopK: QueryDef = QueryDef.sql(
    "q_sim_cosine_topk",
    s"""WITH norms AS ($normsSql
       |), pairs AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
       |    ${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm) AS cosine
       |  FROM norms q JOIN norms c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 10
       |)
       |SELECT query_id, cand_id, cosine,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
       |FROM pairs
       |QUALIFY rnk <= 5""".stripMargin) { (spark, dir) =>
    val n = norms(spark, dir)
    val q = n.where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val pairs = n.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
    pairs
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .where(col("rnk") <= 5)
  }

  /** IVF-style ANN: deterministic coarse centroids (vec_id % 50 = 0),
    * nearest-centroid assignment, single-probe search, top-3 per query
    * (first 5 vectors as queries). */
  val qIvfAnn: QueryDef = QueryDef.sql(
    "q_sim_ivf_ann",
    s"""WITH norms AS ($normsSql
       |), cents AS (
       |  SELECT vec_id AS cell_id, embedding AS c_emb, nrm AS c_nrm FROM norms WHERE vec_id % 50 = 0
       |), assign AS (
       |  SELECT vec_id, cell_id FROM (
       |    SELECT n.vec_id, c.cell_id,
       |      row_number() OVER (PARTITION BY n.vec_id
       |        ORDER BY ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC, c.cell_id) AS rn
       |    FROM norms n CROSS JOIN cents c) WHERE rn = 1
       |), hits AS (
       |  SELECT q.vec_id AS query_id, qa.cell_id, m.vec_id AS cand_id,
       |    ${dotSql("q.embedding", "m.embedding")} / (q.nrm * m.nrm) AS cosine
       |  FROM norms q
       |  JOIN assign qa ON qa.vec_id = q.vec_id
       |  JOIN assign ma ON ma.cell_id = qa.cell_id AND ma.vec_id <> q.vec_id
       |  JOIN norms m ON m.vec_id = ma.vec_id
       |  WHERE q.vec_id < 5
       |)
       |SELECT query_id, cell_id, cand_id, cosine,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
       |FROM hits
       |QUALIFY rnk <= 3""".stripMargin) { (spark, dir) =>
    val n = norms(spark, dir)
    val cents = n.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    // nearest-centroid assignment costs |vectors|×|centroids| dot
    // products and is referenced twice (query cells + member lists);
    // the window's own vec_id exchange materializes it, and the second
    // reference reuses that exchange instead of recomputing (the window
    // shuffle carries only (vec_id, cell_id, c_cos) — tiny)
    val assign = n.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell_id"),
        (dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm"))).as("c_cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cell_id"))))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("cell_id"))
    val queries = n.where(col("vec_id") < 5)
      .join(assign.withColumnRenamed("vec_id", "q_vec"), col("vec_id") === col("q_vec"))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cell_id"))
    val members = assign.select(col("vec_id").as("cand_id"), col("cell_id").as("m_cell"))
      .join(n.select(col("vec_id").as("cand_id"), col("embedding"), col("nrm")), Seq("cand_id"))
    val hits = members.join(broadcast(queries),
        col("m_cell") === col("cell_id") && col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cell_id"), col("cand_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
    hits
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .where(col("rnk") <= 3)
  }

  /** Embedding-cosine near-dup via sign-LSH (random-hyperplane) buckets:
    * 8 deterministic integer hyperplanes (md5-derived weights, generated
    * once at plan-build and embedded as literals in BOTH plans), each
    * vector keyed by its 8-bit sign pattern, candidate pairs only within
    * a bucket — never all-pairs — then ranked by exact cosine.
    * Sign-LSH property: P(same bit) = 1 − θ/π, so near-parallel vectors
    * collide on all 8 bits with high probability. */
  val qEmbeddingNearDup: QueryDef = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def w(p: Int, i: Int): Long = {
      val hex = md.digest(s"plane-$p,$i".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
    }
    val planes = (0 until 8).map(p => (1 to dim).map(i => w(p, i)))
    def bucketExpr(emb: String, arr: Long => String): String =
      planes.zipWithIndex.map { case (ws, p) =>
        val lits = ws.mkString("[", ", ", "]")
        s"(CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1,$dim), i -> $emb[i]::DOUBLE * (${lits})[i]::DOUBLE)), (x,y) -> x+y) >= 0 THEN ${arr(1L << p)} ELSE 0 END)"
      }.mkString(" + ")
    QueryDef.sql(
      "q_dedup_embedding_lsh",
      s"""WITH norms AS ($normsSql
         |), keyed AS (
         |  SELECT vec_id, embedding, nrm,
         |    ${bucketExpr("embedding", _.toString)} AS bucket
         |  FROM norms
         |), pairs AS (
         |  SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
         |  FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |)
         |SELECT bucket, vec_a, vec_b, cosine,
         |  row_number() OVER (ORDER BY cosine DESC, vec_a, vec_b) AS rnk
         |FROM pairs
         |QUALIFY rnk <= 10""".stripMargin) { (spark, dir) =>
      val planeCols = planes.map(ws => array(ws.map(lit): _*))
      val bucket = planes.indices.map { p =>
        val d = dot(col("embedding"), planeCols(p))
        when(d >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      // bucket assignment (8 hyperplane dot products per vector) is
      // computed once behind a bucket-partitioned exchange; the self-join
      // reuses it for both sides and joins co-clustered (see the
      // materialization notes in Dedup.nearDupPairs)
      val keyed = graft.Tables.spread(norms(spark, dir))
        .select(col("vec_id"), col("embedding"), col("nrm"), bucket.as("bucket"))
        .repartition(col("bucket"))
      val pairs = keyed.as("a").join(keyed.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.bucket").as("bucket"),
          col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          (dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm"))).as("cosine"))
      // distributed top-k, then rank only the k survivors (see Dedup's
      // qNgramJaccard note) — no global-window pass over all pairs.
      pairs
        .orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))
        .limit(10)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("cosine").desc, col("vec_a"), col("vec_b"))))
    }
  }

  /** Multi-probe IVF: queries search their TWO nearest cells instead of
    * one — the `nprobe` knob every production IVF index exposes. Cost
    * doubles (still cells/nprobe× below brute force); recall rises
    * because near-boundary queries stop missing neighbors quantized
    * into the adjacent cell (SimilaritySpec measures both probes). */
  val qIvfMultiProbe: QueryDef = QueryDef.sql(
    "q_sim_ivf_multiprobe",
    s"""WITH norms AS ($normsSql
       |), cents AS (
       |  SELECT vec_id AS cell_id, embedding AS c_emb, nrm AS c_nrm FROM norms WHERE vec_id % 50 = 0
       |), ranked AS (
       |  SELECT n.vec_id, c.cell_id,
       |    row_number() OVER (PARTITION BY n.vec_id
       |      ORDER BY ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC, c.cell_id) AS rn
       |  FROM norms n CROSS JOIN cents c
       |), hits AS (
       |  SELECT q.vec_id AS query_id, m.vec_id AS cand_id,
       |    ${dotSql("q.embedding", "m.embedding")} / (q.nrm * m.nrm) AS cosine
       |  FROM norms q
       |  JOIN ranked qa ON qa.vec_id = q.vec_id AND qa.rn <= 2
       |  JOIN ranked ma ON ma.cell_id = qa.cell_id AND ma.rn = 1 AND ma.vec_id <> q.vec_id
       |  JOIN norms m ON m.vec_id = ma.vec_id
       |  WHERE q.vec_id < 5
       |)
       |SELECT query_id, cand_id, cosine,
       |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
       |FROM hits
       |QUALIFY rnk <= 3""".stripMargin) { (spark, dir) =>
    val n = norms(spark, dir)
    val cents = n.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val ranked = n.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell_id"),
        (dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm"))).as("c_cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("c_cos").desc, col("cell_id"))))
    val queryCells = ranked.where(col("rn") <= 2)
      .select(col("vec_id").as("q_vec"), col("cell_id"))
    val queries = n.where(col("vec_id") < 5)
      .join(queryCells, col("vec_id") === col("q_vec"))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cell_id"))
    val members = ranked.where(col("rn") === 1)
      .select(col("vec_id").as("cand_id"), col("cell_id").as("m_cell"))
      .join(n.select(col("vec_id").as("cand_id"), col("embedding"), col("nrm")), Seq("cand_id"))
    members.join(broadcast(queries),
        col("m_cell") === col("cell_id") && col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .where(col("rnk") <= 3)
  }

  // ------------------------------------------------------ trained quantizer

  /** Above this centroid count, [[assignCells]] (and the probe scoring in
    * [[IncrementalAnn.search]]) switch from k unrolled codegen
    * expressions to the single-array-literal form: unrolling is fastest
    * for small k but generated-code/plan size grows linearly with k and
    * becomes the bottleneck at production IVF scale (k = 4096). */
  private[graft] val literalAssignMaxK = 128

  /** `array<struct<cos, cell>>` of the cosine from `emb` to EVERY
    * centroid, computed against ONE array literal (k·dim doubles of
    * DATA in a single `Literal`, not k expression trees). The literal
    * ships with the task binary — which Spark broadcasts per stage — so
    * this is a broadcast-style assignment without join machinery: still
    * a pure map-side pass, no build relation, no shuffle, and the plan
    * stays O(1) expressions regardless of k. Fold order inside each dot
    * product matches [[dot]], so scores are bit-identical to the
    * unrolled form. */
  private[graft] def centScoresArr(emb: Column, nrm: Column,
      cents: Array[Array[Double]]): Column = {
    val data: Seq[(Seq[Double], Double, Int)] = cents.zipWithIndex.map {
      case (w, ci) => (w.toSeq, math.sqrt(w.map(x => x * x).sum), ci)
    }.toSeq
    transform(typedLit(data), c =>
      struct(
        (dot(emb, c.getField("_1")) / (nrm * c.getField("_2"))).as("cos"),
        c.getField("_3").as("cell")))
  }

  /** Nearest-centroid assignment. Input needs `vec_id` and `embedding`;
    * output adds `nrm` and `cell`. At 100 TB this is a pure map-side
    * pass over the corpus — the scale shape IVF assignment must have.
    * Two equivalent forms, switched on [[literalAssignMaxK]]:
    * k ≤ threshold unrolls one codegen'd dot product per centroid with a
    * `greatest` argmax (no loop overhead); k > threshold scores against
    * the single array literal and takes `array_max` (same lexicographic
    * (cos, cell) tiebreak — ties pick the larger cell id in both forms;
    * equivalence on the corpus asserted in SimilaritySpec). */
  def assignCells(emb: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    require(cents.length >= 2, "need at least 2 centroids")
    if (cents.length <= literalAssignMaxK) assignCellsUnrolled(emb, cents)
    else assignCellsBulk(emb, cents)
  }

  private[graft] def assignCellsUnrolled(emb: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    val scored = cents.zipWithIndex.map { case (cw, ci) =>
      val cnrm = math.sqrt(cw.map(x => x * x).sum)
      val d = dot(col("embedding"), array(cw.map(lit): _*))
      struct((d / (col("nrm") * lit(cnrm))).as("cos"), lit(ci).as("cell"))
    }
    emb
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
      .withColumn("cell", greatest(scored.toSeq: _*).getField("cell"))
  }

  private[graft] def assignCellsBulk(emb: DataFrame,
      cents: Array[Array[Double]]): DataFrame =
    emb
      .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
      .withColumn("cell",
        array_max(centScoresArr(col("embedding"), col("nrm"), cents))
          .getField("cell"))

  /** Seeded Lloyd k-means over the embedding column, as DataFrame ops:
    * per iteration, one literal-centroid assignment pass plus one
    * groupBy(cell, dim) mean — only k·dim scalar rows ever reach the
    * driver, never vectors, so training cost is `iters` corpus scans
    * regardless of corpus size. Deterministic: init = the k vectors with
    * the lowest xxhash64(vec_id, seed); empty/degenerate cells keep their
    * previous centroid. Replaces the every-50th-vector placeholder as the
    * production quantizer (the oracle queries keep the placeholder only
    * because DuckDB cannot replay an iterative trainer). */
  def trainCentroids(emb: DataFrame, k: Int, iters: Int,
      seed: Long = 42L, l2: Boolean = false): Array[Array[Double]] = {
    require(k >= 2 && iters >= 0, s"k=$k iters=$iters")
    // l2: assign by Euclidean argmin (= argmax x·c − ‖c‖²/2) instead of
    // cosine — the objective PQ ENCODING uses, so codebooks trained for
    // reconstruction cluster the same way they will be applied
    def l2Assigned(cents: Array[Array[Double]]): DataFrame = {
      val scored = cents.zipWithIndex.map { case (c, k2) =>
        val half = c.map(x => x * x).sum / 2.0
        struct(
          (dot(col("embedding"), array(c.map(lit): _*)) - lit(half)).as("s"),
          lit(k2).as("cell"))
      }
      emb.withColumn("cell", greatest(scored.toSeq: _*).getField("cell"))
    }
    // embedding may be float (raw corpus) or double (PQ residuals)
    var cents: Array[Array[Double]] = emb
      .withColumn("__h", xxhash64(col("vec_id"), lit(seed)))
      .orderBy(col("__h"), col("vec_id")).limit(k)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val means = (if (l2) l2Assigned(cents) else assignCells(emb, cents))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("v").cast("double")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .view.mapValues { rows =>
          // sized from the centroids, not the global dim — the trainer
          // also runs on PQ subvectors
          val a = new Array[Double](cents.head.length)
          rows.foreach(r => a(r.getInt(1)) = r.getDouble(2))
          a
        }.toMap
      cents = cents.zipWithIndex.map { case (old, ci) =>
        means.get(ci) match {
          case Some(m) if math.sqrt(m.map(x => x * x).sum) > 1e-12 => m
          case _ => old // empty or degenerate cell: keep the old centroid
        }
      }
    }
    cents
  }

  /** Mean cosine of every vector to its assigned centroid — the spherical
    * k-means objective (higher is better). */
  def quantizerObjective(emb: DataFrame, cents: Array[Array[Double]]): Double = {
    val best =
      if (cents.length <= literalAssignMaxK) {
        val scored = cents.zipWithIndex.map { case (cw, ci) =>
          val cnrm = math.sqrt(cw.map(x => x * x).sum)
          val d = dot(col("embedding"), array(cw.map(lit): _*))
          struct((d / (col("nrm") * lit(cnrm))).as("cos"), lit(ci).as("cell"))
        }
        greatest(scored.toSeq: _*).getField("cos")
      } else array_max(centScoresArr(col("embedding"), col("nrm"), cents)).getField("cos")
    emb.withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
      .select(best.as("c"))
      .agg(avg(col("c"))).collect()(0).getDouble(0)
  }

  // ------------------------------------------------ trained-quantizer oracle

  /** Fixture the production quantizer is trained on (offline-trained,
    * then frozen — the standard IVF deployment shape; the correctness
    * gate always runs at sf0.01). */
  private val trainDir =
    sys.env.getOrElse("SPARK_GRAFT_TRAIN_DIR", "/root/testdata/sf0.01")

  private[graft] lazy val trainedCentsFixture: Array[Array[Double]] =
    trainCentroids(
      graft.Tables.embeddings(org.apache.spark.sql.SparkSession.active, trainDir)
        .select(col("vec_id"), col("embedding")),
      k = 8, iters = 2)

  /** IVF search with TRAINED centroids under the oracle. The seeded
    * Lloyd trainer is deterministic, so training once at plan-build and
    * embedding the resulting k·dim doubles as literals in BOTH engines
    * makes the trained-quantizer search path oracle-checkable even
    * though DuckDB cannot replay the iterations. Centroid doubles print
    * via `Double.toString` (shortest round-trip form), which DuckDB
    * parses back to the bit-identical double; tiebreaks mirror
    * [[assignCells]] exactly (argmax = max cosine, ties to the LARGER
    * cell id — note the `c.cell DESC`, unlike the placeholder queries'
    * ascending row_number). Lazy: construction trains on the fixture
    * via `SparkSession.active`, so the registry must first be touched
    * with a live session (every main/spec creates one first). */
  lazy val qIvfTrained: QueryDef = {
    val cents = trainedCentsFixture
    val values = cents.zipWithIndex.map { case (w, ci) =>
      val cnrm = math.sqrt(w.map(x => x * x).sum)
      s"($ci, [${w.mkString(", ")}]::DOUBLE[], $cnrm)"
    }.mkString(",\n         |  ")
    QueryDef.sql(
      "q_sim_ivf_trained",
      s"""WITH norms AS ($normsSql
         |), cents(cell, c_emb, c_nrm) AS (VALUES
         |  $values
         |), assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT n.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC, c.cell DESC) AS rn
         |    FROM norms n CROSS JOIN cents c) WHERE rn = 1
         |), hits AS (
         |  SELECT q.vec_id AS query_id, m.vec_id AS cand_id,
         |    ${dotSql("q.embedding", "m.embedding")} / (q.nrm * m.nrm) AS cosine
         |  FROM norms q
         |  JOIN assign qa ON qa.vec_id = q.vec_id
         |  JOIN assign ma ON ma.cell = qa.cell AND ma.vec_id <> q.vec_id
         |  JOIN norms m ON m.vec_id = ma.vec_id
         |  WHERE q.vec_id < 5
         |)
         |SELECT query_id, cand_id, cosine,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
         |FROM hits
         |QUALIFY rnk <= 3""".stripMargin) { (spark, dir) =>
      ivfSearch(
        graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
        cents, col("vec_id") < 5, topk = 3)
    }
  }

  // ------------------------------------------------ product quantization

  /** Train per-subspace PQ codebooks (`subspaces` × `codes` × dim/M):
    * the embedding splits into M contiguous subvectors, each trained
    * with its own seeded Lloyd run — the memory-scale path for ANN at
    * 100 TB, where 64 float dims compress to M byte codes (32× smaller
    * candidate storage; the exact vectors are only read for queries). */
  def trainPqCodebooks(emb: DataFrame, subspaces: Int, codes: Int,
      iters: Int, seed: Long = 42L): Array[Array[Array[Double]]] = {
    require(dim % subspaces == 0, s"dim $dim not divisible into $subspaces subspaces")
    val len = dim / subspaces
    (0 until subspaces).toArray.map { m =>
      trainCentroids(
        emb.select(col("vec_id"),
          slice(col("embedding"), m * len + 1, len).as("embedding")),
        codes, iters, seed + m, l2 = true)
    }
  }

  /** PQ encode: `codes(m)` = the subspace-m codebook row of least L2
    * distance to the subvector. ||x−c||² = ||x||² − 2x·c + ||c||², so
    * argmin = argmax (x·c − ||c||²/2); ties go to the LARGER code
    * (`greatest` on (score, code) structs — mirrored by the oracle's
    * `code DESC`). A pure map-side pass: nothing shuffles, the codebook
    * rides in the task binary as literals. */
  def pqEncode(emb: DataFrame, books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val len = dim / m
    val codeCols = (0 until m).map { mi =>
      val sub = slice(col("embedding"), mi * len + 1, len)
      val scored = books(mi).zipWithIndex.map { case (c, k) =>
        val half = c.map(x => x * x).sum / 2.0
        struct(
          (dot(sub, array(c.map(lit): _*)) - lit(half)).as("s"),
          lit(k).as("k"))
      }
      greatest(scored.toSeq: _*).getField("k")
    }
    emb.withColumn("codes", array(codeCols: _*))
  }

  /** ADC (asymmetric distance computation) search: queries stay exact,
    * every candidate is scored from its CODES alone — each code selects
    * its codebook row with `element_at`, the M rows concatenate into the
    * candidate's RECONSTRUCTION, and the score is one 64-element dot of
    * query × reconstruction (the same single left fold as [[dot]], so
    * scores are bit-identical to the oracle). Expression-only, no UDF.
    * At 100 TB the candidate scan reads M bytes per vector instead of
    * the embedding, and the only shuffle is the per-query top-k. */
  def pqAdcSearch(emb: DataFrame, books: Array[Array[Array[Double]]],
      isQuery: Column, topk: Int): DataFrame = {
    val m = books.length
    val encoded = pqEncode(emb, books).select(col("vec_id"), col("codes"))
    val queries = emb.where(isQuery)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        sqrt(dot(col("embedding"), col("embedding"))).as("q_nrm"))
    val recon = concat((0 until m).map { mi =>
      element_at(typedLit(books(mi).map(_.toSeq).toSeq),
        element_at(col("codes"), mi + 1) + 1)
    }: _*)
    // approximate COSINE: normalize by the reconstruction's norm so the
    // ranking objective matches the exact baseline's (raw MIPS dot would
    // rank large-norm reconstructions first). The reconstruction and its
    // norm materialize ONCE per candidate, below the query join — not
    // once per (query, candidate) pair.
    val reconF = encoded
      .select(col("vec_id"), recon.as("r_emb"))
      .select(col("vec_id"), col("r_emb"),
        sqrt(dot(col("r_emb"), col("r_emb"))).as("r_nrm"))
    reconF.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (dot(col("q_emb"), col("r_emb")) /
          (col("q_nrm") * col("r_nrm"))).as("adc_score"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_score").desc, col("cand_id"))))
      .where(col("rnk") <= topk)
  }

  private lazy val pqBooksFixture: Array[Array[Array[Double]]] =
    trainPqCodebooks(
      graft.Tables.embeddings(org.apache.spark.sql.SparkSession.active, trainDir)
        .select(col("vec_id"), col("embedding")),
      subspaces = 8, codes = 16, iters = 2)

  /** PQ-ADC search under the oracle: the seeded per-subspace trainer is
    * deterministic, so the trained codebooks embed as literals in BOTH
    * engines (the [[qIvfTrained]] technique). Encode tiebreaks and the
    * fixed left-to-right term summation make scores bit-identical. */
  lazy val qPqAdc: QueryDef = {
    val books = pqBooksFixture
    val m = books.length
    val len = dim / m
    // force DIRECT double parsing: a bare decimal literal parses as
    // DECIMAL first and its cast to DOUBLE can land one ulp off; an
    // exponent suffix makes DuckDB parse the shortest-round-trip form
    // straight to the bit-identical IEEE double (these literals reach
    // the OUTPUT score here, unlike qIvfTrained's rank-only centroids)
    def dlit(d: Double): String = {
      val s = d.toString
      if (s.contains('e') || s.contains('E')) s else s + "e0"
    }
    val values = (for {
      mi <- 0 until m
      (c, k) <- books(mi).zipWithIndex
    } yield {
      val half = c.map(x => x * x).sum / 2.0
      s"($mi, $k, [${c.map(dlit).mkString(", ")}]::DOUBLE[], ${dlit(half)})"
    }).mkString(",\n         |  ")
    def subDot(vec: String, mExpr: String, cb: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1,$len), " +
        s"i -> $vec[$mExpr*$len + i]::DOUBLE * $cb[i]::DOUBLE)), (x,y) -> x+y)"
    QueryDef.sql(
      "q_sim_pq_adc",
      s"""WITH norms AS ($normsSql
         |), cb(m, k, c_emb, c_half) AS (VALUES
         |  $values
         |), enc AS (
         |  SELECT vec_id, m, k AS code FROM (
         |    SELECT e.vec_id, cb.m, cb.k,
         |      row_number() OVER (PARTITION BY e.vec_id, cb.m
         |        ORDER BY ${subDot("e.embedding", "cb.m", "cb.c_emb")} - cb.c_half DESC, cb.k DESC) AS rn
         |    FROM embeddings e CROSS JOIN cb) WHERE rn = 1
         |), codes AS (
         |  SELECT vec_id,
         |    ${(0 until m).map(mi =>
              s"max(CASE WHEN m=$mi THEN code END) AS k$mi").mkString(",\n         |    ")}
         |  FROM enc GROUP BY vec_id
         |), recon AS (
         |  SELECT c.vec_id, ${(0 until m).map(mi => s"b$mi.c_emb").mkString(" || ")} AS r_emb
         |  FROM codes c
         |  ${(0 until m).map(mi =>
              s"JOIN cb b$mi ON b$mi.m = $mi AND b$mi.k = c.k$mi").mkString("\n         |  ")}
         |), scores AS (
         |  SELECT q.vec_id AS query_id, r.vec_id AS cand_id,
         |    ${dotSql("q.embedding", "r.r_emb")} /
         |      (q.nrm * sqrt(${dotSql("r.r_emb", "r.r_emb")})) AS adc_score
         |  FROM norms q, recon r
         |  WHERE q.vec_id < 5 AND r.vec_id <> q.vec_id
         |)
         |SELECT query_id, cand_id, adc_score,
         |  row_number() OVER (PARTITION BY query_id ORDER BY adc_score DESC, cand_id) AS rnk
         |FROM scores
         |QUALIFY rnk <= 3""".stripMargin) { (spark, dir) =>
      pqAdcSearch(
        graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
        books, col("vec_id") < 5, topk = 3)
    }
  }

  /** IVF-PQ: the production ANN shape at 100 TB — a coarse IVF cell per
    * vector plus PQ codes of the RESIDUAL (x − centroid), so the index
    * stores one small int + M bytes per vector while search touches only
    * the probe cell's codes. Returns (centroids, residual codebooks);
    * both trainers are the seeded deterministic ones above. */
  def trainIvfPq(emb: DataFrame, cells: Int, subspaces: Int, codes: Int,
      iters: Int, seed: Long = 42L): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cents = trainCentroids(emb, cells, iters, seed)
    val books = trainPqCodebooks(residualFrame(emb, cents), subspaces, codes,
      iters, seed + 1000)
    (cents, books)
  }

  /** `embedding` replaced by the residual to the assigned centroid
    * (keeps `vec_id`, adds `cell`). Map-side: the centroid rides as one
    * array literal, selected by `element_at`. */
  private def residualFrame(emb: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val centSel = element_at(typedLit(cents.map(_.toSeq).toSeq), col("cell") + 1)
    assignCells(emb, cents)
      .select(col("vec_id"), col("cell"),
        zip_with(col("embedding"), centSel,
          (x, c) => x.cast("double") - c).as("embedding"))
  }

  /** IVF-PQ search: candidates come from the query's probe cell only and
    * are scored from cell + codes alone — the candidate's embedding is
    * never read. Reconstruction = centroid + residual-codebook rows;
    * score = q · rec / (‖q‖·‖rec‖), the same approximate cosine as
    * [[pqAdcSearch]]. The cell equi-join is the inverted-list seek;
    * everything else is expression-level. */
  def ivfPqSearch(emb: DataFrame, cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]], isQuery: Column, topk: Int): DataFrame = {
    val m = books.length
    val res = residualFrame(emb, cents)
    val encoded = pqEncode(res, books).select(col("vec_id"), col("cell"), col("codes"))
    val queries = assignCells(emb.where(isQuery), cents)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cell").as("q_cell"))
    val centSel = element_at(typedLit(cents.map(_.toSeq).toSeq), col("cell") + 1)
    val reconRes = concat((0 until m).map { mi =>
      element_at(typedLit(books(mi).map(_.toSeq).toSeq),
        element_at(col("codes"), mi + 1) + 1)
    }: _*)
    val rec = zip_with(centSel, reconRes, (c, r) => c + r)
    // reconstruction + norm once per candidate, below the join
    val reconF = encoded
      .select(col("vec_id"), col("cell"), rec.as("r_emb"))
      .select(col("vec_id"), col("cell"), col("r_emb"),
        sqrt(dot(col("r_emb"), col("r_emb"))).as("r_nrm"))
    reconF
      .join(broadcast(queries),
        col("cell") === col("q_cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (dot(col("q_emb"), col("r_emb")) / (col("q_nrm") * col("r_nrm")))
          .as("adc_score"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_score").desc, col("cand_id"))))
      .where(col("rnk") <= topk)
  }

  private lazy val ivfPqFixture: (Array[Array[Double]], Array[Array[Array[Double]]]) =
    trainIvfPq(
      graft.Tables.embeddings(org.apache.spark.sql.SparkSession.active, trainDir)
        .select(col("vec_id"), col("embedding")),
      cells = 8, subspaces = 8, codes = 16, iters = 2)

  /** IVF-PQ under the oracle: trained centroids AND residual codebooks
    * embed as exact-double literals in both engines; the assignment,
    * residual, encode, reconstruction, and score arithmetic mirror
    * [[ivfPqSearch]] operation for operation (left folds, fixed
    * tiebreaks), so every adc_score is bit-identical. */
  lazy val qIvfPq: QueryDef = {
    val (cents, books) = ivfPqFixture
    val m = books.length
    val len = dim / m
    def dlit(d: Double): String = {
      val s = d.toString
      if (s.contains('e') || s.contains('E')) s else s + "e0"
    }
    val centValues = cents.zipWithIndex.map { case (w, ci) =>
      val cnrm = math.sqrt(w.map(x => x * x).sum)
      s"($ci, [${w.map(dlit).mkString(", ")}]::DOUBLE[], ${dlit(cnrm)})"
    }.mkString(",\n         |  ")
    val bookValues = (for {
      mi <- 0 until m
      (c, k) <- books(mi).zipWithIndex
    } yield {
      val half = c.map(x => x * x).sum / 2.0
      s"($mi, $k, [${c.map(dlit).mkString(", ")}]::DOUBLE[], ${dlit(half)})"
    }).mkString(",\n         |  ")
    def subDot(vec: String, mExpr: String, cb: String) =
      s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1,$len), " +
        s"i -> $vec[$mExpr*$len + i] * $cb[i]::DOUBLE)), (x,y) -> x+y)"
    val reconCat = (0 until m).map(mi => s"b$mi.b_emb").mkString(" || ")
    QueryDef.sql(
      "q_sim_ivf_pq",
      s"""WITH norms AS ($normsSql
         |), cents(cell, c_emb, c_nrm) AS (VALUES
         |  $centValues
         |), books(m, k, b_emb, b_half) AS (VALUES
         |  $bookValues
         |), assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT n.vec_id, c.cell,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC, c.cell DESC) AS rn
         |    FROM norms n CROSS JOIN cents c) WHERE rn = 1
         |), resid AS (
         |  SELECT n.vec_id, a.cell,
         |    list_transform(generate_series(1,$dim),
         |      i -> n.embedding[i]::DOUBLE - c.c_emb[i]) AS r
         |  FROM norms n
         |  JOIN assign a ON a.vec_id = n.vec_id
         |  JOIN cents c ON c.cell = a.cell
         |), enc AS (
         |  SELECT vec_id, m, k AS code FROM (
         |    SELECT r.vec_id, b.m, b.k,
         |      row_number() OVER (PARTITION BY r.vec_id, b.m
         |        ORDER BY ${subDot("r.r", "b.m", "b.b_emb")} - b.b_half DESC, b.k DESC) AS rn
         |    FROM resid r CROSS JOIN books b) WHERE rn = 1
         |), codes AS (
         |  SELECT vec_id,
         |    ${(0 until m).map(mi =>
              s"max(CASE WHEN m=$mi THEN code END) AS k$mi").mkString(",\n         |    ")}
         |  FROM enc GROUP BY vec_id
         |), recon AS (
         |  SELECT c.vec_id, a.cell,
         |    list_transform(generate_series(1,$dim),
         |      i -> ct.c_emb[i] + ($reconCat)[i]) AS rec
         |  FROM codes c
         |  JOIN assign a ON a.vec_id = c.vec_id
         |  JOIN cents ct ON ct.cell = a.cell
         |  ${(0 until m).map(mi =>
              s"JOIN books b$mi ON b$mi.m = $mi AND b$mi.k = c.k$mi").mkString("\n         |  ")}
         |), scores AS (
         |  SELECT q.vec_id AS query_id, r.vec_id AS cand_id,
         |    ${dotSql("q.embedding", "r.rec")} /
         |      (q.nrm * sqrt(${dotSql("r.rec", "r.rec")})) AS adc_score
         |  FROM norms q
         |  JOIN assign qa ON qa.vec_id = q.vec_id
         |  JOIN recon r ON r.cell = qa.cell AND r.vec_id <> q.vec_id
         |  WHERE q.vec_id < 5
         |)
         |SELECT query_id, cand_id, adc_score,
         |  row_number() OVER (PARTITION BY query_id ORDER BY adc_score DESC, cand_id) AS rnk
         |FROM scores
         |QUALIFY rnk <= 3""".stripMargin) { (spark, dir) =>
      ivfPqSearch(
        graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
        cents, books, col("vec_id") < 5, topk = 3)
    }
  }

  /** Single-probe IVF search against an arbitrary centroid set: assign
    * corpus + queries with [[assignCells]], search only the query's cell.
    * Same plan shape as [[qIvfAnn]] (broadcast queries × partition-local
    * members), quantizer pluggable. */
  def ivfSearch(emb: DataFrame, cents: Array[Array[Double]],
      isQuery: Column, topk: Int): DataFrame = {
    val assigned = assignCells(emb, cents)
    val queries = assigned.where(isQuery)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("cell").as("q_cell"))
    assigned
      .join(broadcast(queries),
        col("cell") === col("q_cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .where(col("rnk") <= topk)
  }

  // lazy because the trained queries train on first access (needs a session)
  /** SemDeDup-style semantic dedup: cluster-bounded embedding near-dup
    * with a KEEP/DROP decision per vector. Each vector is assigned to
    * its nearest coarse IVF cell; ONLY within-cell pairs are scored
    * (the SemDeDup recipe — candidates bounded by the cluster, never
    * all-pairs); a vector is dropped when a LOWER-id cell-mate sits
    * within the cosine threshold, `kept_by` naming its keeper (-1 for
    * survivors). Deterministic: greedy by vec_id, no RNG.
    *
    * Scale: assignment is a broadcast map-side pass; the self-join is
    * co-clustered behind one cell-partitioned exchange; per-cell pair
    * count is (cell size choose 2) — the quantizer bounds it the same
    * way it bounds IVF search cost. τ=0.35 is fixture-calibrated (the
    * synthetic vectors top out at cosine 0.48 within cells; a real
    * corpus runs 0.9+); the plan shape is τ-independent. */
  val qSemanticDedup: QueryDef = {
    val tau = 0.35
    QueryDef.sql(
      "q_dedup_semantic",
      s"""WITH norms AS ($normsSql
         |), cents AS (
         |  SELECT vec_id AS cell_id, embedding AS c_emb, nrm AS c_nrm
         |  FROM norms WHERE vec_id % 50 = 0
         |), assigned AS (
         |  SELECT vec_id, cell_id FROM (
         |    SELECT n.vec_id, c.cell_id,
         |      row_number() OVER (PARTITION BY n.vec_id
         |        ORDER BY ${dotSql("n.embedding", "c.c_emb")} / (n.nrm * c.c_nrm) DESC,
         |          c.cell_id) AS rn
         |    FROM norms n CROSS JOIN cents c) WHERE rn = 1
         |), pairs AS (
         |  SELECT b.vec_id AS vec_id, a.vec_id AS keeper
         |  FROM assigned a JOIN assigned b
         |    ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
         |  JOIN norms na ON na.vec_id = a.vec_id
         |  JOIN norms nb ON nb.vec_id = b.vec_id
         |  WHERE ${dotSql("na.embedding", "nb.embedding")} / (na.nrm * nb.nrm) >= ${tau}e0
         |), drops AS (
         |  SELECT vec_id, min(keeper) AS kept_by FROM pairs GROUP BY vec_id
         |)
         |SELECT s.vec_id, s.cell_id,
         |  d.vec_id IS NOT NULL AS dropped,
         |  coalesce(d.kept_by, -1) AS kept_by
         |FROM assigned s LEFT JOIN drops d ON s.vec_id = d.vec_id""".stripMargin) {
      (spark, dir) =>
        val n = norms(spark, dir)
        val cents = n.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("cell_id"), col("embedding").as("c_emb"),
            col("nrm").as("c_nrm"))
        val assigned = graft.Tables.spread(n).crossJoin(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("nrm"), col("cell_id"),
            row_number().over(Window.partitionBy(col("vec_id")).orderBy(
              (dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm"))).desc,
              col("cell_id"))).as("rn"))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("nrm"), col("cell_id"))
          .repartition(col("cell_id"))
        val pairs = assigned.as("a").join(assigned.as("b"),
            col("a.cell_id") === col("b.cell_id") &&
              col("a.vec_id") < col("b.vec_id"))
          .where((dot(col("a.embedding"), col("b.embedding")) /
            (col("a.nrm") * col("b.nrm"))) >= tau)
          .select(col("b.vec_id").as("vec_id"), col("a.vec_id").as("keeper"))
        val drops = pairs.groupBy(col("vec_id"))
          .agg(min(col("keeper")).as("kept_by"))
        assigned.select(col("vec_id"), col("cell_id"))
          .join(drops.withColumnRenamed("vec_id", "d_vec"),
            col("vec_id") === col("d_vec"), "left")
          .select(col("vec_id"), col("cell_id"),
            col("d_vec").isNotNull.as("dropped"),
            coalesce(col("kept_by"), lit(-1L)).as("kept_by"))
    }
  }

  // ---- int8 scalar quantization (SQ8): 4x smaller vectors, asymmetric
  // search — the FAISS ScalarQuantizer shape. Per-DIMENSION trained
  // (vmin, vmax) bounds; code_i = round(255·(x_i−vmin_i)/(vmax_i−vmin_i))
  // clamped to [0,255] (one byte per dimension); search decodes
  // candidates from codes alone and scores against the FULL-PRECISION
  // query (asymmetric — the standard accuracy/compression tradeoff).
  // At 100 TB: the index column is dim bytes/vector instead of 4·dim,
  // the bounds are 2·dim scalars riding the closure, and scoring is
  // pure column arithmetic.

  /** Per-dimension (vmin, vmax) over the corpus — ONE explode +
    * dim-sized aggregation; exact min/max, order-free, deterministic. */
  def trainSqBounds(emb: DataFrame): (Array[Double], Array[Double]) = {
    val rows = emb
      .select(posexplode(col("embedding")).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    (rows.map(_._2), rows.map(_._3))
  }

  /** int8 codes (as ints 0..255 for SQL portability; one byte of
    * information per dimension). Degenerate dimensions (vmax = vmin)
    * code 0 and decode to vmin exactly. */
  def sqEncode(emb: DataFrame, vmins: Array[Double],
      vmaxs: Array[Double]): DataFrame = {
    val mnL = typedLit(vmins.toSeq)
    val mxL = typedLit(vmaxs.toSeq)
    val codes = transform(sequence(lit(1), lit(dim)), i => {
      val x = element_at(col("embedding"), i).cast("double")
      val mn = element_at(mnL, i)
      val mx = element_at(mxL, i)
      when(mx === mn, lit(0))
        .otherwise(greatest(lit(0.0), least(lit(255.0),
          round(lit(255.0) * (x - mn) / (mx - mn)))).cast("int"))
    })
    emb.select(col("vec_id"), codes.as("codes"))
  }

  /** Decoded vector from codes alone: r_i = vmin_i + c_i·(vmax_i−vmin_i)/255. */
  private def sqDecode(codes: Column, vmins: Array[Double],
      vmaxs: Array[Double]): Column = {
    val mnL = typedLit(vmins.toSeq)
    val mxL = typedLit(vmaxs.toSeq)
    transform(sequence(lit(1), lit(dim)), i =>
      element_at(mnL, i) + element_at(codes, i).cast("double") *
        (element_at(mxL, i) - element_at(mnL, i)) / lit(255.0))
  }

  /** Encode∘decode fused into ONE array pass: numerically identical to
    * `sqDecode(sqEncode(...))` (the int code round-trips exactly through
    * double), but evaluates a single higher-order transform per row
    * instead of two with an intermediate code array. */
  private def sqReconCol(emb: Column, vmins: Array[Double],
      vmaxs: Array[Double]): Column = {
    val mnL = typedLit(vmins.toSeq)
    val mxL = typedLit(vmaxs.toSeq)
    transform(sequence(lit(1), lit(dim)), i => {
      val x = element_at(emb, i).cast("double")
      val mn = element_at(mnL, i)
      val mx = element_at(mxL, i)
      val code = when(mx === mn, lit(0))
        .otherwise(greatest(lit(0.0), least(lit(255.0),
          round(lit(255.0) * (x - mn) / (mx - mn)))).cast("int"))
      mn + code.cast("double") * (mx - mn) / lit(255.0)
    })
  }

  /** Asymmetric SQ8 top-k: full-precision queries against candidates
    * reconstructed from their byte codes only. The candidate norm is
    * computed once per candidate BEFORE the query join — not once per
    * (query, candidate) pair. */
  def sqSearch(emb: DataFrame, vmins: Array[Double], vmaxs: Array[Double],
      queryPred: Column, topk: Int): DataFrame = {
    val recon = emb
      .select(col("vec_id"), sqReconCol(col("embedding"), vmins, vmaxs).as("r_emb"))
      .select(col("vec_id"), col("r_emb"),
        sqrt(dot(col("r_emb"), col("r_emb"))).as("r_nrm"))
    val q = emb.where(queryPred).select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("q_nrm"))
    recon.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (dot(col("q_emb"), col("r_emb")) /
          (col("q_nrm") * col("r_nrm")))
          .as("sq_score"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sq_score").desc, col("cand_id"))))
      .where(col("rnk") <= topk)
  }

  private lazy val sqBoundsFixture: (Array[Double], Array[Double]) =
    trainSqBounds(
      graft.Tables.embeddings(org.apache.spark.sql.SparkSession.active, trainDir)
        .select(col("vec_id"), col("embedding")))

  /** SQ8 search under the oracle: the trained bounds are exact corpus
    * min/max (order-free ⇒ deterministic), embedded as double literals
    * in BOTH engines; encode/decode/score use the same fixed-order
    * arithmetic, so scores are bit-identical. */
  lazy val qSq8: QueryDef = {
    val (vmins, vmaxs) = sqBoundsFixture
    def dlit(d: Double): String = {
      val s = d.toString
      if (s.contains('e') || s.contains('E')) s else s + "e0"
    }
    val mnList = vmins.map(dlit).mkString("[", ", ", "]")
    val mxList = vmaxs.map(dlit).mkString("[", ", ", "]")
    QueryDef.sql(
      "q_sim_sq8",
      s"""WITH b AS (SELECT $mnList::DOUBLE[] AS mn, $mxList::DOUBLE[] AS mx
         |), recon AS (
         |  SELECT e.vec_id,
         |    list_transform(generate_series(1,$dim), i ->
         |      b.mn[i] + (CASE WHEN b.mx[i] = b.mn[i] THEN 0.0::DOUBLE
         |        ELSE least(255.0::DOUBLE, greatest(0.0::DOUBLE,
         |          round(255.0::DOUBLE * (e.embedding[i]::DOUBLE - b.mn[i]) /
         |            (b.mx[i] - b.mn[i])))) END) *
         |        (b.mx[i] - b.mn[i]) / 255.0::DOUBLE) AS r_emb
         |  FROM embeddings e, b
         |), q AS (
         |  SELECT vec_id AS query_id, embedding AS q_emb,
         |    sqrt(${dotSql("embedding", "embedding")}) AS q_nrm
         |  FROM embeddings WHERE vec_id < 5
         |), scores AS (
         |  SELECT q.query_id, r.vec_id AS cand_id,
         |    ${dotSql("q.q_emb", "r.r_emb")} /
         |      (q.q_nrm * sqrt(${dotSql("r.r_emb", "r.r_emb")})) AS sq_score
         |  FROM q, recon r WHERE r.vec_id <> q.query_id
         |)
         |SELECT query_id, cand_id, sq_score,
         |  row_number() OVER (PARTITION BY query_id ORDER BY sq_score DESC, cand_id) AS rnk
         |FROM scores
         |QUALIFY rnk <= 3""".stripMargin) { (spark, dir) =>
      sqSearch(
        graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
        vmins, vmaxs, col("vec_id") < 5, topk = 3)
    }
  }

  // ---- binary (1-bit) quantization: 64 dims → 64 sign bits packed into
  // two longs (16 bytes/vector, 16x smaller than float32). Candidate
  // generation is TWO xor+popcount ops per pair (Hamming distance over
  // the packed words) instead of a 64-element dot — the cheapest
  // first-pass filter in the ANN family; survivors are reranked with
  // exact cosine. At 100 TB the bit-code column is what scans: the
  // full-precision vectors are touched only for ~C candidates/query.

  /** Sign bits of dimensions [lo, hi] packed into one long
    * (bit i−lo set ⇔ x_i > 0). Integer arithmetic — exactly portable. */
  private def packSign(emb: Column, lo: Int, hi: Int): Column =
    aggregate(sequence(lit(lo), lit(hi)), lit(0L),
      (acc, i) => acc + when(element_at(emb, i).cast("double") > 0.0,
        pow(lit(2.0), i - lit(lo)).cast("long")).otherwise(lit(0L)))

  /** Binary-code ANN: Hamming top-`cands` over the packed sign bits,
    * then exact-cosine rerank of the survivors to top-`topk`. */
  def binarySearch(emb: DataFrame, queryPred: Column, cands: Int,
      topk: Int): DataFrame = {
    val codes = emb.select(col("vec_id"),
      packSign(col("embedding"), 1, 32).as("b_lo"),
      packSign(col("embedding"), 33, 64).as("b_hi"))
    val q = emb.where(queryPred).select(
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      sqrt(dot(col("embedding"), col("embedding"))).as("q_nrm"),
      packSign(col("embedding"), 1, 32).as("q_lo"),
      packSign(col("embedding"), 33, 64).as("q_hi"))
    val ham = codes.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_emb"), col("q_nrm"),
        col("vec_id").as("cand_id"),
        (bit_count(col("b_lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("b_hi").bitwiseXOR(col("q_hi")))).as("hamming"))
      .withColumn("hrnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("hamming"), col("cand_id"))))
      .where(col("hrnk") <= cands)
    // rerank: only the C survivors/query touch full-precision vectors
    ham.join(emb.select(col("vec_id").as("cand_id"), col("embedding")), "cand_id")
      .select(col("query_id"), col("cand_id"), col("hamming"),
        (dot(col("q_emb"), col("embedding")) /
          (col("q_nrm") * sqrt(dot(col("embedding"), col("embedding")))))
          .as("cosine"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))))
      .where(col("rnk") <= topk)
  }

  /** Oracle twin: the packed words are integers (no IEEE-order concerns)
    * and the rerank reuses the pinned-order dot, so rows are
    * bit-identical. DuckDB's xor()/bit_count mirror Spark's. */
  lazy val qBinaryHamming: QueryDef = {
    def packSql(lo: Int, hi: Int): String =
      s"""list_reduce(list_prepend(0::BIGINT, list_transform(generate_series($lo,$hi),
         | i -> CASE WHEN embedding[i]::DOUBLE > 0.0
         |   THEN CAST(pow(2.0, i - $lo) AS BIGINT) ELSE 0::BIGINT END)), (a,b) -> a+b)""".stripMargin
    QueryDef.sql(
      "q_sim_binary_hamming",
      s"""WITH codes AS (
         |  SELECT vec_id, ${packSql(1, 32)} AS b_lo, ${packSql(33, 64)} AS b_hi
         |  FROM embeddings
         |), q AS (
         |  SELECT vec_id AS query_id, embedding AS q_emb,
         |    sqrt(${dotSql("embedding", "embedding")}) AS q_nrm,
         |    ${packSql(1, 32)} AS q_lo, ${packSql(33, 64)} AS q_hi
         |  FROM embeddings WHERE vec_id < 5
         |), ham AS (
         |  SELECT query_id, q_emb, q_nrm, c.vec_id AS cand_id,
         |    CAST(bit_count(xor(c.b_lo, q.q_lo)) + bit_count(xor(c.b_hi, q.q_hi)) AS INT) AS hamming,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY bit_count(xor(c.b_lo, q.q_lo)) + bit_count(xor(c.b_hi, q.q_hi)), c.vec_id) AS hrnk
         |  FROM codes c, q WHERE c.vec_id <> q.query_id
         |), rer AS (
         |  SELECT query_id, cand_id, hamming,
         |    ${dotSql("h.q_emb", "e.embedding")} /
         |      (h.q_nrm * sqrt(${dotSql("e.embedding", "e.embedding")})) AS cosine
         |  FROM ham h JOIN embeddings e ON e.vec_id = h.cand_id
         |  WHERE h.hrnk <= 20
         |)
         |SELECT query_id, cand_id, hamming, cosine,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rnk
         |FROM rer
         |QUALIFY rnk <= 3""".stripMargin) { (spark, dir) =>
      binarySearch(
        graft.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
        col("vec_id") < 5, cands = 20, topk = 3)
    }
  }

  lazy val all: Seq[QueryDef] =
    Seq(qCosineTopK, qIvfAnn, qIvfMultiProbe, qEmbeddingNearDup, qIvfTrained,
      qPqAdc, qIvfPq, qSemanticDedup, qSq8, qBinaryHamming)
}

