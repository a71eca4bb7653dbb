package graft.llm

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed byte-pair-encoding tokenizer: learn a merge table from
  * the corpus (the Sennrich/GPT training algorithm) and encode documents
  * with it. The reference pipeline has no tokenizer at all; a training-
  * data engine needs one for token accounting, packing, and budget ops
  * (the `q_corpus_*` family currently approximates tokens by whitespace).
  *
  * Scale shape:
  *   - training operates on the DISTINCT word-frequency table, never the
  *     corpus: one corpus pass builds (word, freq), and each merge round
  *     is a pair-count aggregation over the word VOCABULARY (10⁶–10⁷
  *     rows at web scale — orders of magnitude below the corpus) plus a
  *     1-row argmax to the driver. Driver state = the merge table
  *     (K pairs), nothing else.
  *   - each round's vocabulary re-symbolization persists and the
  *     previous round unpersists: lineage stays O(1) deep, K Spark jobs
  *     total.
  *   - encoding is a pure column fold — the merge table embeds in the
  *     plan as K nested array folds applied in rank order, exactly the
  *     BPE left-to-right non-overlapping scan. No UDFs, no shuffle.
  */
object Bpe {

  /** One learned merge: ranked pair → joined symbol. */
  final case class Merge(a: String, b: String, rank: Int)

  private val EndOfWord = "</w>"

  /** Word → initial symbol array: characters plus the end-of-word
    * sentinel (Sennrich's formulation — merges crossing word boundaries
    * are impossible, and the sentinel distinguishes suffix tokens). */
  private def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** Apply ONE merge to a symbol array: the standard left-to-right
    * non-overlapping scan as an array fold ([a,a,a] under (a,a) →
    * [aa, a], never [a, aa]). */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Adjacent-pair frequencies over the (symbolized) vocabulary,
    * frequency-weighted. */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.where(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("a"),
          element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("n"))

  /** Learn `k` merges from the corpus' text column. Deterministic:
    * argmax ties break on (pair) lexical order. Stops early when no
    * adjacent pair repeats (`minCount` floor).
    *
    * Two physically different paths, ONE semantics (the spec asserts
    * they learn identical tables): when the distinct-word vocabulary
    * fits under `driverVocabMax` it collects ONCE and the k merge
    * rounds run as a driver loop — one Spark job total instead of 2k.
    * Vocabularies above the threshold (10⁶–10⁷ words at web scale)
    * keep the distributed per-round aggregation, whose driver state is
    * the merge table alone. The corpus itself is never collected on
    * either path — only the Zipf-compressed (word, freq) table. */
  def train(docs: DataFrame, text: Column, k: Int, minCount: Long = 2L,
      driverVocabMax: Int = 1 << 20): Seq[Merge] =
    trainWithVocab(docs, text, k, minCount, driverVocabMax)._1

  /** [[train]], additionally returning the collected distinct-word
    * vocabulary when the fast (driver-loop) path ran — callers that
    * encode right after training reuse it to build the encode table
    * from a local relation instead of re-shuffling a distinct over the
    * exploded corpus ([[encodeStats]]'s `vocab` parameter). `None` on
    * the distributed path, whose vocabulary never fits a driver. */
  def trainWithVocab(docs: DataFrame, text: Column, k: Int,
      minCount: Long = 2L,
      driverVocabMax: Int = 1 << 20): (Seq[Merge], Option[Seq[String]]) = {
    val wordFreq = docs
      .select(explode(Portable.tokens(text)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    // take(max+1) returns the WHOLE vocab iff it has <= max rows — the
    // path decision and the fast path's input are the same single job
    val head =
      if (driverVocabMax <= 0) Array.empty[org.apache.spark.sql.Row]
      else wordFreq.take(driverVocabMax + 1)
    if (driverVocabMax > 0 && head.length <= driverVocabMax)
      return (trainLocal(
        head.map(r => (r.getString(0), r.getLong(1))), k, minCount),
        Some(head.map(_.getString(0)).toSeq))
    var vocab = wordFreq
      .select(initialSymbols(col("w")).as("syms"), col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val merges = Seq.newBuilder[Merge]
    var prev: Option[DataFrame] = None
    var rank = 0
    var done = false
    while (rank < k && !done) {
      // ONE job per round: this argmax also materializes `vocab`'s cache,
      // after which the previous round's cache is safe to drop (no extra
      // count() barrier)
      val top = pairCounts(vocab)
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      prev.foreach(_.unpersist())
      prev = Some(vocab)
      if (top.isEmpty || top(0).getAs[Long]("n") < minCount) done = true
      else {
        val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
        merges += Merge(a, b, rank)
        vocab = vocab
          .select(applyMerge(col("syms"), a, b).as("syms"), col("freq"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        rank += 1
      }
    }
    prev.foreach(_.unpersist())
    vocab.unpersist()
    (merges.result(), None)
  }

  /** UTF-8 byte order — what Spark's string ORDER BY compares (UTF8String
    * is byte-wise); Java's compareTo is UTF-16 code-unit order and the
    * two disagree between U+E000..U+FFFF and supplementary planes, so the
    * driver loop must compare the same way the cluster loop does. */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

  /** The k merge rounds as a driver loop over a collected (word, freq)
    * vocabulary — step-for-step the distributed algorithm: the same
    * adjacent-pair frequency count (every index, overlaps included), the
    * same (n desc, a, b) argmax tie-break in UTF-8 byte order, the same
    * left-to-right non-overlapping re-symbolization, the same minCount
    * stop. */
  private def trainLocal(vocabIn: Array[(String, Long)], k: Int,
      minCount: Long): Seq[Merge] = {
    var vocab: Array[(Array[String], Long)] = vocabIn.map { case (w, f) =>
      ((w.split("") :+ EndOfWord).filter(_.nonEmpty), f)
    }
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < k && !done) {
      val counts = new java.util.HashMap[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.merge((syms(i), syms(i + 1)), f, _ + _)
          i += 1
        }
      }
      var best: ((String, String), Long) = null
      counts.forEach { (p, n) =>
        if (best == null || n > best._2 || (n == best._2 &&
            (utf8Lt(p._1, best._1._1) || (p._1 == best._1._1 &&
              utf8Lt(p._2, best._1._2))))) best = (p, n)
      }
      if (best == null || best._2 < minCount) done = true
      else {
        val (a, b) = best._1
        merges += Merge(a, b, rank)
        val joined = a + b
        vocab = vocab.map { case (syms, f) =>
          val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
          syms.foreach { s =>
            if (out.nonEmpty && out.last == a && s == b)
              out(out.length - 1) = joined
            else out += s
          }
          (out.toArray, f)
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Tokenize one word-column by folding the merge table in rank order —
    * the exact training-time scan, so train-then-encode round-trips. */
  def encodeWord(word: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(initialSymbols(word))(
      (c, m) => applyMerge(c, m.a, m.b))

  /** Per-document token accounting under a trained merge table:
    * tokens-per-doc, chars-per-token compression, and the doc's token
    * array md5 (content-addressable encode identity).
    *
    * The K-fold merge scan runs once per DISTINCT word — the vocabulary
    * is orders of magnitude below the occurrence count (Zipf; a pure
    * per-occurrence fold measured 12× slower at sf0.1 because the
    * array-fold expressions are interpreted, not codegen'd). The two
    * corpus-sized shuffles the naive plan pays are both engineered out:
    *   - the occurrence→vocab join BROADCASTS the finished (word,
    *     tokens) table — the same O(vocab) memory regime the trainer's
    *     fast path already assumes via `driverVocabMax`, so the probe
    *     (occurrence) side never exchanges;
    *   - the per-doc regroup reuses a HashPartitioning(doc_id) planted
    *     UP FRONT on the narrow (doc_id, n_chars, text) projection —
    *     posexplode and a broadcast join both preserve partitioning, so
    *     the only corpus bytes on the wire are the raw compressed text,
    *     ~3× less than shuffling the exploded token structs (and the
    *     exchange doubles as the compute-spread the single-file fixture
    *     needs). */
  def encodeStats(docs: DataFrame, text: Column, merges: Seq[Merge],
      vocab: Option[Seq[String]] = None): DataFrame = {
    val spark = docs.sparkSession
    val base = docs.select(col("doc_id"), col("n_chars"), text.as("__text"))
      .repartition(col("doc_id"))
    val words = base.select(col("doc_id"), col("n_chars"),
      posexplode(Portable.tokens(col("__text"))).as(Seq("pos", "w")))
    // when the trainer already collected the vocabulary (its fast-path
    // regime), the encode table builds from a parallelized local
    // relation — sc.parallelize distributes WITHOUT an exchange, so the
    // distinct-over-occurrences shuffle disappears entirely
    // the broadcast hint is only sound in the driver-vocab regime —
    // the None (distributed) path exists precisely because the
    // vocabulary exceeds what a driver (and so a broadcast) can hold,
    // so there AQE keeps the choice
    val vocabEnc = vocab match {
      case Some(ws) =>
        import spark.implicits._
        broadcast(spark.createDataset(spark.sparkContext.parallelize(
          ws, math.max(1, spark.sparkContext.defaultParallelism)))
          .toDF("w").select(col("w"), encodeWord(col("w"), merges).as("t")))
      case None => words.select(col("w")).distinct()
        .select(col("w"), encodeWord(col("w"), merges).as("t"))
    }
    val toks = words.join(vocabEnc, Seq("w"))
      .select(col("doc_id"), col("n_chars"), col("pos"), col("t"))
    // collect_list order is partition-dependent — the word position
    // pins the encode identity
    toks.groupBy(col("doc_id"))
      .agg(first(col("n_chars")).as("n_chars"),
        sum(size(col("t"))).cast("long").as("n_tokens"),
        md5(concat_ws(" ", flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("t")))),
          x => x.getField("t"))))).as("encode_md5"))
  }

  /** Registered surface: train 12 merges on the documents corpus (the
    * trainer is deterministic, so this is stable run to run), then
    * encode every document. Rows-only gate: the merge-application fold
    * has no faithful DuckDB twin (RE2 lacks the lookbehind a string
    * rewrite would need; list_reduce cannot build arrays), so
    * correctness is owned by `BpeSpec`'s golden + property tests. */
  lazy val qBpeTokens: QueryDef = QueryDef.rowsOnly("q_text_bpe_tokens") {
    (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val (merges, vocab) = trainWithVocab(docs, col("text"), k = 12)
      encodeStats(docs, col("text"), merges, vocab)
  }

  val all: Seq[QueryDef] = Seq(qBpeTokens)
}
