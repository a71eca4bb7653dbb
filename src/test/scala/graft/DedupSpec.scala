package graft

import graft.llm.Portable
import org.apache.spark.sql.functions._

/** Dedup primitives: portable hashing, minhash behavior on identical and
  * disjoint documents. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("h60/h32 derive from md5 exactly as the oracle does") {
    val r = Seq("hello").toDF("s")
      .select(Portable.h60(col("s")), Portable.h32(col("s")), md5(col("s")))
      .as[(Long, Long, String)].head()
    // md5("hello") = 5d41402abc4b2a76b9719d911017c592
    assert(r._3 == "5d41402abc4b2a76b9719d911017c592")
    assert(r._2 == java.lang.Long.parseLong("5d41402a", 16))
    assert(r._1 == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }

  test("identical documents collide on every dedup key; disjoint ones on none") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "entirely different words compose this unrelated sentence here now")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents")
    // exact: same content hash
    val hashes = docs.select(col("doc_id"), Portable.h60(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L))
    assert(hashes(1L) != hashes(3L))
    // near-dup jaccard over 3-token shingles: identical → 1.0, disjoint → 0.0
    val toks = Portable.tokens(col("text"))
    val sh = docs.select(col("doc_id"),
      array_distinct(transform(sequence(lit(1), size(toks) - 2),
        i => Portable.h32(concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))).as("sh"))
    val sets = sh.as[(Long, Seq[Long])].collect().toMap
    def jac(a: Seq[Long], b: Seq[Long]) = {
      val i = a.toSet.intersect(b.toSet).size.toDouble
      i / (a.size + b.size - i)
    }
    assert(jac(sets(1L), sets(2L)) == 1.0)
    assert(jac(sets(1L), sets(3L)) == 0.0)
  }

  test("tokenization drops empty tokens on messy whitespace") {
    val t = Seq("  a  b\tc ").toDF("s")
      .select(Portable.tokens(col("s"))).as[Seq[String]].head()
    assert(t == Seq("a", "b", "c"))
  }

  test("substring dedup flags planted cross-doc spans and nothing else") {
    // two docs share their first 40 chars exactly (stride-aligned at
    // pos 1); the third doc shares no 40-char span with anyone
    val common = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // 40 chars
    assert(common.length == 40)
    val docs = Seq(
      (1L, common + " first document's own distinctive tail text"),
      (2L, common + " second document ends in a different way!!"),
      (3L, "no shared forty character run lives anywhere inside this third text")
    ).map { case (id, t) => (id, t, "en", "fixture", t.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("substr_fixture").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = llm.Dedup.qSubstringDedup.build(spark, dir)
      .select(col("doc_id"), col("n_dup_spans"))
      .as[(Long, Long)].collect().toMap
    assert(out(1L) >= 1, "doc 1 shares its leading span with doc 2")
    assert(out(2L) >= 1, "doc 2 shares its leading span with doc 1")
    assert(out(3L) == 0, "doc 3 has no cross-doc span")
  }

  test("LSH tuner: thresholds map to sane (b, r); S-curve crosses near target") {
    // the curve's 50% crossover (1/b)^(1/r) must land near the asked
    // threshold for standard configurations
    Seq((0.5, 128), (0.8, 128), (0.9, 256), (0.7, 64)).foreach {
      case (t, h) =>
        val (b, r) = graft.llm.Dedup.tuneLsh(t, h)
        assert(b * r <= h && b >= 1 && r >= 1)
        val crossover = math.pow(1.0 / b, 1.0 / r)
        assert(math.abs(crossover - t) < 0.15,
          f"threshold $t%.2f, $h hashes -> (b=$b, r=$r), crossover $crossover%.2f")
    }
    // monotonicity: a higher threshold never yields FEWER rows per band
    val r1 = graft.llm.Dedup.tuneLsh(0.5, 128)._2
    val r2 = graft.llm.Dedup.tuneLsh(0.9, 128)._2
    assert(r2 >= r1, s"rows per band must grow with threshold: $r1 -> $r2")
  }
}
