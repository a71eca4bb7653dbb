package graft

import graft.functions.Md5PrefixLong
import graft.llm.Portable
import org.apache.spark.sql.functions._

/** The native md5-prefix expression must be bit-identical to the composed
  * `conv(substring(md5(x),1,n),16,10)` form it replaced — the DuckDB
  * oracles still use the composed rendering, so any divergence here would
  * fail every hash-keyed query. */
class PortableSpec extends SparkSpec {
  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column, n: Int) =
    conv(substring(md5(c), 1, n), 16, 10).cast("long")

  test("native h60/h32 equal the composed md5-prefix form on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val diff = docs.select(
      Portable.h60(col("text")).as("n60"), composed(col("text"), 15).as("c60"),
      Portable.h32(col("text")).as("n32"), composed(col("text"), 8).as("c32"))
      .where(col("n60") =!= col("c60") || col("n32") =!= col("c32"))
    assert(diff.count() == 0)
  }

  test("edge inputs: empty string, unicode, binary, all nibble widths") {
    val rows = Seq("", "a", "héllo wörld 世界", "x" * 10000)
    rows.foreach { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      (1 to 15).foreach { n =>
        val expected = java.lang.Long.parseLong(hex.take(n), 16)
        assert(Md5PrefixLong.compute(s.getBytes("UTF-8"), n) == expected,
          s"input '$s' nibbles $n")
      }
    }
  }

  test("RewriteMd5Prefix turns the composed user spelling into the native expr") {
    import graft.functions.RewriteMd5Prefix
    val composedDf = Tables.documents(spark, sfDir)
      .select(composed(col("text"), 15).as("h"))
    val before = composedDf.queryExecution.optimizedPlan
    val after = RewriteMd5Prefix(before)
    assert(before.toString.contains("conv"), before.toString)
    assert(after.toString.contains("md5_prefix_long"), after.toString)
    // and it is value-preserving (rule output executed via a new frame)
    val rewritten = org.apache.spark.sql.GraftSqlShim
      .ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], after)
    val a = rewritten.as[Long].collect().sorted
    val b = composedDf.as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("native shingle hashing equals the composed form, order included") {
    import org.apache.spark.sql.GraftSqlShim
    val toks = Portable.tokens(col("text"))
    val composedShingles = array_distinct(transform(
      sequence(lit(1), size(toks) - 2),
      i => Portable.h32(concat_ws(" ",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))
    val native = GraftSqlShim.column(graft.functions.ShingleHash32(
      GraftSqlShim.expression(toks)))
    val diff = Tables.documents(spark, sfDir)
      .select(col("doc_id"), composedShingles.as("c"), native.as("n"))
      .where(not(col("c") <=> col("n"))) // null-safe, ORDER-sensitive array equality
    assert(diff.count() == 0)
    // short token arrays produce empty shingle sets, not errors
    val edge = spark.sql("SELECT 1")
      .select(GraftSqlShim.column(graft.functions.ShingleHash32(
        GraftSqlShim.expression(array(lit("a"), lit("b"))))).as("s"))
      .selectExpr("size(s) AS n").collect()(0).getInt(0)
    assert(edge == 0)
  }

  test("tokens (regexp_extract_all \\S+) equals split-on-\\s+ with empties dropped") {
    // the DuckDB oracles tokenize as
    // list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '');
    // the engine's regexp_extract_all form must produce the identical
    // array (values AND order) on the corpus and on whitespace edges
    val composedToks = filter(split(col("text"), "\\s+"), t => t =!= lit(""))
    val corpusDiff = Tables.documents(spark, sfDir)
      .select(Portable.tokens(col("text")).as("n"), composedToks.as("c"))
      .where(not(col("n") <=> col("c")))
    assert(corpusDiff.count() == 0)
    val edges = Seq("", " ", "  a  ", "a b", "\ta\nb\r c\f", "a", " \t\n",
      "héllo  wörld", "x" * 500 + " " + "y" * 500)
    val edgeDiff = edges.toDF("text")
      .select(Portable.tokens(col("text")).as("n"), composedToks.as("c"))
      .where(not(col("n") <=> col("c")))
    assert(edgeDiff.count() == 0)
  }

  test("native vec_dot equals the aggregate(zip_with(...)) fold, bit for bit") {
    import org.apache.spark.sql.GraftSqlShim
    def native(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      GraftSqlShim.column(graft.functions.VecDot(
        GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
    def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    // full corpus, float arrays, self- and cross-products
    val e = Tables.embeddings(spark, sfDir)
    val seed = broadcast(e.where(col("vec_id") < 3)
      .select(col("vec_id").as("sid"), col("embedding").as("s_emb")))
    val diff = e.crossJoin(seed).select(
      native(col("embedding"), col("s_emb")).as("n"),
      composed(col("embedding"), col("s_emb")).as("c"),
      native(col("embedding"), col("embedding")).as("n2"),
      composed(col("embedding"), col("embedding")).as("c2"))
      .where(not(col("n") <=> col("c")) || not(col("n2") <=> col("c2")))
    assert(diff.count() == 0)
    // edges: empty arrays -> 0.0; length mismatch -> null; null element
    // -> null; null array -> null; double arrays too
    val edges = spark.sql(
      """SELECT * FROM VALUES
        |  (array(1.0D, 2.0D), array(3.0D, 4.0D)),
        |  (array(1.0D, 2.0D), array(3.0D)),
        |  (array(1.0D, CAST(NULL AS DOUBLE)), array(3.0D, 4.0D)),
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(3.0D, 4.0D)),
        |  (array(), array())
        |AS t(a, b)""".stripMargin)
    val edgeDiff = edges.select(native(col("a"), col("b")).as("n"),
        composed(col("a"), col("b")).as("c"))
      .where(not(col("n") <=> col("c")))
    assert(edgeDiff.count() == 0)
    // and the native path stays inside whole-stage codegen
    val plan = e.select(native(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ArrayAggregate") && !plan.contains("ZipWith"), plan)
  }

  test("the hash path stays inside whole-stage codegen (no fallback eval)") {
    val df = Tables.documents(spark, sfDir).select(Portable.h60(col("text")).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // null propagates through the unary null-safe path
    val n = spark.sql("SELECT 1").select(
      Portable.h32(lit(null).cast("string")).as("h")).collect()(0)
    assert(n.isNullAt(0))
  }
}
