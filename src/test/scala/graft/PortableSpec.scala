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
