package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** DELETE/UPDATE with subqueries in the condition — a statement surface
  * delta-spark refuses outright. `[NOT] IN (SELECT …)` rewrites to the
  * distributed keyed MERGE (the key set never lands on the driver);
  * scalar-comparison subqueries fold to their single value. */
class DmlSubquerySpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-dmlsub-").toString + "/t"

  private def seed(t: String): Unit =
    DeltaLog.write(spark, (0L until 100L)
      .map(i => (i, s"g${i % 5}", i * 10L))
      .toDF("k", "grp", "amt").repartition(4), t)

  test("DELETE … WHERE k IN (SELECT …) deletes exactly the key set") {
    val t = fresh(); seed(t)
    val keys = fresh()
    DeltaLog.write(spark, (0L until 100L by 7L).toDF("q"), keys)
    GraftSql.exec(spark,
      s"DELETE FROM delta.`$t` WHERE k IN (SELECT q FROM delta.`$keys`)")
    val got = DeltaLog.read(spark, t).select("k").as[Long].collect().toSet
    assert(got == (0L until 100L).filterNot(_ % 7 == 0).toSet)
  }

  test("DELETE … IN subquery with residual conjunct applies both") {
    val t = fresh(); seed(t)
    val keys = fresh()
    DeltaLog.write(spark, (0L until 100L by 2L).toDF("q"), keys)
    GraftSql.exec(spark,
      s"DELETE FROM delta.`$t` WHERE grp = 'g0' AND k IN " +
        s"(SELECT q FROM delta.`$keys`)")
    val got = DeltaLog.read(spark, t).select("k").as[Long].collect().toSet
    // g0 ⇔ k % 5 == 0; deleted ⇔ even AND k % 5 == 0 ⇔ k % 10 == 0
    assert(got == (0L until 100L).filterNot(_ % 10 == 0).toSet)
  }

  test("DELETE … NOT IN keeps SQL null semantics") {
    val t = fresh(); seed(t)
    // a NULL in the list: NOT IN is UNKNOWN for every row — no-op
    val withNull = fresh()
    DeltaLog.write(spark,
      (Seq[Option[Long]](None) ++ (0L until 50L).map(Some(_)))
        .toDF("q"), withNull)
    val v0 = DeltaLog.snapshot(spark, t).version
    GraftSql.exec(spark,
      s"DELETE FROM delta.`$t` WHERE k NOT IN (SELECT q FROM delta.`$withNull`)")
    assert(DeltaLog.snapshot(spark, t).version == v0, "NULL list must no-op")
    assert(DeltaLog.read(spark, t).count() == 100L)
    // without the NULL: rows outside the key set go
    val clean = fresh()
    DeltaLog.write(spark, (0L until 50L).toDF("q"), clean)
    GraftSql.exec(spark,
      s"DELETE FROM delta.`$t` WHERE k NOT IN (SELECT q FROM delta.`$clean`)")
    val got = DeltaLog.read(spark, t).select("k").as[Long].collect().toSet
    assert(got == (0L until 50L).toSet)
  }

  test("scalar subquery folds: DELETE and UPDATE against an aggregate") {
    val t = fresh(); seed(t)
    GraftSql.exec(spark,
      s"DELETE FROM delta.`$t` WHERE amt > (SELECT avg(amt) FROM delta.`$t`)")
    // avg(amt) = 495: rows with amt > 495 ⇔ k >= 50 go
    assert(DeltaLog.read(spark, t).select("k").as[Long].collect().toSet ==
      (0L until 50L).toSet)
    GraftSql.exec(spark,
      s"UPDATE delta.`$t` SET amt = 0 WHERE amt >= (SELECT max(amt) FROM delta.`$t`)")
    val top = DeltaLog.read(spark, t).where(col("k") === 49L)
      .select("amt").as[Long].head()
    assert(top == 0L)
    assert(DeltaLog.read(spark, t).where(col("amt") === 0L).count() == 2L) // k=0 and k=49
  }

  test("UPDATE … WHERE k IN (SELECT …) updates exactly the matches") {
    val t = fresh(); seed(t)
    val keys = fresh()
    DeltaLog.write(spark, (10L until 20L).toDF("q"), keys)
    GraftSql.exec(spark,
      s"UPDATE delta.`$t` SET amt = amt + 1000000 WHERE k IN " +
        s"(SELECT q FROM delta.`$keys`)")
    val bumped = DeltaLog.read(spark, t).where(col("amt") >= 1000000L)
      .select("k").as[Long].collect().toSet
    assert(bumped == (10L until 20L).toSet)
    assert(DeltaLog.read(spark, t).count() == 100L)
  }

  test("scalar subqueries fold anywhere: SET expressions and BETWEEN bounds") {
    val t = fresh(); seed(t)
    // SET value from an aggregate subquery (with arithmetic around it)
    GraftSql.exec(spark,
      s"UPDATE delta.`$t` SET amt = (SELECT max(amt) FROM delta.`$t`) + 5 " +
        s"WHERE k = 0")
    assert(DeltaLog.read(spark, t).where(col("k") === 0L)
      .select("amt").as[Long].head() == 995L)
    // BETWEEN two scalar subqueries in a DELETE condition
    GraftSql.exec(spark,
      s"DELETE FROM delta.`$t` WHERE k BETWEEN " +
        s"(SELECT min(k) + 10 FROM delta.`$t`) AND " +
        s"(SELECT min(k) + 19 FROM delta.`$t`)")
    assert(DeltaLog.read(spark, t).select("k").as[Long].collect().toSet ==
      (0L until 100L).filterNot(k => k >= 10 && k <= 19).toSet)
  }

  test("parser robustness: CASE/strings/nesting around the subquery conjunct") {
    val t = fresh(); seed(t)
    val keys = fresh()
    DeltaLog.write(spark, (0L until 100L by 2L).toDF("q"), keys)
    // a CASE expression whose own AND/parens must not derail the split,
    // a string literal containing AND and parens, and a function call
    // with nested parens — all riding beside the membership conjunct
    GraftSql.exec(spark,
      s"""DELETE FROM delta.`$t` WHERE
         |  CASE WHEN grp = 'g0' AND amt >= 0 THEN 1 ELSE 0 END = 1
         |  AND grp != 'has AND (paren) inside'
         |  AND coalesce(amt, least(1, 2)) >= 0
         |  AND k IN (SELECT q FROM delta.`$keys` WHERE q BETWEEN 0 AND 200)
         |""".stripMargin)
    // deleted ⇔ grp g0 (k%5==0) AND even ⇔ k%10==0
    assert(DeltaLog.read(spark, t).select("k").as[Long].collect().toSet ==
      (0L until 100L).filterNot(_ % 10 == 0).toSet)
    // BETWEEN inside the residual coexists with the membership conjunct
    GraftSql.exec(spark,
      s"DELETE FROM delta.`$t` WHERE k BETWEEN 1 AND 9 AND k IN " +
        s"(SELECT q FROM delta.`$keys`)")
    val got = DeltaLog.read(spark, t).select("k").as[Long].collect().toSet
    assert(!got.exists(k => k >= 1 && k <= 9 && k % 2 == 0))
    assert(got.contains(1L) && got.contains(11L))
    // SET expressions referencing the key column auto-qualify inside
    // the merge (the source carries a same-named key)
    GraftSql.exec(spark,
      s"UPDATE delta.`$t` SET amt = k * 1000000 WHERE k >= 90 AND k IN " +
        s"(SELECT q FROM delta.`$keys`)")
    assert(DeltaLog.read(spark, t).where(col("k") === 92L)
      .select("amt").as[Long].head() == 92000000L)
  }

  test("unsupported shapes refuse loudly; duplicate keys in the list are fine") {
    val t = fresh(); seed(t)
    val e = intercept[Exception] {
      GraftSql.exec(spark,
        s"DELETE FROM delta.`$t` WHERE EXISTS (SELECT 1 FROM delta.`$t`)")
    }
    assert(e.getMessage.contains("unsupported subquery shape"))
    // the IN list is distinct'd: duplicates must not double-fire MERGE
    val dup = fresh()
    DeltaLog.write(spark, Seq(1L, 1L, 2L, 2L, 2L).toDF("q"), dup)
    GraftSql.exec(spark,
      s"DELETE FROM delta.`$t` WHERE k IN (SELECT q FROM delta.`$dup`)")
    assert(DeltaLog.read(spark, t).count() == 98L)
  }
}
