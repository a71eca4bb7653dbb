package graft

import graft.operators.Scd2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.sql.Date

/** Property-based check of the SCD2 merge equivalence on GENERATED change
  * logs (the fixture-based Scd2Spec only exercises the shapes present in
  * the testdata): for any log L0 and update batch B,
  * mergeBatch(fromChangeLog(L0), B) == fromChangeLog(L0 ∪ latestPerKey(B)).
  * Random logs hit the paths real data rarely does — empty initial
  * history, new-key inserts, no-op updates, same-day changes resolved by
  * tiebreak. */
class Scd2PropSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("o_custkey")
  private val attrs = Seq("o_orderstatus", "o_orderpriority")
  private val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority",
    "row_hash", "version_number", "effective_start", "effective_end", "is_current")

  private val genRows: Gen[List[(Int, Int, String, String)]] = for {
    n <- Gen.chooseNum(1, 25)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(1, 4) // few keys → frequent per-key histories
      day <- Gen.chooseNum(1, 20) // few days → same-day tiebreak collisions
      st <- Gen.oneOf("O", "F", "P")
      pr <- Gen.oneOf("1-URGENT", "3-MEDIUM")
    } yield (k, day, st, pr))
  } yield rows

  private def toDf(rows: List[(Int, Int, String, String)]): DataFrame =
    rows.zipWithIndex.map { case ((k, d, s, p), i) =>
      (k, Date.valueOf(f"1995-01-$d%02d"), i, s, p)
    }.toDF("o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus", "o_orderpriority")

  test("mergeBatch(history(L0), B) equals fromChangeLog(L0 ∪ latestPerKey(B))") {
    val prop = Prop.forAll(genRows, Gen.chooseNum(1, 21)) { (rows, cutoffDay) =>
      val df = toDf(rows)
      val cutoff = lit(f"1995-01-$cutoffDay%02d").cast("date")
      val initial = df.where(col("o_orderdate") < cutoff)
      val updates = df.where(col("o_orderdate") >= cutoff)
      val merged = Scd2.mergeBatch(
        Scd2.fromChangeLog(initial, keys, attrs, "o_orderdate", Seq("o_orderkey")),
        updates, keys, attrs, "o_orderdate", Seq("o_orderkey"))
        .select(cols.map(col): _*)
      val expected = Scd2.fromChangeLog(
        initial.unionByName(
          Scd2.latestPerKey(updates, keys, "o_orderdate", Seq("o_orderkey"))),
        keys, attrs, "o_orderdate", Seq("o_orderkey"))
        .select(cols.map(col): _*)
      merged.exceptAll(expected).isEmpty && expected.exceptAll(merged).isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
