package graft

import graft.plans.TopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property check for the custom top-k operator on GENERATED data: for
  * any (key, value, id) multiset and any k, TopK.perKey equals the
  * row_number window formulation. Random data hits what the fixture
  * can't: empty groups boundary, k larger than group size, all-equal
  * values resolved purely by tiebreaker, single hot key. */
class TopKPropSpec extends SparkSpec {
  import spark.implicits._

  private val genCase = for {
    n <- Gen.chooseNum(0, 60)
    k <- Gen.chooseNum(1, 6)
    rows <- Gen.listOfN(n, for {
      key <- Gen.chooseNum(1, 4)
      v <- Gen.chooseNum(0, 9) // narrow range → heavy ties, tiebreaker decides
    } yield (key, v))
  } yield (k, rows)

  test("TopK.perKey equals the window formulation on random inputs") {
    val prop = Prop.forAll(genCase) { case (k, rows) =>
      val df = rows.zipWithIndex
        .map { case ((key, v), id) => (key, v, id.toLong) }
        .toDF("key", "v", "id")
      val w = Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))
      val window = df.withColumn("rn", row_number().over(w))
        .where(col("rn") <= k).drop("rn")
        .as[(Int, Int, Long)].collect().sorted.toSeq
      val custom = TopK.perKey(df, Seq("key"), Seq("v" -> false, "id" -> true), k)
        .as[(Int, Int, Long)].collect().sorted.toSeq
      custom == window
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
