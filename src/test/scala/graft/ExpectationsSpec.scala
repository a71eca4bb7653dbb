package graft

import graft.quality.Expectations
import graft.quality.Expectations.{Drop, Expectation, Fail, Track}

/** Expectations engine: drop filtering, observe-based tracking, and the
  * fail action. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1, 10.0), (2, -5.0), (3, 0.0), (4, 60.0), (5, 25.0)
  ).toDF("id", "amount")

  test("Drop rules filter violating rows") {
    val rules = Seq(Expectation("nonneg", "amount >= 0", Drop))
    val cleaned = Expectations.clean(df, rules)
    assert(cleaned.count() == 4)
    assert(cleaned.where("amount < 0").count() == 0)
  }

  test("Track rules count violations via observe without a second pass") {
    val rules = Seq(
      Expectation("nonneg", "amount >= 0", Track),
      Expectation("under_50", "amount <= 50", Track))
    val (observed, obs) = Expectations.observed(df, rules)
    assert(observed.count() == 5) // the action the metrics piggyback on
    assert(obs.get("nonneg") == 1L)
    assert(obs.get("under_50") == 1L)
    assert(obs.get("rows_seen") == 5L)
  }

  test("Fail rules throw on violation, pass when clean") {
    val bad = Seq(Expectation("nonneg", "amount >= 0", Fail))
    val (observedBad, obsBad) = Expectations.observed(df, bad)
    observedBad.count()
    intercept[IllegalArgumentException] {
      Expectations.assertFailRules(obsBad, bad)
    }
    val good = Seq(Expectation("under_100", "amount <= 100", Fail))
    val (observedGood, obsGood) = Expectations.observed(df, good)
    observedGood.count()
    Expectations.assertFailRules(obsGood, good) // must not throw
  }

  test("report emits one row per rule from one aggregate pass") {
    val rows = Expectations.report(
      Tables.lineitem(spark, sfDir), Expectations.lineitemRules)
      .as[(String, String, Long, Long)].collect()
    assert(rows.length == Expectations.lineitemRules.size)
    assert(rows.forall(_._4 == rows.head._4)) // same rows_seen everywhere
  }

  test("quarantine routes violating rows aside, naming every failed rule") {
    val rules = Seq(
      Expectation("nonneg", "amount >= 0", Drop),
      Expectation("under_50", "amount <= 50", Drop))
    val (good, bad) = Expectations.quarantine(df, rules)
    assert(good.columns.toSeq == df.columns.toSeq)
    assert(good.as[(Int, Double)].collect().toSet ==
      Set((1, 10.0), (3, 0.0), (5, 25.0)))
    val quarantined = bad.select("id", "violated_rules")
      .as[(Int, Seq[String])].collect().toMap
    assert(quarantined == Map(2 -> Seq("nonneg"), 4 -> Seq("under_50")))
    // good ∪ bad partitions the input
    assert(good.count() + bad.count() == df.count())
  }
}
