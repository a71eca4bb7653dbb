package graft.quality

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the reference's DLT
  * `expect / expect_or_drop / expect_or_fail` framework
  * (/root/reference/expectations/data_quality.py:12-247, applied at
  * /root/reference/pipelines/silver_pipeline.py:98-99,179-181) rebuilt on
  * plain Spark:
  *
  *   - Drop  → `df.filter(expr(predicate))` (rows violating are removed)
  *   - Track → violation counters via `Dataset.observe` (zero-cost
  *     piggyback on the action; no extra pass)
  *   - Fail  → post-action assertion on the observed counters
  *
  * Scale notes: Drop rules are plain predicates — Catalyst pushes them
  * into the scan. Track rules ride the existing job as accumulator-style
  * observed metrics; [[report]] is the batch variant that aggregates all
  * rules in ONE pass over the data (a single partial+final aggregate, no
  * per-rule scans).
  */
object Expectations {

  sealed trait Action { def name: String }
  case object Drop extends Action { val name = "drop" }
  case object Track extends Action { val name = "track" }
  case object Fail extends Action { val name = "fail" }

  /** One rule: SQL predicate that good rows satisfy. */
  final case class Expectation(name: String, predicate: String, action: Action)

  /** Apply all Drop rules as filters (the cleanse path). */
  def clean(df: DataFrame, rules: Seq[Expectation]): DataFrame =
    rules.filter(_.action == Drop).foldLeft(df)((d, r) => d.filter(expr(r.predicate)))

  /** Attach Track/Fail rules as observed metrics; returns the observed
    * frame and the Observation to read after the next action. Metric per
    * rule = number of violating rows. */
  def observed(df: DataFrame, rules: Seq[Expectation]): (DataFrame, Observation) = {
    val obs = Observation()
    val tracked = rules.filterNot(_.action == Drop)
    val metrics = count(lit(1)).as("rows_seen") +:
      tracked.map(r => sum(when(!expr(r.predicate), 1L).otherwise(0L)).as(r.name))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Quarantine split: good rows satisfy every Drop rule; violating rows
    * are routed aside (the dead-letter pattern) carrying a
    * `violated_rules` array naming each failed rule — so a quality
    * incident is debuggable from the quarantine table alone instead of
    * silently shrinking the clean output. One predicate evaluation per
    * rule per row; both sides derive from a single scan. */
  def quarantine(df: DataFrame, rules: Seq[Expectation]): (DataFrame, DataFrame) = {
    val dropRules = rules.filter(_.action == Drop)
    val flagged = df.withColumn("violated_rules",
      filter(
        array(dropRules.map(r =>
          when(!coalesce(expr(r.predicate), lit(false)), lit(r.name))): _*),
        _.isNotNull))
    val good = flagged.where(size(col("violated_rules")) === 0).drop("violated_rules")
    val bad = flagged.where(size(col("violated_rules")) > 0)
    (good, bad)
  }

  /** Assert Fail rules after an action has run: any violation throws. */
  def assertFailRules(obs: Observation, rules: Seq[Expectation]): Unit =
    rules.filter(_.action == Fail).foreach { r =>
      val violations = obs.get.getOrElse(r.name, 0L).asInstanceOf[Long]
      require(violations == 0L, s"expectation '${r.name}' failed: $violations violating rows")
    }

  /** Batch violation report: one aggregate pass producing a row per rule
    * (rule, action, violations, rows_seen). */
  def report(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val aggs = count(lit(1)).as("__total") +:
      rules.map(r => sum(when(!expr(r.predicate), 1L).otherwise(0L)).as(r.name))
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(rules.map(r => struct(
      lit(r.name).as("rule"),
      lit(r.action.name).as("action"),
      col(r.name).as("violations"),
      col("__total").as("rows_seen"))): _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.action").as("action"),
        col("r.violations").as("violations"), col("r.rows_seen").as("rows_seen"))
  }

  // ------------------------------------------------------------ rule catalog

  /** Lineitem rules, the shape of the reference's silver/gold catalogs
    * (data_quality.py:62-82: non-negative money, bounded rates, valid
    * keys, ordered dates). */
  val lineitemRules: Seq[Expectation] = Seq(
    Expectation("valid_orderkey", "l_orderkey IS NOT NULL AND l_orderkey > 0", Drop),
    Expectation("valid_quantity", "l_quantity > 0 AND l_quantity <= 50", Track),
    Expectation("nonnegative_price", "l_extendedprice >= 0", Fail),
    Expectation("discount_in_range", "l_discount BETWEEN 0 AND 1", Track),
    Expectation("tax_in_range", "l_tax BETWEEN 0 AND 0.1", Track),
    Expectation("shipdate_present", "l_shipdate IS NOT NULL", Track))

  // ---------------------------------------------------------------- queries

  /** Violation report over lineitem — every rule evaluated in one pass. */
  val qReport: QueryDef = {
    val unions = lineitemRules.map { r =>
      s"""SELECT '${r.name}' AS rule, '${r.action.name}' AS action,
         |  count(*) FILTER (WHERE NOT (${r.predicate})) AS violations,
         |  count(*) AS rows_seen
         |FROM lineitem""".stripMargin
    }.mkString("\n|UNION ALL\n|").stripMargin
    QueryDef.sql("q_expect_report", unions) { (spark, dir) =>
      report(Tables.lineitem(spark, dir), lineitemRules)
    }
  }

  /** Cleanse path: Drop rules filter, Track rules surface as flags on the
    * surviving rows (the downstream-visible shape of DLT expect_or_drop +
    * expect). */
  val qClean: QueryDef = {
    val trackRules = lineitemRules.filter(_.action == Track)
    val flagsSql = trackRules.map(r => s"(${r.predicate}) AS ok_${r.name}").mkString(",\n|  ").stripMargin
    val dropPred = lineitemRules.filter(_.action == Drop).map(r => s"(${r.predicate})").mkString(" AND ")
    QueryDef.sql(
      "q_expect_clean",
      s"""SELECT l_orderkey, l_linenumber,
         |  $flagsSql
         |FROM lineitem WHERE $dropPred""".stripMargin) { (spark, dir) =>
      val cleaned = clean(Tables.lineitem(spark, dir), lineitemRules)
      cleaned.select(col("l_orderkey") +: col("l_linenumber") +:
        trackRules.map(r => expr(r.predicate).as(s"ok_${r.name}")): _*)
    }
  }

  val all: Seq[QueryDef] = Seq(qReport, qClean)
}
