package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join shapes for hostile data distributions — the two techniques the
  * engine reaches for when AQE alone is not enough at 100 TB:
  *
  *   - '''salting''' for skewed keys: a sort-merge/shuffle join puts every
  *     row of a hot key into one task; salting splits each key across
  *     `salts` sub-partitions and replicates the (smaller) build side
  *     `salts`×, trading bounded duplication for even task sizes. AQE's
  *     skew-join split handles most cases at runtime; salting is the
  *     static fallback when a single key exceeds what one task can hold.
  *
  *   - '''bucketing''' for repeated co-located joins: tables written with
  *     `bucketBy(n, key)` + `sortBy(key)` join with NO exchange and no
  *     sort — the scan's bucket layout already satisfies the join's
  *     required distribution. The win compounds: every downstream join or
  *     aggregation on the bucket key reuses the layout, which is how a
  *     fact table joined daily against the same dimensions should be
  *     stored. (Spark-native analogue of the reference's Z-order
  *     clustering, /root/reference/utils/optimize_tables.py:24-32.)
  */
object ScaleJoins {

  /** Salted inner equi-join: spread each (possibly hot) key of `skewed`
    * over `salts` sub-keys; replicate `build` once per salt. Result
    * equals `skewed.join(build, Seq(key))` exactly. The salt is
    * per-row-deterministic (hash of partition-local id), not `rand()`,
    * so retried tasks re-produce their partition.
    */
  def saltedJoin(skewed: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = skewed.withColumn(
      "__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = build.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Write `df` as a bucketed, per-bucket-sorted managed table. Joins and
    * aggregations on `key` against tables bucketed with the same count
    * then run exchange-free. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join of two co-bucketed tables. With matching bucket counts on
    * the join key this plans as a sort-merge join with no
    * ShuffleExchange on either side (asserted in ScaleJoinsSpec). */
  def coLocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), Seq(key))

  /** The salted join under the oracle: lineitem enriched by a per-flag
    * dim through `l_returnflag` — a 3-value key, i.e. maximal skew: a
    * plain shuffle join lands ~1/3 of the fact table in each of three
    * tasks no matter how many executors exist. The salted form spreads
    * every flag over `salts` sub-keys (task sizes drop `salts`×,
    * replicating only the 3-row build side). The oracle is the PLAIN
    * join — salting must be observationally invisible. Plan shape
    * (salt expansion, even output partitions) is asserted in
    * ScaleJoinsSpec. */
  val qSkewSalted: QueryDef = QueryDef.sql(
    "q_join_skew_salted",
    """WITH dim AS (
      |  SELECT l_returnflag, count(*) AS flag_count FROM lineitem GROUP BY 1
      |)
      |SELECT l_orderkey, l_linenumber, l_returnflag, flag_count
      |FROM lineitem JOIN dim USING (l_returnflag)""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val dim = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("flag_count"))
    saltedJoin(
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag")),
      dim, "l_returnflag", salts = 8)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("flag_count"))
  }

  /** The diagnostic that DECIDES when salting/AQE-skew-split is needed:
    * per-key frequency of the join key, its share of the table, and the
    * ratio to a perfectly uniform spread over the configured shuffle
    * partition count. A key whose `hot_ratio` exceeds ~2-3 overflows its
    * task at any cluster size; run this before every new large join.
    * Distributed shape: one map-side-combined groupBy + a TakeOrdered
    * top-k — never a global sort. */
  val qSkewReport: QueryDef = QueryDef.sql(
    "q_skew_report",
    """WITH freq AS (
      |  SELECT l_returnflag AS key, count(*) AS n FROM lineitem GROUP BY 1
      |), tot AS (SELECT count(*) AS total FROM lineitem)
      |SELECT key, n, CAST(n AS DOUBLE) / total AS share,
      |  CAST(n * 32 AS DOUBLE) / total AS hot_ratio
      |FROM freq CROSS JOIN tot
      |ORDER BY n DESC, key
      |LIMIT 10""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val freq = li.groupBy(col("l_returnflag").as("key")).agg(count(lit(1)).as("n"))
    val tot = li.agg(count(lit(1)).as("total"))
    freq.crossJoin(broadcast(tot))
      .select(col("key"), col("n"),
        (col("n").cast("double") / col("total")).as("share"),
        ((col("n") * 32).cast("double") / col("total")).as("hot_ratio"))
      .orderBy(col("n").desc, col("key"))
      .limit(10)
  }

  val all: Seq[QueryDef] = Seq(qSkewSalted, qSkewReport)

  /** Banded range join: fact rows against interval dims `[lo, hi)`
    * expressed as an EQUI join, not a theta join. Each interval explodes
    * into the fixed-width buckets it covers; each fact row maps to the
    * one bucket holding its value; the join matches on bucket id and the
    * exact range predicate runs as a post-filter on the (tiny) matched
    * set.
    *
    * Why: Spark plans a raw `f.value >= d.lo AND f.value < d.hi` join as
    * BroadcastNestedLoopJoin — every fact row tests EVERY interval, and
    * when the interval side outgrows the broadcast threshold it degrades
    * to a cartesian product. The bucketed form stays a hash join at any
    * dim size: cost is one equi-join keyed by bucket plus `span/width`
    * replicated rows per interval (choose `bucketWidth` near the median
    * interval span so replication stays O(1) per interval). Overlapping
    * intervals are fine — a fact row matches each interval containing it.
    */
  def rangeJoin(fact: DataFrame, factCol: String,
      bands: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val expanded = bands.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / w), floor(col(hiCol) / w))))
    fact.withColumn("__bucket", floor(col(factCol) / w))
      .join(expanded,
        Seq("__bucket"))
      .where(col(factCol) >= col(loCol) && col(factCol) < col(hiCol))
      .drop("__bucket")
  }
}
