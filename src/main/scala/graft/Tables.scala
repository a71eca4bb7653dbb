package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. The `events` table
  * stores its `ts` column as parquet TIMESTAMP(NANOS); values are
  * microsecond-aligned, so reading them as Spark microsecond timestamps is
  * lossless.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos (legacy conf) and integer-divide
    * to microseconds — the generated values are µs-aligned, so this is
    * lossless and matches what DuckDB sees after `CAST(ts AS TIMESTAMP)`.
    * Integer `div` (not `/`) — ns epochs exceed 2^53, double would lose
    * precision. */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    eventsRaw(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` can address them by
    * the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Spread a narrow input across the cluster ONLY when it actually
    * arrives narrow (the single-file local fixtures scan as 1-2 tasks,
    * which would funnel expensive per-row arithmetic into one core). A
    * real corpus arrives pre-partitioned — at or above `defaultParallelism`
    * partitions — and passes through untouched, so no full-payload
    * exchange appears in the 100 TB plan (asserted in PlanSpec).
    * `spark.graft.spread=never` disables the fixture crutch entirely. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption("spark.graft.spread").contains("never")) df
    else {
      val target = spark.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
  }
}
