package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. The `events`
  * table's `ts` column has shipped in two physical encodings across
  * testdata generations — parquet TIMESTAMP(NANOS) (µs-aligned), and
  * plain timestamp[us] with isAdjustedToUTC=false (read by Spark as
  * TIMESTAMP_NTZ) — so [[events]] dispatches on the observed type and
  * always yields a session-TZ `timestamp` column with identical values
  * (the session runs UTC, making the NTZ→TZ cast value-preserving and
  * equal to DuckDB's naive reading).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Read `events.parquet` tolerating either `ts` encoding. The
    * nanosAsLong conf makes a TIMESTAMP(NANOS) column arrive as raw
    * nano LONGs (Spark's vectorized reader rejects it otherwise) and is
    * a no-op for other types. */
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
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val df = eventsRaw(s, d)
    df.schema("ts").dataType match {
      // TIMESTAMP(NANOS) read as raw nanos: integer-divide to µs (values
      // are µs-aligned, so lossless; `div` not `/` — ns epochs exceed
      // 2^53 and a double quotient would lose precision)
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // timestamp[us] isAdjustedToUTC=false: value-preserving cast under
      // the UTC session, matching DuckDB's naive reading
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
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
