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

  /** Spread a COMPUTE-BOUND input across the cluster when its scan
    * genuinely arrives narrow. The narrowness fact comes from
    * file-source *metadata* (total scanned bytes vs
    * `files.maxPartitionBytes`) — no RDD materialization, no Spark job,
    * no probe-induced planning side effects.
    *
    * Every caller is a per-row-expensive operator (shingling, n-gram
    * explosion, posting lists, JSON envelope parse): compute is
    * k·bytes with k ≫ 1, while the repartition costs O(bytes) of
    * network once. So the bytes floor is LOW (256 KB) — for anything
    * beyond trivia, trading one tiny exchange for full-cluster CPU
    * wins wall-clock (measured: the 64 MB floor of an earlier revision
    * cost 4× on bigram coverage at sf0.1 to save a 2 MB shuffle). The
    * 100 TB plan is unaffected either way: a real corpus splits into
    * ≫ cores scan tasks and passes through untouched.
    *
    * Decision table:
    *   - `spark.graft.spread=never`        → identity (kill switch)
    *   - input has no file scan            → identity (streams, local rels)
    *   - scan < `spark.graft.spread.minBytes` (default 256 KB)
    *                                       → identity: sub-megabyte trivia
    *     finishes faster than an exchange ramps up
    *   - scan splits into ≥ defaultParallelism tasks already
    *                                       → identity: a real corpus
    *     arrives pre-partitioned, so no Exchange enters the 100 TB plan
    *   - bigger but narrow (few big files) → repartition to parallelism
    * Asserted in PlanSpec. Callers spread the NARROW projection (before
    * synthesizing any fat derived column) so the exchange carries
    * source scalars. */
  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption("spark.graft.spread").contains("never")) df
    else {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val scanBytes = df.queryExecution.analyzed.collectLeaves().map {
        case l: LogicalRelation => l.relation match {
          case fs: HadoopFsRelation => fs.location.sizeInBytes
          case _ => 0L
        }
        case _ => 0L
      }.sum
      val floor = spark.conf.getOption("spark.graft.spread.minBytes")
        .map(_.toLong).getOrElse(256L << 10)
      if (scanBytes < math.max(1L, floor)) df
      else {
        val target = spark.sparkContext.defaultParallelism
        val split = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
        val estTasks = (scanBytes + split - 1) / split
        if (estTasks >= target) df else df.repartition(target)
      }
    }
  }
}
