package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-file bloom-filter index for point-lookup data skipping.
  *
  * Zone maps (min/max stats) prune range predicates but are nearly
  * useless for equality on high-cardinality, unclustered columns — every
  * file's [min, max] spans the probe value. The fix large engines ship
  * (Databricks' `CREATE BLOOMFILTER INDEX`, Impala/Parquet bloom pages)
  * is a per-file bloom filter: KB-sized, answers "is value X provably
  * absent from this file?", and turns a needle lookup over a 100 TB table
  * into a handful of file reads.
  *
  * Design (all distributed, mirroring the sidecar layout Databricks
  * documents as `_delta_index`):
  *
  *  - The index lives OUTSIDE the Delta log, as parquet at
  *    `<table>/_graft_index/bloom` with rows `(file, col, bloom)` —
  *    `file` is the add-action-relative path, `bloom` a serialized
  *    [[org.apache.spark.util.sketch.BloomFilter]]. Foreign readers are
  *    unaffected; dropping the directory merely disables the pruning.
  *  - Build is ONE scan + per-file aggregation (Spark's own
  *    `BloomFilterAggregate`, the runtime-join-filter machinery): only
  *    KB blooms cross the shuffle, never rows.
  *  - Probe happens inside [[DeltaLog.pruneEntries]]: the file-entry
  *    frame left-joins its blooms and equality/IN bounds add
  *    `bloom present && !might_contain_any(...)` skip terms
  *    ([[graft.functions.BloomMightContainAny]] — per-row blooms, which
  *    Spark's constant-only `BloomFilterMightContain` cannot probe).
  *    Files without a bloom (pre-index files, fresh OPTIMIZE output) are
  *    simply never bloom-skipped — zone maps still apply, results stay
  *    exact.
  *  - Writers maintain the index: every [[DeltaLog.commitWrite]] whose
  *    table declares `graft.bloomIndex.columns` appends blooms for the
  *    files it stages; [[refresh]] backfills whatever is missing
  *    (initial CREATE, compaction output, foreign appends).
  *
  * Hash normalization: blooms store `xxhash64` of the value cast to a
  * WIDTH-STABLE type (integrals → long), so type widening (int → bigint)
  * never desynchronizes build-time and probe-time hashes. Only
  * point-lookup-shaped types are bloom-eligible — integrals, string,
  * date, timestamp; everything else is refused at [[create]] and ignored
  * at probe time.
  */
object BloomIndex {

  /** Table property: csv of indexed (logical) column names. */
  val ColsProp = "graft.bloomIndex.columns"
  /** Table property: target false-positive probability (default 0.1 —
    * the tradeoff Databricks defaults to; lower fpp, bigger blooms). */
  val FppProp = "graft.bloomIndex.fpp"
  /** Table property: expected distinct items PER FILE (default 1M —
    * sized for ~128 MB parquet files at 100 TB scale). */
  val ItemsProp = "graft.bloomIndex.expectedItems"

  val DefaultItems = 1000000L
  val DefaultFpp = 0.1

  private[sources] val Subdir = "_graft_index/bloom"

  def indexPath(table: String): Path = new Path(table, Subdir)

  /** (indexed logical columns, expectedItems, fpp) from table config. */
  private[graft] def settings(cfg: Map[String, String]): (Seq[String], Long, Double) = (
    cfg.get(ColsProp).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
    cfg.get(ItemsProp).map(_.trim.toLong).getOrElse(DefaultItems),
    cfg.get(FppProp).map(_.trim.toDouble).getOrElse(DefaultFpp))

  /** Standard optimal bit count for `items` at `fpp`, floored at 64. */
  def numBitsFor(items: Long, fpp: Double): Long = {
    require(items > 0, s"expectedItems must be positive: $items")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1): $fpp")
    val ln2 = math.log(2.0)
    math.max(64L, math.ceil(-items * math.log(fpp) / (ln2 * ln2)).toLong)
  }

  /** Types a bloom probe is well-defined for (point-lookup shapes). */
  private[sources] def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case StringType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Width-stable hash input: integrals hash as LONG so int→bigint type
    * widening keeps old files' blooms probe-able. */
  private[sources] def hashInput(c: Column, dt: DataType): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => xxhash64(c.cast(LongType))
    case _ => xxhash64(c)
  }

  /** Per-row bloom aggregate over the width-stable hash of `c`. */
  private def bloomAgg(c: Column, dt: DataType, items: Long, fpp: Double): Column = {
    val agg = new BloomFilterAggregate(
      GraftSqlShim.expression(hashInput(c, dt)),
      Literal(items), Literal(numBitsFor(items, fpp)))
    GraftSqlShim.column(agg.toAggregateExpression())
  }

  /** Probe column: bloom MIGHT contain any of the given hashes. */
  private[sources] def mightContainAny(bloom: Column, hashes: Column): Column =
    GraftSqlShim.column(graft.functions.BloomMightContainAny(
      GraftSqlShim.expression(bloom), GraftSqlShim.expression(hashes)))

  /** `(file, col, bloom)` rows for the given table-relative data files —
    * ONE distributed scan + per-file aggregation; only KB-sized blooms
    * cross the shuffle. `physCols` are PHYSICAL column names (what the
    * staged parquet carries). None when nothing is buildable or the
    * layout defeats basename matching (colliding basenames — a foreign
    * layout this writer never produces). */
  private[sources] def bloomsFor(spark: SparkSession, table: String,
      rels: Seq[String], physCols: Seq[String],
      items: Long, fpp: Double): Option[DataFrame] = {
    if (rels.isEmpty || physCols.isEmpty) return None
    val byName = DeltaLog.basenameIndex(rels).getOrElse(return None)
    val abs = rels.map(p => new Path(table, p).toString)
    val df = spark.read.option("basePath", table).parquet(abs: _*)
    val byField = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val present = physCols.distinct
      .filter(c => byField.get(c).exists(eligible))
    if (present.isEmpty) return None
    val aggs = present.zipWithIndex.map { case (c, i) =>
      bloomAgg(col(c), byField(c), items, fpp).as(s"__b_$i")
    }
    val g = df.groupBy(DeltaLog.fileNameCol.as("__f"))
      .agg(aggs.head, aggs.tail: _*)
    // basename → add-relative path: a small frame joined in (AQE
    // broadcasts it when it fits; at worst it is O(files staged), the
    // same footprint the commit itself holds)
    import spark.implicits._
    val names = byName.toSeq.toDF("__f", "file")
    val pairs = present.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col"), col(s"__b_$i").as("bloom"))
    }
    Some(g.join(names, "__f")
      .select(col("file"), explode(array(pairs: _*)).as("e"))
      .select(col("file"), col("e.col").as("col"), col("e.bloom").as("bloom"))
      .where(col("bloom").isNotNull))
  }

  /** Append bloom rows to the sidecar (parquet append — new part files,
    * never a rewrite). */
  private[sources] def writeAppend(spark: SparkSession, table: String,
      blooms: DataFrame): Unit =
    blooms.write.mode("append").parquet(indexPath(table).toString)

  /** The deduped index frame — None when no index exists. Duplicate
    * `(file, col)` rows (commit retries, overlapping refreshes) collapse
    * to one; any copy is equally valid (same file contents ⇒ equivalent
    * bloom). */
  private[sources] def frame(spark: SparkSession, table: String): Option[DataFrame] = {
    val p = indexPath(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    Some(spark.read.parquet(p.toString)
      .groupBy("file", "col").agg(first("bloom").as("bloom")))
  }

  /** Create (or widen) the bloom index: declares the indexed columns as
    * a table property — every subsequent write maintains the sidecar —
    * and backfills blooms for the current snapshot's files. The
    * Databricks surface this mirrors is
    * `CREATE BLOOMFILTER INDEX ON TABLE t FOR COLUMNS (c OPTIONS ...)`. */
  def create(spark: SparkSession, table: String, cols: Seq[String],
      fpp: Double = DefaultFpp, items: Long = DefaultItems): Unit = {
    require(cols.nonEmpty, "bloom index needs at least one column")
    val snap = DeltaLog.snapshot(spark, table)
    val schema = snap.schema.getOrElse(
      throw new IllegalArgumentException(s"no schema at $table"))
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach { c =>
      require(byName.contains(c), s"bloom index column not in schema: $c")
      require(!snap.partitionColumns.contains(c),
        s"partition column $c is pruned by value exactly — bloom index refused")
      require(eligible(byName(c)),
        s"bloom index on $c: type ${byName(c).sql} is not point-lookup shaped " +
          "(eligible: integral, string, date, timestamp)")
    }
    val merged = (settings(snap.configuration)._1 ++ cols).distinct
    DeltaLog.alterSetProperties(spark, table, Map(
      ColsProp -> merged.mkString(","),
      FppProp -> fpp.toString, ItemsProp -> items.toString))
    refresh(spark, table)
  }

  /** Drop the index: unset the properties and delete the sidecar. */
  def drop(spark: SparkSession, table: String): Unit = {
    DeltaLog.alterUnsetProperties(spark, table,
      Seq(ColsProp, FppProp, ItemsProp))
    val p = indexPath(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Backfill blooms for current-snapshot files missing any indexed
    * column's bloom (initial CREATE, OPTIMIZE output, foreign appends).
    * The missing set is computed DISTRIBUTED (anti-join of the file
    * frame against the index); only the missing files' paths reach the
    * driver — the same footprint as a pruned read's survivor list.
    * Returns how many files were (re)indexed. */
  def refresh(spark: SparkSession, table: String): Int = {
    val snap = DeltaLog.snapshot(spark, table)
    val (cols, items, fpp) = settings(snap.configuration)
    if (cols.isEmpty) return 0
    val phys = cols.map(c => snap.columnMapping.getOrElse(c, c))
    import spark.implicits._
    // tiny fixed side (the indexed column names) × file frame — a
    // deliberate constant-fanout crossJoin, not a data×data product
    val wanted = snap.allFiles.select(col("path"))
      .crossJoin(phys.toDF("col"))
    val missing = frame(spark, table) match {
      case None => wanted
      case Some(idx) => wanted.join(idx.select(col("file").as("path"), col("col")),
        Seq("path", "col"), "left_anti")
    }
    val rels = missing.select("path").distinct().collect().map(_.getString(0)).toSeq
    if (rels.isEmpty) return 0
    bloomsFor(spark, table, rels, phys, items, fpp)
      .foreach(writeAppend(spark, table, _))
    rels.length
  }
}
