package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One WHEN clause of a general MERGE. Clauses are evaluated in the
  * order given, first-match-wins within each of the three row classes
  * (matched / not-matched-by-target / not-matched-by-source) — the SQL
  * standard's semantics and a superset of the reference's
  * `DeltaTable.merge` builder chains
  * (/root/reference/pipelines/gold_pipeline.py:789-796 conditioned
  * update + insert-all; silver_pipeline.py's SCD2 expire step is a
  * matched-update-only merge with an extra ON predicate).
  *
  * In clause conditions and SET/VALUES expressions, target columns are
  * referenced as `col("t.x")` and source columns as `col("s.y")` (the
  * aliases are configurable for the SQL surface). SET / VALUES maps key
  * by bare target-column name; an EMPTY map means UPDATE SET * /
  * INSERT * (every target column taken from the same-named source
  * column).
  */
sealed trait MergeClause {
  def condition: Option[Column]
}
object MergeClause {
  /** WHEN MATCHED [AND cond] THEN UPDATE SET … (empty set = SET *). */
  final case class MatchedUpdate(condition: Option[Column],
      set: Map[String, Column]) extends MergeClause
  /** WHEN MATCHED [AND cond] THEN DELETE. */
  final case class MatchedDelete(condition: Option[Column]) extends MergeClause
  /** WHEN NOT MATCHED [AND cond] THEN INSERT … (empty values = INSERT *). */
  final case class NotMatchedInsert(condition: Option[Column],
      values: Map[String, Column]) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET …. */
  final case class BySourceUpdate(condition: Option[Column],
      set: Map[String, Column]) extends MergeClause
  /** WHEN NOT MATCHED BY SOURCE [AND cond] THEN DELETE. */
  final case class BySourceDelete(condition: Option[Column]) extends MergeClause
}

/** General clause-based MERGE — the reference's actual upsert API
  * (`DeltaTable.merge(...).whenMatchedUpdate(...).whenNotMatchedInsertAll()
  * .execute()`) re-expressed as one declarative frame over the
  * copy-on-write [[DeltaLog]] machinery.
  *
  * Scale shape: the join is a plain equi-join on the merge keys (any
  * extra ON predicate becomes a join filter), so Catalyst/AQE pick the
  * physical side freely — no forced broadcast; the target side is only
  * the files the provenance probe touched (O(touched), not O(table))
  * unless a BY SOURCE clause forces a full pass, exactly like Delta.
  */
object Merge {
  import MergeClause._

  private val Keep = -1
  private val Drop = -2

  /** Pure frame transform: apply `clauses` to `(target ⟗ source)` and
    * return the rows the target table should contain afterwards, in the
    * target's schema. Raises the protocol's nondeterministic-merge
    * error when one target row is matched by several modifying source
    * rows. Used by [[DeltaLog.merge]] under [[DeltaLog.mergeCore]];
    * public for direct testing on plain frames. */
  private[graft] def applyClauses(target: DataFrame, source: DataFrame,
      keys: Seq[String], extraOn: Option[Column], clauses: Seq[MergeClause],
      tAlias: String = "t", sAlias: String = "s",
      schemaEvolution: Boolean = false,
      // caller GUARANTEES the source is key-distinct (e.g. it built the
      // source with .distinct() on exactly the merge keys): each target
      // row then matches ≤ 1 source row, so the eager nondeterminism-
      // guard aggregation (one extra pass over the join) is provably a
      // no-op and skips
      uniqueSourceKeys: Boolean = false): DataFrame = {
    require(clauses.nonEmpty, "MERGE needs at least one WHEN clause")
    require(keys.nonEmpty, "MERGE needs at least one equi-key")
    require(tAlias != sAlias, s"target and source aliases collide: '$tAlias'")
    val tSchema = target.schema
    val tCols = target.columns.toSeq
    val srcCols = source.columns.toSet
    require(keys.forall(srcCols.contains),
      s"source is missing merge key(s): ${keys.filterNot(srcCols.contains).mkString(", ")}")
    // SET * / INSERT * pull every target column from the source by name
    val starClauses = clauses.exists {
      case MatchedUpdate(_, s) => s.isEmpty
      case NotMatchedInsert(_, v) => v.isEmpty
      case _ => false
    }
    if (starClauses && !schemaEvolution) {
      val missing = tCols.filterNot(srcCols.contains)
      require(missing.isEmpty,
        s"UPDATE SET * / INSERT * needs every target column in the source; " +
          s"missing: ${missing.mkString(", ")} (or merge withSchemaEvolution)")
    }
    // schema evolution (Delta's autoMerge): SET */INSERT * carry NEW
    // source columns into the target, and an explicit SET/VALUES may
    // name a new column; rows a clause does not reach get NULL there.
    // Without it, unknown columns refuse below.
    val newFromSource: Seq[org.apache.spark.sql.types.StructField] =
      if (!schemaEvolution || !starClauses) Seq.empty
      else source.schema.fields.toSeq.filterNot(f => tCols.contains(f.name))
    val newFromSets: Seq[String] =
      if (!schemaEvolution) Seq.empty
      else clauses.flatMap {
        case MatchedUpdate(_, s) => s.keys
        case BySourceUpdate(_, s) => s.keys
        case NotMatchedInsert(_, v) => v.keys
        case _ => Seq.empty
      }.distinct.filterNot(n =>
        tCols.contains(n) || newFromSource.exists(_.name == n))
    if (!schemaEvolution) clauses.foreach {
      case MatchedUpdate(_, s) => requireTargetCols(s.keys, tCols, "UPDATE SET")
      case BySourceUpdate(_, s) => requireTargetCols(s.keys, tCols, "UPDATE SET")
      case NotMatchedInsert(_, v) => requireTargetCols(v.keys, tCols, "INSERT")
      case _ =>
    }

    val tFlag = "__graft_merge_t"
    val sFlag = "__graft_merge_s"
    val tid = "__graft_merge_tid"
    val sid = "__graft_merge_sid"
    val t = target.withColumn(tFlag, lit(true))
      .withColumn(tid, monotonically_increasing_id()).alias(tAlias)
    val s = source.withColumn(sFlag, lit(true))
      .withColumn(sid, monotonically_increasing_id()).alias(sAlias)
    val onKeys = keys.map(k => col(s"$tAlias.$k") === col(s"$sAlias.$k")).reduce(_ && _)
    val joined = t.join(s, extraOn.fold(onKeys)(onKeys && _), "full_outer")

    val isMatched = coalesce(col(s"$tAlias.$tFlag"), lit(false)) &&
      coalesce(col(s"$sAlias.$sFlag"), lit(false))
    val targetOnly = coalesce(col(s"$tAlias.$tFlag"), lit(false)) &&
      !coalesce(col(s"$sAlias.$sFlag"), lit(false))

    def condOf(c: MergeClause): Column = c.condition.getOrElse(lit(true))
    def actionOf(c: MergeClause, i: Int): Column = c match {
      case _: MatchedDelete | _: BySourceDelete => lit(Drop)
      case _ => lit(i)
    }
    // first-match-wins chain over one clause group; `default` when none fires
    def chain(cs: Seq[(MergeClause, Int)], default: Int): Column =
      cs.foldRight(lit(default): Column) { case ((c, i), acc) =>
        when(condOf(c), actionOf(c, i)).otherwise(acc)
      }
    val indexed = clauses.zipWithIndex
    val matched = indexed.filter { case (c, _) =>
      c.isInstanceOf[MatchedUpdate] || c.isInstanceOf[MatchedDelete] }
    val bySource = indexed.filter { case (c, _) =>
      c.isInstanceOf[BySourceUpdate] || c.isInstanceOf[BySourceDelete] }
    val inserts = indexed.filter { case (c, _) => c.isInstanceOf[NotMatchedInsert] }

    // the protocol's nondeterminism guard, and the dedup decision, in
    // ONE eager pass over the matched slice: per target row, how many
    // source rows matched at all (`n`) and how many would modify it
    // (`m`). m > 1 anywhere → error (no well-defined result); n > 1
    // anywhere → the output needs the per-target-row dedup window below
    // (the common unique-key merge skips that extra shuffle entirely).
    // Two driver-collected longs, nothing more.
    val modifying = matched.map { case (c, _) => condOf(c) }
      .reduceOption(_ || _).getOrElse(lit(false))
    // a key-distinct source makes every per-target-row count ≤ 1 by
    // construction (an extraOn condition only removes matches): both
    // the error and the dedup window are provably unreachable
    val Array(maxMatches, maxModifying) =
      if (uniqueSourceKeys) Array(1L, 1L)
      else {
        val r = joined.where(isMatched)
          .groupBy(col(s"$tAlias.$tid"))
          .agg(count(lit(1)).as("n"),
            sum(when(modifying, 1L).otherwise(0L)).as("m"))
          .agg(coalesce(max(col("n")), lit(0L)),
            coalesce(max(col("m")), lit(0L))).head()
        Array(r.getLong(0), r.getLong(1))
      }
    if (maxModifying > 1) sys.error(
      "MERGE failed: a target row was matched by multiple source rows " +
        "that would update or delete it — the merge is nondeterministic. " +
        "Deduplicate the source on the merge keys first.")

    val act = when(isMatched, chain(matched, Keep))
      .when(targetOnly, chain(bySource, Keep))
      .otherwise(chain(inserts, Drop))
    val actCol = "__graft_merge_act"

    def setOf(c: MergeClause, column: String): Option[Column] = c match {
      case MatchedUpdate(_, set) =>
        if (set.isEmpty)
          if (srcCols.contains(column)) Some(col(s"$sAlias.$column")) else None
        else set.get(column)
      case BySourceUpdate(_, set) => set.get(column)
      case NotMatchedInsert(_, values) =>
        // inserts must yield a value for EVERY column: unlisted ones are
        // NULL (matches SQL INSERT with a partial column list)
        if (values.isEmpty)
          if (srcCols.contains(column)) Some(col(s"$sAlias.$column")) else None
        else Some(values.getOrElse(column, lit(null)))
      case _ => None
    }
    val out = tSchema.fields.toSeq.map { f =>
      val v = indexed.foldLeft(col(s"$tAlias.${f.name}")) { case (acc, (c, i)) =>
        setOf(c, f.name).fold(acc)(set =>
          when(col(actCol) === i, set).otherwise(acc))
      }
      v.cast(f.dataType).as(f.name)
    } ++ newFromSource.map { f =>
      // evolved column sourced from the source frame: null wherever no
      // star clause (or explicit set) reached the row
      val v = indexed.foldLeft(lit(null).cast(f.dataType): Column) {
        case (acc, (c, i)) => setOf(c, f.name).fold(acc)(set =>
          when(col(actCol) === i, set).otherwise(acc))
      }
      v.cast(f.dataType).as(f.name)
    } ++ newFromSets.map { n =>
      // evolved column defined only by explicit SET/VALUES expressions:
      // type comes from the expressions themselves
      val v = indexed.foldLeft(lit(null): Column) { case (acc, (c, i)) =>
        setOf(c, n).fold(acc)(set =>
          when(col(actCol) === i, set).otherwise(acc))
      }
      v.as(n)
    }
    // a target row matched by several source rows joins to several pairs,
    // but must produce ONE output row: the modifying pair if a clause
    // fired (the guard above capped those at one), else a single
    // pass-through copy. Only when duplicates actually exist (guard
    // pass), dedup with a window grouped per TARGET row; source-only
    // rows group by their own id, so a wide insert never funnels into
    // one partition. The boolean leg disambiguates tid/sid value
    // collisions (both counters start at 0).
    val base = joined.withColumn(actCol, act)
    val deduped =
      if (maxMatches <= 1) base
      else {
        val sourceOnly = !coalesce(col(s"$tAlias.$tFlag"), lit(false))
        val grpKey = when(sourceOnly, col(s"$sAlias.$sid"))
          .otherwise(col(s"$tAlias.$tid"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(grpKey, sourceOnly)
          .orderBy(when(col(actCol) === Keep, lit(1)).otherwise(lit(0)))
        val rnCol = "__graft_merge_rn"
        base.withColumn(rnCol, row_number().over(w))
          .where(col(rnCol) === 1).drop(rnCol)
      }
    deduped.where(col(actCol) =!= Drop).select(out: _*)
  }

  /** The deletion-vector MERGE decomposition: instead of the whole
    * post-state of the touched files, the classified join yields
    *   - `mask`: (fp, ri) provenance of every target row a modifying
    *     clause fired on — masked in place, never rewritten;
    *   - `appends`: ONLY the post-images of fired UPDATEs plus fired
    *     INSERT rows, in the target's schema.
    * Untouched neighbor rows in touched files are not even projected —
    * the whole point: a MERGE updating a sliver of a wide file writes
    * O(modified rows), not O(file). The pre/post/delete/insert frames
    * feed exact CDF. `release()` drops the persisted classified join
    * (ONE join evaluation serves the guard, the mask and the appends). */
  private[graft] final case class DvPlan(mask: DataFrame, appends: DataFrame,
      updatePre: DataFrame, updatePost: DataFrame,
      deleted: DataFrame, inserted: DataFrame, release: () => Unit)

  /** [[applyClauses]]' classification, decomposed for the DV path.
    * `target` must carry the two provenance columns `provCols`
    * (file path, row index); they never appear in the output frames'
    * data columns. Schema evolution works like [[applyClauses]]': the
    * APPEND side carries the evolved columns (existing files read null
    * under the widened declaration — no rewrite, which is the whole
    * point of this path). Raises the same nondeterministic-merge error
    * as [[applyClauses]]. */
  private[graft] def applyClausesDv(target: DataFrame, source: DataFrame,
      keys: Seq[String], extraOn: Option[Column], clauses: Seq[MergeClause],
      provCols: (String, String), tAlias: String = "t", sAlias: String = "s",
      schemaEvolution: Boolean = false,
      // key-distinct source: the guard aggregation is provably a no-op
      // (see applyClauses) — the persisted base materializes lazily in
      // the first real pass instead
      uniqueSourceKeys: Boolean = false): DvPlan = {
    require(clauses.nonEmpty, "MERGE needs at least one WHEN clause")
    require(keys.nonEmpty, "MERGE needs at least one equi-key")
    require(tAlias != sAlias, s"target and source aliases collide: '$tAlias'")
    val (fpCol, riCol) = provCols
    val tSchema = org.apache.spark.sql.types.StructType(
      target.schema.fields.filterNot(f => f.name == fpCol || f.name == riCol))
    val tCols = tSchema.fieldNames.toSeq
    val srcCols = source.columns.toSet
    require(keys.forall(srcCols.contains),
      s"source is missing merge key(s): ${keys.filterNot(srcCols.contains).mkString(", ")}")
    val starClauses = clauses.exists {
      case MatchedUpdate(_, s) => s.isEmpty
      case NotMatchedInsert(_, v) => v.isEmpty
      case _ => false
    }
    if (starClauses && !schemaEvolution) {
      val missing = tCols.filterNot(srcCols.contains)
      require(missing.isEmpty,
        s"UPDATE SET * / INSERT * needs every target column in the source; " +
          s"missing: ${missing.mkString(", ")} (or merge withSchemaEvolution)")
    }
    val newFromSource: Seq[org.apache.spark.sql.types.StructField] =
      if (!schemaEvolution || !starClauses) Seq.empty
      else source.schema.fields.toSeq.filterNot(f => tCols.contains(f.name))
    val newFromSets: Seq[String] =
      if (!schemaEvolution) Seq.empty
      else clauses.flatMap {
        case MatchedUpdate(_, s) => s.keys
        case BySourceUpdate(_, s) => s.keys
        case NotMatchedInsert(_, v) => v.keys
        case _ => Seq.empty
      }.distinct.filterNot(n =>
        tCols.contains(n) || newFromSource.exists(_.name == n))
    if (!schemaEvolution) clauses.foreach {
      case MatchedUpdate(_, s) => requireTargetCols(s.keys, tCols, "UPDATE SET")
      case BySourceUpdate(_, s) => requireTargetCols(s.keys, tCols, "UPDATE SET")
      case NotMatchedInsert(_, v) => requireTargetCols(v.keys, tCols, "INSERT")
      case _ =>
    }

    val tFlag = "__graft_merge_t"
    val sFlag = "__graft_merge_s"
    val tid = "__graft_merge_tid"
    val t = target.withColumn(tFlag, lit(true))
      .withColumn(tid, monotonically_increasing_id()).alias(tAlias)
    val s = source.withColumn(sFlag, lit(true)).alias(sAlias)
    val onKeys = keys.map(k => col(s"$tAlias.$k") === col(s"$sAlias.$k")).reduce(_ && _)
    val joined = t.join(s, extraOn.fold(onKeys)(onKeys && _), "full_outer")

    val isTargetRow = coalesce(col(s"$tAlias.$tFlag"), lit(false))
    val isMatched = isTargetRow && coalesce(col(s"$sAlias.$sFlag"), lit(false))
    val targetOnly = isTargetRow && !coalesce(col(s"$sAlias.$sFlag"), lit(false))

    def condOf(c: MergeClause): Column = c.condition.getOrElse(lit(true))
    def actionOf(c: MergeClause, i: Int): Column = c match {
      case _: MatchedDelete | _: BySourceDelete => lit(Drop)
      case _ => lit(i)
    }
    def chain(cs: Seq[(MergeClause, Int)], default: Int): Column =
      cs.foldRight(lit(default): Column) { case ((c, i), acc) =>
        when(condOf(c), actionOf(c, i)).otherwise(acc)
      }
    val indexed = clauses.zipWithIndex
    val matched = indexed.filter { case (c, _) =>
      c.isInstanceOf[MatchedUpdate] || c.isInstanceOf[MatchedDelete] }
    val bySource = indexed.filter { case (c, _) =>
      c.isInstanceOf[BySourceUpdate] || c.isInstanceOf[BySourceDelete] }
    val inserts = indexed.filter { case (c, _) => c.isInstanceOf[NotMatchedInsert] }

    val act = when(isMatched, chain(matched, Keep))
      .when(targetOnly, chain(bySource, Keep))
      .otherwise(chain(inserts, Drop))
    val actCol = "__graft_merge_act"
    // ONE persisted evaluation of the join serves the guard pass, the
    // mask collection and the append staging — a non-deterministic
    // source (or AQE re-plan) cannot diverge between them
    val base = joined.withColumn(actCol, act)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // the protocol's nondeterminism guard: with it green, a target row
    // has at most ONE firing pair — its other matched pairs classify
    // Keep and are filtered out everywhere below, so no dedup window
    // is ever needed on this path
    val modifying = matched.map { case (c, _) => condOf(c) }
      .reduceOption(_ || _).getOrElse(lit(false))
    val maxModifying =
      if (uniqueSourceKeys) 1L
      else base.where(isMatched)
        .groupBy(col(s"$tAlias.$tid"))
        .agg(sum(when(modifying, 1L).otherwise(0L)).as("m"))
        .agg(coalesce(max(col("m")), lit(0L))).head().getLong(0)
    if (maxModifying > 1) {
      base.unpersist()
      sys.error(
        "MERGE failed: a target row was matched by multiple source rows " +
          "that would update or delete it — the merge is nondeterministic. " +
          "Deduplicate the source on the merge keys first.")
    }

    def setOf(c: MergeClause, column: String): Option[Column] = c match {
      case MatchedUpdate(_, set) =>
        if (set.isEmpty)
          if (srcCols.contains(column)) Some(col(s"$sAlias.$column")) else None
        else set.get(column)
      case BySourceUpdate(_, set) => set.get(column)
      case NotMatchedInsert(_, values) =>
        if (values.isEmpty)
          if (srcCols.contains(column)) Some(col(s"$sAlias.$column")) else None
        else Some(values.getOrElse(column, lit(null)))
      case _ => None
    }
    val out = tSchema.fields.toSeq.map { f =>
      val v = indexed.foldLeft(col(s"$tAlias.${f.name}")) { case (acc, (c, i)) =>
        setOf(c, f.name).fold(acc)(set =>
          when(col(actCol) === i, set).otherwise(acc))
      }
      v.cast(f.dataType).as(f.name)
    } ++ newFromSource.map { f =>
      val v = indexed.foldLeft(lit(null).cast(f.dataType): Column) {
        case (acc, (c, i)) => setOf(c, f.name).fold(acc)(set =>
          when(col(actCol) === i, set).otherwise(acc))
      }
      v.cast(f.dataType).as(f.name)
    } ++ newFromSets.map { n =>
      val v = indexed.foldLeft(lit(null): Column) { case (acc, (c, i)) =>
        setOf(c, n).fold(acc)(set =>
          when(col(actCol) === i, set).otherwise(acc))
      }
      v.as(n)
    }
    val pre = tCols.map(c => col(s"$tAlias.$c").as(c))
    val updateIdx = indexed.collect {
      case (c, i) if c.isInstanceOf[MatchedUpdate] ||
        c.isInstanceOf[BySourceUpdate] => i
    }
    val isUpd = updateIdx.map(col(actCol) === _)
      .reduceOption(_ || _).getOrElse(lit(false))

    DvPlan(
      mask = base.where(isTargetRow && col(actCol) =!= Keep)
        .select(col(s"$tAlias.$fpCol").as("fp"), col(s"$tAlias.$riCol").as("ri")),
      appends = base.where(col(actCol) =!= Keep && col(actCol) =!= Drop)
        .select(out: _*),
      updatePre = base.where(isTargetRow && isUpd).select(pre: _*),
      updatePost = base.where(isTargetRow && isUpd).select(out: _*),
      deleted = base.where(isTargetRow && col(actCol) === Drop).select(pre: _*),
      inserted = base.where(!isTargetRow && col(actCol) =!= Drop).select(out: _*),
      release = () => { base.unpersist(); () })
  }

  private def requireTargetCols(names: Iterable[String], tCols: Seq[String],
      what: String): Unit = {
    val bad = names.filterNot(tCols.contains)
    require(bad.isEmpty,
      s"$what references non-target column(s): ${bad.mkString(", ")}")
  }

  /** Fluent builder mirroring the reference's `DeltaTable.merge` chain:
    * {{{
    * Merge.into(spark, path, source, keys = Seq("id"))
    *   .on(col("t.is_current"))                       // extra ON predicate
    *   .whenMatchedUpdate(Map("x" -> col("s.x")), condition = col("s.x") =!= col("t.x"))
    *   .whenNotMatchedInsertAll()
    *   .execute()
    * }}} */
  def into(spark: SparkSession, table: String, source: DataFrame,
      keys: Seq[String]): Builder = new Builder(spark, table, source, keys)

  final class Builder private[Merge] (spark: SparkSession, table: String,
      source: DataFrame, keys: Seq[String]) {
    private var extra: Option[Column] = None
    private var evolve: Boolean = false
    private val clauses = Seq.newBuilder[MergeClause]
    /** Extra ON predicate beyond the key equalities (e.g. the SCD2
      * expire step's `t.is_current`). */
    def on(condition: Column): Builder = { extra = Some(condition); this }
    /** Delta's autoMerge: update-all/insert-all carry new source
      * columns into the target schema; explicit SET/VALUES may name
      * new columns. */
    def withSchemaEvolution(): Builder = { evolve = true; this }
    def whenMatchedUpdate(set: Map[String, Column],
        condition: Column = null): Builder = {
      clauses += MatchedUpdate(Option(condition), set); this }
    def whenMatchedUpdateAll(condition: Column = null): Builder = {
      clauses += MatchedUpdate(Option(condition), Map.empty); this }
    def whenMatchedDelete(condition: Column = null): Builder = {
      clauses += MatchedDelete(Option(condition)); this }
    def whenNotMatchedInsert(values: Map[String, Column],
        condition: Column = null): Builder = {
      clauses += NotMatchedInsert(Option(condition), values); this }
    def whenNotMatchedInsertAll(condition: Column = null): Builder = {
      clauses += NotMatchedInsert(Option(condition), Map.empty); this }
    def whenNotMatchedBySourceUpdate(set: Map[String, Column],
        condition: Column = null): Builder = {
      clauses += BySourceUpdate(Option(condition), set); this }
    def whenNotMatchedBySourceDelete(condition: Column = null): Builder = {
      clauses += BySourceDelete(Option(condition)); this }
    /** Run the merge; returns the committed table version. */
    def execute(): Long =
      DeltaLog.merge(spark, table, source, keys, clauses.result(), extra,
        schemaEvolution = evolve)
  }
}
