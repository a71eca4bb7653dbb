package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL statement surface over Delta-protocol tables — the reference's
  * users drive their lakehouse from SQL notebooks (`OPTIMIZE`/`VACUUM`
  * in /root/reference/utils/optimize_tables.py:53-79, `RESTORE`/`MERGE`
  * on managed Delta), so every DML/maintenance verb the engine
  * implements is reachable as a statement here, with `delta.`path``
  * table references:
  *
  *   - `SELECT … FROM delta.`/p/t` [VERSION AS OF n | TIMESTAMP AS OF
  *     'yyyy-MM-dd[ HH:mm:ss]'] …` — any query; references are
  *     rewritten to temp views over [[DeltaLog.read]] and handed to
  *     Spark SQL unchanged (full Catalyst surface).
  *   - `DELETE FROM delta.`/p/t` WHERE cond` → [[DeltaLog.deleteWhere]]
  *     (deletion vectors, no rewrite).
  *   - `UPDATE delta.`/p/t` SET a = expr, b = expr WHERE cond` →
  *     [[DeltaLog.updateWhere]] (copy-on-write).
  *   - DELETE/UPDATE conditions MAY embed subqueries — a surface
  *     delta-spark refuses outright ("Subqueries are not supported in
  *     the DELETE/UPDATE condition"). One top-level `[NOT] IN (SELECT …)`
  *     membership conjunct rewrites to the distributed keyed MERGE
  *     (never a collected key list); scalar-comparison subqueries
  *     (`x >= (SELECT avg(…) …)`) each fold to their single value.
  *     See [[execDmlSubquery]] for the exact envelope.
  *   - `MERGE INTO delta.`/p/t` [AS t] USING src [AS s] ON t.k = s.k [AND …]
  *     WHEN MATCHED [AND c] THEN UPDATE SET …|* / DELETE,
  *     WHEN NOT MATCHED [AND c] THEN INSERT (…) VALUES (…) / INSERT *,
  *     WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE SET … / DELETE` →
  *     [[DeltaLog.merge]] (general clause merge, [[Merge]]).
  *   - `RESTORE TABLE delta.`/p/t` TO VERSION AS OF n` →
  *     [[DeltaLog.restore]].
  *   - `OPTIMIZE delta.`/p/t` [FULL] [ZORDER BY (a, b)]` →
  *     [[DeltaLog.optimize]] (bare form on a clustered table is
  *     INCREMENTAL — only files since the last clustering commit).
  *   - `VACUUM delta.`/p/t` [RETAIN n HOURS] [DRY RUN]` → [[DeltaLog.vacuum]].
  *   - `FSCK REPAIR TABLE delta.`/p/t` [DRY RUN]` → [[DeltaLog.fsckRepair]].
  *   - `DESCRIBE HISTORY delta.`/p/t`` → [[DeltaLog.history]].
  *   - `DESCRIBE DETAIL delta.`/p/t`` → [[DeltaLog.detail]].
  *   - `SHOW CREATE TABLE delta.`/p/t`` → [[DeltaLog.showCreateTable]].
  *   - `CREATE TABLE delta.`/p/u` SHALLOW CLONE delta.`/p/t`
  *     [VERSION AS OF n]` → [[DeltaLog.cloneShallow]].
  *   - `CREATE TABLE delta.`/p/t` (a BIGINT, b STRING, …) [PARTITIONED
  *     BY (b)] [TBLPROPERTIES ('k'='v', …)]` → [[DeltaLog.createTable]]
  *     (metadata-only commit 0 — the reference's DDL-first star schema,
  *     02_create_tables.sql:9-184).
  *   - `ALTER TABLE delta.`/p/t` ADD COLUMNS (c TIMESTAMP, …)` →
  *     [[DeltaLog.alterAddColumns]] (metadata-only evolution —
  *     02_create_tables.sql:187-189).
  *   - `ALTER TABLE delta.`/p/t` SET TBLPROPERTIES ('k'='v', …)` /
  *     `UNSET TBLPROPERTIES ('k', …)` → [[DeltaLog.alterSetProperties]]
  *     / [[DeltaLog.alterUnsetProperties]].
  *   - `COPY INTO delta.`/p/t` FROM '/landing/dir' FILEFORMAT = PARQUET
  *     [PATTERN = '*.parquet']` → [[DeltaLog.copyInto]] (idempotent
  *     per-file ingestion).
  *   - `INSERT INTO delta.`/p/t` REPLACE WHERE cond SELECT …` →
  *     [[DeltaLog.replaceWhere]] (selective overwrite).
  *   - `TABLE_CHANGES(delta.`/p/t`, from, to)` inside any SELECT →
  *     [[DeltaLog.changesRange]] (the CDF batch function).
  *   - `GENERATE symlink_format_manifest FOR TABLE delta.`/p/t`` →
  *     [[DeltaLog.generateSymlinkManifest]] (Presto/Trino/Athena
  *     manifests).
  *
  * DML/maintenance statements return a one-row frame with the committed
  * version (or files removed, for VACUUM) — the same shape Delta's SQL
  * returns. Predicates and SET expressions go through Spark's own
  * expression parser (`expr`), so the full function surface is usable.
  */
object GraftSql {

  private val Delete =
    """(?is)\s*DELETE\s+FROM\s+delta\.`([^`]+)`\s+WHERE\s+(.+?)\s*""".r
  private val Update =
    """(?is)\s*UPDATE\s+delta\.`([^`]+)`\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+TABLE\s+delta\.`([^`]+)`\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*""".r
  private val RestoreTs =
    """(?is)\s*RESTORE\s+TABLE\s+delta\.`([^`]+)`\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*""".r
  private val OptimizeZ =
    """(?is)\s*OPTIMIZE\s+delta\.`([^`]+)`\s+ZORDER\s+BY\s*\(([^)]+)\)\s*""".r
  private val OptimizeFull =
    """(?is)\s*OPTIMIZE\s+delta\.`([^`]+)`\s+FULL\s*""".r
  private val Optimize = """(?is)\s*OPTIMIZE\s+delta\.`([^`]+)`\s*""".r
  private val OptimizeWhereZ =
    ("""(?is)\s*OPTIMIZE\s+delta\.`([^`]+)`\s+WHERE\s+(.+?)""" +
      """\s+ZORDER\s+BY\s*\(([^)]+)\)\s*""").r
  private val OptimizeWhere =
    """(?is)\s*OPTIMIZE\s+delta\.`([^`]+)`\s+WHERE\s+(.+?)\s*""".r
  private val DeleteAll =
    """(?is)\s*DELETE\s+FROM\s+delta\.`([^`]+)`\s*""".r
  private val Ctas =
    """(?is)\s*CREATE\s+TABLE\s+delta\.`([^`]+)`\s*(.*?)\s*AS\s+(SELECT\s.+)""".r
  private val CtasOrReplace =
    """(?is)\s*CREATE\s+OR\s+REPLACE\s+TABLE\s+delta\.`([^`]+)`\s*(.*?)\s*AS\s+(SELECT\s.+)""".r
  private val ReorgPurge =
    """(?is)\s*REORG\s+TABLE\s+delta\.`([^`]+)`\s+APPLY\s*\(\s*PURGE\s*\)\s*""".r
  private val ReorgPurgeWhere =
    """(?is)\s*REORG\s+TABLE\s+delta\.`([^`]+)`\s+WHERE\s+(.+?)\s+APPLY\s*\(\s*PURGE\s*\)\s*""".r
  private val CreateBloomIdx =
    ("""(?is)\s*CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+TABLE\s+delta\.`([^`]+)`""" +
      """\s+FOR\s+COLUMNS\s*\(([^)]+)\)(?:\s+OPTIONS\s*\((.+)\))?\s*""").r
  private val DropBloomIdx =
    """(?is)\s*DROP\s+BLOOMFILTER\s+INDEX\s+ON\s+TABLE\s+delta\.`([^`]+)`\s*""".r
  private val VacuumRetain =
    """(?is)\s*VACUUM\s+delta\.`([^`]+)`\s+RETAIN\s+(\d+)\s+HOURS(\s+DRY\s+RUN)?\s*""".r
  private val VacuumLiteRetain =
    ("""(?is)\s*VACUUM\s+delta\.`([^`]+)`\s+LITE""" +
      """\s+RETAIN\s+(\d+)\s+HOURS(\s+DRY\s+RUN)?\s*""").r
  private val VacuumLite =
    """(?is)\s*VACUUM\s+delta\.`([^`]+)`\s+LITE(\s+DRY\s+RUN)?\s*""".r
  private val VacuumDry =
    """(?is)\s*VACUUM\s+delta\.`([^`]+)`\s+DRY\s+RUN\s*""".r
  private val ConvertStmt =
    ("""(?is)\s*CONVERT\s+TO\s+DELTA\s+parquet\.`([^`]+)`""" +
      """(?:\s+PARTITIONED\s+BY\s*\(([^)]+)\))?(\s+NO\s+STATISTICS)?\s*""").r
  private val ConvertIceberg =
    """(?is)\s*CONVERT\s+TO\s+DELTA\s+iceberg\.`([^`]+)`\s*""".r
  private val GenerateManifest =
    """(?is)\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+delta\.`([^`]+)`\s*""".r
  private val Vacuum = """(?is)\s*VACUUM\s+delta\.`([^`]+)`\s*""".r
  private val Fsck =
    """(?is)\s*FSCK\s+REPAIR\s+TABLE\s+delta\.`([^`]+)`(\s+DRY\s+RUN)?\s*""".r
  private val History = """(?is)\s*DESCRIBE\s+HISTORY\s+delta\.`([^`]+)`\s*""".r
  private val ShowCreate =
    """(?is)\s*SHOW\s+CREATE\s+TABLE\s+delta\.`([^`]+)`\s*""".r
  private val ShowProps =
    """(?is)\s*SHOW\s+TBLPROPERTIES\s+delta\.`([^`]+)`(?:\s*\(\s*'([^']+)'\s*\))?\s*""".r
  private val Detail = """(?is)\s*DESCRIBE\s+DETAIL\s+delta\.`([^`]+)`\s*""".r
  private val ShowParts =
    """(?is)\s*SHOW\s+PARTITIONS\s+delta\.`([^`]+)`\s*""".r
  private val CloneStmt =
    """(?is)\s*CREATE\s+TABLE\s+delta\.`([^`]+)`\s+SHALLOW\s+CLONE\s+delta\.`([^`]+)`(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*""".r
  private val DeepCloneStmt =
    """(?is)\s*CREATE\s+TABLE\s+delta\.`([^`]+)`\s+(?:DEEP\s+)?CLONE\s+delta\.`([^`]+)`(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*""".r
  private val CopyInto =
    """(?is)\s*COPY\s+INTO\s+delta\.`([^`]+)`\s+FROM\s+'([^']+)'\s+FILEFORMAT\s*=\s*(\w+)(?:\s+PATTERN\s*=\s*'([^']+)')?\s*""".r
  private val CountStar =
    """(?is)\s*SELECT\s+COUNT\s*\(\s*\*\s*\)(?:\s+AS\s+(\w+))?\s+FROM\s+delta\.`([^`]+)`(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*""".r
  private val ReplaceWhereStmt =
    """(?is)\s*INSERT\s+INTO\s+delta\.`([^`]+)`\s+REPLACE\s+WHERE\s+(.+?)\s+(SELECT\s.+)""".r
  private val InsertOverwriteStmt =
    """(?is)\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?delta\.`([^`]+)`\s+((?:SELECT|VALUES|FROM|WITH)\s.+)""".r
  private val InsertIntoStmt =
    """(?is)\s*INSERT\s+INTO\s+delta\.`([^`]+)`\s+((?:SELECT|VALUES|FROM|WITH)\s.+)""".r
  private val TableChanges =
    """(?i)TABLE_CHANGES\s*\(\s*delta\.`([^`]+)`\s*,\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  // Iceberg changelog: TABLE_CHANGES(iceberg.`p`[, fromSnapshotId])
  private val IcebergTableChanges =
    """(?i)TABLE_CHANGES\s*\(\s*iceberg\.`([^`]+)`\s*(?:,\s*(\d+)\s*)?\)""".r
  private val TableRef =
    """(?i)delta\.`([^`]+)`(\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""".r
  // VERSION AS OF takes a snapshot id OR a quoted ref name (Iceberg's
  // branch/tag addressing)
  private val IcebergRef =
    """(?i)iceberg\.`([^`]+)`(\s+VERSION\s+AS\s+OF\s+(\d+|'[^']+')|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""".r
  // must rewrite BEFORE IcebergRef, which would otherwise swallow the
  // path and leave the `.snapshots` suffix dangling on the view name
  private val IcebergMetaRef =
    """(?i)iceberg\.`([^`]+)`\.(snapshots|history|manifests|files|refs)""".r
  private val IcebergSetRef =
    ("""(?is)\s*ALTER\s+TABLE\s+iceberg\.`([^`]+)`\s+CREATE\s+""" +
      """(TAG|BRANCH)\s+(\w+)\s+AS\s+OF\s+VERSION\s+(\d+)\s*""").r
  private val IcebergDropRef =
    """(?is)\s*ALTER\s+TABLE\s+iceberg\.`([^`]+)`\s+DROP\s+(?:TAG|BRANCH)\s+(\w+)\s*""".r
  private val IcebergDelete =
    """(?is)\s*DELETE\s+FROM\s+iceberg\.`([^`]+)`\s+WHERE\s+(.+?)\s*""".r
  private val IcebergUpdate =
    """(?is)\s*UPDATE\s+iceberg\.`([^`]+)`\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*""".r
  // keyed MERGE with a recency guard — the reference's S8 sink shape as
  // a procedure-style verb (the clause-builder MERGE stays Delta-only)
  private val IcebergMerge =
    ("""(?is)\s*MERGE\s+INTO\s+iceberg\.`([^`]+)`\s+USING\s+(.+?)""" +
      """\s+ON\s+KEYS\s*\(([^)]+)\)\s+RECENCY\s+(\w+)\s*""").r
  private val IcebergExpire =
    ("""(?is)\s*EXPIRE\s+SNAPSHOTS\s+iceberg\.`([^`]+)`""" +
      """(?:\s+OLDER\s+THAN\s+'([^']+)')?(?:\s+RETAIN\s+LAST\s+(\d+))?\s*""").r
  private val IcebergReorg =
    """(?is)\s*REORG\s+TABLE\s+iceberg\.`([^`]+)`\s+APPLY\s*\(\s*PURGE\s*\)\s*""".r
  private val IcebergOptimize =
    """(?is)\s*OPTIMIZE\s+iceberg\.`([^`]+)`\s*""".r
  // the remove_orphan_files procedure, spelled like the Delta VACUUM
  // verb for cross-format consistency
  private val IcebergVacuum =
    ("""(?is)\s*VACUUM\s+iceberg\.`([^`]+)`""" +
      """(?:\s+OLDER\s+THAN\s+'([^']+)')?\s*""").r
  private val IcebergRewriteManifests =
    """(?is)\s*REWRITE\s+MANIFESTS\s+iceberg\.`([^`]+)`\s*""".r
  private val IcebergInsert =
    """(?is)\s*INSERT\s+INTO\s+iceberg\.`([^`]+)`\s+((?:SELECT|VALUES|FROM|WITH)\s.+)""".r
  // write-audit-publish: stage rows on a branch, then publish it
  private val IcebergInsertBranch =
    """(?is)\s*INSERT\s+INTO\s+iceberg\.`([^`]+)`\s+BRANCH\s+(\w+)\s+((?:SELECT|VALUES|FROM|WITH)\s.+)""".r
  private val IcebergFastForward =
    """(?is)\s*ALTER\s+TABLE\s+iceberg\.`([^`]+)`\s+FAST\s+FORWARD\s+TO\s+(\w+)\s*""".r
  private val IcebergCherrypick =
    """(?is)\s*ALTER\s+TABLE\s+iceberg\.`([^`]+)`\s+CHERRYPICK\s+SNAPSHOT\s+(\d+)\s*""".r
  private val IcebergCreateHead =
    """(?is)\s*CREATE\s+TABLE\s+iceberg\.`([^`]+)`\s*\((.*)""".r
  // CREATE TABLE: the column list may hold nested parens (DECIMAL(12,2)),
  // so only the head is regex-matched; the balanced column list and the
  // optional PARTITIONED BY / TBLPROPERTIES clauses are scanned manually
  private val CreateHead =
    """(?is)\s*CREATE\s+TABLE\s+delta\.`([^`]+)`\s*\((.*)""".r
  private val PartitionedBy =
    """(?is)\s*PARTITIONED\s+BY\s*\(([^)]+)\)(.*)""".r
  private val ClusterBy =
    """(?is)\s*CLUSTER\s+BY\s*\(([^)]+)\)(.*)""".r
  private val AlterCluster =
    """(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+CLUSTER\s+BY\s+(?:\(([^)]+)\)|(NONE))\s*""".r
  private val TblProps = """(?is)\s*TBLPROPERTIES\s*\((.+)\)\s*""".r
  private val AlterAdd =
    """(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+ADD\s+COLUMNS\s*\((.+)\)\s*""".r
  private val IceAlterAdd =
    """(?is)\s*ALTER\s+TABLE\s+iceberg\.`([^`]+)`\s+ADD\s+COLUMNS\s*\((.+)\)\s*""".r
  private val AlterSet =
    """(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+SET\s+TBLPROPERTIES\s*\((.+)\)\s*""".r
  private val AlterUnset =
    """(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+UNSET\s+TBLPROPERTIES\s*\((.+)\)\s*""".r
  private val AlterRename =
    """(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?\s*""".r
  private val AlterDropCol =
    """(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+DROP\s+COLUMN\s+`?(\w+)`?\s*""".r
  private val AlterAddCheck =
    """(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*""".r
  private val AlterDropCheck =
    """(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+DROP\s+CONSTRAINT\s+(\w+)\s*""".r
  private val AlterSync =
    """(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+SYNC\s+IDENTITY\s*""".r
  private val AlterSetDefault =
    ("""(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+ALTER\s+COLUMN\s+""" +
      """`?(\w+)`?\s+SET\s+DEFAULT\s+(.+?)\s*""").r
  private val AlterDropDefault =
    ("""(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+ALTER\s+COLUMN\s+""" +
      """`?(\w+)`?\s+DROP\s+DEFAULT\s*""").r
  private val AlterColType =
    ("""(?is)\s*ALTER\s+TABLE\s+delta\.`([^`]+)`\s+ALTER\s+COLUMN\s+""" +
      """`?(\w+)`?\s+TYPE\s+(.+?)\s*""").r
  private val PropPair = """'([^']*)'\s*=\s*'([^']*)'""".r
  private val PropKey = """'([^']*)'""".r

  private def parseProps(s: String): Map[String, String] =
    PropPair.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap

  // column DDL with a generation clause — Databricks' own syntax:
  //   sk BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1)
  //   yr INT GENERATED ALWAYS AS (year(order_ts))
  private val IdentityCol =
    ("""(?is)^\s*`?(\w+)`?\s+(\w+(?:\s*\([^)]*\))?)\s+GENERATED\s+""" +
      """(ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY""" +
      """(?:\s*\(\s*START\s+WITH\s+(-?\d+)(?:\s+INCREMENT\s+BY\s+(-?\d+))?\s*\))?\s*$""").r
  private val GeneratedCol =
    """(?is)^\s*`?(\w+)`?\s+(\w+(?:\s*\([^)]*\))?)\s+GENERATED\s+ALWAYS\s+AS\s*\((.+)\)\s*$""".r
  //   c INT DEFAULT 5, s STRING DEFAULT 'x' — column DEFAULT values
  private val DefaultCol =
    """(?is)^\s*`?(\w+)`?\s+(\w+(?:\s*\([^)]*\))?)\s+DEFAULT\s+(.+?)\s*$""".r

  /** Split a CREATE TABLE column list on top-level commas (nested
    * parens — DECIMAL(12,2), START WITH … — and quotes stay intact). */
  private def splitTopCommas(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var quote: Char = 0; var start = 0; var i = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().filter(_.trim.nonEmpty)
  }

  /** Parse a CREATE TABLE column list, honoring GENERATED ALWAYS AS
    * (expr) and GENERATED {ALWAYS|BY DEFAULT} AS IDENTITY clauses by
    * attaching the protocol's field-metadata keys. */
  private def parseColumns(colsDdl: String): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(splitTopCommas(colsDdl).map {
      case IdentityCol(name, tpe, kind, startO, stepO) =>
        val md = new MetadataBuilder()
          .putLong(DeltaLog.IdStartKey, Option(startO).map(_.toLong).getOrElse(1L))
          .putLong(DeltaLog.IdStepKey, Option(stepO).map(_.toLong).getOrElse(1L))
        if (!kind.equalsIgnoreCase("ALWAYS"))
          md.putBoolean(DeltaLog.IdAllowKey, true)
        StructField(name, DataType.fromDDL(tpe), nullable = true, md.build())
      case GeneratedCol(name, tpe, genExpr) =>
        StructField(name, DataType.fromDDL(tpe), nullable = true,
          new MetadataBuilder()
            .putString(DeltaLog.GenExprKey, genExpr.trim).build())
      case DefaultCol(name, tpe, dflt) =>
        StructField(name, DataType.fromDDL(tpe), nullable = true,
          new MetadataBuilder()
            .putString(DeltaLog.DefaultKey, dflt.trim).build())
      case plain => StructType.fromDDL(plain).fields.head
    })
  }

  /** Split `rest` (everything after the opening paren of a CREATE TABLE
    * column list) into the balanced column-list DDL and the tail after
    * its closing paren. */
  private def balancedSplit(rest: String): (String, String) = {
    var depth = 1; var i = 0; var quote = ' '
    while (i < rest.length && depth > 0) {
      val c = rest(i)
      if (quote != ' ') { if (c == quote) quote = ' ' }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      i += 1
    }
    require(depth == 0, s"unbalanced parens in CREATE TABLE: ($rest")
    (rest.substring(0, i - 1), rest.substring(i))
  }

  /** A `TIMESTAMP AS OF` literal: `yyyy-MM-dd[ HH:mm:ss]`, read in the
    * session's UTC convention. */
  private def parseTsMillis(s: String): Long = {
    val t = s.trim
    val ldt =
      if (t.length <= 10) java.time.LocalDate.parse(t).atStartOfDay()
      else java.time.LocalDateTime.parse(t.replace(' ', 'T'))
    ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
  }

  private val MergeHead =
    """(?is)\s*MERGE\s+(?:WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+.*""".r

  /** Split `s` on every top-level occurrence of word `keyword` —
    * outside parens, string literals, AND `CASE … END` blocks (a CASE
    * expression's own WHEN/AND must not split a MERGE statement).
    * Returns the segments WITHOUT the keyword; segment 0 is what
    * precedes the first occurrence. */
  private def topLevelSplit(s: String, keyword: String): Seq[String] = {
    val kw = keyword.toLowerCase
    val out = Seq.newBuilder[String]
    var depth = 0; var caseDepth = 0; var betweenPending = 0
    var quote: Char = 0
    var segStart = 0; var i = 0
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val c = s(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else c match {
        case '\'' | '"' | '`' => quote = c; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ if isWord(c) && (i == 0 || !isWord(s(i - 1))) =>
          var j = i; while (j < s.length && isWord(s(j))) j += 1
          val word = s.substring(i, j).toLowerCase
          if (word == "case") caseDepth += 1
          else if (word == "end" && caseDepth > 0) caseDepth -= 1
          // `x BETWEEN a AND b`: that AND is part of the expression, not
          // a conjunction — swallow exactly one following top-level AND
          else if (word == "between" && depth == 0 && caseDepth == 0)
            betweenPending += 1
          else if (word == "and" && depth == 0 && caseDepth == 0 &&
              betweenPending > 0)
            betweenPending -= 1
          else if (word == kw && depth == 0 && caseDepth == 0) {
            out += s.substring(segStart, i); segStart = j
          }
          i = j
        case _ => i += 1
      }
    }
    out += s.substring(segStart)
    out.result()
  }

  // clause bodies (what follows a top-level WHEN)
  private val MatchedUpdateStar =
    """(?is)\s*MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+UPDATE\s+SET\s+\*\s*""".r
  private val MatchedUpdateC =
    """(?is)\s*MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+UPDATE\s+SET\s+(.+?)\s*""".r
  private val MatchedDeleteC =
    """(?is)\s*MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+DELETE\s*""".r
  private val BySourceUpdateC =
    """(?is)\s*NOT\s+MATCHED\s+BY\s+SOURCE(?:\s+AND\s+(.+?))?\s+THEN\s+UPDATE\s+SET\s+(.+?)\s*""".r
  private val BySourceDeleteC =
    """(?is)\s*NOT\s+MATCHED\s+BY\s+SOURCE(?:\s+AND\s+(.+?))?\s+THEN\s+DELETE\s*""".r
  private val InsertStarC =
    """(?is)\s*NOT\s+MATCHED(?:\s+BY\s+TARGET)?(?:\s+AND\s+(.+?))?\s+THEN\s+INSERT\s+\*\s*""".r
  private val InsertC =
    """(?is)\s*NOT\s+MATCHED(?:\s+BY\s+TARGET)?(?:\s+AND\s+(.+?))?\s+THEN\s+INSERT\s*\(([^)]*)\)\s*VALUES\s*\((.+)\)\s*""".r
  private val MergeTarget =
    """(?is)\s*MERGE\s+INTO\s+delta\.`([^`]+)`(?:\s+AS\s+(\w+)|\s+(?!USING\b)(\w+))?\s+USING\s+(.*)""".r
  private val SourceAliasOn =
    """(?is)(?:\s*AS\s+(\w+)|\s*(?!ON\b)(\w+))?\s+ON\s+(.+)""".r
  private val EqConjunct =
    """(?is)\s*(\w+)\.`?(\w+)`?\s*=\s*(\w+)\.`?(\w+)`?\s*""".r

  private def stripAlias(name: String, aliases: Set[String]): String = {
    val parts = name.split('.')
    if (parts.length == 2 && aliases.contains(parts(0).toLowerCase)) parts(1)
    else name
  }

  /** `MERGE INTO delta.`path` [AS t] USING <src> [AS s] ON <cond>
    * WHEN [NOT] MATCHED [BY SOURCE] [AND c] THEN UPDATE SET …|* / DELETE /
    * INSERT (cols) VALUES (…) | INSERT *` → [[DeltaLog.merge]].
    * The source is `delta.`path``, a registered view, or a
    * parenthesized subquery (itself allowed to reference delta paths).
    * ON must contain at least one same-named `t.k = s.k` equality (the
    * shuffle keys); any further conjuncts become an extra join
    * predicate. */
  private def execMerge(spark: SparkSession, statement: String): DataFrame = {
    // delta-spark's `MERGE WITH SCHEMA EVOLUTION INTO …` spelling
    val EvolutionHead = """(?is)(\s*MERGE\s+)WITH\s+SCHEMA\s+EVOLUTION\s+(INTO\s+.*)""".r
    val (stmt, evolve) = statement match {
      case EvolutionHead(head, tail) => (head + tail, true)
      case s => (s, false)
    }
    val (path, tAliasOpt, rest) = stmt match {
      case MergeTarget(p, a1, a2, r) =>
        (p, Option(a1).orElse(Option(a2)), r)
      case _ => sys.error(s"cannot parse MERGE statement: $statement")
    }
    // the USING source: delta ref, parenthesized subquery, or view name
    val trimmed = rest.trim
    val (srcDf, afterSrc) =
      if (trimmed.startsWith("(")) {
        var depth = 0; var quote: Char = 0; var end = -1; var i = 0
        while (i < trimmed.length && end < 0) {
          val c = trimmed(i)
          if (quote != 0) { if (c == quote) quote = 0 }
          else c match {
            case '\'' | '"' | '`' => quote = c
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        require(end > 0, s"unbalanced parens in MERGE source: $trimmed")
        (exec(spark, trimmed.substring(1, end)), trimmed.substring(end + 1))
      } else {
        val DeltaSrc = """(?is)(delta\.`[^`]+`(?:\s+VERSION\s+AS\s+OF\s+\d+)?)(.*)""".r
        val IceSrc = """(?is)(iceberg\.`[^`]+`(?:\s+VERSION\s+AS\s+OF\s+\d+)?)(.*)""".r
        val ViewSrc = """(?is)([\w.]+)(.*)""".r
        trimmed match {
          case DeltaSrc(ref, after) => (exec(spark, s"SELECT * FROM $ref"), after)
          case IceSrc(ref, after) => (exec(spark, s"SELECT * FROM $ref"), after)
          case ViewSrc(view, after) => (spark.table(view), after)
          case _ => sys.error(s"cannot parse MERGE source: $trimmed")
        }
      }
    val (sAliasOpt, onAndClauses) = afterSrc match {
      case SourceAliasOn(a1, a2, r) => (Option(a1).orElse(Option(a2)), r)
      case _ => sys.error(s"expected [alias] ON <cond> after MERGE source: $afterSrc")
    }
    val tAlias = tAliasOpt.getOrElse("t")
    val sAlias = sAliasOpt.getOrElse("s")
    val aliasSet = Set(tAlias.toLowerCase, sAlias.toLowerCase)

    val whenSegs = topLevelSplit(onAndClauses, "WHEN")
    require(whenSegs.length >= 2, s"MERGE needs at least one WHEN clause: $statement")
    val onCond = whenSegs.head

    // classify ON conjuncts: same-named t/s equalities are merge keys,
    // the rest joins as an extra predicate
    val (keys, extras) = topLevelSplit(onCond, "AND")
      .foldLeft((Seq.empty[String], Seq.empty[String])) { case ((ks, es), conj) =>
        conj match {
          case EqConjunct(a1, c1, a2, c2)
            if c1.equalsIgnoreCase(c2) &&
              Set(a1.toLowerCase, a2.toLowerCase) == aliasSet => (ks :+ c1, es)
          case other => (ks, es :+ other)
        }
      }
    require(keys.nonEmpty,
      s"MERGE ON needs at least one $tAlias.<col> = $sAlias.<col> equality: $onCond")
    val extraOn = extras.map(expr).reduceOption(_ && _)

    def setMap(set: String): Map[String, org.apache.spark.sql.Column] =
      splitAssignments(set).map {
        case Assign(c, e) => stripAlias(c, aliasSet) -> expr(e)
        case bad => sys.error(s"cannot parse SET assignment: '$bad'")
      }.toMap
    def condOpt(c: String) = Option(c).map(expr)

    val clauses: Seq[MergeClause] = whenSegs.tail.map {
      case MatchedUpdateStar(c) => MergeClause.MatchedUpdate(condOpt(c), Map.empty)
      case MatchedDeleteC(c) => MergeClause.MatchedDelete(condOpt(c))
      case MatchedUpdateC(c, set) => MergeClause.MatchedUpdate(condOpt(c), setMap(set))
      case BySourceDeleteC(c) => MergeClause.BySourceDelete(condOpt(c))
      case BySourceUpdateC(c, set) => MergeClause.BySourceUpdate(condOpt(c), setMap(set))
      case InsertStarC(c) => MergeClause.NotMatchedInsert(condOpt(c), Map.empty)
      case InsertC(c, cols, vals) =>
        val names = cols.split(",").map(n => stripAlias(
          n.trim.stripPrefix("`").stripSuffix("`"), aliasSet)).filter(_.nonEmpty)
        val exprs = splitAssignments(vals)
        require(names.length == exprs.length,
          s"INSERT column/value count mismatch: ${names.length} vs ${exprs.length}")
        MergeClause.NotMatchedInsert(condOpt(c), names.zip(exprs.map(expr)).toMap)
      case bad => sys.error(s"cannot parse MERGE WHEN clause: WHEN $bad")
    }
    version(spark, DeltaLog.merge(spark, path, srcDf, keys, clauses, extraOn,
      aliases = (tAlias, sAlias), schemaEvolution = evolve))
  }

  /** Split a SET clause on top-level commas (commas inside parens or
    * string literals belong to the expression). */
  private def splitAssignments(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
    }
    if (cur.nonEmpty) out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val Assign = """(?s)\s*`?([\w.]+)`?\s*=\s*(.+)""".r

  /** True when a DML condition embeds a `(SELECT …)` subquery. */
  private def hasSubquery(s: String): Boolean =
    """(?is)\(\s*SELECT\b""".r.findFirstIn(s).isDefined

  // a whole conjunct of the shape `col [NOT] IN (SELECT …)` —
  // topLevelSplit already guarantees balanced parens within a conjunct,
  // so the greedy body runs to the final `)`
  private val InSubqueryConjunct =
    """(?is)\s*`?([\w.]+)`?\s+(NOT\s+)?IN\s*\(\s*(SELECT\b.+)\)\s*""".r

  /** Replace every `(SELECT …)` in an SQL fragment with its evaluated
    * scalar literal. Each subquery runs through [[exec]] (so
    * `delta.`path``/`iceberg.`path`` references work) and must return
    * exactly one row and one column. Quote-aware: parens inside string
    * literals are opaque. */
  private def foldScalarSubqueries(spark: SparkSession, fragment: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fragment.length) {
      val c = fragment(i)
      if (c == '\'') {
        val j = fragment.indexOf('\'', i + 1)
        val end = if (j < 0) fragment.length else j + 1
        out.append(fragment.substring(i, end)); i = end
      } else if (c == '(' &&
          fragment.substring(i + 1).dropWhile(_.isWhitespace)
            .take(7).toLowerCase.startsWith("select")) {
        var depth = 0; var j = i; var quote = false; var endIdx = -1
        while (j < fragment.length && endIdx < 0) {
          val ch = fragment(j)
          if (quote) { if (ch == '\'') quote = false }
          else ch match {
            case '\'' => quote = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) endIdx = j
            case _ =>
          }
          j += 1
        }
        require(endIdx > 0, s"unbalanced parens in: $fragment")
        val sub = fragment.substring(i + 1, endIdx)
        val r = exec(spark, sub)
        require(r.schema.length == 1,
          s"scalar subquery must return one column, got ${r.schema.length}: ($sub)")
        val rows = r.limit(2).collect()
        require(rows.length == 1,
          s"scalar subquery must return exactly one row, got ${rows.length}: ($sub)")
        out.append(sqlLiteral(rows(0).get(0)))
        i = endIdx + 1
      } else { out.append(c); i += 1 }
    }
    out.result()
  }

  /** Render a collected scalar as a SQL literal for predicate folding. */
  private def sqlLiteral(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case t: java.time.Instant => s"TIMESTAMP '${java.sql.Timestamp.from(t)}'"
    case d: java.sql.Date => s"DATE '$d'"
    case d: java.time.LocalDate => s"DATE '$d'"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case other => other.toString
  }

  /** Qualify bare references to `key` with `alias` inside a raw SQL
    * fragment — quote- and word-boundary-aware, leaving `x.key`
    * (already qualified) and `key(` (a function named key) alone. */
  private def qualifyKey(fragment: String, key: String, alias: String): String = {
    val sb = new StringBuilder
    var i = 0
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < fragment.length) {
      val c = fragment(i)
      if (c == '\'' || c == '`') {
        val j = fragment.indexOf(c, i + 1)
        val end = if (j < 0) fragment.length else j + 1
        sb.append(fragment.substring(i, end)); i = end
      } else if (isWord(c) && (i == 0 ||
          (!isWord(fragment(i - 1)) && fragment(i - 1) != '.'))) {
        var j = i; while (j < fragment.length && isWord(fragment(j))) j += 1
        val word = fragment.substring(i, j)
        val next = fragment.drop(j).dropWhile(_.isWhitespace).headOption
        if (word.equalsIgnoreCase(key) &&
            !next.contains('(') && !next.contains('.'))
          sb.append(s"$alias.$word")
        else sb.append(word)
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  /** DELETE/UPDATE whose WHERE embeds subqueries. Envelope:
    *
    *   - at most ONE top-level `key [NOT] IN (SELECT …)` membership
    *     conjunct. IN rewrites to `MERGE … WHEN MATCHED [AND residual]
    *     THEN DELETE/UPDATE` against the subquery's distinct keys —
    *     fully distributed, the key set never lands on the driver.
    *     NOT IN rewrites to `WHEN NOT MATCHED BY SOURCE` with SQL's
    *     null semantics kept exactly: a NULL in the subquery result
    *     means NO row qualifies, and NULL target keys never qualify.
    *   - scalar `(SELECT …)` subqueries ANYWHERE in the remaining
    *     conjuncts (`x >= (SELECT avg(…) …)`, `y BETWEEN (SELECT …)
    *     AND (SELECT …)`); each runs through [[exec]] (so
    *     `delta.`path``/`iceberg.`path`` references work), must yield
    *     exactly one row and column, and folds to a literal.
    *
    * Residual conjuncts and SET expressions referencing the membership
    * KEY column by bare name are auto-qualified with the target alias
    * (the merge join carries a same-named source key).
    * Returns the committed version. */
  private def execDmlSubquery(spark: SparkSession, path: String,
      cond: String, set: Option[Seq[(String, String)]]): Long = {
    // SET arrives as raw (column, expression) strings: the merge branch
    // must qualify bare key references in the expressions (the joined
    // frame carries a same-named source key), which only works before
    // parsing. Scalar subqueries in the expressions fold here either way.
    def setColumns(qualify: Option[String]): Option[Map[String, org.apache.spark.sql.Column]] =
      set.map(_.map { case (c, e) =>
        val folded = foldScalarSubqueries(spark, e)
        c -> expr(qualify.fold(folded)(k => qualifyKey(folded, k, "t")))
      }.toMap)
    val conjuncts = topLevelSplit(cond, "AND").map(_.trim).filter(_.nonEmpty)
    val (members, rest0) = conjuncts.partition {
      case InSubqueryConjunct(_, _, _) => true
      case _ => false
    }
    require(members.size <= 1,
      s"at most one [NOT] IN (SELECT …) conjunct is supported, got ${members.size}: $cond")
    val rest = rest0.map { conj =>
      // EXISTS cannot fold to a scalar and would otherwise produce a
      // baffling parse error downstream — refuse with the envelope
      require(!"""(?i)\bEXISTS\s*\(""".r.findFirstIn(conj).isDefined,
        s"unsupported subquery shape in DML condition (supported: " +
          s"`col [NOT] IN (SELECT …)` and scalar `(SELECT …)` anywhere " +
          s"in an expression; spell EXISTS as IN): $conj")
      foldScalarSubqueries(spark, conj)
    }
    members.headOption match {
      case None =>
        // every subquery was scalar: folded to a plain predicate
        val pred = rest.reduceOption((a, b) => s"($a) AND ($b)")
          .map(expr).getOrElse(lit(true))
        setColumns(qualify = None)
          .fold(DeltaLog.deleteWhere(spark, path, pred))(m =>
            DeltaLog.updateWhere(spark, path, pred, m))
      case Some(InSubqueryConjunct(keyRaw, notKw, sub)) =>
        val key = keyRaw.split('.').last
        // inside the merge join the source carries a same-named key, so
        // bare references to it in the residual are ambiguous — qualify
        // them with the target alias
        val residual = rest.map(qualifyKey(_, key, "t"))
          .reduceOption((a, b) => s"($a) AND ($b)").map(expr)
        val src0 = exec(spark, sub)
        require(src0.schema.length == 1,
          s"IN subquery must return one column, got ${src0.schema.length}: ($sub)")
        val src = src0.select(col(src0.columns.head).as(key)).distinct()
        if (notKw != null) {
          // NOT IN: one NULL in the list makes the predicate UNKNOWN for
          // every row — nothing qualifies (probed with a limit-1 job)
          if (!src.where(col(key).isNull).isEmpty)
            return DeltaLog.snapshot(spark, path).version
          // the target alias qualifies the key: the joined frame carries
          // the same-named source key (null for by-source rows)
          val guard = residual.fold(col(s"t.$key").isNotNull)(
            col(s"t.$key").isNotNull && _)
          val clause: MergeClause = setColumns(Some(key)).fold[MergeClause](
            MergeClause.BySourceDelete(Some(guard)))(m =>
            MergeClause.BySourceUpdate(Some(guard), m))
          // src is .distinct() on exactly the merge key — the guard
          // aggregation is provably a no-op and skips
          DeltaLog.merge(spark, path, src, Seq(key), Seq(clause),
            uniqueSourceKeys = true)
        } else {
          val clause: MergeClause = setColumns(Some(key)).fold[MergeClause](
            MergeClause.MatchedDelete(residual))(m =>
            MergeClause.MatchedUpdate(residual, m))
          DeltaLog.merge(spark, path, src, Seq(key), Seq(clause),
            uniqueSourceKeys = true)
        }
      case Some(other) => sys.error(s"unreachable membership conjunct: $other")
    }
  }

  /** Shared CTAS body: evaluate the query and land it as one commit.
    * `orReplace = false` refuses an existing target; `true` overwrites
    * it in place, redeclaring the schema, with history preserved. */
  private def execCtas(spark: SparkSession, path: String, mid: String,
      select: String, orReplace: Boolean): DataFrame = {
    require(orReplace || !DeltaLog.isDeltaTable(spark, path),
      s"CTAS target already exists: $path (use CREATE OR REPLACE TABLE)")
    def cols(s: String) = s.split(",")
      .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty).toSeq
    val (partBy, clusterBy, afterPart) = mid match {
      case PartitionedBy(cs, t) => (cols(cs), Seq.empty[String], t)
      case ClusterBy(cs, t) => (Seq.empty[String], cols(cs), t)
      case t => (Seq.empty[String], Seq.empty[String], t)
    }
    val props = afterPart match {
      case TblProps(kv) => parseProps(kv)
      case t => require(t.trim.isEmpty,
        s"cannot parse CTAS tail: '$t'"); Map.empty[String, String]
    }
    val df = exec(spark, select)
    val v = DeltaLog.write(spark, df, path, "overwrite",
      partitionBy = partBy, properties = props)
    if (clusterBy.nonEmpty) {
      DeltaLog.alterClusterBy(spark, path, clusterBy)
      version(spark, DeltaLog.snapshot(spark, path).version)
    } else version(spark, v)
  }

  /** SQL INSERT is POSITIONAL: when the SELECT's arity matches the
    * target's declared column count, columns map (and cast) by position;
    * otherwise the frame passes by NAME so generated/identity columns
    * the INSERT legitimately omits still fill in at write. */
  private def positional(spark: SparkSession, table: String,
      df: DataFrame): DataFrame = {
    val declared = if (!DeltaLog.isDeltaTable(spark, table)) None
      else DeltaLog.snapshot(spark, table).schema
    declared match {
      case Some(s) if s.fields.length == df.columns.length =>
        df.select(df.columns.zip(s.fields).map { case (c, f) =>
          df.col(c).cast(f.dataType).as(f.name)
        }.toIndexedSeq: _*)
      case _ => df
    }
  }

  /** Position-coerce an incoming frame to an ICEBERG table's declared
    * schema (the [[positional]] twin for iceberg refs). */
  private def icebergPositional(spark: SparkSession, table: String,
      df: DataFrame): DataFrame =
    if (!IcebergTable.isIcebergTable(spark, table)) df
    else {
      val s = IcebergTable.state(spark, table).schema
      if (s.fields.length != df.columns.length) df
      else df.select(df.columns.zip(s.fields).map { case (c, f) =>
        df.col(c).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
    }

  /** Iceberg SQL partition transforms — `bucket(4, c)`, `truncate(8, c)`,
    * `years(c)`/`months(c)`/`days(c)`/`hours(c)` (singular accepted),
    * bare `c` for identity — to the engine's (source, transform) pairs. */
  private def parseIcebergTransforms(s: String): Seq[(String, String)] = {
    val Fn = """(?i)(\w+)\s*\(\s*([^)]*)\s*\)""".r
    def bare(c: String) = c.trim.stripPrefix("`").stripSuffix("`")
    s.split(",(?![^(]*\\))").map(_.trim).filter(_.nonEmpty).toSeq.map {
      case Fn(fn, args) =>
        val a = args.split(",").map(bare).filter(_.nonEmpty)
        fn.toLowerCase match {
          case "bucket" =>
            require(a.length == 2, s"bucket(n, col) expected: $args")
            a(1) -> s"bucket[${a(0)}]"
          case "truncate" =>
            require(a.length == 2, s"truncate(w, col) expected: $args")
            a(1) -> s"truncate[${a(0)}]"
          case "year" | "years" => a(0) -> "year"
          case "month" | "months" => a(0) -> "month"
          case "day" | "days" => a(0) -> "day"
          case "hour" | "hours" => a(0) -> "hour"
          case other => sys.error(s"unknown Iceberg partition transform: $other")
        }
      case c => bare(c) -> "identity"
    }
  }

  private def version(spark: SparkSession, v: Long): DataFrame = {
    import spark.implicits._
    Seq(v).toDF("version")
  }

  /** Execute one statement (see object doc). Unrecognized statement
    * shapes fall through to Spark SQL with `delta.`path`` references
    * rewritten to temp views — so plain SELECTs just work. */
  def exec(spark: SparkSession, statement: String): DataFrame = statement match {
    // Iceberg keyed MERGE with the recency guard (Scd2.sourceWins) —
    // `MERGE INTO iceberg.`p` USING (<select>) ON KEYS (k) RECENCY ts` —
    // must dispatch BEFORE the generic Delta MergeHead catch-all
    case IcebergMerge(path, src, keys, recency) =>
      val srcSql0 = src.trim
      // strip ONE outer paren pair only when the opening paren actually
      // encloses the whole text — `(SELECT ...) UNION ALL (SELECT ...)`
      // is balanced but not enclosed, and stripping would corrupt it
      def enclosed(s: String): Boolean = {
        if (!(s.startsWith("(") && s.endsWith(")"))) return false
        var depth = 0
        var inStr = false
        var i = 0
        while (i < s.length - 1) {
          val c = s.charAt(i)
          if (inStr) { if (c == '\'') inStr = false }
          else c match {
            case '\'' => inStr = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) return false
            case _ =>
          }
          i += 1
        }
        depth == 1
      }
      val srcSql =
        if (enclosed(srcSql0)) srcSql0.substring(1, srcSql0.length - 1)
        else srcSql0
      version(spark, IcebergTable.mergeUpsert(spark, path, exec(spark, srcSql),
        keys.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq, recency))
    case MergeHead() => execMerge(spark, statement)
    // DDL before DML: CloneStmt also begins with CREATE TABLE but names
    // no column list, so the head patterns cannot collide
    case CloneStmt(target, src, v) =>
      version(spark,
        DeltaLog.cloneShallow(spark, src, target, Option(v).map(_.toLong)))
    // Databricks semantics: a bare CLONE is a deep clone
    case DeepCloneStmt(target, src, v) =>
      version(spark,
        DeltaLog.cloneDeep(spark, src, target, Option(v).map(_.toLong)))
    case CreateHead(path, rest) =>
      val (colsDdl, tail) = balancedSplit(rest)
      val schema = parseColumns(colsDdl)
      val (partBy, clusterBy, afterPart) = tail match {
        case PartitionedBy(cols, t) =>
          (cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty).toSeq, Seq.empty[String], t)
        case ClusterBy(cols, t) =>
          (Seq.empty[String],
            cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
              .filter(_.nonEmpty).toSeq, t)
        case t => (Seq.empty[String], Seq.empty[String], t)
      }
      val props = afterPart match {
        case TblProps(kv) => parseProps(kv)
        case t => require(t.trim.isEmpty,
          s"cannot parse CREATE TABLE tail: '$t'"); Map.empty[String, String]
      }
      version(spark,
        DeltaLog.createTable(spark, path, schema, partBy, props, clusterBy))
    // CTAS — CREATE TABLE ... AS SELECT: evaluate the query (delta
    // references and TABLE_CHANGES rewrite recursively) and land it as
    // the new table's first commit. CreateHead cannot collide: it
    // requires an explicit column list in parens.
    // CREATE OR REPLACE TABLE … AS SELECT: one atomic overwrite commit
    // that REDECLARES the schema (delta-spark's replace semantics —
    // history and time travel to the pre-replace versions survive,
    // unlike DROP + CREATE)
    case CtasOrReplace(path, mid, select) =>
      execCtas(spark, path, mid, select, orReplace = true)
    case Ctas(path, mid, select) =>
      execCtas(spark, path, mid, select, orReplace = false)
    case AlterAdd(path, colsDdl) =>
      version(spark, DeltaLog.alterAddColumns(spark, path,
        org.apache.spark.sql.types.StructType.fromDDL(colsDdl)))
    // Iceberg column-level schema evolution — metadata-only, fresh
    // field ids, old files null-fill on read
    case IceAlterAdd(path, colsDdl) =>
      version(spark, IcebergTable.alterAddColumns(spark, path,
        org.apache.spark.sql.types.StructType.fromDDL(colsDdl)).toLong)
    case AlterSet(path, kv) =>
      version(spark, DeltaLog.alterSetProperties(spark, path, parseProps(kv)))
    case AlterUnset(path, kv) =>
      version(spark, DeltaLog.alterUnsetProperties(spark, path,
        PropKey.findAllMatchIn(kv).map(_.group(1)).toSeq))
    case AlterRename(path, from, to) =>
      version(spark, DeltaLog.alterRenameColumn(spark, path, from, to))
    case AlterDropCol(path, name) =>
      version(spark, DeltaLog.alterDropColumn(spark, path, name))
    case AlterAddCheck(path, name, check) =>
      version(spark, DeltaLog.alterAddConstraint(spark, path, name, check))
    case AlterDropCheck(path, name) =>
      version(spark, DeltaLog.alterDropConstraint(spark, path, name))
    case AlterSync(path) =>
      version(spark, DeltaLog.alterSyncIdentity(spark, path))
    case AlterSetDefault(path, c, dflt) =>
      version(spark, DeltaLog.alterColumnDefault(spark, path, c, Some(dflt)))
    case AlterDropDefault(path, c) =>
      version(spark, DeltaLog.alterColumnDefault(spark, path, c, None))
    case AlterColType(path, c, tpe) =>
      version(spark, DeltaLog.alterColumnType(spark, path, c,
        org.apache.spark.sql.types.DataType.fromDDL(tpe)))
    case AlterCluster(path, cols, none) =>
      version(spark, DeltaLog.alterClusterBy(spark, path,
        if (none != null) Seq.empty
        else cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq))
    // Iceberg merge-on-read DELETE: position-delete slots land in one
    // v2 delete snapshot, no data file rewritten
    case IcebergDelete(path, cond) =>
      version(spark, IcebergTable.deleteWhere(spark, path, expr(cond)))
    // Iceberg merge-on-read UPDATE: position deletes + post-image
    // appends in ONE snapshot, no data file rewritten
    case IcebergUpdate(path, set, cond) =>
      val assignments = splitAssignments(set).map {
        case Assign(c, e) => c -> expr(e)
        case bad => sys.error(s"cannot parse SET assignment: '$bad'")
      }
      version(spark,
        IcebergTable.updateWhere(spark, path, expr(cond), assignments.toMap))
    // REORG iceberg APPLY (PURGE): materialize merge-on-read deletes —
    // survivors rewritten in one REPLACE snapshot, delete files gone
    case IcebergReorg(path) =>
      version(spark, IcebergTable.materializeDeletes(spark, path))
    // named refs: a TAG pins a snapshot (expiry-protected), a BRANCH is
    // a movable head; SELECT addresses them via VERSION AS OF 'name'
    case IcebergSetRef(path, kind, name, snap) =>
      IcebergTable.setRef(spark, path, name, snap.toLong,
        isBranch = kind.equalsIgnoreCase("BRANCH"))
      version(spark, IcebergTable.refSnapshotId(spark, path, name))
    case IcebergDropRef(path, name) =>
      IcebergTable.dropRef(spark, path, name)
      version(spark, IcebergTable.refSnapshotId(spark, path, "main"))
    // OPTIMIZE iceberg: the rewrite_data_files procedure — bin-pack
    // small files, apply merge-on-read deletes, carry big clean files
    case IcebergOptimize(path) =>
      val (rewritten, carried) = IcebergTable.rewriteDataFiles(spark, path)
      import spark.implicits._
      Seq((rewritten.toLong, carried.toLong))
        .toDF("rewritten_data_files_count", "carried_data_files_count")
    // CREATE TABLE iceberg with the spec's SQL transform syntax —
    // `PARTITIONED BY (bucket(4, k), days(ts))` — lands one empty
    // snapshot declaring schema + partition spec; appends adopt it
    case IcebergCreateHead(path, rest) =>
      val (colsDdl, tail) = balancedSplit(rest)
      val schema = parseColumns(colsDdl)
      // transforms nest parens (`bucket(4, k)`), so the clause body is
      // cut at the BALANCING close paren, not the first one
      val PartHead = """(?is)\s*PARTITIONED\s+BY\s*\((.*)""".r
      val partition = tail match {
        case PartHead(rest2) => parseIcebergTransforms(balancedSplit(rest2)._1)
        case _ => Seq.empty
      }
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      version(spark,
        IcebergTable.writeAppend(spark, empty, path, partition = partition))
    case IcebergInsertBranch(path, branch, select) =>
      version(spark, IcebergTable.writeAppend(spark,
        icebergPositional(spark, path, exec(spark, select)), path,
        toBranch = Some(branch)))
    case IcebergFastForward(path, branch) =>
      version(spark, IcebergTable.fastForward(spark, path, branch))
    case IcebergCherrypick(path, snap) =>
      version(spark, IcebergTable.cherrypick(spark, path, snap.toLong))
    case IcebergInsert(path, select) =>
      version(spark, IcebergTable.writeAppend(spark,
        icebergPositional(spark, path, exec(spark, select)), path))
    // Iceberg snapshot expiry (the expire_snapshots procedure):
    // defaults mirror the procedure's — older than NOW, retain last 1
    case IcebergExpire(path, ts, retain) =>
      val older = Option(ts).map(parseTsMillis)
        .getOrElse(System.currentTimeMillis() + 1L)
      val n = Option(retain).map(_.toInt).getOrElse(1)
      val removed = IcebergTable.expireSnapshots(spark, path, older, n)
      import spark.implicits._
      Seq(removed).toDF("files_deleted")
    case IcebergVacuum(path, ts) =>
      // default grace: 3 days (Iceberg's remove_orphan_files default) —
      // a bare VACUUM next to a live writer must never sweep files the
      // writer staged into data/ but has not yet committed
      val older = Option(ts).map(parseTsMillis)
        .getOrElse(System.currentTimeMillis() - 3L * 24 * 3600 * 1000)
      val removed = IcebergTable.removeOrphanFiles(spark, path, older)
      import spark.implicits._
      Seq(removed).toDF("files_deleted")
    case IcebergRewriteManifests(path) =>
      val (before, after) = IcebergTable.rewriteManifests(spark, path)
      import spark.implicits._
      Seq((before, after)).toDF("manifests_before", "manifests_after")
    case Delete(path, cond) if hasSubquery(cond) =>
      version(spark, execDmlSubquery(spark, path, cond, None))
    case Delete(path, cond) =>
      version(spark, DeltaLog.deleteWhere(spark, path, expr(cond)))
    // DELETE without WHERE: metadata-only truncate — ONE commit removing
    // every file entry; no data file is read, rewritten, or DV-masked
    // (Delta's full-table DELETE fast path)
    case DeleteAll(path) =>
      val empty = DeltaLog.read(spark, path).limit(0)
      version(spark, DeltaLog.write(spark, empty, path, "overwrite"))
    case Update(path, set, cond) if hasSubquery(set) || hasSubquery(cond) =>
      // SET expressions fold their scalar subqueries to literals
      // (`SET x = (SELECT avg(…) …) * 2`); the condition goes through
      // the full membership/scalar rewrite
      val raw = splitAssignments(set).map {
        case Assign(c, e) => c -> e
        case bad => sys.error(s"cannot parse SET assignment: '$bad'")
      }
      version(spark, execDmlSubquery(spark, path, cond, Some(raw)))
    case Update(path, set, cond) =>
      val assignments = splitAssignments(set).map {
        case Assign(c, e) => c -> expr(e)
        case bad => sys.error(s"cannot parse SET assignment: '$bad'")
      }
      version(spark,
        DeltaLog.updateWhere(spark, path, expr(cond), assignments.toMap))
    case Restore(path, v) =>
      version(spark, DeltaLog.restore(spark, path, v.toLong))
    case RestoreTs(path, ts) =>
      version(spark, DeltaLog.restore(spark, path,
        DeltaLog.versionAtTimestamp(spark, path, parseTsMillis(ts))))
    case OptimizeZ(path, cols) =>
      version(spark, DeltaLog.optimize(spark, path,
        zorderBy = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq))
    // OPTIMIZE ... WHERE: partition-scoped compaction/clustering — the
    // predicate must reference partition columns only (validated inside)
    case OptimizeWhereZ(path, cond, cols) =>
      version(spark, DeltaLog.optimize(spark, path,
        zorderBy = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq,
        where = Some(expr(cond))))
    case OptimizeWhere(path, cond) =>
      version(spark, DeltaLog.optimize(spark, path, where = Some(expr(cond))))
    // OPTIMIZE ... FULL: whole-table recluster (resets the incremental
    // clustering basis); bare OPTIMIZE on a clustered table is
    // incremental — O(files since the last clustering commit)
    case OptimizeFull(path) =>
      version(spark, DeltaLog.optimize(spark, path, full = true))
    case Optimize(path) =>
      version(spark, DeltaLog.optimize(spark, path))
    // REORG ... APPLY (PURGE): rewrite ONLY the files carrying deletion
    // vectors (minFileSize=1 scopes bin-packing to DV files — no file is
    // under 1 byte), materializing the deletes; Delta's REORG verb.
    // The WHERE form additionally zone-map-scopes which DV files purge —
    // O(matching DV files) after a targeted sweep, never O(table)
    case ReorgPurgeWhere(path, cond) =>
      version(spark,
        DeltaLog.optimize(spark, path, minFileSize = 1L, where = Some(expr(cond))))
    case ReorgPurge(path) =>
      version(spark, DeltaLog.optimize(spark, path, minFileSize = 1L))
    case CreateBloomIdx(path, cols, opts) =>
      val props = Option(opts).map(parseProps).getOrElse(Map.empty)
      val colSeq = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty).toSeq
      BloomIndex.create(spark, path, colSeq,
        fpp = props.get("fpp").map(_.toDouble).getOrElse(BloomIndex.DefaultFpp),
        items = props.get("numItems").map(_.toLong)
          .getOrElse(BloomIndex.DefaultItems))
      import spark.implicits._
      colSeq.toDF("indexed_column")
    case DropBloomIdx(path) =>
      BloomIndex.drop(spark, path)
      import spark.implicits._
      Seq(path).toDF("dropped_index_on")
    // CONVERT TO DELTA parquet.`path` [PARTITIONED BY (c1, c2)] [NO STATISTICS]
    // — partition column NAMES only (types come from partition discovery,
    // matching convertToDelta's contract)
    case ConvertStmt(path, partCols, noStats) =>
      val pb = Option(partCols).toSeq.flatMap(_.split(",").toSeq)
        .map(_.trim.stripPrefix("`").stripSuffix("`"))
        // tolerate delta-spark's `name type` partition-schema spelling by
        // keeping the name token only
        .map(_.split("\\s+")(0)).filter(_.nonEmpty)
      version(spark,
        DeltaLog.convertToDelta(spark, path, pb, collectStats = noStats == null))
    case ConvertIceberg(path) =>
      version(spark, DeltaLog.convertIcebergToDelta(spark, path))
    // GENERATE symlink_format_manifest: Presto/Trino/Athena manifests
    case GenerateManifest(path) =>
      val n = DeltaLog.generateSymlinkManifest(spark, path)
      import spark.implicits._
      Seq(n).toDF("files_listed")
    // VACUUM ... LITE: log-driven reclamation, no table listing
    case VacuumLiteRetain(path, hours, dry) =>
      val n = DeltaLog.vacuumLite(spark, path,
        retainMillis = hours.toLong * 60L * 60L * 1000L,
        dryRun = dry != null)
      import spark.implicits._
      Seq(n.toLong).toDF(if (dry != null) "files_reclaimable" else "files_removed")
    case VacuumLite(path, dry) =>
      import spark.implicits._
      Seq(DeltaLog.vacuumLite(spark, path, dryRun = dry != null).toLong)
        .toDF(if (dry != null) "files_reclaimable" else "files_removed")
    case VacuumRetain(path, hours, dry) =>
      val n = DeltaLog.vacuum(spark, path,
        retainMillis = hours.toLong * 60L * 60L * 1000L,
        dryRun = dry != null)
      import spark.implicits._
      Seq(n.toLong).toDF(if (dry != null) "files_reclaimable" else "files_removed")
    case VacuumDry(path) =>
      import spark.implicits._
      Seq(DeltaLog.vacuum(spark, path, dryRun = true).toLong)
        .toDF("files_reclaimable")
    case Vacuum(path) =>
      import spark.implicits._
      Seq(DeltaLog.vacuum(spark, path).toLong).toDF("files_removed")
    // FSCK REPAIR TABLE: drop log entries whose files vanished out-of-band
    case Fsck(path, dry) =>
      import spark.implicits._
      DeltaLog.fsckRepair(spark, path, dryRun = dry != null)
        .toDF(if (dry != null) "missing_file" else "removed_file")
    case History(path) =>
      DeltaLog.history(spark, path)
    case ShowCreate(path) =>
      import spark.implicits._
      Seq(DeltaLog.showCreateTable(spark, path)).toDF("createtab_stmt")
    case Detail(path) =>
      DeltaLog.detail(spark, path)
    // SHOW PARTITIONS: the distinct partition tuples, straight from the
    // DISTRIBUTED file frame's partitionValues — zero data files opened
    case ShowParts(path) =>
      val snap = DeltaLog.snapshot(spark, path)
      require(snap.partitionColumns.nonEmpty,
        s"SHOW PARTITIONS: table is not partitioned: $path")
      val phys = snap.columnMapping
      snap.allFiles.select(snap.partitionColumns.map(c =>
        try_element_at(col("partitionValues"),
          lit(phys.getOrElse(c, c))).as(c)): _*)
        .distinct().orderBy(snap.partitionColumns.map(col): _*)
    case ShowProps(path, key) =>
      // SHOW TBLPROPERTIES delta.`p` [('key')] — Delta's SQL shape:
      // all configuration pairs, or the one asked-for key
      import spark.implicits._
      val cfg = DeltaLog.snapshot(spark, path).configuration
      val rows = Option(key) match {
        case Some(k) => Seq(k -> cfg.getOrElse(k,
          s"Table ${path} does not have property: $k"))
        case None => cfg.toSeq.sortBy(_._1)
      }
      rows.toDF("key", "value")
    case CopyInto(path, from, fmt, pat) =>
      val (v, n) = DeltaLog.copyInto(spark, path, from,
        fmt.toLowerCase, Option(pat))
      import spark.implicits._
      Seq((v, n.toLong)).toDF("version", "files_ingested")
    // a bare COUNT(*) answers from file statistics — zero data files
    // opened (Delta's metadata-count fast path)
    case CountStar(alias, path, v) =>
      import spark.implicits._
      Seq(DeltaLog.countRows(spark, path, Option(v).map(_.toLong)))
        .toDF(Option(alias).getOrElse("count(1)"))
    case ReplaceWhereStmt(path, cond, select) =>
      version(spark,
        DeltaLog.replaceWhere(spark, path, exec(spark, select), expr(cond)))
    case InsertOverwriteStmt(path, select) =>
      // honors spark.sql.sources.partitionOverwriteMode=dynamic: only
      // the partitions the SELECT carries are replaced
      version(spark, DeltaLog.write(spark,
        positional(spark, path, exec(spark, select)), path, mode = "overwrite"))
    case InsertIntoStmt(path, select) =>
      version(spark, DeltaLog.write(spark,
        positional(spark, path, exec(spark, select)), path, mode = "append"))
    case other =>
      // SELECT (or anything else): rewrite table_changes(delta.`p`, a, b)
      // and delta.`path` [VERSION AS OF n | TIMESTAMP AS OF 'ts']
      // references into temp views and let Spark SQL take it from there
      val withChanges0 = TableChanges.replaceAllIn(other, m => {
        val (path, a, b) = (m.group(1), m.group(2).toLong, m.group(3).toLong)
        val view = s"graft_changes_${Integer.toHexString((path, a, b).hashCode)}"
        DeltaLog.changesRange(spark, path, a, b).createOrReplaceTempView(view)
        scala.util.matching.Regex.quoteReplacement(view)
      })
      val withChanges = IcebergTableChanges.replaceAllIn(withChanges0, m => {
        val path = m.group(1)
        val from = Option(m.group(2)).map(_.toLong)
        val view = s"graft_ice_changes_${Integer.toHexString((path, from).hashCode)}"
        IcebergTable.changes(spark, path, fromSnapshotExclusive = from)
          .createOrReplaceTempView(view)
        scala.util.matching.Regex.quoteReplacement(view)
      })
      val rewritten = TableRef.replaceAllIn(withChanges, m => {
        val path = m.group(1)
        val ver = Option(m.group(3)).map(_.toLong)
          .orElse(Option(m.group(4)).map(t =>
            DeltaLog.versionAtTimestamp(spark, path, parseTsMillis(t))))
        val view = s"graft_delta_${Integer.toHexString((path, ver).hashCode)}"
        DeltaLog.read(spark, path, ver).createOrReplaceTempView(view)
        scala.util.matching.Regex.quoteReplacement(view)
      })
      // iceberg.`path`.snapshots|history|manifests|files — the spec's
      // inspection tables, resolved before the bare table ref below
      val withIceMeta = IcebergMetaRef.replaceAllIn(rewritten, m => {
        val (path, kind) = (m.group(1), m.group(2).toLowerCase)
        val view = s"graft_icemeta_${Integer.toHexString((path, kind).hashCode)}"
        IcebergTable.metadataTable(spark, path, kind)
          .createOrReplaceTempView(view)
        scala.util.matching.Regex.quoteReplacement(view)
      })
      // iceberg.`path` [VERSION AS OF snapshotId | TIMESTAMP AS OF 'ts']
      // resolves through the Iceberg reader (merge-on-read deletes
      // applied), same temp-view mechanism
      val withIceberg = IcebergRef.replaceAllIn(withIceMeta, m => {
        val path = m.group(1)
        // numeric = snapshot id; quoted = branch/tag name
        val snapId = Option(m.group(3)).map { tok =>
          if (tok.startsWith("'"))
            IcebergTable.refSnapshotId(spark, path,
              tok.stripPrefix("'").stripSuffix("'"))
          else tok.toLong
        }
        val asOf = Option(m.group(4)).map(parseTsMillis)
        val view = s"graft_iceberg_${Integer.toHexString((path, snapId, asOf).hashCode)}"
        IcebergTable.read(spark, path, snapId, asOf).createOrReplaceTempView(view)
        scala.util.matching.Regex.quoteReplacement(view)
      })
      spark.sql(withIceberg)
  }
}
