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
  *   - `SELECT … FROM delta.`/p/t` [VERSION AS OF n] …` — any query;
  *     references are rewritten to temp views over [[DeltaLog.read]]
  *     and handed to Spark SQL unchanged (full Catalyst surface).
  *   - `DELETE FROM delta.`/p/t` WHERE cond` → [[DeltaLog.deleteWhere]]
  *     (deletion vectors, no rewrite).
  *   - `UPDATE delta.`/p/t` SET a = expr, b = expr WHERE cond` →
  *     [[DeltaLog.updateWhere]] (copy-on-write).
  *   - `RESTORE TABLE delta.`/p/t` TO VERSION AS OF n` →
  *     [[DeltaLog.restore]].
  *   - `OPTIMIZE delta.`/p/t` [ZORDER BY (a, b)]` → [[DeltaLog.optimize]].
  *   - `VACUUM delta.`/p/t` [RETAIN n HOURS]` → [[DeltaLog.vacuum]].
  *   - `DESCRIBE HISTORY delta.`/p/t`` → [[DeltaLog.history]].
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
  private val OptimizeZ =
    """(?is)\s*OPTIMIZE\s+delta\.`([^`]+)`\s+ZORDER\s+BY\s*\(([^)]+)\)\s*""".r
  private val Optimize = """(?is)\s*OPTIMIZE\s+delta\.`([^`]+)`\s*""".r
  private val VacuumRetain =
    """(?is)\s*VACUUM\s+delta\.`([^`]+)`\s+RETAIN\s+(\d+)\s+HOURS\s*""".r
  private val Vacuum = """(?is)\s*VACUUM\s+delta\.`([^`]+)`\s*""".r
  private val History = """(?is)\s*DESCRIBE\s+HISTORY\s+delta\.`([^`]+)`\s*""".r
  private val TableRef =
    """(?i)delta\.`([^`]+)`(\s+VERSION\s+AS\s+OF\s+(\d+))?""".r

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

  private def version(spark: SparkSession, v: Long): DataFrame = {
    import spark.implicits._
    Seq(v).toDF("version")
  }

  /** Execute one statement (see object doc). Unrecognized statement
    * shapes fall through to Spark SQL with `delta.`path`` references
    * rewritten to temp views — so plain SELECTs just work. */
  def exec(spark: SparkSession, statement: String): DataFrame = statement match {
    case Delete(path, cond) =>
      version(spark, DeltaLog.deleteWhere(spark, path, expr(cond)))
    case Update(path, set, cond) =>
      val assignments = splitAssignments(set).map {
        case Assign(c, e) => c -> expr(e)
        case bad => sys.error(s"cannot parse SET assignment: '$bad'")
      }
      version(spark,
        DeltaLog.updateWhere(spark, path, expr(cond), assignments.toMap))
    case Restore(path, v) =>
      version(spark, DeltaLog.restore(spark, path, v.toLong))
    case OptimizeZ(path, cols) =>
      version(spark, DeltaLog.optimize(spark, path,
        zorderBy = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq))
    case Optimize(path) =>
      version(spark, DeltaLog.optimize(spark, path))
    case VacuumRetain(path, hours) =>
      val n = DeltaLog.vacuum(spark, path,
        retainMillis = hours.toLong * 60L * 60L * 1000L)
      import spark.implicits._
      Seq(n.toLong).toDF("files_removed")
    case Vacuum(path) =>
      import spark.implicits._
      Seq(DeltaLog.vacuum(spark, path).toLong).toDF("files_removed")
    case History(path) =>
      DeltaLog.history(spark, path)
    case other =>
      // SELECT (or anything else): rewrite delta.`path` [VERSION AS OF n]
      // references into temp views and let Spark SQL take it from there
      val rewritten = TableRef.replaceAllIn(other, m => {
        val path = m.group(1)
        val ver = Option(m.group(3)).map(_.toLong)
        val view = s"graft_delta_${Integer.toHexString((path, ver).hashCode)}"
        DeltaLog.read(spark, path, ver).createOrReplaceTempView(view)
        scala.util.matching.Regex.quoteReplacement(view)
      })
      spark.sql(rewritten)
  }
}
