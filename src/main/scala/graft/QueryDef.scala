package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark builder plus (optionally) an equivalent
  * ANSI SQL string the driver runs in DuckDB over the same parquet tables.
  *
  * Oracle-matching rules (driver compare sorts columns by name, then hashes
  * values):
  *   - every computed column is aliased identically on both sides;
  *   - sums are computed over `DECIMAL(38,10)` casts so they are exact and
  *     order-independent in both engines;
  *   - doubles that reach the output are rounded to a fixed scale;
  *   - row sets are deterministic (no unordered `first`, unseeded `rand`,
  *     or arbitrary-row dedup).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Query with a DuckDB oracle. */
  def sql(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  /** Query the driver checks rows-only (no SQL-expressible oracle). */
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
