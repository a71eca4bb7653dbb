package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable primitives shared by the LLM-pipeline operators.
  *
  * Every derived value here must be bit-identical between Spark and the
  * DuckDB oracle, so all hashing goes through md5 (identical in both
  * engines) and all folds are explicit left-folds (Spark `aggregate`
  * ≡ DuckDB `list_reduce` with a prepended zero) so double arithmetic
  * happens in the same IEEE order on both sides.
  */
object Portable {

  private def md5Prefix(c: Column, nibbles: Int): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(graft.functions.Md5PrefixLong(
      GraftSqlShim.expression(c), nibbles))
  }

  /** 60-bit string hash: first 15 hex chars of md5, as a non-negative
    * long — computed by the native [[graft.functions.Md5PrefixLong]]
    * expression (digest bytes → long, no hex string / substring / radix
    * parse per row; PortableSpec asserts bit-equality with the composed
    * form). DuckDB equivalent: `('0x' || substr(md5(x),1,15))::BIGINT`. */
  def h60(c: Column): Column = md5Prefix(c, 15)

  /** 32-bit string hash (fits multiply-mod arithmetic without overflow —
    * a*h+b stays under 2^63 for a,b < 2^30).
    * DuckDB: `('0x' || substr(md5(x),1,8))::BIGINT`. */
  def h32(c: Column): Column = md5Prefix(c, 8)

  /** DuckDB SQL fragments for the same hashes. */
  def h60Sql(e: String): String = s"('0x' || substr(md5($e),1,15))::BIGINT"
  def h32Sql(e: String): String = s"('0x' || substr(md5($e),1,8))::BIGINT"

  /** Whitespace tokenization with empty tokens removed — `split` keeps
    * leading/trailing empties (Java limit=-1) while DuckDB's
    * regexp_split_to_array does too; filtering on both sides makes the
    * edge behavior irrelevant. */
  def tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => t =!= lit(""))

  /** DuckDB: same tokenization. */
  def tokensSql(e: String): String =
    s"list_filter(regexp_split_to_array($e, '\\s+'), t -> t <> '')"

  /** Prime modulus for multiply-shift signature hashing (smallest prime
    * above 2^32, the classic minhash universe size). */
  val MinhashPrime: Long = 4294967311L

  /** Prime modulus for rolling/polynomial fingerprints. */
  val FingerprintPrime: Long = 1000000007L
}
