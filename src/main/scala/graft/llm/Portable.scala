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

  /** Whitespace tokenization with empty tokens removed. Computed as
    * `regexp_extract_all(c, "\S+")` — the maximal non-whitespace runs,
    * exactly the complement of splitting on `\s+` and dropping the
    * leading/trailing empties (Java `\s`/`\S` are complements, so the
    * two forms partition the string identically; PortableSpec asserts
    * equality with the split+filter composition). Chosen over
    * `filter(split(c, "\s+"), _ =!= "")` because higher-order
    * `ArrayFilter` is CodegenFallback — an interpreted lambda per
    * token — while `RegExpExtractAll` stays inside whole-stage codegen
    * (guide §4.1: prefer built-ins in the hot path). */
  def tokens(c: Column): Column = regexp_extract_all(c, lit("\\S+"), lit(0))

  /** DuckDB: same tokenization. */
  def tokensSql(e: String): String =
    s"list_filter(regexp_split_to_array($e, '\\s+'), t -> t <> '')"

  /** Prime modulus for multiply-shift signature hashing (smallest prime
    * above 2^32, the classic minhash universe size). */
  val MinhashPrime: Long = 4294967311L

  /** Prime modulus for rolling/polynomial fingerprints. */
  val FingerprintPrime: Long = 1000000007L
}
