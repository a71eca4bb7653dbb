package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed Aggregator (SURVEY §2.9 U4 family): exact population
  * variance over fixed-point inputs.
  *
  * Why this exists: `var_pop(double)` accumulates IEEE doubles, so its
  * low bits depend on partitioning/merge order — re-running the same
  * query on the same data can differ, which a bit-exact verification
  * gate (or an incremental recompute diff) cannot tolerate. This
  * aggregator keeps both moments in arbitrary-precision integers over
  * values quantized to a caller-chosen grid (callers pass
  * `CAST(round(value * 1e6) AS BIGINT)` for a 1e-6 grid), so the sums
  * are exact and order-independent; only the final finish() converts to
  * double, with a fixed operation order any SQL engine can mirror:
  * `s2/n - (s1/n)^2`.
  *
  * Buffer is kryo-encoded (BigInt doesn't fit Spark's fixed
  * DecimalType(38,18) product-encoder mapping without overflow), so the
  * aggregate runs through ObjectHashAggregate — off the codegen fast
  * path, the price of unbounded-precision state. The merge is
  * associative+commutative, so map-side partial aggregation still
  * applies; state is 3 numbers per group.
  */
object ExactVariance {

  case class State(s1: BigInt, s2: BigInt, n: Long)

  /** Population variance of the quantized values, in grid units². */
  object VarPopQ extends Aggregator[Long, State, Double] {
    override def zero: State = State(BigInt(0), BigInt(0), 0L)
    override def reduce(b: State, x: Long): State = {
      val v = BigInt(x)
      State(b.s1 + v, b.s2 + v * v, b.n + 1)
    }
    override def merge(a: State, b: State): State =
      State(a.s1 + b.s1, a.s2 + b.s2, a.n + b.n)
    override def finish(b: State): Double =
      if (b.n == 0) Double.NaN
      else {
        // fixed op order: s2/n - mean*mean — the oracle mirrors this
        val mean = b.s1.toDouble / b.n
        b.s2.toDouble / b.n - mean * mean
      }
    override def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val functionName = "exact_var_pop_q"

  /** Register for SQL / untyped DataFrame use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register(functionName, org.apache.spark.sql.functions.udaf(VarPopQ))
}
