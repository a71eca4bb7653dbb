package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: runs every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall times.
  *
  * Each query is materialized through a `noop`-format write — unlike
  * `count()`, this forces full evaluation of every output column (windows,
  * join projections, string/JSON work) instead of letting Catalyst prune
  * everything that doesn't affect cardinality.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)

    // JVM/codegen warmup on the smallest SF so per-query times measure the
    // plan, not first-call JIT + codegen compilation.
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }

    // A query that throws records wall-time -1 and lands in `failed` —
    // a regression must not masquerade as a fast run.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
