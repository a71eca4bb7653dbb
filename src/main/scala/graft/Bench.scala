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

    // Dev-only subset filter. Each query runs `reps` times and reports the
    // min — one timed run picks up whatever full-GC debt the previous
    // query's decimal/HLL buffers left behind (observed 6x inflation on a
    // single run), and min-of-2 measures the plan, not the neighbor.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    require(reps >= 1, s"SPARK_GRAFT_REPS must be >= 1, got $reps")
    val queries = SparkEntry.queries.filter(q => only.forall(_.contains(q._1)))
    require(queries.nonEmpty,
      s"SPARK_GRAFT_ONLY=${only.fold("")(_.mkString(","))} matches no registered query " +
        s"(known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")

    // JVM/codegen warmup on the smallest SF so per-query times measure the
    // plan, not first-call JIT + codegen compilation.
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    queries.foreach { case (name, fn) =>
      try fn(spark, warmupDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
      }
    }

    // Per-query shuffle accounting: a task-end listener totals shuffle
    // write bytes while a query runs — the number the scale claims are
    // about ("shuffles hashes, not text"). Collected on the LAST rep so
    // the figure is one clean run, not reps×.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          shuffleBytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)

    // A query that throws records wall-time -1 and lands in `failed` —
    // a regression must not masquerade as a fast run.
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var shuffled = 0L
      val times = (1 to reps).map { rep =>
        if (rep == reps) {
          // drain queued listener events from the previous rep, then zero
          org.apache.spark.GraftCoreShim.drainListenerBus(spark.sparkContext, 30000)
          shuffleBytes.set(0L)
        }
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        if (rep == reps) {
          org.apache.spark.GraftCoreShim.drainListenerBus(spark.sparkContext, 30000)
          shuffled = shuffleBytes.get()
        }
        if (ok) dt else -1.0
      }
      (name, times.min, !times.contains(-1.0), shuffled)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sh = results.map { case (k, _, _, s) => "\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _) => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"shuffle_bytes":$sh,"failed":$failed,"sf":"$sfDir"}"""
    // the stdout tail gets truncated downstream (the 83-query line is long
    // and sbt appends [success] noise) — persist the whole line to a file
    // as the canonical artifact, then print it for greppability
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
    java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
