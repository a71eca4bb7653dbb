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

    // LOAD GATE (before the session exists, so the only load measured is
    // OTHER processes'): a timed pass started at loadavg 3.0 cost round 9
    // an honest r8 comparison. Wait — bounded — for the 1-min load to
    // fall under the gate; if it never does, proceed but record the
    // breach in the artifact so the numbers carry their own caveat.
    def load1(): Double = scala.util.Try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .trim.split(" ").head.toDouble
    }.getOrElse(0.0)
    val loadGate = sys.env.getOrElse("SPARK_GRAFT_LOAD_GATE", "1.5").toDouble
    val loadWaitMs = sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT_MS", "180000").toLong
    val gateT0 = System.currentTimeMillis()
    while (load1() > loadGate &&
        System.currentTimeMillis() - gateT0 < loadWaitMs) {
      System.err.println(
        f"[bench] load gate: 1-min loadavg ${load1()}%.2f > $loadGate%.1f — waiting")
      Thread.sleep(5000)
    }
    val gateWaited = System.currentTimeMillis() - gateT0
    val gateOk = load1() <= loadGate
    if (!gateOk) System.err.println(
      f"[bench] load gate BREACHED after ${gateWaited}ms: loadavg ${load1()}%.2f " +
        "— timing anyway; artifact will record gate_ok=false")

    val spark = GraftSession.local(cpus)

    // Dev-only subset filter. Each query runs `reps` times and reports the
    // min — one timed run picks up whatever full-GC debt the previous
    // query's decimal/HLL buffers left behind (observed 6x inflation on a
    // single run), and min-of-2 measures the plan, not the neighbor.
    // Machine-contention guard (two of the last four artifacts were
    // polluted by concurrent load): record the host load average around
    // the run so a reader can judge the numbers' provenance without a
    // forensic rerun.
    def loadAvg(): String = scala.util.Try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .trim.split(" ").take(3).mkString("[", ",", "]")
    }.getOrElse("[]")
    val loadBefore = loadAvg()

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
    // a regression must not masquerade as a fast run. A drain timeout (a
    // backed-up listener bus) degrades only that query's shuffle figure
    // to -1 instead of aborting the run.
    def drain(): Boolean = scala.util.Try(
      org.apache.spark.GraftCoreShim.drainListenerBus(spark.sparkContext, 30000)).isSuccess
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // absorb the previous query's GC debt before timing starts: one
      // timed run otherwise pays the neighbor's full-GC (observed 6x
      // inflation on dedup queries following decimal/HLL-heavy plans).
      // The gc sits OUTSIDE the timed window, so reported totals measure
      // plans, not the neighbor's collections.
      System.gc()
      Thread.sleep(100)
      var shuffled = -1L
      val times = (1 to reps).map { rep =>
        // drain queued listener events from the previous rep, then zero
        val preDrained = rep == reps && { val d = drain(); shuffleBytes.set(0L); d }
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // shuffle figure only when the rep succeeded AND both drains did
        // — a failed query's partial work must not masquerade as its
        // shuffle footprint (-1 = not measured)
        if (rep == reps && ok && preDrained && drain()) shuffled = shuffleBytes.get()
        if (ok) dt else -1.0
      }
      (name, times.min, !times.contains(-1.0), shuffled)
    }
    spark.sparkContext.removeSparkListener(listener)
    def r4(v: Double): Double = math.rint(v * 10000) / 10000 // 0.1 ms grain

    // Gold-batch headline + scaling curve: the full medallion build —
    // bronze two-level CDC parse → silver cleanse/dedup → gold dims +
    // fact + validation — over the golden fixture replicated N times
    // (disjoint id spaces, identical per-row work). The one wall-time
    // budget the reference publishes is its nightly gold batch: 7,200 s
    // on 4 workers (jobs/gold_pipeline_config.json:11); this is the
    // engine's apples-to-apples number. The fixture is LANDED to parquet
    // before the timer starts — the reference's budget covers a pipeline
    // reading already-landed data, so generation cost must not count.
    // Three points (default 5k/20k/50k copies) give the headline a
    // scaling slope, not just one sample. Skipped for dev subset runs
    // unless the knob is set explicitly.
    val goldCurve = sys.env.getOrElse("SPARK_GRAFT_GOLD_CURVE", "5000,20000,50000")
      .split(",").filter(_.nonEmpty).map(_.trim.toInt).toSeq
    val goldSkip = goldCurve.isEmpty || goldCurve.exists(_ <= 0) ||
      (only.nonEmpty && sys.env.get("SPARK_GRAFT_GOLD_CURVE").isEmpty)
    val goldJson = if (goldSkip) "" else {
      var prevPerK = Option.empty[Double]
      val points = goldCurve.map { copies =>
        val dir = java.nio.file.Files.createTempDirectory("graft_gold_fixture")
        try {
          // land the scaled topics OUTSIDE the timed window
          val landed = graft.pipelines.Fixtures.topicsScaled(spark, copies).map {
            case (topic, df) =>
              val p = dir.resolve(topic).toString
              df.write.mode("overwrite").parquet(p)
              topic -> spark.read.parquet(p)
          }
          def timedBuild(): (Double, Long, Boolean) = {
            System.gc(); Thread.sleep(100)
            val t0 = System.nanoTime()
            val tables = graft.pipelines.Medallion.graph(spark, landed).runMaterialized()
            tables.values.foreach(_.write.format("noop").mode("overwrite").save())
            val checks = graft.pipelines.Medallion.validate(tables).collect()
            val dt = r4((System.nanoTime() - t0) / 1e9)
            val factRows = tables("trip_fact").count()
            val allPass = checks.forall(_.getBoolean(2))
            graft.pipelines.TableGraph.release(tables)
            (dt, factRows, allPass)
          }
          var (dt, factRows, allPass) = timedBuild()
          // contention guard: the pipeline is sublinear-to-flat per copy,
          // so a point whose sec/kcopy rate JUMPS >2x over the previous
          // point is almost certainly machine noise (the r7 artifact's
          // 50k point was 22x inflated by concurrent load). Re-measure
          // once on the already-landed fixture and keep the better run,
          // labeling the point so the artifact shows it happened.
          val rerun = prevPerK.exists(p => dt * 1000.0 / copies > 2 * p)
          if (rerun) {
            val (dt2, f2, p2) = timedBuild()
            if (dt2 < dt) { dt = dt2; factRows = f2; allPass = p2 }
          }
          val perK = r4(dt * 1000.0 / copies)
          prevPerK = Some(perK)
          s"""{"copies":$copies,"sec":$dt,"sec_per_kcopy":$perK,""" +
            s""""fact_rows":$factRows,"validation_passed":$allPass,"rerun":$rerun}"""
        } finally {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
      s""","gold_batch":${points.head},"gold_curve":[${points.mkString(",")}]"""
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val sh = results.map { case (k, _, _, s) => "\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = r4(results.collect { case (_, v, true, _) => v }.sum)
    val head = s""""metric":"total","value":$total,"unit":"sec""""
    val loadJson = s""""load":{"before":$loadBefore,"after":${loadAvg()},""" +
      s""""procs":${Runtime.getRuntime.availableProcessors()},""" +
      s""""gate":{"threshold":$loadGate,"ok":$gateOk,"waited_ms":$gateWaited}}"""
    val tail = s""""failed":$failed,"sf":"$sfDir",""" +
      s""""queries_file":"BENCH_FULL.json",$loadJson$goldJson"""
    // The downstream tail capture is bounded (~2000 chars) and sbt
    // appends [success] noise, so a single line carrying the 119-query
    // map truncates (BENCH_r04..r06 parsed: null) — and 119 named
    // timings alone are ~3000 chars, so they can never fit the parsed
    // line. Emission order for a bounded tail: droppable detail lines
    // FIRST (shuffle map, then the per-query times map), and a COMPACT
    // summary — total, failed, sf, gold_batch, gold_curve; NO per-query
    // map — as the very LAST stdout line, so the capture always ends
    // with one complete parseable JSON line. The full canonical line
    // goes to TWO file artifacts untruncated: the scratch path
    // (BENCH_LOCAL.json, gitignored) and BENCH_FULL.json, which is
    // TRACKED so every round's full per-query map survives in git for
    // round-over-round regression checks; the summary line's
    // `queries_file` field names it.
    val full = s"""{$head,"queries":$qs,"shuffle_bytes":$sh,$tail}"""
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json"))
    java.nio.file.Files.write(out, (full + "\n").getBytes("UTF-8"))
    // a SPARK_GRAFT_ONLY dev run must never clobber the tracked
    // full-surface artifact with a partial query map
    if (only.isEmpty)
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        (full + "\n").getBytes("UTF-8"))
    println(s"""{"metric":"shuffle_bytes_by_query","unit":"bytes","shuffle_bytes":$sh}""")
    println(s"""{"metric":"per_query_sec","unit":"sec","queries":$qs}""")
    println(s"""{$head,$tail}""")
    spark.stop()
  }
}
