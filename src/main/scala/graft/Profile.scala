package graft

import org.apache.spark.scheduler._

/** Dev profiling tool: run named queries once (noop sink, after an
  * sf0.001 warmup) and split wall time into Spark-job time vs
  * driver-side gaps — the measurement loop for the fixture-heavy DML
  * queries, where per-commit driver work (metadata JSON/avro, fsync,
  * plan analysis) competes with actual task execution.
  *
  * Usage: runMain graft.Profile [sfDir] queryName...
  */
object Profile {
  private case class JobRec(id: Int, desc: String, submitted: Long,
      var finished: Long = -1L, var tasks: Int = 0, var taskMs: Long = 0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: runMain graft.Profile [sfDir] queryName...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties).map { p =>
          val d = p.getProperty("spark.job.description", "")
          if (d.nonEmpty) d else p.getProperty("callSite.short", "")
        }.getOrElse("")
        jobs.put(js.jobId, JobRec(js.jobId, desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId); if (r != null) r.finished = je.time
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // per-action attribution: every collect/count/save the query's code
    // path issues is one QueryExecution — funcName + root plan node +
    // wall time name the commit-machinery actions job counts can't
    case class Act(fn: String, node: String, ms: Long)
    val acts = new java.util.concurrent.ConcurrentLinkedQueue[Act]()
    val qeListener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val ph = qe.tracker.phases.map { case (k, v) =>
          s"$k=${v.endTimeMs - v.startTimeMs}" }.mkString(" ")
        acts.add(Act(funcName, qe.executedPlan.nodeName + "  [" + ph + "]",
          durationNs / 1000000))
        ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qeListener)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"warmup $n: ${e.getMessage}") }
      System.gc(); Thread.sleep(200)
      org.apache.spark.GraftCoreShim.drainListenerBus(spark.sparkContext, 30000)
      jobs.clear(); acts.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wallMs = (System.nanoTime() - t0) / 1e6
      org.apache.spark.GraftCoreShim.drainListenerBus(spark.sparkContext, 30000)
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.sortBy(_.submitted)
      // merge job intervals to charge overlapping (concurrent) jobs once
      val iv = recs.filter(_.finished > 0).map(r => (r.submitted, r.finished))
        .sortBy(_._1)
      val jobMs = iv.foldLeft((0L, 0L)) { case ((acc, hi), (s, e)) =>
        if (e <= hi) (acc, hi)
        else if (s >= hi) (acc + (e - s), e)
        else (acc + (e - hi), e)
      }._1
      println(f"\n=== $n wall=${wallMs / 1000}%.3fs jobs=${recs.size} " +
        f"jobTime=${jobMs / 1000.0}%.3fs driverGap=${(wallMs - jobMs) / 1000}%.3fs ===")
      recs.foreach { r =>
        val d = if (r.finished > 0) (r.finished - r.submitted) else -1L
        println(f"  job ${r.id}%4d ${d}%6d ms  ${r.desc.take(90)}")
      }
      val as = acts.asScala.toSeq
      println(f"  actions=${as.size} actMs=${as.map(_.ms).sum}")
      as.foreach(a => println(f"  act ${a.ms}%6d ms  ${a.fn}%-18s ${a.node.take(60)}"))
    }
    spark.stop()
  }
}
