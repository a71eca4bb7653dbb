package graft

/** Dev tool: run one query in a loop (noop sink) so an external sampler
  * (`jstack` / `jcmd Thread.print`) can attribute driver-side time.
  * Usage: runMain graft.ProfileLoop <sfDir> <queryName> [iters]
  */
object ProfileLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val iters = args.drop(2).headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    // ad-hoc conf overrides for A/B runs: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    val fn = SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    println(s"PROFILE_LOOP_READY pid=${ProcessHandle.current().pid()}")
    val t0 = System.nanoTime()
    (1 to iters).foreach { _ =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    println(f"PROFILE_LOOP_DONE avg=${(System.nanoTime() - t0) / 1e9 / iters}%.3fs")
    spark.stop()
  }
}
