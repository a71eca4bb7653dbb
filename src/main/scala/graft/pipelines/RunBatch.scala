package graft.pipelines

import graft.GraftSession
import graft.maintenance.Maintenance
import org.apache.spark.sql.functions._

/** The scheduled batch job (ST7) — the reference's 3-task DAG
  * (/root/reference/jobs/batch_job.json:14-75: gold build → optimize →
  * validate) as one offline-runnable main:
  *
  *   1. build every gold table through the dependency graph and write
  *      them (fact partitioned by trip_status — the engine's stand-in
  *      for the reference's date/region partitions at fixture scale);
  *   2. compact + cluster + collect statistics on the written outputs;
  *   3. validate: SCD2 currency invariants, referential integrity of the
  *      fact's location key, and golden row counts, emitted as one JSON
  *      line; exit 1 if any check fails.
  *
  * Usage: runMain graft.pipelines.RunBatch [outDir]
  */
object RunBatch {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-gold-").toString)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)

    // task 1: gold build (topological, each table cached once)
    val tables = Medallion.graph(spark).runMaterialized()
    val dims = Seq("dim_location", "dim_eater", "dim_merchant", "dim_courier")
    dims.foreach(t => Maintenance.optimizedWrite(tables(t), s"$out/$t"))
    Maintenance.optimizedWrite(tables("trip_fact"), s"$out/trip_fact",
      partitionBy = Seq("trip_status"))

    // task 2: maintenance on what task 1 wrote
    dims.foreach(t => Maintenance.compact(spark, s"$out/$t", numFiles = 1))
    Maintenance.cluster(spark, s"$out/trip_fact", numFiles = 1, cols = Seq("trip_id"))
    spark.read.parquet(s"$out/trip_fact").createOrReplaceTempView("gold_trip_fact")
    spark.sql("CACHE TABLE gold_trip_fact") // materialize for ANALYZE parity

    // task 3: validation over the WRITTEN outputs (not the in-memory frames)
    def read(t: String) = spark.read.parquet(s"$out/$t")
    val fact = read("trip_fact")
    val dimLoc = read("dim_location")
    val checks: Seq[(String, Long, Long)] = Seq(
      ("fact_rows", fact.count(), 3L),
      ("fact_orphan_locations", fact.where(col("pickup_location_key").isNotNull)
        .join(dimLoc, fact("pickup_location_key") === dimLoc("location_key"),
          "left_anti").count(), 0L)) ++
      dims.map { t =>
        val df = read(t)
        if (df.columns.contains("is_current"))
          (s"${t}_current_per_key", df.where(col("is_current"))
            .groupBy(df.columns.head).count().where(col("count") =!= 1).count(), 0L)
        else (s"${t}_nonempty", if (df.count() > 0) 0L else 1L, 0L)
      }
    val failed = checks.filterNot { case (_, observed, expected) => observed == expected }
    val js = checks.map { case (n, o, e) =>
      s""""$n":{"observed":$o,"expected":$e,"passed":${o == e}}"""
    }.mkString("{", ",", "}")
    println(s"""BATCH {"status":"${if (failed.isEmpty) "PASS" else "FAIL"}","out":"$out","checks":$js}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
