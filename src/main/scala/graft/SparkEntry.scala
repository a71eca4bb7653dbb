package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All implemented operators are exported here: each module in
  * `graft.operators.*` / `graft.llm.*` exposes an `all: Seq[QueryDef]`;
  * this object flattens them into the `queries` / `oracleSql` maps the
  * driver consumes.
  */
object SparkEntry {

  /** Every registered query definition, in module order. */
  def defs: Seq[QueryDef] =
    operators.Aggregations.all ++
      operators.Joins.all ++
      operators.ScaleJoins.all ++
      operators.Windows.all ++
      operators.Generators.all ++
      operators.Cleanse.all ++
      operators.JsonOps.all ++
      operators.Scd2.all ++
      quality.Expectations.all ++
      quality.Validation.all ++
      quality.Profiling.all ++
      functions.Geo.all ++
      maintenance.Maintenance.all ++
      streaming.Streams.all ++
      streaming.StatefulTopK.all ++
      streaming.Sessions.all ++
      llm.TextAnalysis.all ++
      llm.Retrieval.all ++
      llm.Dedup.all ++
      llm.Bpe.all ++
      llm.Similarity.all ++
      llm.Multimodal.all ++
      llm.Sampling.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by region/nation — scan→broadcast-join chain→aggregate
    * (the dim-enrichment shape of the reference's gold layer). */
  def entry(spark: SparkSession): DataFrame =
    operators.Joins.qRevenueByNation.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.collect { case QueryDef(n, _, Some(o)) => n -> o }.toMap
}
