package graft.pipelines

import org.apache.spark.sql.DataFrame

/** DLT-style declarative table graph (SURVEY §7.1): each table declares
  * its upstream dependencies and a builder over the resolved upstream
  * frames; [[TableGraph.run]] executes in topological order — the
  * stand-in for the reference's managed `@dlt.table` pipeline
  * (/root/reference/pipelines/bronze_pipeline.py:137-141) and its job
  * task DAG (/root/reference/jobs/batch_job.json:14-75).
  *
  * Materialization is the caller's choice: `run` returns the resolved
  * frames (lazy plans); `runMaterialized` caches exactly the tables
  * with more than one registered consumer, so diamond dependencies
  * don't recompute shared upstreams while single-consumer and sink
  * tables — whose plans inline into their one reader — never occupy
  * executor memory. At 100 TB caching every bronze/silver intermediate
  * would evict or spill; the graph's edges say which frames are
  * genuinely shared. Callers release with [[TableGraph.release]] (or
  * `unpersist()` — a no-op on the uncached frames) once done.
  */
final case class TableDef(name: String, deps: Seq[String])(
    val build: Map[String, DataFrame] => DataFrame)

final class TableGraph {
  private var defs = Vector.empty[TableDef]

  def register(t: TableDef): this.type = {
    require(!defs.exists(_.name == t.name), s"duplicate table ${t.name}")
    defs :+= t
    this
  }

  def tables: Seq[TableDef] = defs

  /** Dependency-respecting execution order (Kahn; deterministic by
    * registration order; cycles rejected). */
  def topologicalOrder: Seq[TableDef] = {
    val byName = defs.map(t => t.name -> t).toMap
    defs.foreach(t => t.deps.foreach(d =>
      require(byName.contains(d), s"${t.name} depends on unregistered $d")))
    val resolved = scala.collection.mutable.LinkedHashSet.empty[String]
    var remaining = defs
    while (remaining.nonEmpty) {
      val (ready, blocked) = remaining.partition(_.deps.forall(resolved.contains))
      require(ready.nonEmpty,
        s"dependency cycle among: ${remaining.map(_.name).mkString(", ")}")
      ready.foreach(t => resolved += t.name)
      remaining = blocked
    }
    resolved.toSeq.map(byName)
  }

  def run(): Map[String, DataFrame] =
    topologicalOrder.foldLeft(Map.empty[String, DataFrame]) { (acc, t) =>
      acc + (t.name -> t.build(acc))
    }

  /** Tables consumed by 2+ downstream builders — the only frames whose
    * caching pays for its memory. */
  def multiConsumerTables: Set[String] = {
    val counts = defs.flatMap(_.deps).groupBy(identity).view.mapValues(_.size)
    counts.filter(_._2 >= 2).keys.toSet
  }

  def runMaterialized(): Map[String, DataFrame] = {
    val shared = multiConsumerTables
    topologicalOrder.foldLeft(Map.empty[String, DataFrame]) { (acc, t) =>
      val df = t.build(acc)
      acc + (t.name -> (if (shared(t.name)) df.cache() else df))
    }
  }
}

object TableGraph {
  /** Unpersist whatever [[TableGraph.runMaterialized]] cached (no-op on
    * uncached frames). */
  def release(tables: Map[String, DataFrame]): Unit =
    tables.values.foreach(_.unpersist())
}
