package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the
  * clustering step a dedup pipeline runs AFTER pair generation: near-dup
  * pairs form a graph; each component is one duplicate cluster; the
  * minimum id in a component is its canonical document.
  *
  * Algorithm: every vertex starts labeled with its own id; each round a
  * vertex adopts the minimum label among itself and its neighbors;
  * fixpoint in O(component diameter) rounds. Each round is two
  * distributed hash joins keyed on vertex id — no driver-side graph, no
  * per-vertex state beyond one long. Near-dup clusters are short chains
  * (diameter is small in practice), so the round count stays single-digit
  * even at corpus scale.
  *
  * Convergence is detected by the (strictly decreasing, bounded) sum of
  * labels; each round is localCheckpoint-ed so the plan does not grow
  * with iterations — on a cluster, use reliable checkpointing instead if
  * an executor loss must not restart the loop.
  */
object Graph {

  /** @param vertices one column: `id`
    * @param edges two columns: `src`, `dst` (undirected; either order)
    * @return `id`, `component` (= min id reachable from `id`)
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxIters: Int = 50): DataFrame = {
    // materialize the edge list ONCE: it re-enters the loop every round,
    // and an expensive upstream (e.g. the LSH pair pipeline) must not be
    // recomputed per iteration
    val undirected = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    def labelSum(df: DataFrame): BigDecimal =
      BigDecimal(df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0))
    // LAZY checkpoints: the convergence-sum action right below each
    // round materializes the checkpoint as part of its own job, so the
    // loop pays ONE job per round instead of two (eager-materialize +
    // sum); subsequent consumers (the next round's two joins) read the
    // materialized partitions either way
    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint(false)
    var prevSum = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val neighborMin = undirected
        .join(labels, col("dst") === col("id"))
        .groupBy(col("src"))
        .agg(min(col("component")).as("n_component"))
      labels = labels
        .join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("n_component"), col("component")))
            .as("component"))
        .localCheckpoint(false)
      val sumNow = labelSum(labels)
      converged = sumNow == prevSum
      prevSum = sumNow
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIters rounds")
    labels
  }
}
