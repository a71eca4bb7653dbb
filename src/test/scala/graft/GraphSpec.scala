package graft

import graft.operators.Graph

/** Min-label propagation must find transitive components (the case
  * pairwise dedup misses) and handle chains whose diameter forces
  * several propagation rounds. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("chains collapse to one component, islands stay separate") {
    val vertices = (1L to 8L).toDF("id")
    // 1-2-3-4 is a chain (diameter 3); 5-6 a pair; 7, 8 singletons
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
  }

  test("a long path converges (many rounds, label flows from the far end)") {
    val n = 12L
    val vertices = (1L to n).toDF("id")
    // path n - (n-1) - ... - 1: min label 1 must traverse the whole path
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Graph.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L))
  }

  test("edge direction does not matter") {
    val vertices = (1L to 3L).toDF("id")
    val forward = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val backward = Seq((2L, 1L), (3L, 2L)).toDF("src", "dst")
    val a = Graph.connectedComponents(vertices, forward).as[(Long, Long)].collect().toMap
    val b = Graph.connectedComponents(vertices, backward).as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
