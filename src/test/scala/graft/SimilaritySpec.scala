package graft

import org.apache.spark.sql.functions._

/** Structural and recall properties of the similarity-search queries:
  * cosines are valid, rankings are correctly ordered, and single-probe
  * IVF retrieves a useful fraction of the exact top-k. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def topkRows =
    SparkEntry.queries("q_sim_cosine_topk")(spark, sfDir)
      .select(col("query_id"), col("cand_id"), col("cosine"), col("rnk"))
      .as[(Long, Long, Double, Int)].collect()

  test("cosines are in [-1, 1] and ranks ordered by descending cosine") {
    val rows = topkRows
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, c, _) => assert(c >= -1.0001 && c <= 1.0001) }
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"cosine not descending in rank order: ${byRank.toSeq}")
    }
  }

  test("IVF hits stay inside the query's probe cell and rank correctly") {
    val ivf = SparkEntry.queries("q_sim_ivf_ann")(spark, sfDir)
      .select(col("query_id"), col("cell_id"), col("cand_id"), col("cosine"), col("rnk"))
      .as[(Long, Long, Long, Double, Int)].collect()
    assert(ivf.nonEmpty)
    // one probe cell per query
    ivf.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._2).distinct.length == 1)
      val byRank = g.sortBy(_._5).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  private def recallOf(queryName: String): Double = {
    val exact = topkRows.filter { case (q, _, _, rnk) => q < 5 && rnk <= 3 }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = SparkEntry.queries(queryName)(spark, sfDir)
      .select(col("query_id"), col("cand_id"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      got.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    recalls.sum / recalls.size
  }

  test("single-probe IVF recalls a useful fraction of the exact top-3") {
    val mean = recallOf("q_sim_ivf_ann")
    info(f"mean IVF recall@3 = $mean%.2f")
    assert(mean >= 0.2, f"single-probe recall collapsed: $mean%.2f")
  }

  test("a second probe does not lose recall (and should gain it)") {
    val one = recallOf("q_sim_ivf_ann")
    val two = recallOf("q_sim_ivf_multiprobe")
    info(f"recall@3: nprobe=1 -> $one%.2f, nprobe=2 -> $two%.2f")
    assert(two >= one, f"multi-probe recall $two%.2f below single-probe $one%.2f")
  }
}
