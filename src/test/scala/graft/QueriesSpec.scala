package graft

/** Every registered QueryDef must build and execute at sf0.001, and every
  * oracle-verified query must declare matching column names (the driver's
  * compare hashes by sorted column name). */
class QueriesSpec extends SparkSpec {

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries and oracleSql keys line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert(SparkEntry.defs.map(_.name).distinct.size == SparkEntry.defs.size,
      "duplicate query names")
  }

  SparkEntry.defs.foreach { d =>
    test(s"${d.name} executes at sf0.001") {
      val df = d.build(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
