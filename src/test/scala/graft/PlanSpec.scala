package graft

import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape regressions: the properties that make the queries scale are
  * asserted here, so a refactor that silently loses a pushed filter, a
  * broadcast, or a distributed top-k fails the build — not a 100 TB run. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter predicates reach the parquet scan (PushedFilters)") {
    val plan = planOf("q_filter_predicates")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(!plan.matches("(?s).*PushedFilters: \\[\\].*"),
      s"scan must push at least one filter:\n$plan")
  }

  test("dim-enrichment joins broadcast the small sides") {
    val plan = planOf("q_join_revenue_by_nation")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("star-schema rollup: bounded dims broadcast, SF-scaling sides shuffle") {
    // disable size-based auto-broadcast: what remains is the 100 TB plan.
    // Only the bounded dims (nation 25, region 5) carry an explicit
    // broadcast() hint; the fact-fact join AND the part/supplier joins
    // (20 B part rows at 100 TB) must plan as shuffle joins — a forced
    // broadcast there would OOM a real cluster no matter what AQE says.
    withAutoBroadcastOff {
      val plan = planOf("q_join_star_schema")
      assert("""\(\d+\) BroadcastHashJoin""".r.findAllIn(plan).size == 2, plan)
      assert("""\(\d+\) (SortMergeJoin|ShuffledHashJoin)""".r.findAllIn(plan).size == 3, plan)
    }
  }

  test("revenue-by-nation: customer join shuffles once hints are gone") {
    // same discipline for the J1/J3 chain: nation+region broadcast
    // (hinted, bounded cardinality); lineitem⋈orders and ⋈customer
    // (both SF-scaling) shuffle
    withAutoBroadcastOff {
      val plan = planOf("q_join_revenue_by_nation")
      assert("""\(\d+\) BroadcastHashJoin""".r.findAllIn(plan).size == 2, plan)
      assert("""\(\d+\) (SortMergeJoin|ShuffledHashJoin)""".r.findAllIn(plan).size == 2, plan)
    }
  }

  test("medallion dim enrichment carries no forced broadcast") {
    // per-entity metric frames scale with the user base: with
    // auto-broadcast off and no hint, the enrichment joins must shuffle
    withAutoBroadcastOff {
      val topics = pipelines.Fixtures.topics(spark)
      val silver = pipelines.Medallion.silverEater(
        pipelines.Medallion.bronze(topics("eater"), "eater"))
      val trips = pipelines.Medallion.silverTrips(
        pipelines.Medallion.bronze(topics("trip_events"), "trip_events"))
      val plan = pipelines.Medallion.dimEater(silver, trips)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("BroadcastHashJoin"),
        s"dim enrichment must not force a broadcast:\n$plan")
    }
  }

  private def withAutoBroadcastOff(body: => Unit): Unit = {
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("global top-n plans as distributed TakeOrderedAndProject") {
    assert(planOf("q_order_topn").contains("TakeOrderedAndProject"))
    // pair-ranking queries use the same shape: per-partition heaps, no
    // single-partition window over the full pair set
    assert(planOf("q_dedup_ngram_jaccard").contains("TakeOrderedAndProject"))
    assert(planOf("q_dedup_embedding_lsh").contains("TakeOrderedAndProject"))
  }

  test("aggregation pipeline stays inside whole-stage codegen") {
    // the codegen explainer can't see inside AdaptiveSparkPlan before
    // execution, so inspect the static plan
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("q_agg_pricing_summary")(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("codegen"))
      assert(plan.contains("Found 2 WholeStageCodegen subtrees"),
        s"scan→partial-agg and final-agg must each be one codegen stage:\n${plan.take(800)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("corpus curation shares the shingle stage via exchange reuse") {
    // the shingle arrays are referenced by the signature path and both
    // verification sides; the explicit materialization exchanges in
    // Dedup.nearDupPairs must be reused, not recomputed (final AQE plan)
    val df = SparkEntry.queries("q_corpus_curation")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("Reused".r.findAllIn(plan).nonEmpty,
      "expected at least one reused exchange/stage in the final plan")
  }

  test("partition-keyed join prunes fact partitions dynamically (DPP)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp-").toString
    Tables.orders(spark, sfDir).write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(dir)
    val fact = spark.read.parquet(dir)
    // the dim must be a real source with a surviving selective filter —
    // a LocalRelation dim gets its filter folded away and DPP skips it
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim-").toString
    Seq(("1-URGENT", "u"), ("5-LOW", "l")).toDF("o_orderpriority", "flag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim.where(org.apache.spark.sql.functions.col("flag") === "u"),
      Seq("o_orderpriority"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the fact scan:\n$plan")
  }

  test("selective dim filter injects a runtime bloom filter on the fact side") {
    // at 100 TB the bloom filter prunes fact rows BEFORE the join's
    // shuffle — size thresholds are lowered here so the optimizer
    // considers the test-scale tables
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // force a shuffle join: broadcast joins don't need the filter
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val lineitem = Tables.lineitem(spark, sfDir)
      val orders = Tables.orders(spark, sfDir)
        .where(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
        s"expected a runtime bloom filter on the fact side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("spread decides from scan metadata: no RDD probe, no fixture shuffle") {
    val target = spark.sparkContext.defaultParallelism
    val docs = Tables.documents(spark, sfDir)
    // a tiny fixture passes through untouched — SAME object, so the
    // payload exchange the old RDD probe added never enters the plan
    assert(Tables.spread(docs) eq docs)
    val narrow = docs.coalesce(1)
    assert(Tables.spread(narrow) eq narrow)
    // lower the size floor below the fixture's bytes: now it counts as
    // "large but narrow" (few huge files vs maxPartitionBytes) and gets
    // spread to cluster parallelism
    spark.conf.set("spark.graft.spread.minBytes", "1")
    try {
      assert(Tables.spread(narrow).rdd.getNumPartitions == target)
      // but a scan that already splits into >= parallelism tasks is
      // identity even above the floor (real corpus arrives wide)
      val saved = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
      try assert(Tables.spread(docs) eq docs)
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", saved)
    } finally spark.conf.unset("spark.graft.spread.minBytes")
    // and the conf kill-switch disables the crutch entirely
    spark.conf.set("spark.graft.spread", "never")
    try assert(Tables.spread(narrow) eq narrow)
    finally spark.conf.unset("spark.graft.spread")
  }

  test("stratified sample: both lang windows run on ONE exchange") {
    // rank and count windows share the partitioning; a second exchange
    // would double the (full-corpus) shuffle for nothing
    val plan = SparkEntry.queries("q_corpus_stratified")(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one hash exchange:\n$plan")
  }

  test("substring dedup hashes each span once (exchange reused by agg and join)") {
    // the (doc_id, h) projection is materialized on h; the duplicate-hash
    // aggregate and the span↔duplicate join must both read that one
    // exchange rather than re-scanning and re-hashing the corpus
    val df = SparkEntry.queries("q_dedup_substring")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("Reused".r.findAllIn(plan).nonEmpty,
      s"expected a reused exchange/stage in the final plan:\n$plan")
  }

  test("multimodal feature projection is UDF-free (stays in codegen)") {
    // the stub decode is md5 column arithmetic; a ScalaUDF here would
    // break whole-stage codegen in the scan-side projection
    val plan = SparkEntry.queries("q_multimodal_features")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"),
      s"q_multimodal_features must not evaluate a ScalaUDF:\n$plan")
  }

  test("chunking is a pure narrow pipeline (zero exchanges)") {
    // tokenize → explode starts → slice+hash: everything pipelines with
    // the scan; any Exchange here would shuffle full document text
    val plan = SparkEntry.queries("q_text_chunking")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("boilerplate detection shuffles hashes, not text") {
    // after the per-doc chunk hashing, every exchange key/payload is
    // (doc_id, chunk_hash [, counts]) — the text column must not survive
    // past the scan-side projection into any exchange
    val df = SparkEntry.queries("q_dedup_boilerplate")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val exchangeLines = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchangeLines.nonEmpty)
    exchangeLines.foreach(l =>
      assert(!l.contains("text"), s"exchange must not carry text: $l"))
  }

  test("boilerplate strip moves chunk text through exactly one exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // the strip decision runs on the narrow hash frame; document text
    // must cross the wire only in the per-doc rebuild aggregation — a
    // second text-bearing exchange (the r5 plan's freq join or a
    // re-shuffle before the flag join) is the 100 TB regression
    val df = SparkEntry.queries("q_dedup_boilerplate_strip")(spark, sfDir)
    df.collect() // finalize the adaptive plan
    def shuffles(p: SparkPlan): Seq[ShuffleExchangeExec] = p match {
      case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
      case q: QueryStageExec => shuffles(q.plan)
      case s: ShuffleExchangeExec => s +: s.children.flatMap(shuffles)
      case other =>
        other.children.flatMap(shuffles) ++
          other.subqueries.flatMap(shuffles)
    }
    // the fixture's round-robin spread exchanges are excluded: spread is
    // identity on production pre-partitioned input (own test above)
    val all = shuffles(df.queryExecution.executedPlan).distinct
      .filterNot(_.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])
    assert(all.nonEmpty, "expected at least one hash exchange")
    // chunk text crosses a shuffle only inside the rebuild aggregation's
    // partial collect_list buffer — so exactly one exchange may sit on a
    // node whose own expressions mention ctext (the r5 plan had two:
    // freq join + rebuild both shuffled the text-bearing frame)
    val textBearing = all.filter(_.child.simpleString(Int.MaxValue).contains("ctext"))
    assert(textBearing.size == 1,
      s"exactly one exchange may carry chunk text, found ${textBearing.size}:\n" +
        textBearing.map(_.child.simpleString(Int.MaxValue)).mkString("\n"))
    // and no hash exchange moves a raw string column (hashes are longs;
    // text travels only as the aggregation buffer above)
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType, StructType}
    def hasString(dt: DataType): Boolean = dt match {
      case _: StringType => true
      case s: StructType => s.fields.exists(f => hasString(f.dataType))
      case a: ArrayType => hasString(a.elementType)
      case m: MapType => hasString(m.keyType) || hasString(m.valueType)
      case _ => false
    }
    assert(all.forall(s => !s.child.output.exists(a => hasString(a.dataType))),
      "no hash exchange may carry a raw string column")
  }

  test("projection pruning reaches the scan (ReadSchema)") {
    // the pricing summary touches 7 of lineitem's 16 columns; the scan
    // must not read the rest
    val plan = planOf("q_agg_pricing_summary")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty, plan)
    assert(!readSchema.contains("l_comment"),
      s"unused columns must be pruned from the scan:\n$readSchema")
  }

  test("BM25 prunes posting lists by the query terms before scoring") {
    // the tiny query set must broadcast, and the plan must be free of
    // cartesian products — scoring touches the query terms' postings,
    // not all (doc, term) pairs
    val plan = planOf("q_text_bm25_topk")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"),
      s"BM25 must never go all-pairs:\n$plan")
  }

  test("semantic dedup: within-cell self-join, no cartesian, text never shuffles") {
    // the embedding self-join is keyed on cell_id (the quantizer bounds
    // candidates); an unkeyed cross join is the 100 TB catastrophe. The
    // broadcast nearest-cell assignment keeps the centroid cross join
    // (10 rows) — assert the candidate join itself is a keyed join.
    val df = SparkEntry.queries("q_dedup_semantic")(spark, sfDir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("""(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)""".r
      .findAllIn(plan).nonEmpty, plan)
    // the only allowed nested-loops are the bounded 10-centroid
    // broadcast, replicated once per consumer of the assignment subplan
    // (pairs a-side, b-side, and the keep/drop output) — an all-pairs
    // vector join would add a 4th (or a CartesianProduct) and fail here
    assert(!plan.contains("CartesianProduct"), plan)
    val nested = """\(\d+\) BroadcastNestedLoopJoin""".r.findAllIn(plan).size
    assert(nested <= 3, s"only the 10-centroid broadcast may nest:\n$plan")
  }
}
