package graft

import java.nio.file.Files

import graft.sources.{IcebergPartition, IcebergTable}
import org.apache.spark.sql.functions._

/** Iceberg hidden partitioning ([[graft.sources.IcebergPartition]]):
  * spec-vector bucket hashing, literal≡column transform parity, the
  * partitioned write/read round trip, and manifest-tuple pruning. */
class IcebergPartitionSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-icepart-").toString + "/t"

  test("bucket hash matches the spec's published vectors (Appendix B)") {
    import IcebergPartition._
    // int and long hash identically (both as little-endian longs)
    assert(hashLong(34L) == 2017239379, s"long 34 -> ${hashLong(34L)}")
    assert(murmur3("iceberg".getBytes("UTF-8")) == 1210000089,
      s"'iceberg' -> ${murmur3("iceberg".getBytes("UTF-8"))}")
    val days = java.time.LocalDate.parse("2017-11-16").toEpochDay
    assert(hashLong(days) == -653330422, s"date 2017-11-16 -> ${hashLong(days)}")
    val micros = java.time.Instant.parse("2017-11-16T22:31:08Z")
      .getEpochSecond * 1000000L
    assert(hashLong(micros) == -2047944441, s"ts -> ${hashLong(micros)}")
    // bucket index: non-negative, stable
    assert(bucketOf(hashLong(34L), 16) == (2017239379 & Int.MaxValue) % 16)
  }

  test("transform columns agree with the literal path on every row") {
    val df = spark.range(-50, 50).select(
      col("id").cast("int").as("i"),
      (col("id") * 977L).as("l"),
      concat(lit("v"), col("id")).as("s"),
      timestamp_seconds(col("id") * 100000L).as("ts"))
      .withColumn("d", col("ts").cast("date"))
    val cases: Seq[(String, String)] = Seq(
      "i" -> "bucket[7]", "l" -> "bucket[5]", "s" -> "bucket[4]",
      "ts" -> "bucket[3]",
      "i" -> "truncate[10]", "l" -> "truncate[1000]", "s" -> "truncate[2]",
      "ts" -> "year", "ts" -> "month", "ts" -> "day", "ts" -> "hour",
      "d" -> "year", "d" -> "month", "d" -> "day",
      "i" -> "identity", "s" -> "identity")
    cases.foreach { case (src, tname) =>
      val t = IcebergPartition.parseTransform(tname)
      val srcType = df.schema(src).dataType
      val rows = df.select(col(src),
        IcebergPartition.column(t, col(src), srcType).as("p")).collect()
      rows.foreach { r =>
        val expect = IcebergPartition.applyLiteral(t, r.get(0), srcType)
        assert(r.get(1) == expect,
          s"$src $tname: value ${r.get(0)} column=${r.get(1)} literal=$expect")
      }
    }
  }

  test("truncate floors negatives per spec") {
    assert(IcebergPartition.applyLiteral(
      IcebergPartition.Truncate(10), -1, org.apache.spark.sql.types.IntegerType) == -10)
    assert(IcebergPartition.applyLiteral(
      IcebergPartition.Truncate(3), "abcde", org.apache.spark.sql.types.StringType) == "abc")
  }

  test("partitioned write/read round trip; appends adopt the spec") {
    val t = fresh()
    val ev = Tables.events(spark, sfDir)
    val (h1, h2) = (ev.where(col("event_id") % 2 === 0),
      ev.where(col("event_id") % 2 =!= 0))
    IcebergTable.writeAppend(spark, h1, t,
      partition = Seq("user_id" -> "bucket[4]", "ts" -> "day"))
    // second append declares nothing — it must ADOPT the table's spec
    IcebergTable.writeAppend(spark, h2, t)
    val st = IcebergTable.state(spark, t)
    assert(st.specFields.map(f => f.source -> f.transform.name) ==
      Seq("user_id" -> "bucket[4]", "ts" -> "day"))
    assert(st.partitionTuples.size == st.dataFiles.size)
    assert(st.partitionTuples.forall(_.isDefined),
      "every data file must carry its manifest partition tuple")
    val back = IcebergTable.read(spark, t)
    assert(back.count() == ev.count())
    val (a, b) = (
      back.agg(sum("event_id"), sum(col("value").cast("decimal(38,10)"))).head(),
      ev.agg(sum("event_id"), sum(col("value").cast("decimal(38,10)"))).head())
    assert(a == b, s"$a vs $b")
  }

  test("partition evolution: new spec-id, per-spec pruning, optimize repartitions") {
    val t = fresh()
    val ev = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val (h1, h2) = (ev.where(col("event_id") % 2 === 0),
      ev.where(col("event_id") % 2 =!= 0))
    IcebergTable.writeAppend(spark, h1, t,
      partition = Seq("user_id" -> "bucket[4]"))
    // a DIFFERENT spec evolves the table instead of refusing
    IcebergTable.writeAppend(spark, h2, t, partition = Seq("ts" -> "day"))
    val st = IcebergTable.state(spark, t)
    assert(st.defaultSpecId == 1)
    assert(st.allSpecs.keySet == Set(0, 1))
    assert(st.fileSpecIds.toSet == Set(0, 1),
      "old files keep spec 0, new files carry spec 1")
    assert(IcebergTable.read(spark, t).count() == ev.count())

    // pruning engages under EACH file's own spec
    val keyPred = col("user_id") === 7L
    val pk = IcebergTable.pruneState(spark, st, keyPred)
    val oldFiles = st.fileSpecIds.count(_ == 0)
    val keptOld = pk.fileSpecIds.count(_ == 0)
    assert(keptOld < oldFiles, "bucket pruning must engage on spec-0 files")
    assert(pk.fileSpecIds.count(_ == 1) == st.fileSpecIds.count(_ == 1),
      "spec-1 files have no user_id field and must all survive")
    import spark.implicits._
    val got = IcebergTable.readPruned(spark, t, keyPred)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    val want = ev.where(keyPred)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    assert(got == want)

    // rewrite_data_files re-lays old-spec files under the new default
    val (rw, _) = IcebergTable.rewriteDataFiles(spark, t, smallerThan = 0L)
    assert(rw >= oldFiles, s"expected the $oldFiles spec-0 files rewritten, got $rw")
    val after = IcebergTable.state(spark, t)
    assert(after.fileSpecIds.forall(_ == after.defaultSpecId))
    assert(after.partitionTuples.forall(_.isDefined))
    val got2 = IcebergTable.read(spark, t)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    assert(got2 == ev.orderBy("event_id").select("event_id").as[Long].collect().toSeq)
  }

  test("manifest tuples prune data files; readPruned stays exact") {
    val t = fresh()
    val ev = Tables.events(spark, sfDir)
    IcebergTable.writeAppend(spark, ev, t,
      partition = Seq("user_id" -> "bucket[4]", "ts" -> "day"))
    val st = IcebergTable.state(spark, t)
    assert(st.dataFiles.size > 4, s"fixture too narrow: ${st.dataFiles.size}")

    // bucket equality prunes to ~1/4 of the files
    val keyPred = col("user_id") === 7L
    val pk = IcebergTable.pruneState(spark, st, keyPred)
    assert(pk.dataFiles.size < st.dataFiles.size,
      s"bucket pruning kept everything (${st.dataFiles.size})")
    assert(IcebergTable.readPruned(spark, t, keyPred).count() ==
      IcebergTable.read(spark, t).where(keyPred).count())

    // day range prunes and the residual filter keeps exactness
    val lo = ev.agg(min("ts")).head().getTimestamp(0).toInstant
    val cut = java.sql.Timestamp.from(lo.plusSeconds(3 * 86400))
    val tsPred = col("ts") >= lit(cut)
    val pt = IcebergTable.pruneState(spark, st, tsPred)
    assert(pt.dataFiles.size < st.dataFiles.size,
      s"day pruning kept everything (${st.dataFiles.size})")
    val got = IcebergTable.readPruned(spark, t, tsPred)
      .agg(count(lit(1)), sum("event_id")).head()
    val want = IcebergTable.read(spark, t).where(tsPred)
      .agg(count(lit(1)), sum("event_id")).head()
    assert(got == want, s"$got vs $want")

    // conjunction prunes along BOTH fields
    val both = IcebergTable.pruneState(spark, st, keyPred && tsPred)
    assert(both.dataFiles.size <= math.min(pk.dataFiles.size, pt.dataFiles.size))

    // an unhandled predicate shape never prunes (kept conservative)
    val odd = IcebergTable.pruneState(spark, st, col("user_id") % 2 === 1)
    assert(odd.dataFiles.size == st.dataFiles.size)
  }

  test("metadata tables: snapshots, history, manifests, files (API + SQL)") {
    val t = fresh()
    val ev = Tables.events(spark, sfDir).limit(500)
    IcebergTable.writeAppend(spark, ev.where(col("event_id") % 2 === 0), t,
      partition = Seq("user_id" -> "bucket[4]"))
    IcebergTable.writeAppend(spark, ev.where(col("event_id") % 2 =!= 0), t)

    val snaps = IcebergTable.metadataTable(spark, t, "snapshots")
    assert(snaps.count() == 2)
    assert(snaps.columns.toSeq == Seq("committed_at", "snapshot_id",
      "parent_id", "operation", "manifest_list"))
    val hist = IcebergTable.metadataTable(spark, t, "history")
    assert(hist.count() == 2)
    assert(hist.where(col("is_current_ancestor")).count() >= 1)
    val mans = IcebergTable.metadataTable(spark, t, "manifests")
    assert(mans.count() == 2) // second snapshot: carried + new manifest
    val files = IcebergTable.metadataTable(spark, t, "files")
    val st = IcebergTable.state(spark, t)
    assert(files.where(col("content") === 0).count() == st.dataFiles.size)
    assert(files.agg(sum("record_count")).head().getLong(0) == st.recordCount)
    // partition tuple surfaces per file
    assert(files.where(col("content") === 0)
      .where(element_at(col("partition"), "user_id_bucket").isNull).count() == 0)

    // the SQL surface resolves suffixed refs, metadata and data in one query
    val viaSql = graft.sources.GraftSql.exec(spark,
      s"SELECT count(*) AS n FROM iceberg.`$t`.snapshots").head().getLong(0)
    assert(viaSql == 2)
    val joined = graft.sources.GraftSql.exec(spark,
      s"""SELECT (SELECT count(*) FROM iceberg.`$t`.files) AS nf,
         |       (SELECT count(*) FROM iceberg.`$t`) AS nr""".stripMargin).head()
    assert(joined.getLong(0) == st.dataFiles.size && joined.getLong(1) == 500)
  }

  test("rewriteDataFiles: bin-pack + delete purge; clean big files carried") {
    val t = fresh()
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type").orderBy("event_id").limit(600)
    // one BIG clean file, then a stream of small appends
    IcebergTable.writeAppend(spark, ev.where(col("event_id") < 400).coalesce(1), t)
    (0 until 4).foreach { i =>
      IcebergTable.writeAppend(spark,
        ev.where(col("event_id") >= 400 + i * 50 &&
          col("event_id") < 450 + i * 50).coalesce(1), t, carryPrevious = true)
    }
    // merge-on-read deletes pinned INSIDE the small tail
    IcebergTable.deleteWhere(spark, t,
      col("event_id") >= 400 && col("event_id") % 7 === 0)
    import spark.implicits._
    IcebergTable.deleteEquals(spark, t, Seq("purgeme").toDF("event_type"))

    val before = IcebergTable.state(spark, t)
    val bigSize = before.fileSizes.max
    val want = IcebergTable.read(spark, t)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq

    // equality deletes scope EVERY lower-sequence file, so the big file
    // rewrites too unless... here there are eq deletes: expect carried=0;
    // re-run with only the big file clean of deletes is covered below
    val (rw1, _) = IcebergTable.rewriteDataFiles(spark, t, smallerThan = bigSize)
    assert(rw1 > 0)
    val after = IcebergTable.state(spark, t)
    assert(!after.hasDeletes, "rewrite must purge all delete manifests")
    assert(after.dataFiles.size < before.dataFiles.size,
      s"${before.dataFiles.size} -> ${after.dataFiles.size}")
    val got = IcebergTable.read(spark, t)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    assert(got == want)
    // metadata-only count is back
    assert(IcebergTable.countRows(spark, t) == want.size.toLong)

    // second pass on the now-clean table: the biggest file(s) carry
    // with their BYTES untouched (length + mtime pinned)
    val beforeSizes = IcebergTable.state(spark, t)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stats(paths: Seq[String]) = paths.map { p =>
      val s = fs.getFileStatus(new org.apache.hadoop.fs.Path(p))
      p -> (s.getLen, s.getModificationTime)
    }.toMap
    val maxSz = beforeSizes.fileSizes.max
    val bigPaths = beforeSizes.dataFiles.zip(beforeSizes.fileSizes)
      .filter(_._2 == maxSz).map(_._1)
    val pinned = stats(bigPaths)
    val (rw2, carried2) = IcebergTable.rewriteDataFiles(spark, t,
      smallerThan = maxSz)
    assert(carried2 >= 1, s"expected a carried file, got rw=$rw2 carried=$carried2")
    assert(stats(bigPaths) == pinned, "carried files must not be rewritten")
    val got2 = IcebergTable.read(spark, t)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    assert(got2 == want)

    // SQL verb
    val sqlRes = graft.sources.GraftSql.exec(spark, s"OPTIMIZE iceberg.`$t`")
    assert(sqlRes.columns.toSeq ==
      Seq("rewritten_data_files_count", "carried_data_files_count"))
  }

  test("rewriteDataFiles keeps partition tuples prunable") {
    val t = fresh()
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type")
    IcebergTable.writeAppend(spark, ev, t,
      partition = Seq("user_id" -> "bucket[4]"))
    IcebergTable.deleteWhere(spark, t, col("event_id") % 3 === 0)
    val (rw, _) = IcebergTable.rewriteDataFiles(spark, t, smallerThan = Long.MaxValue)
    assert(rw > 0)
    val st = IcebergTable.state(spark, t)
    assert(!st.hasDeletes)
    assert(st.partitionTuples.forall(_.isDefined),
      "rewritten files must re-carry partition tuples")
    val pred = col("user_id") === 7L
    val pruned = IcebergTable.pruneState(spark, st, pred)
    assert(pruned.dataFiles.size < st.dataFiles.size)
    import spark.implicits._
    val got = IcebergTable.readPruned(spark, t, pred)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    val wantRows = ev.where(pred && col("event_id") % 3 =!= 0)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    assert(got == wantRows)
  }

  test("SQL: CREATE TABLE iceberg PARTITIONED BY (transforms) + INSERT INTO") {
    val t = fresh()
    import graft.sources.GraftSql
    GraftSql.exec(spark,
      s"CREATE TABLE iceberg.`$t` (event_id BIGINT, user_id BIGINT, ts TIMESTAMP) " +
        "PARTITIONED BY (bucket(4, user_id), days(ts))")
    val st0 = IcebergTable.state(spark, t)
    assert(st0.specFields.map(f => f.source -> f.transform.name) ==
      Seq("user_id" -> "bucket[4]", "ts" -> "day"))
    assert(IcebergTable.read(spark, t).count() == 0)

    Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
      .createOrReplaceTempView("graft_icesql_src")
    GraftSql.exec(spark,
      s"INSERT INTO iceberg.`$t` SELECT event_id, user_id, ts FROM graft_icesql_src")
    val n = spark.table("graft_icesql_src").count()
    assert(IcebergTable.read(spark, t).count() == n)
    // the insert adopted the declared spec: tuples present, pruning live
    val st = IcebergTable.state(spark, t)
    assert(st.partitionTuples.nonEmpty && st.partitionTuples.forall(_.isDefined))
    val pk = IcebergTable.pruneState(spark, st, col("user_id") === 7L)
    assert(pk.dataFiles.size < st.dataFiles.size)
  }

  test("column bounds skip files on UNPARTITIONED tables (Iceberg zone maps)") {
    val t = fresh()
    // four appends with disjoint id ranges → tight per-file min/max
    (0 until 4).foreach { b =>
      val part = spark.range(b * 1000, (b + 1) * 1000).select(
        col("id"),
        concat(lit(f"s$b%02d-"), col("id")).as("s"),
        timestamp_seconds(col("id") * 1000L).as("ts"),
        (col("id") % 97 * 1.5).as("d"))
      IcebergTable.writeAppend(spark, part.coalesce(1), t)
    }
    val st = IcebergTable.state(spark, t)
    assert(st.dataFiles.size == 4)
    assert(st.lowerBounds.forall(_.nonEmpty) && st.upperBounds.forall(_.nonEmpty),
      "every file must carry written bounds")

    // long range: only one file overlaps id < 500
    val p1 = IcebergTable.pruneState(spark, st, col("id") < 500L)
    assert(p1.dataFiles.size == 1, s"id<500 kept ${p1.dataFiles.size}")
    // long equality: one file
    val p2 = IcebergTable.pruneState(spark, st, col("id") === 2500L)
    assert(p2.dataFiles.size == 1)
    // string equality: per-file prefixes make one file eligible
    val p3 = IcebergTable.pruneState(spark, st, col("s") === "s02-2100")
    assert(p3.dataFiles.size == 1, s"string bound kept ${p3.dataFiles.size}")
    // timestamp range: files 2..3
    val cut = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(2000 * 1000L))
    val p4 = IcebergTable.pruneState(spark, st, col("ts") >= lit(cut))
    assert(p4.dataFiles.size == 2, s"ts bound kept ${p4.dataFiles.size}")
    // IN list across two ranges
    val p5 = IcebergTable.pruneState(spark, st, col("id").isin(10L, 3010L))
    assert(p5.dataFiles.size == 2)

    // exactness: pruned read ≡ full filter
    import spark.implicits._
    val got = IcebergTable.readPruned(spark, t, col("id") < 500L)
      .orderBy("id").select("id").as[Long].collect().toSeq
    assert(got == (0L until 500L))
    // bounds survive a REAL rewrite commit: a tiny 5th file forces the
    // REPLACE snapshot, the four big ones carry with bounds intact
    IcebergTable.writeAppend(spark,
      spark.range(4000, 4010).select(col("id"),
        concat(lit("s04-"), col("id")).as("s"),
        timestamp_seconds(col("id") * 1000L).as("ts"),
        (col("id") % 97 * 1.5).as("d")).coalesce(1), t)
    val stBig = IcebergTable.state(spark, t)
    val (rw, carried) = IcebergTable.rewriteDataFiles(spark, t,
      smallerThan = stBig.fileSizes.max)
    assert(rw >= 1 && carried >= 1, s"rw=$rw carried=$carried")
    val st2 = IcebergTable.state(spark, t)
    assert(st2.lowerBounds.forall(_.nonEmpty) && st2.upperBounds.forall(_.nonEmpty),
      "every file (carried AND rewritten) must keep bounds")
    val p6 = IcebergTable.pruneState(spark, st2, col("id") < 500L)
    assert(p6.dataFiles.size == 1, s"post-rewrite bounds kept ${p6.dataFiles.size}")
  }

  test("null counts prune IS [NOT] NULL and all-null files") {
    val t = fresh()
    // file A: s never null; file B: s always null; file C: mixed
    val a = spark.range(0, 100).select(col("id"), concat(lit("v"), col("id")).as("s"))
    val b = spark.range(100, 200).select(col("id"), lit(null).cast("string").as("s"))
    val c = spark.range(200, 300).select(col("id"),
      when(col("id") % 2 === 0, concat(lit("v"), col("id"))).as("s"))
    Seq(a, b, c).foreach(df =>
      IcebergTable.writeAppend(spark, df.coalesce(1), t))
    val st = IcebergTable.state(spark, t)
    assert(st.dataFiles.size == 3)
    assert(st.nullCounts.forall(_.nonEmpty))

    val pNull = IcebergTable.pruneState(spark, st, col("s").isNull)
    assert(pNull.dataFiles.size == 2, s"IS NULL kept ${pNull.dataFiles.size}") // B + C
    val pNotNull = IcebergTable.pruneState(spark, st, col("s").isNotNull)
    assert(pNotNull.dataFiles.size == 2, s"IS NOT NULL kept ${pNotNull.dataFiles.size}") // A + C
    // a value atom can never match the all-null file
    val pEq = IcebergTable.pruneState(spark, st, col("s") === "v50")
    assert(pEq.dataFiles.size == 1, s"eq kept ${pEq.dataFiles.size}") // A only (bounds cut C)
    import spark.implicits._
    val got = IcebergTable.readPruned(spark, t, col("s").isNull)
      .orderBy("id").select("id").as[Long].collect().toSeq
    val want = (100L until 200L) ++ (200L until 300L).filter(_ % 2 == 1)
    assert(got == want)
  }

  test("pruned reads compose with merge-on-read deletes") {
    val t = fresh()
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts")
    IcebergTable.writeAppend(spark, ev, t,
      partition = Seq("user_id" -> "bucket[4]"))
    IcebergTable.deleteWhere(spark, t, col("event_id") % 5 === 0)
    val pred = col("user_id") === 7L
    val got = IcebergTable.readPruned(spark, t, pred)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    val want = ev.where(pred && col("event_id") % 5 =!= 0)
      .orderBy("event_id").select("event_id").as[Long].collect().toSeq
    assert(got == want)
  }
}
