package graft

import graft.functions.{ExactVariance, GeohashEncode, ZOrderKey}
import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.functions._

/** The engine must be drivable from PURE SQL — the reference's users
  * live in SQL notebooks: tables as views, native functions registered,
  * and the results identical to the DataFrame API path. */
class SqlSurfaceSpec extends SparkSpec {

  test("a star-schema aggregate written in SQL equals the DataFrame query") {
    Tables.registerAll(spark, sfDir)
    val sqlRes = spark.sql(
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  count(*) AS n_lineitems,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,10))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey  = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin)
    val dfRes = SparkEntry.queries("q_join_revenue_by_nation")(spark, sfDir)
    assert(sqlRes.exceptAll(dfRes).count() == 0 && dfRes.exceptAll(sqlRes).count() == 0)
  }

  test("native custom functions are callable from SQL") {
    Tables.registerAll(spark, sfDir)
    GeohashEncode.register(spark)
    ZOrderKey.register(spark)
    ExactVariance.register(spark)
    val row = spark.sql(
      """SELECT geohash_encode(48.8566, 2.3522, 8) AS gh,
        |  zorder_key(3, 5) AS zk""".stripMargin).head()
    assert(row.getString(0).nonEmpty && row.getString(0).length == 8)
    // interleave(3=0b11, 5=0b101): a bits at odd positions, b at even
    assert(row.getLong(1) == ZOrderKey.interleave(3L, 5L))
    val v = spark.sql(
      """SELECT exact_var_pop_q(CAST(round(value * 1e6) AS BIGINT)) / 1e12 AS v
        |FROM events""".stripMargin).head().getDouble(0)
    assert(v > 0)
  }

  test("a silver-cleanse + window pipeline runs end-to-end in SQL") {
    Tables.registerAll(spark, sfDir)
    val out = spark.sql(
      """WITH cleansed AS (
        |  SELECT c_custkey, trim(lower(c_name)) AS name,
        |    regexp_replace(c_mktsegment, '[^A-Za-z]', '') AS segment,
        |    c_acctbal
        |  FROM customer WHERE c_acctbal IS NOT NULL
        |)
        |SELECT c_custkey, name, segment,
        |  rank() OVER (ORDER BY c_acctbal DESC) AS bal_rank
        |FROM cleansed
        |ORDER BY bal_rank LIMIT 10""".stripMargin).collect()
    assert(out.length == 10 && out.head.getInt(3) == 1)
  }

  test("SQL over Delta-protocol tables, including time travel") {
    import graft.sources.DeltaLog
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-sqldelta-").toString + "/t"
    DeltaLog.write(spark, Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("id", "tag", "ts"), t)
    DeltaLog.mergeUpsert(spark, t,
      Seq((2L, "b2", 1L), (3L, "c", 1L)).toDF("id", "tag", "ts"), Seq("id"), "ts")
    DeltaLog.read(spark, t).createOrReplaceTempView("dl_now")
    DeltaLog.read(spark, t, Some(0L)).createOrReplaceTempView("dl_v0")
    assert(spark.sql("SELECT count(*) FROM dl_now").head().getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM dl_v0").head().getLong(0) == 2L)
    assert(spark.sql(
      "SELECT tag FROM dl_now WHERE id = 2").head().getString(0) == "b2")
  }

  test("SHOW TBLPROPERTIES lists configuration; the keyed form answers one") {
    import graft.sources.{DeltaLog, GraftSql}
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-sqlprops-").toString + "/t"
    DeltaLog.write(spark, Seq(1L).toDF("x").coalesce(1), t,
      properties = Map("delta.appendOnly" -> "true", "team.owner" -> "graft"))
    val all = GraftSql.exec(spark, s"SHOW TBLPROPERTIES delta.`$t`")
      .as[(String, String)].collect().toMap
    assert(all("delta.appendOnly") == "true" && all("team.owner") == "graft")
    val one = GraftSql.exec(spark,
      s"SHOW TBLPROPERTIES delta.`$t` ('team.owner')").head()
    assert(one.getString(0) == "team.owner" && one.getString(1) == "graft")
    val missing = GraftSql.exec(spark,
      s"SHOW TBLPROPERTIES delta.`$t` ('no.such.key')").head()
    assert(missing.getString(1).contains("does not have property"))
  }

  test("statement surface: SELECT/DELETE/UPDATE/RESTORE/OPTIMIZE/VACUUM/HISTORY") {
    import graft.sources.{DeltaLog, GraftSql}
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft-sqlstmt-").toString + "/t"
    DeltaLog.write(spark,
      spark.range(100).selectExpr("id AS x", "CAST(id % 5 AS STRING) AS g")
        .repartition(2), t)

    // SELECT with a delta.`path` reference, plain and time-traveled
    def q(sql: String) = GraftSql.exec(spark, sql)
    assert(q(s"SELECT count(*) AS n FROM delta.`$t`").head().getLong(0) == 100L)

    // DELETE via deletion vectors
    assert(q(s"DELETE FROM delta.`$t` WHERE x % 10 = 3").head().getLong(0) == 1L)
    assert(q(s"SELECT count(*) AS n FROM delta.`$t`").head().getLong(0) == 90L)
    assert(DeltaLog.snapshot(spark, t).fileEntries.exists(_.dv.isDefined))

    // UPDATE, multi-assignment with a function call containing commas
    q(s"UPDATE delta.`$t` SET g = concat(g, '!'), x = x + 1000 WHERE x = 50")
    val r = q(s"SELECT g, x FROM delta.`$t` WHERE x = 1050").head()
    assert(r.getString(0) == "0!" && r.getLong(1) == 1050L)

    // time travel sees the pre-DELETE state
    assert(q(s"SELECT count(*) AS n FROM delta.`$t` VERSION AS OF 0")
      .head().getLong(0) == 100L)
    // TIMESTAMP AS OF far in the future resolves to the newest version
    assert(q(s"SELECT count(*) AS n FROM delta.`$t` TIMESTAMP AS OF '2100-01-01'")
      .head().getLong(0) == 90L)

    // DESCRIBE DETAIL: one row, distributed file aggregate
    val d = q(s"DESCRIBE DETAIL delta.`$t`").head()
    assert(d.getAs[String]("format") == "delta" &&
      d.getAs[Long]("numFiles") > 0L && d.getAs[Long]("sizeInBytes") > 0L)

    // SHOW CREATE TABLE reconstructs the declaration
    val ddl = q(s"SHOW CREATE TABLE delta.`$t`").head().getString(0)
    assert(ddl.startsWith(s"CREATE TABLE delta.`$t`"), ddl)
    assert(ddl.contains("USING delta"), ddl)

    // OPTIMIZE purges the DVs; HISTORY lists every operation
    q(s"OPTIMIZE delta.`$t`")
    assert(DeltaLog.snapshot(spark, t).fileEntries.forall(_.dv.isEmpty))
    val ops = q(s"DESCRIBE HISTORY delta.`$t`")
      .select("operation").as[String].collect().toSet
    assert(Set("OVERWRITE", "DELETE", "UPDATE", "OPTIMIZE").subsetOf(ops), ops.toString)

    // RESTORE to the pre-UPDATE version (x=50 back, DELETE still applied)
    q(s"RESTORE TABLE delta.`$t` TO VERSION AS OF 1")
    assert(q(s"SELECT count(*) AS n FROM delta.`$t` WHERE x = 50")
      .head().getLong(0) == 1L)
    assert(q(s"SELECT count(*) AS n FROM delta.`$t`").head().getLong(0) == 90L)

    // VACUUM with an explicit retention window reclaims nothing young…
    assert(q(s"VACUUM delta.`$t` RETAIN 168 HOURS").head().getLong(0) == 0L)
    // …DRY RUN counts the reclaimable files without deleting anything…
    val reclaimable = q(s"VACUUM delta.`$t` RETAIN 0 HOURS DRY RUN").head().getLong(0)
    assert(reclaimable > 0L)
    // a real scan (WHERE defeats the metadata fast path) proves the
    // version-0 files are still on disk
    assert(q(s"SELECT count(*) AS n FROM delta.`$t` VERSION AS OF 0 WHERE x >= 0")
      .head().getLong(0) == 100L, "dry run must not delete")
    // …and RETAIN 0 HOURS reclaims exactly those files
    assert(q(s"VACUUM delta.`$t` RETAIN 0 HOURS").head().getLong(0) == reclaimable)
    assert(q(s"SELECT count(*) AS n FROM delta.`$t`").head().getLong(0) == 90L)
  }

  test("statement surface: MERGE INTO with update/delete/insert clauses") {
    import graft.sources.{DeltaLog, GraftSql}
    import spark.implicits._
    def q(sql: String) = GraftSql.exec(spark, sql)
    val t = java.nio.file.Files.createTempDirectory("graft-sqlmerge-").toString + "/t"
    DeltaLog.write(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("id", "tag", "v"), t)
    Seq((2L, 200L), (3L, 5L), (9L, 90L)).toDF("id", "nv")
      .createOrReplaceTempView("merge_src")

    q(s"""MERGE INTO delta.`$t` AS t USING merge_src AS s ON t.id = s.id
         |WHEN MATCHED AND s.nv >= 100 THEN UPDATE SET v = s.nv
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (id, tag, v) VALUES (s.id, 'new', s.nv)
         |""".stripMargin)
    val got = DeltaLog.read(spark, t).orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    // 1 untouched, 2 updated, 3 deleted, 9 inserted
    assert(got === Seq((1L, "a", 10L), (2L, "b", 200L), (9L, "new", 90L)))

    // subquery source + INSERT * + extra non-key ON conjunct (join filter);
    // a CASE WHEN inside SET must not confuse the clause splitter
    q(s"""MERGE INTO delta.`$t` tgt
         |USING (SELECT id, nv FROM merge_src WHERE nv > 0) src
         |ON tgt.id = src.id AND tgt.v < 100
         |WHEN MATCHED THEN UPDATE SET v = CASE WHEN src.nv > 50 THEN src.nv ELSE 0 END
         |""".stripMargin)
    val after = DeltaLog.read(spark, t).orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    // id=2 has v=200 (fails tgt.v<100 join filter, unchanged);
    // id=9 has v=90 → matched, nv=90>50 → v=90 (unchanged value)
    assert(after === Seq((1L, "a", 10L), (2L, "b", 200L), (9L, "new", 90L)))

    // BY SOURCE delete: rows with no source key vanish
    q(s"""MERGE INTO delta.`$t` AS t USING merge_src AS s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN DELETE
         |""".stripMargin)
    assert(DeltaLog.read(spark, t).select("id").as[Long].collect().toSet ===
      Set(2L, 9L))
  }

  test("CTAS lands a query as a new table; partitioned + properties variants") {
    Tables.registerAll(spark, sfDir)
    val t = java.nio.file.Files
      .createTempDirectory("graft-ctas-").toString + "/t"
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` AS
         |SELECT n_nationkey, n_name, n_regionkey FROM nation
         |WHERE n_regionkey < 3""".stripMargin)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.version == 0L)
    val back = DeltaLog.read(spark, t)
    assert(back.count() == spark.sql(
      "SELECT 1 FROM nation WHERE n_regionkey < 3").count())
    // CTAS onto an existing table refuses
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, s"CREATE TABLE delta.`$t` AS SELECT 1 AS x")
    }
    // partitioned CTAS with properties
    val t2 = java.nio.file.Files
      .createTempDirectory("graft-ctas-").toString + "/t"
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t2` PARTITIONED BY (n_regionkey)
         |TBLPROPERTIES ('delta.appendOnly'='true') AS
         |SELECT n_nationkey, n_name, n_regionkey FROM nation""".stripMargin)
    val s2 = DeltaLog.snapshot(spark, t2)
    assert(s2.partitionColumns == Seq("n_regionkey"))
    assert(s2.configuration("delta.appendOnly") == "true")
    assert(DeltaLog.read(spark, t2).count() == 25L)
  }

  test("CREATE OR REPLACE TABLE redeclares schema in place; history survives") {
    Tables.registerAll(spark, sfDir)
    val t = java.nio.file.Files
      .createTempDirectory("graft-corsel-").toString + "/t"
    GraftSql.exec(spark,
      s"CREATE TABLE delta.`$t` AS SELECT n_nationkey, n_name FROM nation")
    assert(DeltaLog.read(spark, t).count() == 25L)
    // replace with a DIFFERENT schema — one commit, no drop
    GraftSql.exec(spark,
      s"""CREATE OR REPLACE TABLE delta.`$t` AS
         |SELECT r_regionkey AS rk, r_name AS rn FROM region""".stripMargin)
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.version == 1L, s"replace must be ONE commit: ${snap.version}")
    assert(snap.schema.get.fieldNames.toSeq == Seq("rk", "rn"))
    assert(DeltaLog.read(spark, t).count() == 5L)
    // time travel to the pre-replace version still works
    assert(DeltaLog.read(spark, t, Some(0L)).count() == 25L)
    // OR REPLACE also creates when the target is absent
    val t2 = java.nio.file.Files
      .createTempDirectory("graft-corsel-").toString + "/t"
    GraftSql.exec(spark,
      s"CREATE OR REPLACE TABLE delta.`$t2` AS SELECT 1 AS x")
    assert(DeltaLog.read(spark, t2).count() == 1L)
  }

  test("DELETE without WHERE truncates metadata-only (no rewrite, no DVs)") {
    val t = java.nio.file.Files
      .createTempDirectory("graft-truncate-").toString + "/t"
    DeltaLog.write(spark,
      spark.range(0, 100).select(col("id").as("k")).repartition(4), t)
    GraftSql.exec(spark, s"DELETE FROM delta.`$t`")
    val snap = DeltaLog.snapshot(spark, t)
    assert(snap.files.isEmpty, "full-table DELETE must remove every entry")
    assert(DeltaLog.read(spark, t).count() == 0L)
    // schema survives; the table keeps accepting appends
    DeltaLog.write(spark,
      spark.range(0, 5).select(col("id").as("k")), t, "append")
    assert(DeltaLog.read(spark, t).count() == 5L)
    // time travel still sees the pre-truncate rows
    assert(DeltaLog.read(spark, t, Some(0L)).count() == 100L)
  }

  test("SHOW PARTITIONS lists distinct tuples from the file frame") {
    val t = java.nio.file.Files
      .createTempDirectory("graft-showparts-").toString + "/t"
    val df = spark.range(0, 60).select(col("id").as("k"),
      (col("id") % 3).as("p"), (col("id") % 2).as("q"))
    DeltaLog.write(spark, df, t, partitionBy = Seq("p", "q"))
    val parts = GraftSql.exec(spark, s"SHOW PARTITIONS delta.`$t`")
    assert(parts.columns.toSeq == Seq("p", "q"))
    assert(parts.count() == 6L)
    intercept[IllegalArgumentException] {
      val t2 = java.nio.file.Files
        .createTempDirectory("graft-showparts-").toString + "/t"
      DeltaLog.write(spark, df.drop("p", "q"), t2)
      GraftSql.exec(spark, s"SHOW PARTITIONS delta.`$t2`")
    }
  }

  test("data-skipping stats knobs and delta.checkpointInterval are honored") {
    import graft.sources.GraftSql
    // explicit stats column list: only 's' gets min/max; numRecords stays
    val t = java.nio.file.Files
      .createTempDirectory("graft-statscols-").toString + "/t"
    DeltaLog.write(spark,
      spark.range(0, 20).select(col("id").as("k"),
        format_string("s%02d", col("id")).as("s")).coalesce(1), t,
      properties = Map("delta.dataSkippingStatsColumns" -> "s"))
    val st = DeltaLog.snapshot(spark, t).allFiles
      .select("stats").head.getString(0)
    assert(st.contains("numRecords") && st.contains("\"s\"") &&
      !st.contains("\"k\""), st)
    // numIndexedCols=1: only the FIRST eligible column is stats'd
    val t2 = java.nio.file.Files
      .createTempDirectory("graft-statscols-").toString + "/t"
    DeltaLog.write(spark,
      spark.range(0, 20).select(col("id").as("k"),
        format_string("s%02d", col("id")).as("s")).coalesce(1), t2,
      properties = Map("delta.dataSkippingNumIndexedCols" -> "1"))
    val st2 = DeltaLog.snapshot(spark, t2).allFiles
      .select("stats").head.getString(0)
    assert(st2.contains("\"k\"") && !st2.contains("\"s\""), st2)
    // delta.checkpointInterval as a TABLE property: checkpoint at v2
    val t3 = java.nio.file.Files
      .createTempDirectory("graft-cpint-").toString + "/t"
    DeltaLog.write(spark, spark.range(0, 5).toDF("k").coalesce(1), t3,
      properties = Map("delta.checkpointInterval" -> "2"))
    DeltaLog.write(spark, spark.range(5, 10).toDF("k").coalesce(1), t3, "append")
    DeltaLog.write(spark, spark.range(10, 15).toDF("k").coalesce(1), t3, "append")
    val fs = new org.apache.hadoop.fs.Path(t3)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(t3,
      "_delta_log/_last_checkpoint")),
      "table-property checkpoint interval of 2 must checkpoint at v2")
  }

  test("REORG WHERE purges only the matching files' deletion vectors") {
    import spark.implicits._
    val t = java.nio.file.Files
      .createTempDirectory("graft-sql-reorgw-").toString + "/t"
    // two single-file partitions, each with a DV from a row-level delete
    DeltaLog.write(spark, (0L until 20L).map(i => (i, s"p${i % 2}"))
      .toDF("k", "p").repartition(1), t, partitionBy = Seq("p"))
    DeltaLog.deleteWhere(spark, t, col("k") === 4L)  // masks p0's file
    DeltaLog.deleteWhere(spark, t, col("k") === 5L)  // masks p1's file
    val before = DeltaLog.snapshot(spark, t)
    assert(before.fileEntries.count(_.dv.nonEmpty) == 2)
    GraftSql.exec(spark,
      s"REORG TABLE delta.`$t` WHERE p = 'p0' APPLY (PURGE)")
    val after = DeltaLog.snapshot(spark, t)
    // p0's mask materialized away; p1's untouched
    assert(after.fileEntries.count(_.dv.nonEmpty) == 1)
    assert(DeltaLog.read(spark, t).count() == 18L)
  }

  test("MERGE WITH SCHEMA EVOLUTION carries new source columns into the target") {
    import spark.implicits._
    val t = java.nio.file.Files
      .createTempDirectory("graft-sql-mwse-").toString + "/t"
    DeltaLog.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t)
    Seq((2L, "B", "x2"), (3L, "c", "x3")).toDF("id", "v", "extra")
      .createOrReplaceTempView("mwse_src")
    GraftSql.exec(spark,
      s"""MERGE WITH SCHEMA EVOLUTION INTO delta.`$t` AS t
         |USING mwse_src AS s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = DeltaLog.read(spark, t)
      .as[(Long, String, Option[String])].collect().toSet
    assert(got == Set((1L, "a", None), (2L, "B", Some("x2")),
      (3L, "c", Some("x3"))))
  }

  test("INSERT INTO appends positionally; INSERT OVERWRITE honors dynamic mode") {
    import spark.implicits._
    val t = java.nio.file.Files
      .createTempDirectory("graft-sql-insert-").toString + "/t"
    GraftSql.exec(spark,
      s"CREATE TABLE delta.`$t` (k BIGINT, p STRING) PARTITIONED BY (p)")
    GraftSql.exec(spark,
      s"INSERT INTO delta.`$t` SELECT * FROM VALUES (1, 'a'), (2, 'b') AS v(x, y)")
    // positional: names differ (x,y), INT coerces to the declared BIGINT
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    GraftSql.exec(spark, s"INSERT INTO delta.`$t` VALUES (3, 'a')")
    assert(DeltaLog.read(spark, t).count() == 3L)
    // dynamic overwrite from SQL: only partition 'a' is replaced
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try GraftSql.exec(spark,
      s"INSERT OVERWRITE delta.`$t` SELECT * FROM VALUES (9, 'a') AS v(x, y)")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((9L, "a"), (2L, "b")))
    // static INSERT OVERWRITE truncates
    GraftSql.exec(spark,
      s"INSERT OVERWRITE TABLE delta.`$t` SELECT * FROM VALUES (7, 'z') AS v(x, y)")
    assert(DeltaLog.read(spark, t).as[(Long, String)].collect().toSeq ==
      Seq((7L, "z")))
  }

  test("OPTIMIZE WHERE compacts only the matching partition") {
    val t = java.nio.file.Files
      .createTempDirectory("graft-optwhere-").toString + "/t"
    val df = spark.range(0, 400).select(col("id").as("k"),
      (col("id") % 4).as("p"))
    // 4 partitions × several files each
    DeltaLog.write(spark, df.repartition(8), t, partitionBy = Seq("p"))
    val before = DeltaLog.snapshot(spark, t)
    val untouched = before.files.filterNot(_.startsWith("p=1/")).toSet
    assert(before.files.count(_.startsWith("p=1/")) > 1)
    GraftSql.exec(spark, s"OPTIMIZE delta.`$t` WHERE p = 1")
    val after = DeltaLog.snapshot(spark, t)
    // scoped partition compacted to one file; every other file untouched
    assert(after.files.count(_.startsWith("p=1/")) == 1)
    assert(untouched.subsetOf(after.files.toSet))
    assert(DeltaLog.read(spark, t).count() == 400L)
    // a data-column predicate is refused
    intercept[IllegalArgumentException] {
      GraftSql.exec(spark, s"OPTIMIZE delta.`$t` WHERE k = 1")
    }
  }
}
