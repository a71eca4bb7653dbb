package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, Merge}
import graft.sources.MergeClause._
import org.apache.spark.sql.functions._

/** General clause-based MERGE ([[graft.sources.Merge]]): the reference's
  * `DeltaTable.merge` builder semantics on the copy-on-write protocol —
  * conditioned update, delete, insert, BY SOURCE clauses, the
  * nondeterministic-merge guard, and first-match-wins ordering. */
class MergeClausesSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft-merge-").toString + "/t"

  private def target3(): String = {
    val t = freshTable()
    DeltaLog.write(spark,
      Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
        .toDF("id", "tag", "v").repartition(2), t)
    t
  }

  test("conditioned update, fallthrough delete, and insert in one merge") {
    val t = target3()
    val src = Seq((2L, 200), (3L, 31), (9L, 90)).toDF("id", "nv")
    Merge.into(spark, t, src, keys = Seq("id"))
      .whenMatchedUpdate(Map("v" -> col("s.nv")), condition = col("s.nv") >= 100)
      .whenMatchedDelete()
      .whenNotMatchedInsert(Map("id" -> col("s.id"), "v" -> col("s.nv")))
      .execute()
    val got = DeltaLog.read(spark, t).orderBy("id")
      .as[(Long, Option[String], Int)].collect().toSeq
    // 1 untouched; 2 updated (nv>=100); 3 deleted (fallthrough); 9 inserted (tag null)
    assert(got === Seq((1L, Some("a"), 10), (2L, Some("b"), 200),
      (4L, Some("d"), 40), (9L, None, 90)))
  }

  test("SCD2 expire shape: update-only merge with an extra ON predicate") {
    // two history rows per key, only is_current=true may be expired —
    // the reference's silver SCD2 expire step
    val t = freshTable()
    DeltaLog.write(spark, Seq(
      (1L, 100, false), (1L, 101, true),
      (2L, 200, false), (2L, 201, true)).toDF("id", "v", "is_current"), t)
    val src = Seq((1L, 999)).toDF("id", "nv")
    Merge.into(spark, t, src, keys = Seq("id"))
      .on(col("t.is_current"))
      .whenMatchedUpdate(Map("is_current" -> lit(false), "v" -> col("s.nv")))
      .execute()
    val got = DeltaLog.read(spark, t).orderBy("id", "v")
      .as[(Long, Int, Boolean)].collect().toSeq
    assert(got === Seq((1L, 100, false), (1L, 999, false),
      (2L, 200, false), (2L, 201, true)))
  }

  test("updateAll + insertAll is a plain upsert") {
    val t = target3()
    val src = Seq((2L, "B", 22), (9L, "I", 90)).toDF("id", "tag", "v")
    Merge.into(spark, t, src, keys = Seq("id"))
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    val got = DeltaLog.read(spark, t).orderBy("id")
      .as[(Long, String, Int)].collect().toSeq
    assert(got === Seq((1L, "a", 10), (2L, "B", 22), (3L, "c", 30),
      (4L, "d", 40), (9L, "I", 90)))
  }

  test("first-match-wins: an earlier conditional clause shadows a later one") {
    val t = target3()
    val src = Seq((1L, 5), (2L, 500)).toDF("id", "nv")
    Merge.into(spark, t, src, keys = Seq("id"))
      .whenMatchedUpdate(Map("v" -> lit(-1)), condition = col("s.nv") < 100)
      .whenMatchedUpdate(Map("v" -> lit(-2)))
      .execute()
    val got = DeltaLog.read(spark, t).orderBy("id")
      .as[(Long, String, Int)].collect().toSeq.map(r => r._1 -> r._3)
    assert(got === Seq(1L -> -1, 2L -> -2, 3L -> 30, 4L -> 40))
  }

  test("BY SOURCE delete drops target rows with no source key") {
    val t = target3()
    val src = Seq((1L, 0), (3L, 0)).toDF("id", "nv")
    Merge.into(spark, t, src, keys = Seq("id"))
      .whenNotMatchedBySourceDelete(condition = col("t.v") >= 40)
      .execute()
    // 2 and 4 lack source keys; only 4 passes the condition
    assert(DeltaLog.read(spark, t).orderBy("id")
      .select("id").as[Long].collect().toSeq === Seq(1L, 2L, 3L))
  }

  test("nondeterministic merge (one target row, two modifying source rows) fails loudly") {
    val t = target3()
    val src = Seq((2L, 1), (2L, 2)).toDF("id", "nv")
    val e = intercept[RuntimeException] {
      Merge.into(spark, t, src, keys = Seq("id"))
        .whenMatchedUpdate(Map("v" -> col("s.nv")))
        .execute()
    }
    assert(e.getMessage.contains("multiple source rows"))
    // a NON-modifying duplicate (condition filters one) is legal
    Merge.into(spark, t, src, keys = Seq("id"))
      .whenMatchedUpdate(Map("v" -> col("s.nv")), condition = col("s.nv") === 2)
      .execute()
    assert(DeltaLog.read(spark, t).where(col("id") === 2)
      .select("v").as[Int].head() === 2)
  }

  test("merge is copy-on-write: files without source keys stay live") {
    val t = freshTable()
    // two files with disjoint key ranges
    DeltaLog.write(spark, Seq((1L, 10), (2L, 20)).toDF("id", "v").coalesce(1), t)
    DeltaLog.write(spark, Seq((100L, 1000), (200L, 2000)).toDF("id", "v").coalesce(1),
      t, mode = "append")
    val before = DeltaLog.snapshot(spark, t).files.toSet
    Merge.into(spark, t, Seq((1L, 11)).toDF("id", "nv"), keys = Seq("id"))
      .whenMatchedUpdate(Map("v" -> col("s.nv")))
      .execute()
    val after = DeltaLog.snapshot(spark, t).files.toSet
    assert(before.intersect(after).size === 1,
      "the file holding only keys 100/200 must survive untouched")
    assert(DeltaLog.read(spark, t).orderBy("id").as[(Long, Int)].collect().toSeq ===
      Seq(1L -> 11, 2L -> 20, 100L -> 1000, 200L -> 2000))
  }

  test("schema evolution: star clauses carry new source columns; old rows get null") {
    val t = target3()
    val src = Seq((2L, "B", 22, "x2"), (9L, "I", 90, "x9"))
      .toDF("id", "tag", "v", "extra")
    Merge.into(spark, t, src, keys = Seq("id"))
      .withSchemaEvolution()
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    val got = DeltaLog.read(spark, t).orderBy("id")
      .as[(Long, String, Int, Option[String])].collect().toSeq
    assert(got === Seq((1L, "a", 10, None), (2L, "B", 22, Some("x2")),
      (3L, "c", 30, None), (4L, "d", 40, None), (9L, "I", 90, Some("x9"))))
    // the evolved schema is durable: a fresh snapshot declares `extra`
    assert(DeltaLog.snapshot(spark, t).schema.get.fieldNames.contains("extra"))
  }

  test("schema evolution: an explicit SET may name a new column") {
    val t = target3()
    val src = Seq((1L, 7)).toDF("id", "nv")
    Merge.into(spark, t, src, keys = Seq("id"))
      .withSchemaEvolution()
      .whenMatchedUpdate(Map("score" -> (col("s.nv") * 2)))
      .execute()
    val got = DeltaLog.read(spark, t).orderBy("id")
      .select("id", "score").as[(Long, Option[Int])].collect().toSeq
    assert(got === Seq(1L -> Some(14), 2L -> None, 3L -> None, 4L -> None))
    // without the flag the same merge refuses
    intercept[IllegalArgumentException] {
      Merge.into(spark, t, src, keys = Seq("id"))
        .whenMatchedUpdate(Map("brand_new" -> lit(1)))
        .execute()
    }
  }

  test("plan shape: the dedup window enters the plan only under duplicate matches") {
    val t = Seq((1L, 10), (2L, 20)).toDF("id", "v")
    def planOf(src: org.apache.spark.sql.DataFrame): String =
      Merge.applyClauses(t, src, Seq("id"), None,
        Seq(MatchedUpdate(None, Map("v" -> lit(0)))))
        .queryExecution.executedPlan.toString
    // unique source keys: no per-target-row window (no extra shuffle)
    assert(!planOf(Seq((1L, 1)).toDF("id", "nv")).contains("Window"))
    // duplicate NON-modifying matches would duplicate rows: window appears
    val dup = Seq((1L, 1), (1L, 2)).toDF("id", "nv")
    val dupPlan = Merge.applyClauses(t, dup, Seq("id"), None,
      Seq(MatchedUpdate(Some(col("s.nv") === 1), Map("v" -> lit(0)))))
      .queryExecution.executedPlan.toString
    assert(dupPlan.contains("Window"))
  }

  test("clause validation: bad SET column, missing source key, star without columns") {
    val t = Seq((1L, 2)).toDF("id", "v")
    val s = Seq((1L, 3)).toDF("id", "nv")
    intercept[IllegalArgumentException] {
      Merge.applyClauses(t, s, Seq("id"), None,
        Seq(MatchedUpdate(None, Map("nope" -> lit(1)))))
    }
    intercept[IllegalArgumentException] {
      Merge.applyClauses(t, s, Seq("other"), None,
        Seq(MatchedDelete(None)))
    }
    intercept[IllegalArgumentException] { // v absent from source → SET * refused
      Merge.applyClauses(t, s, Seq("id"), None,
        Seq(MatchedUpdate(None, Map.empty)))
    }
  }
}
