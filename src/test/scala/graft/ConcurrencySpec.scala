package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import graft.sources.{ConcurrentAppendException, ConcurrentDeleteDeleteException,
  ConcurrentDeleteReadException, ConcurrentTransactionException,
  MetadataChangedException, ProtocolChangedException}
import org.apache.spark.sql.functions._

/** Optimistic-concurrency conflict detection (delta-spark's conflict
  * checker, from the public protocol's concurrency semantics): a DML
  * operation pinned at snapshot version `b` that finds the log advanced
  * REBASES — commits at the tip without recomputing — when every
  * intervening commit is provably non-conflicting (a blind append under
  * WriteSerializable), and otherwise throws the typed
  * [[CommitRaceException]] subclass that `withDmlRetry` turns into a
  * fresh-snapshot recompute. At 1000-writer scale this is the difference
  * between "every concurrent append aborts my MERGE" and "the MERGE
  * lands one version later, zero wasted work".
  *
  * The concurrent writer is injected via `DeltaLog.raceHook`, which runs
  * after the victim computed its plan from the pinned snapshot and
  * before its commit — exactly the window a real race occupies. Attempt
  * counts distinguish a rebase (1 plan computation) from a recompute
  * (2+).
  */
class ConcurrencySpec extends SparkSpec
    with org.scalatest.BeforeAndAfterEach {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-conc-").toString + "/t"

  /** Install a hook that fires `act` once, on the victim's FIRST attempt
    * only; returns a counter of how many attempts the victim made. The
    * injected writer's own commits re-enter the hook — guarded out so
    * the counter sees only the victim's attempts. */
  private def raceOnce(act: () => Unit): () => Int = {
    var attempts = 0
    var fired = false
    var inAct = false
    DeltaLog.raceHook = (_, _) =>
      if (!inAct) {
        attempts += 1
        if (!fired) {
          fired = true; inAct = true
          try act() finally inAct = false
        }
      }
    () => attempts
  }

  override def afterEach(): Unit = {
    DeltaLog.raceHook = (_, _) => ()
    super.afterEach()
  }

  private def seed(t: String, props: String = ""): Unit = {
    GraftSql.exec(spark, s"CREATE TABLE delta.`$t` (k BIGINT, v STRING)$props")
    DeltaLog.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t,
      mode = "append")
  }

  test("UPDATE rebases over a concurrent blind append: no recompute") {
    val t = fresh(); seed(t)
    val base = DeltaLog.snapshot(spark, t).version
    val attempts = raceOnce(() =>
      DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v"), t, mode = "append"))
    val v = DeltaLog.updateWhere(spark, t, col("k") === 1L,
      Map("v" -> lit("A")))
    // the append took base+1; the UPDATE landed at base+2 WITHOUT
    // recomputing (one attempt = one raceHook invocation)
    assert(v == base + 2)
    assert(attempts() == 1)
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "A", 2L -> "b", 9L -> "z"))
  }

  test("MERGE rebases over a concurrent blind append") {
    val t = fresh(); seed(t)
    val base = DeltaLog.snapshot(spark, t).version
    val attempts = raceOnce(() =>
      DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v"), t, mode = "append"))
    val src = Seq((2L, "B2"), (3L, "c")).toDF("k", "v")
    graft.sources.Merge.into(spark, t, src, keys = Seq("k"))
      .whenMatchedUpdate(Map("v" -> col("s.v")))
      .whenNotMatchedInsert(Map("k" -> col("s.k"), "v" -> col("s.v")))
      .execute()
    assert(attempts() == 1)
    val got = DeltaLog.read(spark, t).select("k", "v")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "z"))
    assert(DeltaLog.snapshot(spark, t).version == base + 2)
  }

  test("DV DELETE rebases over a concurrent blind append") {
    val t = fresh(); seed(t)
    val base = DeltaLog.snapshot(spark, t).version
    val attempts = raceOnce(() =>
      DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v"), t, mode = "append"))
    val v = DeltaLog.deleteWhere(spark, t, col("k") === 2L)
    assert(v == base + 2)
    assert(attempts() == 1)
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 9L -> "z"))
  }

  test("OPTIMIZE rebases over a concurrent blind append and keeps it live") {
    val t = fresh(); seed(t)
    DeltaLog.write(spark, Seq((3L, "c")).toDF("k", "v"), t, mode = "append")
    val attempts = raceOnce(() =>
      DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v"), t, mode = "append"))
    DeltaLog.optimize(spark, t, targetFiles = 1)
    assert(attempts() == 1)
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c", 9L -> "z"))
  }

  test("delete/delete overlap recomputes from a fresh snapshot") {
    val t = fresh()
    // BOTH rows in ONE file: the seed()'s two-file layout stopped
    // conflicting once (a) zone maps give each DELETE its own file and
    // (b) a whole-file delete no longer emits the spurious
    // deletionVectors protocol upgrade that used to trip the loser
    GraftSql.exec(spark, s"CREATE TABLE delta.`$t` (k BIGINT, v STRING)")
    DeltaLog.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1),
      t, mode = "append")
    val attempts = raceOnce(() => {
      DeltaLog.deleteWhere(spark, t, col("k") === 2L); ()
    })
    // same file touched by both DELETEs → ConcurrentDeleteDelete inside,
    // withDmlRetry recomputes (attempt 2) and the result is still exact
    DeltaLog.deleteWhere(spark, t, col("k") === 1L)
    assert(attempts() == 2)
    assert(DeltaLog.read(spark, t).count() == 0L)
  }

  test("metadata-only sweep rebases over a concurrent out-of-range append") {
    val t = fresh()
    GraftSql.exec(spark, s"CREATE TABLE delta.`$t` (k BIGINT, day STRING)")
    DeltaLog.write(spark, (0L until 20L).map(i => (i, s"d${i % 2}"))
      .toDF("k", "day").repartition(1), t, mode = "append",
      partitionBy = Seq("day"))
    val base = DeltaLog.snapshot(spark, t).version
    // the racer appends into the SURVIVING partition while the sweep is
    // pinned — its add provably can't match day='d0', so the sweep
    // commits at the tip without recompute
    val attempts = raceOnce(() =>
      DeltaLog.write(spark, Seq((100L, "d1")).toDF("k", "day"), t,
        mode = "append", partitionBy = Seq("day")))
    val v = DeltaLog.deleteWhere(spark, t, col("day") === "d0")
    assert(v == base + 2)
    assert(attempts() == 1, "out-of-range append must rebase, not recompute")
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(got == ((0L until 20L).filter(_ % 2 == 1)
      .map(i => (i, "d1")) :+ ((100L, "d1"))).toSet)
    // and no deletion vectors: the sweep removed whole files
    assert(DeltaLog.snapshot(spark, t).fileEntries.forall(_.dv.isEmpty))
  }

  test("disjoint-file delete/delete rebases with zero wasted work") {
    val t = fresh(); seed(t) // two rows, two files
    val attempts = raceOnce(() => {
      DeltaLog.deleteWhere(spark, t, col("k") === 2L); ()
    })
    // zone maps scope each DELETE to its own file and neither commit
    // carries a protocol change → the loser REBASES on attempt 1
    DeltaLog.deleteWhere(spark, t, col("k") === 1L)
    assert(attempts() == 1)
    assert(DeltaLog.read(spark, t).count() == 0L)
  }

  test("concurrent metadata change recomputes, not rebases") {
    val t = fresh(); seed(t)
    val attempts = raceOnce(() =>
      GraftSql.exec(spark,
        s"ALTER TABLE delta.`$t` SET TBLPROPERTIES ('graft.note'='x')"))
    DeltaLog.updateWhere(spark, t, col("k") === 1L, Map("v" -> lit("A")))
    assert(attempts() == 2)
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "A", 2L -> "b"))
    // the property set by the "winner" survived the recomputed UPDATE
    assert(DeltaLog.snapshot(spark, t).configuration.get("graft.note")
      .contains("x"))
  }

  test("Serializable isolation: a blind append MATCHING the predicate recomputes") {
    val t = fresh()
    seed(t, " TBLPROPERTIES ('delta.isolationLevel'='Serializable')")
    val attempts = raceOnce(() =>
      DeltaLog.write(spark, Seq((1L, "dup")).toDF("k", "v"), t, mode = "append"))
    DeltaLog.updateWhere(spark, t, col("k") === 1L, Map("v" -> lit("A")))
    // the appended k=1 row's stats overlap the predicate → conflict →
    // recompute, which then updates BOTH k=1 rows (serial history)
    assert(attempts() == 2)
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "A"), (2L, "b")))
  }

  test("Serializable isolation: a provably disjoint blind append rebases") {
    val t = fresh()
    seed(t, " TBLPROPERTIES ('delta.isolationLevel'='Serializable')")
    val attempts = raceOnce(() =>
      DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v"), t, mode = "append"))
    DeltaLog.updateWhere(spark, t, col("k") === 1L, Map("v" -> lit("A")))
    // stats of the appended file (k: 9..9) prove it cannot match k=1 —
    // no conflict even under Serializable (stats-precise checking)
    assert(attempts() == 1)
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "A", 2L -> "b", 9L -> "z"))
  }

  test("UPDATEs on provably disjoint keys commute without recompute") {
    val t = fresh(); seed(t)
    DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v"), t, mode = "append")
    val attempts = raceOnce(() => {
      DeltaLog.updateWhere(spark, t, col("k") === 9L, Map("v" -> lit("Z9"))); ()
    })
    // the winner rewrote the k=9 file (non-blind); its new file's stats
    // (k: 9..9) prove no overlap with this UPDATE's k=1 read — rebase
    DeltaLog.updateWhere(spark, t, col("k") === 1L, Map("v" -> lit("A")))
    assert(attempts() == 1)
    val got = DeltaLog.read(spark, t).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "A", 2L -> "b", 9L -> "Z9"))
  }

  test("checkConflicts classifies each conflict with its typed exception") {
    val t = fresh(); seed(t)
    val snap = DeltaLog.snapshot(spark, t)
    val file = snap.files.head
    val base = snap.version

    // blind append → no conflict under WriteSerializable
    DeltaLog.write(spark, Seq((9L, "z")).toDF("k", "v"), t, mode = "append")
    DeltaLog.checkConflicts(spark, t, base, base + 1,
      DeltaLog.TxnReadInfo(Set(file), Set(file)), Map.empty)
    // …but a conflict under Serializable
    intercept[ConcurrentAppendException] {
      DeltaLog.checkConflicts(spark, t, base, base + 1,
        DeltaLog.TxnReadInfo(Set(file), Set(file)),
        Map("delta.isolationLevel" -> "Serializable"))
    }

    // non-blind dataChange commit (UPDATE rewrites a file) → append
    // conflict even when the paths differ
    val v2 = DeltaLog.updateWhere(spark, t, col("k") === 9L,
      Map("v" -> lit("Z")))
    intercept[ConcurrentAppendException] {
      DeltaLog.checkConflicts(spark, t, v2 - 1, v2,
        DeltaLog.TxnReadInfo(Set("other"), Set("other")), Map.empty)
    }
    // the same UPDATE's remove, against a txn that READ that file
    val removed = DeltaLog.readCommitActions(spark, t, v2)
      .filter(_.contains("\"remove\""))
    assert(removed.nonEmpty)
    val removedPath = com.fasterxml.jackson.databind.json.JsonMapper.builder()
      .build().readTree(removed.head).get("remove").get("path").asText()
    intercept[ConcurrentDeleteReadException] {
      DeltaLog.checkConflicts(spark, t, v2 - 1, v2,
        DeltaLog.TxnReadInfo(Set(removedPath), Set.empty), Map.empty)
    }
    intercept[ConcurrentDeleteDeleteException] {
      DeltaLog.checkConflicts(spark, t, v2 - 1, v2,
        DeltaLog.TxnReadInfo(Set(removedPath), Set(removedPath)), Map.empty)
    }

    // metadata change
    GraftSql.exec(spark,
      s"ALTER TABLE delta.`$t` SET TBLPROPERTIES ('graft.note'='x')")
    val v3 = DeltaLog.snapshot(spark, t).version
    intercept[MetadataChangedException] {
      DeltaLog.checkConflicts(spark, t, v3 - 1, v3,
        DeltaLog.TxnReadInfo(Set.empty, Set.empty), Map.empty)
    }

    // SetTransaction under an asserted appId
    DeltaLog.write(spark, Seq((10L, "y")).toDF("k", "v"), t,
      mode = "append", txn = Some(("app-1", 7L)))
    val v4 = DeltaLog.snapshot(spark, t).version
    intercept[ConcurrentTransactionException] {
      DeltaLog.checkConflicts(spark, t, v4 - 1, v4,
        DeltaLog.TxnReadInfo(Set.empty, Set.empty, Set("app-1")), Map.empty)
    }
    // a different appId does not conflict (the commit is a blind append)
    DeltaLog.checkConflicts(spark, t, v4 - 1, v4,
      DeltaLog.TxnReadInfo(Set.empty, Set.empty, Set("app-2")), Map.empty)
  }

  test("append commits declare isBlindAppend; rewrites do not") {
    val t = fresh(); seed(t)
    val vAppend = DeltaLog.snapshot(spark, t).version
    val appendCi = DeltaLog.readCommitActions(spark, t, vAppend)
      .find(_.contains("commitInfo")).get
    assert(appendCi.contains("\"isBlindAppend\":true"))
    val vUp = DeltaLog.updateWhere(spark, t, col("k") === 1L,
      Map("v" -> lit("A")))
    val upCi = DeltaLog.readCommitActions(spark, t, vUp)
      .find(_.contains("commitInfo")).get
    assert(upCi.contains("\"isBlindAppend\":false"))
  }
}
