package graft

import java.nio.file.Files

import graft.sources.IcebergTable
import org.apache.spark.sql.functions._

/** Named snapshot refs (Iceberg spec, Table Metadata `refs`): tags pin
  * a snapshot for reproducibility (the "this training run used corpus
  * rc1" shape), branches are movable heads, `main` tracks every commit,
  * and a ref PROTECTS its snapshot from expiry until dropped. */
class IcebergRefsSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("graft-refs-").toString + "/t"

  test("tag pins a snapshot across commits; main tracks the head") {
    val t = fresh()
    val s1 = IcebergTable.writeAppend(spark, Seq((1L, "a")).toDF("k", "v"), t)
    IcebergTable.setRef(spark, t, "rc1", s1)
    val s2 = IcebergTable.writeAppend(spark, Seq((2L, "b")).toDF("k", "v"), t)
    val s3 = IcebergTable.writeAppend(spark, Seq((3L, "c")).toDF("k", "v"), t)

    // the tag survived two commits and still reads the pinned state
    assert(IcebergTable.readRef(spark, t, "rc1")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
    // main is the head
    assert(IcebergTable.refSnapshotId(spark, t, "main") == s3)
    assert(IcebergTable.readRef(spark, t, "main").count() == 3)
    // refs inspection table
    val refs = IcebergTable.metadataTable(spark, t, "refs")
      .as[(String, String, Long)].collect()
      .map { case (n, ty, id) => n -> ((ty, id)) }.toMap
    assert(refs("rc1") == ("tag", s1) && refs("main") == ("branch", s3))
    assert(s2 != s3)
  }

  test("a ref protects its snapshot from expiry; dropRef releases it") {
    val t = fresh()
    val s1 = IcebergTable.writeAppend(spark, Seq((1L, "a")).toDF("k", "v"), t)
    IcebergTable.setRef(spark, t, "audit", s1)
    IcebergTable.writeAppend(spark, Seq((2L, "b")).toDF("k", "v"), t)
    IcebergTable.writeAppend(spark, Seq((3L, "c")).toDF("k", "v"), t)

    // expire everything but the newest: the tagged snapshot must survive
    IcebergTable.expireSnapshots(spark, t,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    assert(IcebergTable.readRef(spark, t, "audit")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))

    // drop the tag, expire again: now the old snapshot goes away
    IcebergTable.dropRef(spark, t, "audit")
    IcebergTable.expireSnapshots(spark, t,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    intercept[Exception] { IcebergTable.read(spark, t, snapshotId = Some(s1)) }
    // the head still reads fine
    assert(IcebergTable.read(spark, t).count() == 3)
  }

  test("SQL verbs: CREATE TAG, VERSION AS OF 'name', refs table, DROP TAG") {
    val t = fresh()
    val s1 = IcebergTable.writeAppend(spark, Seq((1L, "a")).toDF("k", "v"), t)
    IcebergTable.writeAppend(spark, Seq((2L, "b")).toDF("k", "v"), t)
    graft.sources.GraftSql.exec(spark,
      s"ALTER TABLE iceberg.`$t` CREATE TAG rc1 AS OF VERSION $s1")
    val pinned = graft.sources.GraftSql.exec(spark,
      s"SELECT k, v FROM iceberg.`$t` VERSION AS OF 'rc1' ORDER BY k")
      .as[(Long, String)].collect().toSeq
    assert(pinned == Seq((1L, "a")))
    val names = graft.sources.GraftSql.exec(spark,
      s"SELECT name FROM iceberg.`$t`.refs ORDER BY name")
      .as[String].collect().toSeq
    assert(names == Seq("main", "rc1"))
    graft.sources.GraftSql.exec(spark, s"ALTER TABLE iceberg.`$t` DROP TAG rc1")
    intercept[Exception] {
      graft.sources.GraftSql.exec(spark,
        s"SELECT * FROM iceberg.`$t` VERSION AS OF 'rc1'")
    }
  }

  test("write-audit-publish: branch writes stack in isolation, publish is atomic") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "base")).toDF("k", "v"), t)
    // two staged commits stack on the audit branch
    val b1 = IcebergTable.writeAppend(spark,
      Seq((2L, "staged1")).toDF("k", "v"), t, toBranch = Some("audit"))
    val b2 = IcebergTable.writeAppend(spark,
      Seq((3L, "staged2")).toDF("k", "v"), t, toBranch = Some("audit"))
    // isolation: the published head serves ONLY the base wave; the
    // branch serves base + both staged waves (they stacked, not forked)
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "base")))
    assert(IcebergTable.readRef(spark, t, "audit")
      .as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "staged1"), (3L, "staged2")))
    assert(IcebergTable.refSnapshotId(spark, t, "audit") == b2 && b1 != b2)
    // expiry protects the staged snapshots (the branch ref pins them)
    IcebergTable.expireSnapshots(spark, t,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    assert(IcebergTable.readRef(spark, t, "audit").count() == 3)
    // publish: main fast-forwards to the branch head
    val head = IcebergTable.fastForward(spark, t, "audit")
    assert(head == b2)
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "staged1"), (3L, "staged2")))
    assert(IcebergTable.refSnapshotId(spark, t, "main") == b2)
    // idempotent: publishing an already-published branch is a no-op
    assert(IcebergTable.fastForward(spark, t, "audit") == b2)
  }

  test("fastForward refuses a diverged published head; tags refuse writes") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "base")).toDF("k", "v"), t)
    IcebergTable.writeAppend(spark,
      Seq((2L, "staged")).toDF("k", "v"), t, toBranch = Some("audit"))
    // main moves past the fork point: the branch no longer fast-forwards
    IcebergTable.writeAppend(spark, Seq((9L, "raced")).toDF("k", "v"), t)
    val e = intercept[IllegalArgumentException] {
      IcebergTable.fastForward(spark, t, "audit")
    }
    assert(e.getMessage.contains("diverged"), e.getMessage)
    // the failed publish left both histories intact
    assert(IcebergTable.read(spark, t).count() == 2)
    assert(IcebergTable.readRef(spark, t, "audit").count() == 2)
    // a TAG is immutable: writing to it refuses
    val s1 = IcebergTable.refSnapshotId(spark, t, "main")
    IcebergTable.setRef(spark, t, "pin", s1)
    intercept[IllegalArgumentException] {
      IcebergTable.writeAppend(spark,
        Seq((4L, "x")).toDF("k", "v"), t, toBranch = Some("pin"))
    }
    intercept[Exception] { IcebergTable.fastForward(spark, t, "pin") }
  }

  test("WAP SQL verbs: INSERT INTO ... BRANCH, FAST FORWARD TO") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "base")).toDF("k", "v"), t)
    graft.sources.GraftSql.exec(spark,
      s"INSERT INTO iceberg.`$t` BRANCH audit SELECT 2 AS k, 'staged' AS v")
    assert(IcebergTable.read(spark, t).count() == 1)
    graft.sources.GraftSql.exec(spark,
      s"ALTER TABLE iceberg.`$t` FAST FORWARD TO audit")
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "staged")))
  }

  test("cherrypick publishes ONE staged append; refuses non-appends") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "base")).toDF("k", "v"), t)
    // stage TWO commits on the audit branch; pick only the first
    val b1 = IcebergTable.writeAppend(spark,
      Seq((2L, "wanted")).toDF("k", "v"), t, toBranch = Some("audit"))
    IcebergTable.writeAppend(spark,
      Seq((3L, "unwanted")).toDF("k", "v"), t, toBranch = Some("audit"))
    val newHead = IcebergTable.cherrypick(spark, t, b1)
    assert(newHead != b1, "cherrypick must mint a NEW snapshot on main")
    // main has base + the picked wave, NOT the second staged wave
    assert(IcebergTable.read(spark, t).as[(Long, String)].collect().toSet ==
      Set((1L, "base"), (2L, "wanted")))
    // the branch is untouched
    assert(IcebergTable.readRef(spark, t, "audit").count() == 3)
    // idempotent: a snapshot already in main's ancestry is a no-op
    assert(IcebergTable.cherrypick(spark, t, newHead) == newHead)
    // SQL verb
    val t2 = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "a")).toDF("k", "v"), t2)
    val s2 = IcebergTable.writeAppend(spark,
      Seq((2L, "b")).toDF("k", "v"), t2, toBranch = Some("wip"))
    graft.sources.GraftSql.exec(spark,
      s"ALTER TABLE iceberg.`$t2` CHERRYPICK SNAPSHOT $s2")
    assert(IcebergTable.read(spark, t2).count() == 2)
    // an unknown snapshot id refuses loudly (the non-append gate is a
    // defensive require on the same path — every snapshot this engine
    // stages on a branch is an append, so it is unreachable from the
    // public surface today)
    intercept[Exception] { IcebergTable.cherrypick(spark, t2, 424242L) }
  }

  test("cherrypick: refuses a picked snapshot whose parent is expired") {
    val t = fresh()
    IcebergTable.writeAppend(spark, Seq((1L, "a")).toDF("k", "v"), t) // s1
    val b1 = IcebergTable.writeAppend(spark,
      Seq((2L, "staged")).toDF("k", "v"), t, toBranch = Some("audit"))
    IcebergTable.writeAppend(spark, Seq((3L, "c")).toDF("k", "v"), t) // s2 head
    // release the branch ref so s1 (b1's parent) loses its ancestor
    // protection, then expire it; b1 survives via retainLast
    IcebergTable.dropRef(spark, t, "audit")
    IcebergTable.expireSnapshots(spark, t,
      olderThanMs = System.currentTimeMillis() + 1000000L, retainLast = 2)
    // with the parent gone there is no baseline to diff b1's own
    // additions against — picking would re-append carried manifests and
    // duplicate rows on every later read; refuse loudly instead
    val e = intercept[Exception] { IcebergTable.cherrypick(spark, t, b1) }
    assert(e.getMessage.contains("expired"), e.getMessage)
  }

  test("ref edits refuse bad shapes") {
    val t = fresh()
    val s1 = IcebergTable.writeAppend(spark, Seq((1L, "a")).toDF("k", "v"), t)
    intercept[IllegalArgumentException] {
      IcebergTable.setRef(spark, t, "main", s1)
    }
    intercept[IllegalArgumentException] {
      IcebergTable.setRef(spark, t, "ghost", 999999L)
    }
    intercept[Exception] { IcebergTable.dropRef(spark, t, "missing") }
    intercept[Exception] { IcebergTable.refSnapshotId(spark, t, "missing") }
    // a failed edit leaves the table readable
    assert(IcebergTable.read(spark, t).count() == 1)
  }
}
