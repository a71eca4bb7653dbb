package graft

import java.nio.file.Files

import graft.sources.IcebergTable
import org.apache.spark.sql.functions._

/** Model-based Iceberg fuzz, the [[ProtocolFuzzSpec]] shape on the v2
  * merge-on-read surface: seeded random interleavings of append,
  * REPLACE, position deletes, equality deletes (including the re-insert
  * of a previously eq-deleted key — the sequence-number scoping the
  * spec exists for), rewrite_data_files, and materializeDeletes,
  * checked against a driver-side row model after every op, with
  * snapshot-id time travel verified on a sample at the end.
  */
class IcebergFuzzSpec extends SparkSpec {
  import spark.implicits._

  private type R = (Long, String, Double)

  private def run(seed: Int, partitioned: Boolean): Unit = {
    val rnd = new scala.util.Random(seed)
    val t = Files.createTempDirectory(s"graft-icefuzz-$seed-").toString + "/t"
    val segs = Vector("A", "B", "C", "D")
    var nextKey = 0L
    def batch(n: Int): Seq[R] = (1 to n).map { _ =>
      nextKey += 1
      (nextKey, segs(rnd.nextInt(segs.size)), (rnd.nextInt(1000) + 1).toDouble)
    }
    def df(rows: Seq[R]) =
      rows.toDF("k", "seg", "amt").repartition(1 + rnd.nextInt(3))

    var model: Vector[R] = Vector.empty
    var deletedKeys: Vector[Long] = Vector.empty
    val snapModels = scala.collection.mutable.LinkedHashMap[Long, Vector[R]]()

    val rows0 = batch(8)
    val s0 = IcebergTable.writeAppend(spark, df(rows0), t,
      partition = if (partitioned) Seq("seg" -> "identity", "k" -> "bucket[4]")
      else Seq.empty)
    model = rows0.toVector
    snapModels(s0) = model

    def check(ctx: String): Unit = {
      val got = IcebergTable.read(spark, t).select("k", "seg", "amt")
        .as[R].collect().toVector.sorted
      assert(got == model.sorted,
        s"$ctx diverged (seed=$seed partitioned=$partitioned)")
    }

    for (step <- 1 to 20) {
      val op = rnd.nextInt(9)
      val sid: Long = op match {
        case 0 | 1 => // append fresh keys
          val rows = batch(1 + rnd.nextInt(6))
          val s = IcebergTable.writeAppend(spark, df(rows), t)
          model = model ++ rows
          s
        case 2 => // position delete (merge-on-read, content=1)
          val th = (rnd.nextInt(1000) + 1).toDouble
          val victims = model.filter(_._3 < th)
          deletedKeys = deletedKeys ++ victims.map(_._1)
          model = model.filterNot(_._3 < th)
          IcebergTable.deleteWhere(spark, t, col("amt") < th)
        case 3 => // equality delete on a key sample (content=2)
          val keys = rnd.shuffle(model.map(_._1)).take(1 + rnd.nextInt(3))
          if (keys.isEmpty) -1L
          else {
            deletedKeys = deletedKeys ++ keys
            model = model.filterNot(r => keys.contains(r._1))
            IcebergTable.deleteEquals(spark, t, keys.toDF("k"))
          }
        case 4 => // re-insert an eq/pos-deleted key: the new row lands at
          // a HIGHER sequence number, so earlier deletes must not eat it
          if (deletedKeys.isEmpty) -1L
          else {
            val k = deletedKeys(rnd.nextInt(deletedKeys.size))
            val row = (k, "R", 9000.0 + k)
            val s = IcebergTable.writeAppend(spark, df(Seq(row)), t)
            model = model :+ row
            s
          }
        case 5 => // REPLACE with a segment-filtered state
          val drop = segs(rnd.nextInt(segs.size))
          val keep = model.filterNot(_._2 == drop)
          if (keep.isEmpty) -1L
          else {
            val s = IcebergTable.writeAppend(spark, df(keep), t,
              carryPrevious = false)
            model = keep
            s
          }
        case 6 => // rewrite_data_files: bin-pack + apply deletes, no change
          IcebergTable.rewriteDataFiles(spark, t); -1L
        case 7 => // materialize merge-on-read deletes: no visible change
          IcebergTable.materializeDeletes(spark, t)
        case 8 => // metadata-only count agrees with the model
          assert(IcebergTable.countRows(spark, t) == model.size.toLong,
            s"countRows != model at step $step (seed $seed)")
          -1L
      }
      if (sid >= 0) snapModels(sid) = model
      check(s"step $step op $op")
    }

    // snapshot-id time travel on a sample of recorded snapshots
    val recorded = snapModels.toVector
    (rnd.shuffle(recorded).take(5) :+ recorded.last).foreach { case (id, m) =>
      val got = IcebergTable.read(spark, t, snapshotId = Some(id))
        .select("k", "seg", "amt").as[R].collect().toVector.sorted
      assert(got == m.sorted,
        s"time travel to snapshot $id diverged (seed=$seed partitioned=$partitioned)")
    }
  }

  test("seeded mixed-op Iceberg fuzz vs model: unpartitioned") {
    run(303, partitioned = false)
  }
  test("seeded mixed-op Iceberg fuzz vs model: hidden-partitioned") {
    run(404, partitioned = true)
  }

  /** Write-audit-publish fuzz: random interleave of main appends,
    * branch appends, fast-forward publishes, single-snapshot
    * cherry-picks, and snapshot expiry — after every op, the PUBLISHED
    * view must equal the main model and the BRANCH view its own model.
    * The isolation property under test: staged rows never leak into
    * main until a publish verb, and publishes carry exactly what the
    * model says they carry. */
  private def runWap(seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val t = Files.createTempDirectory(s"graft-wapfuzz-$seed-").toString + "/t"
    var nextKey = 0L
    def batch(n: Int): Seq[(Long, String)] = (1 to n).map { _ =>
      nextKey += 1; (nextKey, s"v$nextKey")
    }
    var mainModel: Vector[(Long, String)] = Vector.empty
    var branchModel: Vector[(Long, String)] = Vector.empty
    var branchExists = false
    // any main movement since the branch forked (a main append or a
    // cherry-pick mints a snapshot outside the branch's ancestry) makes
    // a fast-forward publish illegal until the branch is rebuilt — the
    // real WAP cycle drops the branch after each publish
    var forkDiverged = false
    // staged snapshots since the fork, oldest first, each with the rows
    // it added (cherry-pick takes one; fast-forward takes all)
    var staged: Vector[(Long, Seq[(Long, String)])] = Vector.empty
    val first = batch(4)
    IcebergTable.writeAppend(spark, first.toDF("k", "v"), t)
    mainModel = first.toVector
    def check(ctx: String): Unit = {
      val main = IcebergTable.read(spark, t)
        .as[(Long, String)].collect().toVector.sorted
      assert(main == mainModel.sorted, s"$ctx (seed $seed): main diverged")
      if (branchExists) {
        val br = IcebergTable.readRef(spark, t, "audit")
          .as[(Long, String)].collect().toVector.sorted
        assert(br == branchModel.sorted, s"$ctx (seed $seed): branch diverged")
      }
    }
    (1 to 16).foreach { step =>
      rnd.nextInt(5) match {
        case 0 => // main append — an existing branch does NOT see it
          val rows = batch(1 + rnd.nextInt(3))
          IcebergTable.writeAppend(spark, rows.toDF("k", "v"), t)
          mainModel ++= rows
          if (branchExists) forkDiverged = true
        case 1 | 2 => // branch append — main does NOT see it
          val rows = batch(1 + rnd.nextInt(3))
          val sid = IcebergTable.writeAppend(spark, rows.toDF("k", "v"), t,
            toBranch = Some("audit"))
          if (!branchExists) { // forked fresh from the current head
            branchExists = true; branchModel = mainModel; forkDiverged = false
          }
          branchModel ++= rows
          staged :+= (sid, rows)
        case 3 => // publish the whole branch, then drop it (WAP cycle)
          if (branchExists && staged.nonEmpty && !forkDiverged) {
            IcebergTable.fastForward(spark, t, "audit")
            IcebergTable.dropRef(spark, t, "audit")
            mainModel = branchModel
            branchExists = false; staged = Vector.empty
          } else if (branchExists && forkDiverged && staged.nonEmpty) {
            // the refusal itself is part of the contract
            intercept[IllegalArgumentException] {
              IcebergTable.fastForward(spark, t, "audit")
            }
          }
        case 4 => // cherry-pick the OLDEST staged snapshot (appends
          // commute, so this is legal even on a diverged main) — the
          // branch itself is untouched, but main now has a snapshot
          // outside the branch ancestry
          staged.headOption.foreach { case (sid, rows) =>
            IcebergTable.cherrypick(spark, t, sid)
            mainModel ++= rows
            staged = staged.tail
            forkDiverged = true
          }
      }
      check(s"step $step")
    }
  }

  test("seeded write-audit-publish fuzz vs model") {
    runWap(707); runWap(808)
  }
}
