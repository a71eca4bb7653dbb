package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, Merge}
import org.apache.spark.sql.functions._

/** Model-based protocol fuzz: a seeded random interleaving of every
  * mutating verb the writer supports — append, full-file and row-level
  * DELETE, UPDATE, clause MERGE, OPTIMIZE (plain and ZORDER),
  * checkpoint, log compaction, RESTORE — executed in lockstep against a
  * driver-side reference model (a plain Vector of rows). After EVERY op
  * the table read-back must equal the model exactly, and at the end a
  * sample of recorded versions must time-travel back to their recorded
  * model states. The point is the INTERLEAVINGS: a DV delete under a
  * later checkpoint, a merge over a restored state, an optimize that
  * must purge DVs without changing data — op-pair bugs no single-verb
  * spec exercises.
  */
class ProtocolFuzzSpec extends SparkSpec {
  import spark.implicits._

  private type R = (Long, String, Double)

  private def run(seed: Int, partitioned: Boolean,
      cloneFirst: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    val base = Files.createTempDirectory(s"graft-fuzz-$seed-").toString
    val src = base + "/t"
    val segs = Vector("A", "B", "C", "D")
    var nextKey = 0L
    def batch(n: Int): Seq[R] = (1 to n).map { _ =>
      nextKey += 1
      (nextKey, segs(rnd.nextInt(segs.size)), (rnd.nextInt(1000) + 1).toDouble)
    }
    def df(rows: Seq[R]) =
      rows.toDF("k", "seg", "amt").repartition(1 + rnd.nextInt(3))

    var model: Vector[R] = Vector.empty
    val versionModels = scala.collection.mutable.LinkedHashMap[Long, Vector[R]]()

    val rows0 = batch(8)
    DeltaLog.write(spark, df(rows0), src,
      partitionBy = if (partitioned) Seq("seg") else Seq.empty)
    model = rows0.toVector
    // cloneFirst: every subsequent op runs against a SHALLOW CLONE; the
    // source must come out of the whole fuzz byte-identical
    val t = if (!cloneFirst) src else {
      val c = base + "/clone"
      versionModels(DeltaLog.cloneShallow(spark, src, c)) = model
      c
    }
    if (!cloneFirst)
      versionModels(DeltaLog.latestVersion(spark, t).getOrElse(0L)) = model

    def check(ctx: String): Unit = {
      val got = DeltaLog.read(spark, t).select("k", "seg", "amt")
        .as[R].collect().toVector.sorted
      assert(got == model.sorted,
        s"$ctx diverged (seed=$seed partitioned=$partitioned): " +
          s"table=${got.take(5)}... model=${model.sorted.take(5)}...")
    }

    for (step <- 1 to 24) {
      val op = rnd.nextInt(12)
      val committed: Long = op match {
        case 0 | 1 => // append (new keys only: keys are never reused)
          val rows = batch(1 + rnd.nextInt(6))
          val v = DeltaLog.write(spark, df(rows), t, mode = "append")
          model = model ++ rows
          v
        case 2 => // full-file-provable DELETE (partition sweep on the
          // partitioned table, zone-map sweep otherwise)
          val s = segs(rnd.nextInt(segs.size))
          val v = DeltaLog.deleteWhere(spark, t, col("seg") === s)
          model = model.filterNot(_._2 == s)
          v
        case 3 => // row-level DELETE → deletion vectors
          val th = (rnd.nextInt(1000) + 1).toDouble
          val v = DeltaLog.deleteWhere(spark, t, col("amt") < th)
          model = model.filterNot(_._3 < th)
          v
        case 4 => // UPDATE: bump a segment's amounts
          val s = segs(rnd.nextInt(segs.size))
          val v = DeltaLog.updateWhere(spark, t, col("seg") === s,
            Map("amt" -> (col("amt") + 1000.0)))
          model = model.map(r => if (r._2 == s) (r._1, r._2, r._3 + 1000.0) else r)
          v
        case 5 | 6 => // clause MERGE: update-all matched, insert-all new
          val existing = rnd.shuffle(model.map(_._1)).take(rnd.nextInt(4))
          val fresh = batch(rnd.nextInt(3))
          val srcRows: Seq[R] =
            existing.map(k => (k, "M", 5000.0 + k)) ++ fresh
          if (srcRows.isEmpty) -1L
          else {
            val v = Merge.into(spark, t, df(srcRows), keys = Seq("k"))
              .whenMatchedUpdateAll()
              .whenNotMatchedInsertAll()
              .execute()
            val srcMap = srcRows.map(r => r._1 -> r).toMap
            model = model.map(r => srcMap.getOrElse(r._1, r)) ++
              srcRows.filterNot(s => model.exists(_._1 == s._1))
            v
          }
        case 7 => // OPTIMIZE (also purges any DVs); data must not change
          DeltaLog.optimize(spark, t)
        case 8 => // OPTIMIZE ZORDER BY the key
          DeltaLog.optimize(spark, t, zorderBy = Seq("k"))
        case 9 => // checkpoint: replay shortcut, zero data change
          DeltaLog.checkpoint(spark, t)
        case 10 => // log compaction over the whole current range
          val latest = DeltaLog.latestVersion(spark, t).getOrElse(0L)
          if (latest >= 1) DeltaLog.compactLog(spark, t, 0L, latest)
          -1L
        case 11 => // RESTORE to a random earlier recorded version
          if (versionModels.size < 2) -1L
          else {
            val candidates = versionModels.keys.toVector.init
            val target = candidates(rnd.nextInt(candidates.size))
            val v = DeltaLog.restore(spark, t, target)
            model = versionModels(target)
            v
          }
      }
      if (committed >= 0) versionModels(committed) = model
      check(s"step $step op $op")
    }

    // time travel: a sample of recorded versions reads back each one's
    // recorded model (restore preserved history; nothing was vacuumed)
    val recorded = versionModels.toVector
    val sample = rnd.shuffle(recorded).take(6) :+ recorded.last
    sample.foreach { case (ver, m) =>
      val got = DeltaLog.read(spark, t, versionAsOf = Some(ver))
        .select("k", "seg", "amt").as[R].collect().toVector.sorted
      assert(got == m.sorted,
        s"time travel to v$ver diverged (seed=$seed partitioned=$partitioned)")
    }

    // the fuzzed clone never wrote through to its source
    if (cloneFirst) {
      val srcGot = DeltaLog.read(spark, src).select("k", "seg", "amt")
        .as[R].collect().toVector.sorted
      assert(srcGot == rows0.toVector.sorted,
        s"clone fuzz mutated the SOURCE table (seed=$seed)")
      assert(DeltaLog.latestVersion(spark, src).contains(0L),
        s"clone fuzz committed to the SOURCE log (seed=$seed)")
    }
  }

  test("seeded mixed-op fuzz vs model: unpartitioned") { run(101, partitioned = false) }
  test("seeded mixed-op fuzz vs model: partitioned by seg") { run(202, partitioned = true) }
  test("seeded mixed-op fuzz on a SHALLOW CLONE: source stays untouched") {
    run(303, partitioned = false, cloneFirst = true)
  }
}
