package graft

import java.nio.file.Files

import graft.sources.{DeltaLog, GraftSql}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DDL × DML fuzz: seeded random interleavings of schema evolution
  * (ADD / RENAME / DROP COLUMN on a column-mapped table; type widening
  * on an unmapped one) with appends, updates, and deletes, checked
  * after every op against a driver-side model that tracks BOTH the rows
  * and the evolving schema. Values compare through a canonical string
  * form so an int that widened to long still equals its model value.
  * This targets the seam the single-verb DDL specs cannot: data written
  * under one schema generation read back through a later one.
  */
class DdlFuzzSpec extends SparkSpec {

  private def canon(v: Any): String = v match {
    case null => "∅"
    case b: Byte => b.toLong.toString
    case s: Short => s.toLong.toString
    case i: Int => i.toLong.toString
    case l: Long => l.toString
    case f: Float => f.toDouble.toString
    case d: Double => d.toString
    case other => other.toString
  }

  /** Read the table back as canonical (sorted) row maps. */
  private def observe(t: String): Vector[Map[String, String]] = {
    val df = DeltaLog.read(spark, t)
    val names = df.schema.fieldNames
    df.collect().toVector
      .map(r => names.zipWithIndex.map { case (n, i) => n -> canon(r.get(i)) }.toMap)
  }

  private def assertSame(t: String, model: Vector[Map[String, String]],
      ctx: String): Unit = {
    val got = observe(t).sortBy(_.toSeq.sorted.mkString("|"))
    val want = model.sortBy(_.toSeq.sorted.mkString("|"))
    assert(got == want, s"$ctx diverged:\n got=${got.take(3)}\nwant=${want.take(3)}")
  }

  test("column-mapped table: ADD/RENAME/DROP interleaved with DML vs model") {
    val rnd = new scala.util.Random(7001)
    val t = Files.createTempDirectory("graft-ddlfuzz-").toString + "/t"
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (k BIGINT, seg STRING, amt DOUBLE)
         |TBLPROPERTIES ('delta.columnMapping.mode'='name')""".stripMargin)

    // schema model: ordered (name, sparkType); row model: canonical maps
    var schema: Vector[(String, DataType)] =
      Vector("k" -> LongType, "seg" -> StringType, "amt" -> DoubleType)
    var model: Vector[Map[String, String]] = Vector.empty
    var nextKey = 0L
    var nextCol = 0

    def typedValue(dt: DataType, k: Long): Any = dt match {
      case LongType => k * 10
      case StringType => s"s$k"
      case DoubleType => k + 0.5
      case other => sys.error(s"unexpected $other")
    }
    def appendRows(n: Int): Unit = {
      val rows = (1 to n).map { _ =>
        nextKey += 1
        Row.fromSeq(schema.map {
          case ("k", _) => nextKey
          case (_, dt) => typedValue(dt, nextKey)
        })
      }
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(schema.map { case (n2, dt) => StructField(n2, dt) }))
      DeltaLog.write(spark, df, t, mode = "append")
      model = model ++ rows.map(r =>
        schema.map(_._1).zipWithIndex.map { case (n2, i) => n2 -> canon(r.get(i)) }.toMap)
    }

    appendRows(6)
    for (step <- 1 to 22) {
      val op = rnd.nextInt(8)
      op match {
        case 0 | 1 => appendRows(1 + rnd.nextInt(4))
        case 2 => // ADD COLUMN (old rows read back null)
          nextCol += 1
          val name = s"a$nextCol"
          val dt = Vector(StringType, LongType, DoubleType)(nextCol % 3)
          DeltaLog.alterAddColumns(spark, t, StructType(Seq(StructField(name, dt))))
          schema = schema :+ (name -> dt)
          model = model.map(_ + (name -> canon(null)))
        case 3 => // RENAME a non-key column
          val idx = 1 + rnd.nextInt(schema.size - 1)
          val (from, dt) = schema(idx)
          nextCol += 1
          val to = s"r$nextCol"
          DeltaLog.alterRenameColumn(spark, t, from, to)
          schema = schema.updated(idx, to -> dt)
          model = model.map(m => (m - from) + (to -> m(from)))
        case 4 => // DROP a non-key column (keep at least two columns)
          if (schema.size > 2) {
            val idx = 1 + rnd.nextInt(schema.size - 1)
            val name = schema(idx)._1
            DeltaLog.alterDropColumn(spark, t, name)
            schema = schema.patch(idx, Nil, 1)
            model = model.map(_ - name)
          }
        case 5 => // UPDATE a random non-key column where k % 3 == 0
          val (name, dt) = schema(1 + rnd.nextInt(schema.size - 1))
          val v: Any = dt match {
            case StringType => "upd"
            case LongType => 7777L
            case DoubleType => 1234.5
            case other => sys.error(s"unexpected $other")
          }
          DeltaLog.updateWhere(spark, t, col("k") % 3 === 0,
            Map(name -> lit(v)))
          model = model.map(m =>
            if (m("k").toLong % 3 == 0) m + (name -> canon(v)) else m)
        case 6 => // DELETE where k % 4 == 1
          DeltaLog.deleteWhere(spark, t, col("k") % 4 === 1)
          model = model.filterNot(_("k").toLong % 4 == 1)
        case 7 => DeltaLog.checkpoint(spark, t)
      }
      assert(observe(t).headOption.forall(_.keySet == schema.map(_._1).toSet))
      assertSame(t, model, s"step $step op $op")
    }
  }

  test("type widening interleaved with DML vs model") {
    val rnd = new scala.util.Random(7002)
    val t = Files.createTempDirectory("graft-widfuzz-").toString + "/t"
    GraftSql.exec(spark,
      s"""CREATE TABLE delta.`$t` (k BIGINT, v INT, f FLOAT)
         |TBLPROPERTIES ('delta.enableTypeWidening'='true')""".stripMargin)

    var vType: DataType = IntegerType
    var fType: DataType = FloatType
    var model: Vector[Map[String, String]] = Vector.empty
    var nextKey = 0L

    def appendRows(n: Int): Unit = {
      val rows = (1 to n).map { _ =>
        nextKey += 1
        val vv: Any = vType match {
          case IntegerType => nextKey.toInt * 3
          case LongType => nextKey * 3
          case _ => nextKey.toDouble * 3
        }
        val fv: Any = fType match {
          case FloatType => nextKey.toFloat
          case _ => nextKey.toDouble
        }
        Row(nextKey, vv, fv)
      }
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField("k", LongType),
          StructField("v", vType), StructField("f", fType))))
      DeltaLog.write(spark, df, t, mode = "append")
      model = model ++ rows.map(r => Map(
        "k" -> canon(r.get(0)), "v" -> canon(r.get(1)), "f" -> canon(r.get(2))))
    }

    appendRows(5)
    for (step <- 1 to 18) {
      rnd.nextInt(7) match {
        case 0 | 1 => appendRows(1 + rnd.nextInt(4))
        case 2 => // widen v: int -> long (first hit only)
          if (vType == IntegerType) { DeltaLog.alterColumnType(spark, t, "v", LongType); vType = LongType }
        case 3 => // widen f: float -> double (first hit only)
          if (fType == FloatType) { DeltaLog.alterColumnType(spark, t, "f", DoubleType); fType = DoubleType }
        case 4 => // UPDATE v where k even — literal typed at the CURRENT type
          val v: Any = if (vType == IntegerType) 999 else 999L
          DeltaLog.updateWhere(spark, t, col("k") % 2 === 0, Map("v" -> lit(v)))
          model = model.map(m =>
            if (m("k").toLong % 2 == 0) m + ("v" -> canon(v)) else m)
        case 5 => // DELETE where k % 5 == 2
          DeltaLog.deleteWhere(spark, t, col("k") % 5 === 2)
          model = model.filterNot(_("k").toLong % 5 == 2)
        case 6 => DeltaLog.checkpoint(spark, t)
      }
      assertSame(t, model, s"widen step $step")
    }
    // both widenings must have occurred by now for the test to mean much
    assert(vType == LongType && fType == DoubleType,
      "fuzz sequence never exercised a widening — adjust the seed")
  }
}
