package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one per test JVM). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same file:// binding as GraftSession.local — specs must exercise
      // the filesystem the bench and verify surfaces run on
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.sources.FastLocalFileSystem].getName)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  protected val spark: SparkSession = SparkSpec.spark
  def sfDir: String = SparkSpec.sfDir

  /** Drop a managed table AND its warehouse location — a previous test
    * JVM may have left the directory behind without catalog metadata. */
  def dropManagedTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$name")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    ()
  }
}
