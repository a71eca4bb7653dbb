package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.printSchema()
    ev.show(3, truncate = false)
    spark.stop()
  }
}
