package graft
import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: `SparkEntry.entry` must return >0
  * rows on sf0.001. Exit 0 iff it does. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE entry rows=$n cols=${df.columns.mkString(",")}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
