package graft
import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's smoke check: runs the flagship
  * `SparkEntry.entry` pipeline (deps → SQL step → journal → merge →
  * flip) and prints the row count.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"SMOKE rows=${df.count()}")
    spark.stop()
  }
}
