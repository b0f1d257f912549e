package graft
import org.apache.spark.sql.SparkSession
/** Throwaway environment probe (removed once answered). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Driver smoke path: entry must return rows > 0 on sf0.001.
    val df = SparkEntry.entry(spark)
    println(s"entry rows = ${df.count()}")
    df.show(3, false)
    spark.stop()
  }
}
