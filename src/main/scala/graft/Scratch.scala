package graft
import org.apache.spark.sql.SparkSession
/** Throwaway environment probe (kept minimal between uses). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"entry rows = ${SparkEntry.entry(spark).count()}")
    spark.stop()
  }
}
