package graft
import org.apache.spark.sql.SparkSession
/** Throwaway environment probe (kept minimal between uses).
  * Usage: runMain graft.Scratch <sfDir> <query>... — times each named
  * SparkEntry query with the same warm-up + clearCache protocol as Bench. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("word_count")
    names.foreach { n =>
      val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
        if (n == "entry") (sp, _) => SparkEntry.entry(sp)
        else SparkEntry.queries(n)
      fn(spark, sfDir).count(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(f"TIMING $n%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$rows")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
