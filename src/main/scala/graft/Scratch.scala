package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.RollingState
/** Throwaway environment probe (kept minimal between uses). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    // live rate source → per-record rolling sum → memory sink
    val src = spark.readStream.format("rate").option("rowsPerSecond", 50).load()
      .select(concat(lit("u"), col("value") % 5).as("key"),
        (col("value") % 100).cast("double").as("value"), col("value").as("seq"))
      .as[RollingState.KV]
    val q = RollingState(src).writeStream.format("memory")
      .queryName("live_roll").outputMode("append").start()
    Thread.sleep(6000); q.processAllAvailable()
    val t = spark.table("live_roll")
    println(s"live_roll rows = ${t.count()}  (one per input record)")
    t.orderBy("key", "seq").show(6)
    // per-record property: n increments by 1 within each key
    val bad = t.selectExpr("key", "n", "lag(n, 1) OVER (PARTITION BY key ORDER BY seq) AS p")
      .where("p IS NOT NULL AND n <> p + 1").count()
    println(s"monotonic-n violations = $bad")
    q.stop(); spark.stop()
  }
}
