package graft.plans
object PdiDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("pdidbg").toString
    (0 until 96).map(i => (i.toLong, f"2024-02-${1 + i / 24}%02dT${i % 24}%02d:30:00"))
      .toDF("id", "ts_s")
      .select(col("id"), col("ts_s").cast("timestamp").as("ts"))
      .withColumn("ts_date", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("ts_date").parquet(dir)
    graft.storage.Layout.markUtcDays(spark, dir)
    val eq = spark.read.parquet(dir)
      .filter(to_date(col("ts")) === lit("2024-02-03").cast("date"))
    println("OPTIMIZED:\n" + eq.queryExecution.optimizedPlan.toString)
    spark.stop()
  }
}
