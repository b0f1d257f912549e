package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Synth
import graft.streaming.EnrichState
/** Throwaway environment probe (removed once answered): live streaming
  * pipeline rate → synth generators → enrichment state machine → console. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    // live rate source → two generated streams → Either-tagged union
    val counter = Synth.rateCounter(spark, rowsPerSecond = 20, numPartitions = 2)
    val cems = Synth.waybillC(counter).select(
      col("waybillCode"), (col("timeStamp") * 10).as("seq"),
      struct(col("waybillCode"), col("waybillSign"), col("siteCode"),
        col("siteName"), lit("9").as("busiNo"), lit("m").as("busiName"),
        lit("p").as("sendPay"),
        lit(null).cast("long").as("pickupTs"), lit(null).cast("long").as("deliveryTs")).as("cem"),
      lit(null).cast("struct<waybillCode:string,packageCode:string,staticDeliveryTs:bigint>").as("link"))
    val links = Synth.waybillRouteLink(counter).select(
      col("waybillCode"),
      (col("staticDeliveryTs") % 100000 + 1000000).as("seq"),
      lit(null).cast(cems.schema("cem").dataType.sql).as("cem"),
      struct(col("waybillCode"), col("packageCode"), col("staticDeliveryTs")).as("link"))
    val union = cems.unionByName(links).as[EnrichState.In]

    val q = EnrichState(union)
      .writeStream.format("memory").queryName("live_enrich")
      .outputMode("append").start()
    Thread.sleep(8000)
    q.processAllAvailable()
    val n = spark.table("live_enrich").count()
    println(s"live_enrich rows = $n")
    spark.table("live_enrich").orderBy("waybillCode", "packageCode").show(8, false)
    val perWaybill = spark.table("live_enrich")
      .groupBy("waybillCode").count().orderBy("waybillCode")
    println("per-waybill output counts (expect 6 = 1 bare CEM + 5 links, or 5 if links flushed on CEM):")
    perWaybill.show(5)
    q.stop()
    spark.stop()
  }
}
