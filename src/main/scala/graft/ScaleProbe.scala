package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-up probe: replicate the sf0.1 testdata 10× (with
  * shifted keys, into /tmp) and compare operator runtimes against the
  * sf0.1 numbers — the "would this survive 10×?" check the 100 TB
  * contract asks for. Near-linear growth (≈10×) means the plan has no
  * super-linear term; anything quadratic shows up immediately. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // events.parquet is TIMESTAMP(NANOS): read as long ns (the replica
    // then carries a plain BIGINT ts, which Tables.events handles)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = "/root/testdata/sf0.1"
    val out = "/tmp/graft_sf1_synth"
    val mult = 10

    def replicate(name: String, idCols: Map[String, Long]): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val copies = spark.range(mult).select(col("id").as("copy"))
      var df = base.crossJoin(copies)
      idCols.foreach { case (c, stride) =>
        df = df.withColumn(c, col(c) + col("copy") * stride)
      }
      df.drop("copy").write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    // shift keys so cardinalities scale with volume (10x users, docs, orders)
    val skipGen = new java.io.File(s"$out/region.parquet").exists() // region is written LAST: a partial earlier run regenerates
    if (!skipGen) {
    replicate("events", Map("event_id" -> 10000000L, "user_id" -> 1000L))
    replicate("documents", Map("doc_id" -> 1000000L))
    replicate("embeddings", Map("vec_id" -> 1000000L))
    replicate("lineitem", Map("l_orderkey" -> 10000000L))
    replicate("orders", Map("o_orderkey" -> 10000000L, "o_custkey" -> 1000000L))
    for (t <- Seq("customer", "supplier", "part", "nation", "region"))
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    println("replicated 10x into " + out)

    val probeQueries = if (args.nonEmpty) args.toSeq
      else Seq("group_agg", "rolling_sum", "session_window",
        "sliding_window", "word_count", "enrich_wide_row", "ann_topk",
        "simhash_dedup", "doc_fingerprint", "dedup_exact", "last_nonnull_merge")
    def timeAll(dir: String): Map[String, Double] = probeQueries.map { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, dir).count() // warm
      HarnessUtil.releaseAll(spark)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      HarnessUtil.releaseAll(spark)
      n -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val base = timeAll(src)
    val big = timeAll(out)
    println(f"${"query"}%-20s ${"sf0.1"}%8s ${"10x"}%8s ${"ratio"}%6s")
    probeQueries.foreach { n =>
      println(f"$n%-20s ${base(n)}%8.2f ${big(n)}%8.2f ${big(n) / base(n)}%6.1f")
    }
    spark.stop()
  }
}
