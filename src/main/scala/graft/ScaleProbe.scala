package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-up probe: replicate the sf0.1 testdata 10× (with
  * shifted keys, into /tmp) and compare operator runtimes against the
  * sf0.1 numbers — the "would this survive 10×?" check the 100 TB
  * contract asks for. Near-linear growth (≈10×) means the plan has no
  * super-linear term; anything quadratic shows up immediately. */
object ScaleProbe {

  /** `density` mode: pin the dedup tail's "work ∝ collisions" claim on a
    * hostile distribution. Three corpora at IDENTICAL volume (10× docs)
    * whose only difference is the near-dup density: a doc_id-hash share
    * (1/8, 2/8, 4/8) of documents keeps all 10 copies content-identical
    * (a dup group → C(10,2)=45 true pairs each); every other copy has
    * each token salted with its copy index, which changes every shingle
    * so it collides with nothing. Volume constant + density doubling ⇒
    * if candidate work is bucket-local, wall-time follows PAIR COUNT,
    * not volume². A quadratic all-pairs term would show as time growing
    * faster than the pair count between corpora. */
  private def densityProbe(spark: SparkSession, src: String, queries: Seq[String]): Unit = {
    val mult = 10
    val shares = Seq(1, 2, 4) // of 8: 12.5% / 25% / 50% dup-group docs
    def corpusDir(m: Int) = s"/tmp/graft_density_$m"
    shares.foreach { m =>
      val dir = corpusDir(m)
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        val base = spark.read.parquet(s"$src/documents.parquet")
        val copies = spark.range(mult).select(col("id").as("copy"))
        base.crossJoin(copies)
          .withColumn("text",
            when(col("copy") === 0 || pmod(col("doc_id"), lit(8)) < m, col("text"))
              .otherwise(concat_ws(" ",
                expr("transform(split(text, ' '), w -> concat(w, '_', copy))"))))
          .withColumn("doc_id", col("doc_id") + col("copy") * 1000000L)
          .drop("copy")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
    }
    println(f"${"query"}%-20s ${"share"}%6s ${"pairs"}%10s ${"sec"}%8s ${"sec/Kpair"}%10s")
    queries.foreach { n =>
      val fn = SparkEntry.queries(n)
      shares.foreach { m =>
        val dir = corpusDir(m)
        fn(spark, dir).count() // warm
        HarnessUtil.releaseAll(spark)
        val t0 = System.nanoTime()
        val pairs = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        HarnessUtil.releaseAll(spark)
        println(f"$n%-20s ${s"$m/8"}%6s $pairs%10d $sec%8.2f ${sec * 1000 / math.max(pairs, 1)}%10.3f")
      }
    }
  }

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
    if (args.headOption.contains("density")) {
      val qs = if (args.length > 1) args.drop(1).toSeq
        else Seq("dedup_near_minhash", "ngram_jaccard")
      densityProbe(spark, src, qs)
      spark.stop(); return
    }
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
