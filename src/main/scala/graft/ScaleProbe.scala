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

  /** `grouprank` mode: pin the grouped-rank skew claim with a frame big
    * enough that the single-task sort actually shows. One dominant group
    * (90% of rows) + 4 small ones, at 1M and 10M rows: the window form
    * (`row_number() OVER (PARTITION BY g ORDER BY ...)`) sorts the
    * dominant group in ONE task, so its time grows with the group; the
    * two-phase `Prims.groupedRowNumber` spreads the same order across
    * the range exchange. Both are timed on identical checkpointed
    * inputs; equality of results is PrimsSpec's job. */
  private def groupRankProbe(spark: SparkSession): Unit = {
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1000000L, 10000000L)) {
      // plain lineage, not checkpointed: releaseAll between runs frees
      // checkpoint blocks, and a range projection regenerates for free —
      // both arms pay the identical narrow generation cost
      val df = spark.range(n).select(
          when(col("id") % 10 === 0, concat(lit("s"), col("id") % 4))
            .otherwise(lit("big")).as("g"),
          (col("id") * 7919 % 104729).as("v"), col("id"))
        .repartition(32)
      def time(label: String)(mk: => DataFrame): Unit = {
        mk.count() // warm
        HarnessUtil.releaseAll(spark)
        val t0 = System.nanoTime()
        mk.count()
        HarnessUtil.releaseAll(spark)
        println(f"grouprank n=$n%-9d $label%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      time("window") {
        df.withColumn("rk", row_number().over(
          Window.partitionBy("g").orderBy("v", "id")).cast("long"))
      }
      time("two-phase") {
        graft.ops.Prims.groupedRowNumber(df, "rk", Seq("g"), col("v"), col("id"))
      }
      // the scale-limiting quantity: the most rows any ONE task must
      // sort. The window form clusters by group (its exchange is
      // hash-by-g), so its max task carries the dominant group; the
      // two-phase range exchange spreads the same order evenly. Wall
      // time above is constant-factor territory at probe scale — THIS
      // number is what turns into the spill/OOM/straggler at 100x.
      def maxTaskRows(exchanged: DataFrame): Long =
        exchanged.groupBy(spark_partition_id().as("p")).count()
          .agg(max("count")).collect()(0).getLong(0)
      val winMax = maxTaskRows(df.repartition(col("g")))
      val tpMax = maxTaskRows(df.repartitionByRange(col("g"), col("v"), col("id")))
      println(f"grouprank n=$n%-9d max-task-rows: window=$winMax%,d two-phase=$tpMax%,d")
      HarnessUtil.releaseAll(spark)
    }
  }

  /** `ivftrain` mode: pin the sampled-training claim — Lloyd training on
    * the fixed-size [[graft.ops.Similarity.trainSample]] must cost the
    * same at 1× and 10× corpus, while full-corpus training grows. Calls
    * the trainer directly (the memoized query path hides training from a
    * second run). */
  private def ivfTrainProbe(spark: SparkSession, src: String, big: String): Unit = {
    import graft.ops.Similarity
    def embOf(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr(Similarity.quantExpr).as("qv"))
    for ((label, dir) <- Seq("sf0.1" -> src, "10x" -> big)) {
      val emb = embOf(dir).localCheckpoint(true)
      def time(kind: String)(train: => Unit): Unit = {
        train // warm (JIT; training itself is uncached)
        val t0 = System.nanoTime()
        train
        println(f"ivftrain $label%-6s $kind%-8s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      time("full")    { Similarity.trainedCentroids(spark, emb); () }
      time("sampled") { Similarity.trainedCentroids(spark, Similarity.trainSample(emb)); () }
      HarnessUtil.releaseAll(spark)
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
    if (args.headOption.contains("grouprank")) {
      groupRankProbe(spark)
      spark.stop(); return
    }
    if (args.headOption.contains("ivftrain")) {
      ivfTrainProbe(spark, src, "/tmp/graft_sf1_synth") // requires a prior 10x replication run
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
