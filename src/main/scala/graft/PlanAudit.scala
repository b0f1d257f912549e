package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected queries so the
  * scale-sanity checks (pushdown, pruning, broadcast, partial agg,
  * codegen spans) are auditable — run after any operator change. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("filter", "group_agg", "enrich_wide_row", "window_join",
               "dedup_near_minhash", "ann_topk", "ann_ivf_topk", "word_count",
               "session_window", "ngram_jaccard", "pipeline_clean",
               "decontaminate", "domain_mix", "corpus_shuffle", "repetition_score")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
