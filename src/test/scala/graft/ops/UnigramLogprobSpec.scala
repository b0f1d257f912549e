package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** unigram_logprob: the narrow map-literal scoring pass must agree with an
  * independent explode+join recompute, and every per-token surprisal must
  * sit inside the [most-frequent-vocab-word, OOV-floor] band. */
class UnigramLogprobSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("map-literal scoring equals an explode+join recompute") {
    val s = spark
    import s.implicits._
    val got = TextAnalysis.unigramLogprob(s, dir)
      .select("doc_id", "n_tok", "surprisal_mnats")
      .as[(Long, Long, Long)].collect().toVector

    // independent path: explode tokens, rebuild the same LM via SQL-side
    // aggregation, left-join, per-doc sum
    val toks = graft.Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr(Prims.wordsExpr)).as("w")).cache()
    val counts = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt")).as[Long].head()
    val vocab = counts.orderBy(col("cnt").desc, col("w")).limit(20)
      .collect().map(r => r.getString(0) ->
        math.round(math.log(r.getLong(1).toDouble / total) * 1e6)).toMap
    val floorM = math.round(math.log(0.5 / total) * 1e6)
    val vocabDf = vocab.toSeq.toDF("w", "mn")
    val want = toks.join(broadcast(vocabDf), Seq("w"), "left")
      .na.fill(Map("mn" -> floorM))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), (-sum("mn")).as("surprisal_mnats"))
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toVector
    toks.unpersist()

    assert(got.nonEmpty && got == want)
  }

  test("per-token mean sits inside the [best-vocab, OOV-floor] surprisal band") {
    val s = spark
    import s.implicits._
    val rows = TextAnalysis.unigramLogprob(s, dir)
      .select("mean_mnats").as[Double].collect()
    // best possible: most frequent word's surprisal; worst: the OOV floor
    val toks = graft.Tables.documents(s, dir)
      .select(explode(expr(Prims.wordsExpr)).as("w"))
    val counts = toks.groupBy("w").count().as[(String, Long)].collect()
    val total = counts.map(_._2).sum
    val best = -math.round(math.log(counts.map(_._2).max.toDouble / total) * 1e6)
    val floor = -math.round(math.log(0.5 / total) * 1e6)
    assert(rows.forall(m => m >= best - 1 && m <= floor + 1))
  }
}
