package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** source_divergence: the engine-side KL must equal a from-scratch
  * Scala recompute of the same quantized formula, and stay within
  * quantization distance of non-negativity (true KL ≥ 0; micro-nat
  * rounding can dip a near-identical source slightly below). */
class SourceDivergenceSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("KL equals scratch recompute; near-non-negative; token totals reconcile") {
    val s = spark
    import s.implicits._
    val got = TextAnalysis.sourceDivergence(s, dir)
      .as[(String, Long, Double)].collect().toVector
    assert(got.nonEmpty)

    val toks = graft.Tables.documents(s, dir)
      .select(col("source"), explode(expr(Prims.wordsExpr)).as("w"))
      .as[(String, String)].collect()
    val vocab = toks.groupBy(_._2).view.mapValues(_.size).toVector
      .sortBy { case (w, c) => (-c, w) }.take(20).map(_._1).toSet
    def bucket(w: String) = if (vocab.contains(w)) w else "OOV"
    val buckets = vocab.toVector.sorted :+ "OOV"
    val byScb = toks.groupBy(t => (t._1, bucket(t._2))).view.mapValues(_.size.toLong).toMap
    val corpC = toks.groupBy(t => bucket(t._2)).view.mapValues(_.size.toLong).toMap
    val ctot = toks.size.toLong
    def mn(num: Long, den: Long) = math.round(math.log(num.toDouble / den) * 1e6)

    got.foreach { case (src, nTok, kl) =>
      val tok = byScb.collect { case ((`src`, _), c) => c }.sum
      assert(nTok == tok)
      val num = buckets.map { b =>
        val cnt = byScb.getOrElse((src, b), 0L)
        (cnt + 1) * (mn(cnt + 1, tok + 21) - mn(corpC.getOrElse(b, 0L) + 1, ctot + 21))
      }.sum
      val want = num.toDouble / (tok + 21)
      assert(kl == want, s"$src: $kl != $want")
      assert(kl >= -1.0, s"$src dips below quantization floor: $kl")
    }
  }
}
