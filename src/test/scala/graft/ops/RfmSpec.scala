package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** rfm_segments: band arithmetic must agree with a driver-side quartile
  * recompute, bands partition customers near-evenly, and the metrics
  * reconcile with the raw orders. */
class RfmSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("bands equal a driver-side rank recompute; metrics reconcile") {
    val s = spark
    import s.implicits._
    val rows = Tpch.rfmSegments(s, dir)
      .select("o_custkey", "recency_days", "frequency", "monetary",
        "r_band", "f_band", "m_band")
      .as[(Long, Long, Long, Double, Long, Long, Long)].collect().toVector
    assert(rows.nonEmpty)
    val n = rows.length

    def bandOf(rank: Int): Long = ((rank.toLong - 1) * 4) / n + 1
    val byRec = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> (4 - (((i.toLong) * 4) / n)) }.toMap
    val byFreq = rows.sortBy(r => (r._3, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> bandOf(i + 1) }.toMap
    val byMon = rows.sortBy(r => (r._4, r._1)).zipWithIndex
      .map { case (r, i) => r._1 -> bandOf(i + 1) }.toMap
    rows.foreach { case (ck, _, _, _, rb, fb, mb) =>
      assert(rb == byRec(ck) && fb == byFreq(ck) && mb == byMon(ck),
        s"band mismatch for customer $ck")
    }
    // quartiles are near-even: each band holds n/4 ± 1 customers
    Seq(rows.map(_._5), rows.map(_._6), rows.map(_._7)).foreach { bands =>
      val sizes = bands.groupBy(identity).values.map(_.size)
      assert(sizes.size == 4 && sizes.forall(sz => math.abs(sz - n / 4) <= 1))
    }
    // frequency reconciles with raw order counts
    val freq = graft.Tables.orders(s, dir).groupBy("o_custkey").count()
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (ck, _, f, _, _, _, _) => assert(f == freq(ck)) }
  }
}
