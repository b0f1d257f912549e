package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** moving_avg: the windowed trend must equal a driver-side trailing-7
  * recompute over the daily aggregate, warm up correctly (mov_days grows
  * 1..7 then stays 7 on contiguous days), and reconcile with raw order
  * counts. */
class MovingAvgSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("equals a driver-side trailing-window recompute") {
    val s = spark
    import s.implicits._
    val rows = Tpch.movingAvg(s, dir)
      .as[(Long, Long, Double, Double, Long, Double)].collect().toVector
    assert(rows.nonEmpty)
    assert(rows.map(_._1) == rows.map(_._1).sorted)

    val days = rows.map(r => (r._1, BigDecimal(r._3).setScale(2)))
    rows.zipWithIndex.foreach { case ((_, _, _, mov, movDays, movAvg), i) =>
      val frame = days.slice(math.max(0, i - 6), i + 1)
      assert(movDays == frame.length)
      val want = frame.map(_._2).sum
      assert(math.abs(mov - want.toDouble) < 1e-6, s"row $i: $mov != $want")
      assert(movAvg == mov / movDays)
    }
    // order-count reconciliation
    val total = graft.Tables.orders(s, dir).count()
    assert(rows.map(_._2).sum == total)
  }
}
