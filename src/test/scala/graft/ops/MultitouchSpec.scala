package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** multitouch_attribution: the bucketed equi-join form must equal the
  * naive per-user range join, and each purchase's credits must sum back
  * to its value (the linear-attribution conservation law). */
class MultitouchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("pairs equal the naive range join; credits conserve purchase value") {
    val s = spark
    import s.implicits._
    val rows = EnrichJoin.multitouchAttribution(s, dir)
      .select("purchase_id", "touch_id", "n_touches", "credit")
      .as[(Long, Long, Long, Double)].collect().toVector
    assert(rows.nonEmpty)

    // naive reference: collect events, per purchase scan its user's touches
    val evs = graft.Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[(Long, Long, String, Long, Double)].collect()
    val horizon = 3600000000L
    val byUser = evs.groupBy(_._2)
    val want = evs.filter(_._3 == "purchase").flatMap { case (pid, uid, _, pts, _) =>
      byUser(uid).filter(t => (t._3 == "view" || t._3 == "click") &&
        t._4 < pts && t._4 >= pts - horizon)
        .map(t => (pid, t._1))
    }.toSet
    assert(rows.map(r => (r._1, r._2)).toSet == want)

    // conservation: per purchase, n_touches consistent and sum(credit)
    // equals dec2(value) up to double-sum association noise
    val values = evs.filter(_._3 == "purchase").map(e => e._1 -> e._5).toMap
    rows.groupBy(_._1).foreach { case (pid, rs) =>
      assert(rs.forall(_._3 == rs.length))
      val total = rs.map(_._4).sum
      val expect = BigDecimal(values(pid)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      assert(math.abs(total - expect.toDouble) < 1e-6,
        s"purchase $pid: credits $total != value $expect")
    }
  }
}
