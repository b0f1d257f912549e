package graft.agg

import graft.SparkSpec
import Aggregators._

/** W12 Aggregator family driven through real groupByKey aggregations. */
class AggregatorsSpec extends SparkSpec {

  test("NullCoalescingLast: newest non-null wins per field (StateTest:683-698)") {
    val s = spark
    import s.implicits._
    val parts = Seq(
      ("JD1", Partial(1, Some("siteA"), None, None)),
      ("JD1", Partial(2, None, Some("busi7"), None)),
      ("JD1", Partial(3, Some("siteB"), None, Some("pay1"))),
      ("JD2", Partial(1, None, Some("busi9"), None))).toDS()
    val byKey = parts.groupByKey(_._1).mapValues(_._2)
      .agg(new NullCoalescingLast().toColumn)
      .collect().toMap
    assert(byKey("JD1") == Merged(Some("siteB"), Some("busi7"), Some("pay1")))
    assert(byKey("JD2") == Merged(None, Some("busi9"), None))
  }

  test("SumWithDetail: (sum, sorted history) like ProductIncome.detail") {
    val s = spark
    import s.implicits._
    val out = Seq(("A", 5L), ("A", 3L), ("B", 7L), ("A", 9L)).toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(new SumWithDetail().toColumn)
      .collect().toMap
    assert(out("A") == SumDetailBuf(17L, Seq(3L, 5L, 9L)))
    assert(out("B") == SumDetailBuf(7L, Seq(7L)))
  }

  test("RevenueDecimal: exact BigDecimal income x sale (StateTest:602-621)") {
    val s = spark
    import s.implicits._
    def d(x: String) = new java.math.BigDecimal(x)
    val out = Seq(
      ("cat1", DecPair(d("100"), d("0.75"))),
      ("cat1", DecPair(d("200"), d("0.50"))),
      ("cat2", DecPair(d("999"), d("0.99")))).toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(new RevenueDecimal().toColumn)
      .collect().toMap
    assert(out("cat1").compareTo(d("175.00")) == 0)
    assert(out("cat2").compareTo(d("989.01")) == 0)
  }
}
