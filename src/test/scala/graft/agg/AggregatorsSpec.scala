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

  test("TopK keeps the k largest per group across partitions") {
    val s = spark
    import s.implicits._
    val out = s.range(1000).map(i => (s"g${i % 3}", i))
      .groupByKey(_._1).mapValues(_._2: Long)
      .agg(new TopK(4).toColumn)
      .collect().toMap
    assert(out("g0") == Seq(999L, 996L, 993L, 990L))
    assert(out("g1") == Seq(997L, 994L, 991L, 988L))
  }

  test("HeavyHitters finds the dominant items within the Misra-Gries bound") {
    val s = spark
    import s.implicits._
    // 600x 'hot', 300x 'warm', 100 singletons
    val items = (Seq.fill(600)("hot") ++ Seq.fill(300)("warm") ++
      (0 until 100).map(i => s"rare$i"))
    val out = items.toDS().repartition(8)
      .groupByKey(_ => "all").mapValues(identity)
      .agg(new HeavyHitters(8).toColumn)
      .collect().head._2
    assert(out.contains("hot") && out.contains("warm"))
    // undercount bound: estimate >= true - n/capacity = 600 - 125
    assert(out("hot") >= 600 - 1000 / 8)
    assert(out("hot") <= 600)
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
