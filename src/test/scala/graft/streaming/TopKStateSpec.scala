package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import TopKState._

/** SpaceSaving invariants against exact counts computed in plain Scala:
  * no under-estimation, bounded over-estimation, no false negatives
  * above the n/Capacity support threshold, exactness below capacity. */
class TopKStateSpec extends SparkSpec {

  /** A skewed synthetic stream: item i appears with frequency ~ 1/i. */
  private def zipfish(n: Int): Seq[String] =
    (1 to n).map { i =>
      var x = i; var item = 1
      while (x % 2 == 0 && item < 20) { x /= 2; item += 1 }
      s"it$item"
    }

  test("pure core: count sandwich and threshold guarantee on a skewed stream") {
    val items = zipfish(4000)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tab = items.foldLeft(Tab(Nil, 0L, 0L))((t, it) => add(t, it))
    assert(tab.counters.length <= Capacity, "state budget is hard")
    assert(tab.n == 4000)
    // sandwich: true <= count <= true + err for every tracked item
    tab.counters.foreach { c =>
      val t = exact.getOrElse(c.item, 0L)
      assert(c.count >= t && c.count <= t + c.err, s"$c vs true=$t")
    }
    // threshold: every item with true count > n/Capacity is tracked
    val thresh = tab.n / Capacity
    exact.filter(_._2 > thresh).keys.foreach { hot =>
      assert(tab.counters.exists(_.item == hot), s"heavy item $hot evicted")
    }
  }

  test("pure core: exact counts when distinct items fit the capacity") {
    val items = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(5)("c")
    val tab = scala.util.Random.shuffle(items).foldLeft(Tab(Nil, 0L, 0L))(
      (t, it) => add(t, it))
    val got = tab.counters.map(c => c.item -> (c.count, c.err)).toMap
    assert(got == Map("a" -> (50L, 0L), "b" -> (30L, 0L), "c" -> (5L, 0L)))
  }

  test("pure core: deterministic eviction — same stream, same table") {
    val items = zipfish(2000) ++ (1 to 40).map(i => s"rare$i")
    val t1 = items.foldLeft(Tab(Nil, 0L, 0L))((t, it) => add(t, it))
    val t2 = items.foldLeft(Tab(Nil, 0L, 0L))((t, it) => add(t, it))
    assert(t1.counters.sortBy(_.item) == t2.counters.sortBy(_.item))
  }

  test("streaming: running top-K per key accumulates across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[In]
    val q = TopKState(input.toDS())
      .writeStream.format("memory").queryName("topk_run")
      .outputMode("update").start()
    try {
      input.addData(
        (Seq.fill(20)("x") ++ Seq.fill(5)("y") ++ Seq.fill(2)("z"))
          .map(In("k1", _)) ++ Seq.fill(7)(In("k2", "w")): _*)
      q.processAllAvailable()
      input.addData(
        (Seq.fill(10)("y") ++ Seq.fill(1)("x")).map(In("k1", _)): _*)
      q.processAllAvailable()
      val rows = s.table("topk_run").as[Out].collect()
      val k1b2 = rows.filter(r => r.key == "k1" && r.batches == 2L)
        .sortBy(_.rank).map(r => (r.item, r.count)).toSeq
      // after both batches: x=21, y=15, z=2 — few distinct, so exact
      assert(k1b2 == Seq(("x", 21L), ("y", 15L), ("z", 2L)))
      assert(rows.filter(r => r.key == "k1" && r.batches == 2L)
        .forall(_.n == 38L))
      val k2 = rows.filter(r => r.key == "k2" && r.batches == 1L)
      assert(k2.map(r => (r.item, r.count)).toSeq == Seq(("w", 7L)))
    } finally q.stop()
  }
}
