package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import SessionTopKState._

/** Session-window top-k: the reference's session-merge walkthrough
  * (test/WindowTest.java:205-242, withGap) with a SpaceSaving payload —
  * a bridging event fuses two open sessions AND their sketch tables
  * (TopKState.merge), the fused session fires once on watermark
  * passage with counts accounting for both parents, and the
  * Capacity-counter bound survives the merge. */
class SessionTopKStateSpec extends SparkSpec {

  test("bridging event merges two sessions and their tables; fused session fires once") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(String, String, Long)] // key, item, epochSec
    val evs = input.toDS()
      .select(col("_1").as("key"), col("_2").as("item"),
        timestamp_seconds(col("_3")).as("ts"))
      .withWatermark("ts", "30 seconds")
      .as[In]
    val q = SessionTopKState(evs, gapMs = 10000L)
      .writeStream.format("memory").queryName("sess_topk")
      .outputMode("append").start()
    try {
      def rows() = s.table("sess_topk").as[Out].collect().toVector
      def step(batch: (String, String, Long)*): Unit = {
        input.addData(batch: _*); q.processAllAvailable()
      }

      // S1 = [100, 115): a,a,b
      step(("k", "a", 100L), ("k", "a", 105L), ("k", "b", 105L))
      // S2 = [120, 131): c,c — disjoint from S1 (gap 10 s, 115 ≤ 120)
      step(("k", "c", 120L), ("k", "c", 121L))
      assert(rows().isEmpty, "open sessions must not fire")

      // bridge at 112: reach [112,122) overlaps BOTH → fuse to [100,131)
      // with merged table {a:2, b:2, c:2} (the bridging item is b)
      step(("k", "b", 112L))
      assert(rows().isEmpty, "fused session still open")

      // advance wm to 135 s (> fused end-1 = 130999) → one fused fire
      step(("k", "z", 165L))
      step(("k", "z2", 170L))
      val fired = rows()
      assert(fired.map(o =>
        (o.sessionStart, o.sessionEnd, o.rank, o.item, o.count, o.err, o.n)) ==
        Vector((100000L, 131000L, 1L, "a", 2L, 0L, 6L),
               (100000L, 131000L, 2L, "b", 2L, 0L, 6L),
               (100000L, 131000L, 3L, "c", 2L, 0L, 6L)),
        s"fused session fire mismatch: $fired")
    } finally q.stop()
  }

  test("TopKState.merge: floors absorbed, bound kept, deterministic truncation") {
    import TopKState._
    // full table A (capacity 8, min count 2) and a disjoint 3-item B
    val a = (1 to 8).foldLeft(Tab(Nil, 0L, 0L)) { (t, i) =>
      (1 to (if (i <= 4) 2 else 5)).foldLeft(t)((t2, _) => add(t2, s"a$i"))
    }
    assert(a.counters.length == Capacity && a.counters.map(_.count).min == 2L)
    val b = Seq("b1", "b1", "b2").foldLeft(Tab(Nil, 0L, 0L))((t, it) => add(t, it))

    val m = merge(a, b)
    // bound survives: 10 candidate items truncated back to Capacity
    assert(m.counters.length == Capacity)
    assert(m.n == a.n + b.n)
    // b1 (count 2, not tracked in full A) absorbs A's floor 2 into
    // count AND err — the never-under-estimate invariant
    val b1 = m.counters.find(_.item == "b1").get
    assert(b1.count == 4L && b1.err == 2L, s"floor absorption wrong: $b1")
    // A's high-count items keep exact counts (B is not full → floor 0)
    assert(m.counters.find(_.item == "a5").get == Counter("a5", 5L, 0L))
    // truncation is by (count desc, err asc, item): of the four (2,0)
    // items a1..a4, the two slots left after a5..a8/b1/b2 go to a1, a2
    assert(!m.counters.exists(c => Set("a3", "a4")(c.item)))
    assert(Set("a1", "a2").subsetOf(m.counters.map(_.item).toSet))
    // merge with empty is identity on counter CONTENT (order is the
    // canonical (count desc, err asc, item) truncation order)
    assert(merge(a, Tab(Nil, 0L, 0L)).counters.toSet == a.counters.toSet)
  }
}
