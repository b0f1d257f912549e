package graft.ops

import graft.{HarnessUtil, SparkSpec}
import org.apache.spark.GraftSparkShim

/** Pins `decontaminateBloom`'s broadcast-lifetime contract (documented
  * on the operator): exactly ONE filter-sized broadcast per
  * construction, destroyed — gone from the BLOCK MANAGER, not merely
  * dequeued — at `releaseAll`, across repeated constructions. The
  * hostile scenario is a harness loop (or per-shard re-planning
  * session) constructing the query many times: without the eager
  * destroy, filter-sized broadcasts stack on driver and executors
  * until GC happens to run. */
class BloomBroadcastLifecycleSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("10 repeated constructions: one tracked broadcast each, none accumulate") {
    val s = spark
    // drain anything a previous suite left tracked, so counts are ours
    HarnessUtil.releaseAll(s)
    val rows = (1 to 10).map { i =>
      val n = PipelineOps.decontaminateBloom(s, dir).count()

      val pending = HarnessUtil.pendingBroadcasts
      assert(pending.size == 1,
        s"construction $i tracked ${pending.size} broadcasts, expected exactly 1 " +
          "(a second filter stacked, or release drained early)")
      val handle = pending.head
      assert(GraftSparkShim.liveBroadcastIds(s.sparkContext).contains(handle.id),
        s"construction $i: tracked broadcast ${handle.id} has no live blocks " +
          "while its query is in flight")

      HarnessUtil.releaseAll(s)
      assert(HarnessUtil.pendingBroadcasts.isEmpty,
        s"construction $i: releaseAll left tracked broadcasts behind")
      // destroy() is synchronous, but give the block manager a moment
      // anyway so a future Spark making removal async doesn't flake this
      val deadline = System.currentTimeMillis + 5000
      while (GraftSparkShim.liveBroadcastIds(s.sparkContext).contains(handle.id)
          && System.currentTimeMillis < deadline)
        Thread.sleep(20)
      assert(!GraftSparkShim.liveBroadcastIds(s.sparkContext).contains(handle.id),
        s"construction $i: broadcast ${handle.id} still has live blocks after release " +
          "- the filter survived its destroy")
      // destroyed means unusable, not just unloaded: re-executing the
      // released plan must be impossible rather than quietly recomputing
      quietly(intercept[org.apache.spark.SparkException](handle.value))
      n
    }
    // the query itself stayed correct across the loop (same survivors)
    assert(rows.distinct.size == 1 && rows.head > 0)
  }
}
