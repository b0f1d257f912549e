package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import SketchState._

/** The streaming HLL keeps a fixed-size register array per key and its
  * running estimate tracks the exact distinct count within the sketch's
  * error envelope — checked against EXACT counts computed in plain
  * Scala, never against another engine's registers. */
class SketchStateSpec extends SparkSpec {

  private val Tol = 0.05 // ~2× the configured rsd (2.3% at P=11)

  test("estimator accuracy across magnitudes, pure core") {
    for (n <- Seq(100, 1000, 50000)) {
      val regs = emptyRegs()
      (0 until n).foreach(i => add(regs, i.toLong * 2654435761L + 17))
      val est = estimate(regs)
      assert(math.abs(est - n) <= math.max(n * Tol, 8),
        s"n=$n est=$est")
    }
  }

  test("pointwise-max merge equals single-pass construction exactly") {
    val all = emptyRegs()
    val a = emptyRegs()
    val b = emptyRegs()
    (0 until 20000).foreach { i =>
      add(all, i.toLong)
      if (i % 2 == 0) add(a, i.toLong) else add(b, i.toLong)
    }
    assert(java.util.Arrays.equals(merge(a, b), all),
      "register union must be exact, not approximate")
    // overlapping halves too (duplicates must not inflate)
    val aOv = emptyRegs(); val bOv = emptyRegs()
    (0 until 20000).foreach { i =>
      if (i < 15000) add(aOv, i.toLong)
      if (i >= 5000) add(bOv, i.toLong)
    }
    assert(java.util.Arrays.equals(merge(aOv, bOv), all))
  }

  test("duplicates never move the estimate") {
    val once = emptyRegs()
    val thrice = emptyRegs()
    (0 until 5000).foreach { i =>
      add(once, i.toLong)
      (1 to 3).foreach(_ => add(thrice, i.toLong))
    }
    assert(java.util.Arrays.equals(once, thrice))
  }

  test("streaming: running per-key estimates track exact counts; state is fixed-size") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[In]
    val q = SketchState(input.toDS())
      .writeStream.format("memory").queryName("sketch_run")
      .outputMode("update").start()
    try {
      // batch 1: key a sees 1..2000, key b sees 1..300
      input.addData((1 to 2000).map(i => In("a", i.toLong)) ++
        (1 to 300).map(i => In("b", i.toLong)): _*)
      q.processAllAvailable()
      // batch 2: a re-sees 1..1000 (dups) + 2001..3000 new; b unchanged dups
      input.addData((1 to 1000).map(i => In("a", i.toLong)) ++
        (2001 to 3000).map(i => In("a", i.toLong)) ++
        (1 to 300).map(i => In("b", i.toLong)): _*)
      q.processAllAvailable()
      val rows = s.table("sketch_run").as[Est].collect()
      def latest(k: String): Est = rows.filter(_.key == k).maxBy(_.seenBatches)
      def batch(k: String, b: Long): Est = rows.find(r => r.key == k && r.seenBatches == b).get
      assert(math.abs(batch("a", 1L).estimate - 2000) <= 2000 * Tol)
      assert(math.abs(latest("a").estimate - 3000) <= 3000 * Tol,
        s"dups must not inflate: ${latest("a")}")
      assert(math.abs(latest("b").estimate - 300) <= math.max(300 * Tol, 8))
      assert(latest("a").seenBatches == 2L && latest("b").seenBatches == 2L)
    } finally q.stop()
  }
}
