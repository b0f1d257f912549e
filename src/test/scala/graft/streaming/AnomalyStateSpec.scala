package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import AnomalyState._

/** Welford anomaly detector: the running statistics must equal exact
  * two-pass moments, a planted spike must flag (and ONLY it), the warmup
  * gate must suppress early verdicts, and cross-batch state continuation
  * must equal the single-batch run. */
class AnomalyStateSpec extends SparkSpec {

  test("pure core: Welford equals two-pass moments") {
    val xs = Vector.tabulate(1000)(i => math.sin(i * 0.7) * 5 + 100 + (i % 7))
    val st = xs.foldLeft(Stats(0, 0, 0))(fold)
    val mean = xs.sum / xs.size
    val m2 = xs.map(x => (x - mean) * (x - mean)).sum
    assert(st.n == xs.size)
    assert(math.abs(st.mean - mean) < 1e-9)
    assert(math.abs(st.m2 - m2) < 1e-6 * m2)
  }

  test("pure core: spike flags, baseline noise does not, warmup suppresses") {
    // 50 noisy-but-bounded values, then a 10-sigma spike
    val base = Vector.tabulate(50)(i => 10.0 + (i % 5) - 2) // values in [8, 12]
    var st = Stats(0, 0, 0)
    val verdicts = (base :+ 60.0).map { x =>
      val (_, anom) = score(st, x)
      st = fold(st, x)
      anom
    }
    assert(verdicts.last, "the spike must flag")
    assert(!verdicts.init.exists(identity), "no baseline value may flag")
    // warmup: fewer than MinN priors can never flag, however extreme
    var st2 = Stats(0, 0, 0)
    val early = Vector(1.0, 1.0, 1.0, 1e9).map { x =>
      val (_, anom) = score(st2, x); st2 = fold(st2, x); anom
    }
    assert(!early.exists(identity))
  }

  test("streaming: cross-batch continuation equals one-shot; spike caught live") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val series = Vector.tabulate(40)(i => In("m", i.toLong, 50.0 + (i % 9))) :+
      In("m", 40L, 500.0)

    def run(chunks: Seq[Seq[In]], name: String): Vector[Out] = {
      val input = MemoryStream[In]
      val q = AnomalyState(input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
        s.table(name).as[Out].collect().toVector.sortBy(_.seq)
      } finally q.stop()
    }
    val oneShot = run(Seq(series), "anom_one")
    val chunked = run(series.grouped(7).toSeq, "anom_chunked")
    assert(oneShot == chunked, "batch boundaries must not change verdicts")
    assert(oneShot.last.isAnomaly && oneShot.count(_.isAnomaly) == 1)
    assert(oneShot.last.nPrior == 40L)
  }
}
