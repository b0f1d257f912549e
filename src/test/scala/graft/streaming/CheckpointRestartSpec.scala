package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** J7 durability for the r11 state machines: the reference's state
  * chapter enables checkpointing in every stateful demo
  * (test/StateTest.java:245,532 — state exists to SURVIVE restarts), so
  * each GroupState machine must produce identical output when the query
  * is killed mid-stream and restarted from its checkpoint.
  *
  * Harness: the same batched input runs twice against a parquet-per-
  * micro-batch foreachBatch sink (idempotent by batchId — the
  * (batchId, overwrite) contract the reference's ES upsert sink relies
  * on): run A uninterrupted, run B stopped after an early batch and
  * restarted from the SAME checkpoint + MemoryStream. Fixtures are
  * designed so the post-restart output is derivable ONLY from state
  * built before the kill (open CEP anchors, attribution touch history,
  * SpaceSaving counter tables, Welford baselines) — equality is
  * therefore a real recovery proof, not a stateless replay. */
class CheckpointRestartSpec extends SparkSpec {

  /** Provider parameterization: the RocksDB twin suite overrides these
    * so the ENTIRE matrix re-runs under
    * RocksDBStateStoreProvider + changelog checkpointing (the state
    * store is a provider choice, not a semantics choice — this is the
    * measured proof). The conf is session-level but read at query START,
    * and suites run sequentially in the forked test JVM, so scoping it
    * beforeAll/afterAll flips exactly this suite's queries. */
  protected def providerConf: Map[String, String] = Map.empty

  /** Proof-hook that the provider actually took effect: the RocksDB twin
    * asserts rocksdb custom metrics on the running query's progress. */
  protected def assertProvider(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = ()

  override def beforeAll(): Unit = {
    super.beforeAll()
    providerConf.foreach { case (k, v) => spark.conf.set(k, v) }
  }
  override def afterAll(): Unit = {
    providerConf.keys.foreach(spark.conf.unset)
    super.afterAll()
  }

  private val M = 1000000L // us per second
  private def ts(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000L))

  /** Run `batches` through `build` with a checkpoint; if `interrupt`,
    * kill the query after `interruptAfter` batches and restart it from
    * the same checkpoint. Returns the union of all micro-batch outputs
    * as canonical JSON rows. */
  private def go[I: Encoder](batches: Seq[Seq[I]], interrupt: Boolean,
      interruptAfter: Int, mode: String)(
      build: Dataset[I] => DataFrame): Set[String] = {
    val s = spark
    implicit val sqlCtx = s.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ckpt_restart").toString
    val input = MemoryStream[I]
    def start() = build(input.toDS()).writeStream
      .outputMode(mode)
      .option("checkpointLocation", s"$base/cp")
      .foreachBatch { (b: DataFrame, id: Long) =>
        b.write.mode("overwrite").parquet(s"$base/out/b$id")
      }
      .start()
    var q = start()
    try {
      batches.zipWithIndex.foreach { case (rows, i) =>
        input.addData(rows: _*)
        q.processAllAvailable()
        if (interrupt && i + 1 == interruptAfter) { q.stop(); q = start() }
      }
      q.processAllAvailable()
      assertProvider(q)
    } finally q.stop()
    s.read.parquet(s"$base/out/b*").toJSON.collect().toSet
  }

  private def bothRuns[I: Encoder](batches: Seq[Seq[I]], interruptAfter: Int,
      mode: String)(build: Dataset[I] => DataFrame): (Set[String], Set[String]) =
    (go(batches, interrupt = false, interruptAfter, mode)(build),
     go(batches, interrupt = true, interruptAfter, mode)(build))

  test("PatternState: open anchors survive a kill; post-restart purchase resolves them") {
    val s = spark
    import s.implicits._
    import PatternState._
    // fixture starts at t=1000 s: the engine's beyond-watermark filter is
    // INCLUSIVE against the initial watermark 0, so a ts(0) row would be
    // dropped before it ever reached the operator
    val batches = Seq(
      // two anchors open; wm reaches 1010 s → both ripe PRE-kill
      Seq(Ev(1, 1, "view", ts(1000 * M)), Ev(2, 1, "view", ts(1010 * M))),
      // purchase resolves BOTH recovered anchors; next view advances wm
      Seq(Ev(3, 1, "purchase", ts(1060 * M)), Ev(4, 1, "view", ts(1100 * M))),
      // flush: ripen event 4 (opens an anchor, never matched)
      Seq(Ev(5, 1, "view", ts(11000 * M))))
    val (a, b) = bothRuns(batches, interruptAfter = 1, "append")(
      ds => PatternState(ds.withWatermark("ts", "0 seconds")).toDF())
    assert(a == b, s"restart diverged:\n A-B=${(a diff b).take(3)}\n B-A=${(b diff a).take(3)}")
    // non-vacuous: both pre-kill anchors matched the post-restart purchase
    val matched = a.filter(_.contains("\"purchaseTsUs\":" + 1060 * M))
    assert(matched.size == 2, s"expected 2 recovered-anchor matches, got $a")
  }

  test("MultiTouchState: touch history survives a kill; post-restart purchase credits it") {
    val s = spark
    import s.implicits._
    import MultiTouchState._
    // same t=1000 s base as above (inclusive watermark-0 filter)
    val batches = Seq(
      // three touches, all ripe by end of batch (wm → 1020 s)
      Seq(Ev(1, 1, "view", ts(1000 * M), 0.0), Ev(2, 1, "click", ts(1010 * M), 0.0),
        Ev(3, 1, "view", ts(1020 * M), 0.0)),
      // purchase splits 100.00 across the three RECOVERED touches
      Seq(Ev(4, 1, "purchase", ts(1030 * M), 100.0),
        Ev(5, 1, "view", ts(1200 * M), 0.0)),
      // flush: ripen event 5
      Seq(Ev(6, 1, "view", ts(21000 * M), 0.0)))
    val (a, b) = bothRuns(batches, interruptAfter = 1, "append")(
      ds => MultiTouchState(ds.withWatermark("ts", "0 seconds")).toDF())
    assert(a == b, s"restart diverged:\n A-B=${(a diff b).take(3)}\n B-A=${(b diff a).take(3)}")
    val credits = a.filter(_.contains("\"purchaseId\":4"))
    assert(credits.size == 3 && credits.forall(_.contains("\"nTouches\":3")),
      s"expected 3-way credit over recovered touches, got $a")
  }

  test("TopKState: SpaceSaving counter tables survive a kill") {
    val s = spark
    import s.implicits._
    import TopKState._
    // batch 1 overfills Capacity=8 (10 distinct, skewed) so the table
    // holds non-zero err entries; batch 2's counts/errs are correct only
    // over the recovered table
    val b1 = (1 to 10).flatMap(i => Seq.fill(11 - i)(In("k", s"w$i")))
    val b2 = Seq.fill(6)(In("k", "w1")) ++ Seq.fill(9)(In("k", "w10")) ++
      Seq.fill(4)(In("k", "fresh"))
    val (a, b) = bothRuns(Seq(b1, b2), interruptAfter = 1, "update")(
      ds => TopKState(ds).toDF())
    assert(a == b, s"restart diverged:\n A-B=${(a diff b).take(3)}\n B-A=${(b diff a).take(3)}")
    // non-vacuous: the batch-2 top-1 count (w1: 10 pre-kill + 6 post) is
    // cumulative across the kill, and the stream total n accumulated
    assert(a.exists(r => r.contains("\"item\":\"w1\"") && r.contains("\"count\":16")),
      s"w1 count not cumulative across restart: $a")
    assert(a.exists(_.contains("\"n\":" + (b1.size + b2.size))), s"n not cumulative: $a")
  }

  test("WindowedTopKState: per-window SpaceSaving tables survive a kill; windows fire post-restart") {
    val s = spark
    import s.implicits._
    import WindowedTopKState._
    // window [0,3000)s gets its whole population BEFORE the kill (skewed
    // so the table carries structure); the watermark only passes window
    // end AFTER the restart, so the fired top-k is derivable solely from
    // the recovered per-window table. ts ≥ 1 s (inclusive wm-0 filter).
    val b1 = (1 to 9).flatMap(i => Seq.fill(10 - i)(In("k", s"w$i", ts(1000000L + i * 100000L))))
    val b2 = Seq(In("k", "drv", ts(3600L * M))) // wm → 3600 s - delay
    val b3 = Seq(In("k", "drv", ts(3700L * M))) // tick: fire [0,3000)s windows
    val (a, b) = bothRuns(Seq(b1, b2, b3), interruptAfter = 1, "append")(
      ds => WindowedTopKState(
        ds.withWatermark("ts", "0 seconds").as[In], sizeMs = 3000000L).toDF())
    assert(a == b, s"restart diverged:\n A-B=${(a diff b).take(3)}\n B-A=${(b diff a).take(3)}")
    // non-vacuous: the fired rank-1 (w1: 9 occurrences, err 0, n=45)
    // exists only if the pre-kill table was recovered
    assert(a.exists(r => r.contains("\"item\":\"w1\"") && r.contains("\"count\":9")
      && r.contains("\"n\":45")), s"recovered window table not fired: $a")
  }

  test("WindowedSketchState: per-window HLL registers survive a kill") {
    val s = spark
    import s.implicits._
    import WindowedSketchState._
    // window [999,1002)s gets 3 distinct items pre-kill; the estimate
    // fires post-restart and is exact only if the registers recovered
    val b1 = Seq(In("k", 10L, ts(1000 * M)), In("k", 11L, ts(1000 * M)),
      In("k", 12L, ts(1001 * M)), In("k", 10L, ts(1001 * M)))
    val b2 = Seq(In("drv", 1L, ts(1010 * M)))
    val b3 = Seq(In("drv", 2L, ts(1011 * M)))
    val (a, b) = bothRuns(Seq(b1, b2, b3), interruptAfter = 1, "append")(
      ds => WindowedSketchState(
        ds.withWatermark("ts", "0 seconds").as[In], sizeMs = 3000L).toDF())
    assert(a == b, s"restart diverged:\n A-B=${(a diff b).take(3)}\n B-A=${(b diff a).take(3)}")
    assert(a.exists(r => r.contains("\"key\":\"k\"") && r.contains("\"estimate\":3")),
      s"recovered window must count 3 distinct exactly: $a")
  }

  test("slidingCarrier: pane buffers survive a kill; the watermark fires them post-restart") {
    val s = spark
    import s.implicits._
    import EventWindowState._
    // all pane state is built in batch 1 with the carrier watermark held
    // BACK (wmTs = 1000 s), so nothing fires pre-kill; batch 2 advances
    // the carrier and the recovered buffers fire. size 4 s, slide 2 s:
    //   v=5 @1001 s → panes 998, 1000;  v=7 @1003 s → panes 1000, 1002
    // expected fires: (998s, 5, 1), (1000s, 12, 2), (1002s, 7, 1)
    val batches = Seq(
      Seq(EvW("k", 5L, ts(1001 * M), ts(1000 * M)),
        EvW("k", 7L, ts(1003 * M), ts(1000 * M))),
      Seq(EvW("drv", 1L, ts(1020 * M), ts(1020 * M))), // carrier → 1020 s
      Seq(EvW("drv", 1L, ts(1021 * M), ts(1021 * M)))) // tick: timers fire
    val (a, b) = bothRuns(batches, interruptAfter = 1, "append")(
      ds => EventWindowState.slidingCarrier(
        ds.withWatermark("wmTs", "0 seconds"), sizeMs = 4000L, slideMs = 2000L).toDF())
    assert(a == b, s"restart diverged:\n A-B=${(a diff b).take(3)}\n B-A=${(b diff a).take(3)}")
    def fired(start: Long) = a.find(r => r.contains("\"key\":\"k\"")
      && r.contains("\"kind\":\"fire\"") && r.contains("\"windowStart\":" + start * M / 1000))
    assert(fired(998).exists(r => r.contains("\"sum\":5") && r.contains("\"count\":1")), s"pane 998: $a")
    assert(fired(1000).exists(r => r.contains("\"sum\":12") && r.contains("\"count\":2")), s"pane 1000: $a")
    assert(fired(1002).exists(r => r.contains("\"sum\":7") && r.contains("\"count\":1")), s"pane 1002: $a")
  }

  test("AnomalyState: Welford baselines survive a kill") {
    val s = spark
    import s.implicits._
    import AnomalyState._
    // 15 baseline points (n ≥ MinN=10), then a post-restart spike whose
    // z-score needs the recovered (n, mean, m2)
    val b1 = (1 to 15).map(i => In("k", i.toLong, 10.0 + 0.1 * (i % 5)))
    val b2 = Seq(In("k", 16L, 10.2), In("k", 17L, 50.0))
    val (a, b) = bothRuns(Seq(b1, b2), interruptAfter = 1, "append")(
      ds => AnomalyState(ds).toDF())
    assert(a == b, s"restart diverged:\n A-B=${(a diff b).take(3)}\n B-A=${(b diff a).take(3)}")
    // non-vacuous: the spike is anomalous against a 16-observation prior
    assert(a.exists(r => r.contains("\"seq\":17") && r.contains("\"nPrior\":16")
      && r.contains("\"isAnomaly\":true")), s"spike not scored on recovered baseline: $a")
  }

  test("WindowedTopKState.lateCarrier: fire, allowed-late re-fire and late split all ride recovered tables") {
    val s = spark
    import s.implicits._
    import WindowedTopKState._
    // the whole [0,10 s) table is built pre-kill with the carrier held
    // back; everything observable — the fire, the allowed-late RE-fire,
    // the late side-output routing — happens post-restart and depends
    // on the recovered (table, pending) window state. size 10 s,
    // lateness 5 s.
    val batches = Seq(
      Seq(InW("k", "x", ts(1 * M), ts(1 * M)), InW("k", "x", ts(2 * M), ts(2 * M)),
        InW("k", "y", ts(3 * M), ts(3 * M))),
      Seq(InW("k", "z", ts(11 * M), ts(12 * M))),  // carrier → 12 s: fires [0,10)
      Seq(InW("k", "x", ts(5 * M), ts(14 * M))),   // allowed-late → re-fire x(3)
      Seq(InW("k", "q", ts(21 * M), ts(21 * M))),  // carrier → 21 s: purge [0,10)
      Seq(InW("k", "y", ts(6 * M), ts(23 * M))))   // beyond lateness → late row
    val (a, b) = bothRuns(batches, interruptAfter = 1, "update")(
      ds => WindowedTopKState.lateCarrier(
        ds.withWatermark("wmTs", "0 seconds"), sizeMs = 10000L,
        allowedLatenessMs = 5000L).toDF())
    assert(a == b, s"restart diverged:\n A-B=${(a diff b).take(3)}\n B-A=${(b diff a).take(3)}")
    // initial fire from the recovered table, then the re-fired count 3
    assert(a.exists(r => r.contains("\"kind\":\"fire\"") && r.contains("\"item\":\"x\"")
      && r.contains("\"count\":2")), s"recovered window did not fire: $a")
    assert(a.exists(r => r.contains("\"kind\":\"fire\"") && r.contains("\"item\":\"x\"")
      && r.contains("\"count\":3")), s"allowed-late re-fire missing: $a")
    assert(a.exists(r => r.contains("\"kind\":\"late\"") && r.contains("\"item\":\"y\"")),
      s"late side-output row missing: $a")
  }

  test("SessionTopKState: open sessions and their sketch tables survive a kill and merge post-restart") {
    val s = spark
    import s.implicits._
    import SessionTopKState._
    // S1's table is built pre-kill; the bridge, the merge with S2 and
    // the fused fire all happen post-restart — the fused counts are
    // only right if S1's SpaceSaving table was recovered. gap 10 s,
    // watermark delay 30 s.
    val batches = Seq(
      Seq(In("k", "a", ts(100 * M)), In("k", "a", ts(105 * M)), In("k", "b", ts(105 * M))),
      Seq(In("k", "c", ts(120 * M)), In("k", "c", ts(121 * M))), // S2, disjoint
      Seq(In("k", "b", ts(112 * M))),                            // bridge: fuse S1+S2
      Seq(In("k", "z", ts(165 * M))),                            // wm → 135 s: fused fires
      Seq(In("k", "z2", ts(170 * M))))
    val (a, b) = bothRuns(batches, interruptAfter = 1, "append")(
      ds => SessionTopKState(ds.withWatermark("ts", "30 seconds"), gapMs = 10000L).toDF())
    assert(a == b, s"restart diverged:\n A-B=${(a diff b).take(3)}\n B-A=${(b diff a).take(3)}")
    // non-vacuous: the fused [100 s, 131 s) session fired with a=2 over n=6
    assert(a.exists(r => r.contains("\"sessionStart\":100000") && r.contains("\"sessionEnd\":131000")
      && r.contains("\"item\":\"a\"") && r.contains("\"count\":2") && r.contains("\"n\":6")),
      s"fused session fire not derived from recovered tables: $a")
  }

  test("SessionTopKState.lateCarrier: a late bridge re-fires FIRED sessions from recovered tables") {
    val s = spark
    import s.implicits._
    import SessionTopKState._
    // both parent sessions' tables are built pre-kill; the fires, the
    // late BRIDGE that fuses the two already-fired sessions, the fused
    // re-fire, the purge and the beyond-lateness split all happen
    // post-restart — the fused x:3/n:4 is only right if BOTH parents'
    // SpaceSaving tables were recovered. gap 10 s, lateness 20 s.
    val batches = Seq(
      Seq(InL("k", "x", ts(1 * M), ts(1 * M)), InL("k", "x", ts(2 * M), ts(2 * M)),
        InL("k", "y", ts(20 * M), ts(3 * M))),       // A [1,12) {x:2}, B [20,30) {y:1}
      Seq(InL("k", "c", ts(60 * M), ts(31 * M))),    // wm 31 s: fires A and B
      Seq(InL("k", "x", ts(11 * M), ts(32 * M))),    // late bridge → fused [1,30) re-fires
      Seq(InL("k", "d", ts(95 * M), ts(80 * M))),    // purge fused; fire C [60,70)
      Seq(InL("k", "q", ts(5 * M), ts(81 * M))))     // beyond lateness → late row
    val (a, b) = bothRuns(batches, interruptAfter = 1, "update")(
      ds => SessionTopKState.lateCarrier(ds.withWatermark("wmTs", "0 seconds"),
        gapMs = 10000L, allowedLatenessMs = 20000L).toDF())
    assert(a == b, s"restart diverged:\n A-B=${(a diff b).take(3)}\n B-A=${(b diff a).take(3)}")
    assert(a.exists(r => r.contains("\"kind\":\"fire\"") && r.contains("\"sessionStart\":1000")
      && r.contains("\"sessionEnd\":30000") && r.contains("\"item\":\"x\"")
      && r.contains("\"count\":3") && r.contains("\"n\":4")),
      s"fused late re-fire not derived from recovered tables: $a")
    assert(a.exists(r => r.contains("\"kind\":\"late\"") && r.contains("\"item\":\"q\"")),
      s"beyond-lateness side output missing: $a")
  }
}

/** The FULL kill-restart matrix under RocksDBStateStoreProvider +
  * changelog checkpointing — every machine above (PatternState,
  * MultiTouchState, TopKState, WindowedTopKState incl. lateCarrier,
  * WindowedSketchState, slidingCarrier, AnomalyState, SessionTopKState)
  * recovers from a RocksDB checkpoint exactly as from the heap
  * provider's. r13 proved three machines under RocksDB
  * (RocksDbStateStoreSpec, kept for the heap-vs-rocks output-identity
  * direction); this inherits the whole suite, so new machines added to
  * the matrix are RocksDB-covered automatically. Each run additionally
  * asserts rocksdb custom metrics on the query progress — the provider
  * conf demonstrably took effect, not just sat in the session. */
class RocksDbCheckpointRestartSpec extends CheckpointRestartSpec {
  override protected def providerConf: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
  override protected def assertProvider(
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
    assert(ops.nonEmpty, "no state operator progress — cannot prove provider")
    import scala.jdk.CollectionConverters._
    assert(ops.exists(_.customMetrics.keySet.asScala.exists(_.startsWith("rocksdb"))),
      s"query ran without RocksDB state store; metrics: " +
        ops.map(_.customMetrics.keySet.asScala.take(5)).mkString(", "))
  }
}
