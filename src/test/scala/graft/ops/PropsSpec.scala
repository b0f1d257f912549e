package graft.ops

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the semantic cores (SURVEY.md §5 plan:
  * last-non-null-wins merge and window-assignment arithmetic). */
class PropsSpec extends AnyFunSuite {

  /** Run a ScalaCheck property and fail the suite if it doesn't hold
    * (scalatestplus bridge isn't on the offline classpath). */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  /** A5 null-coalescing merge (reference: test/StateTest.java:683-698):
    * merging partials in arrival order must equal "last non-null wins". */
  test("property: null-coalescing reduce == last-non-null-wins") {
    val partial = Gen.listOfN(3, Gen.option(Gen.choose(-100, 100)))
    val stream = Gen.nonEmptyListOf(partial)
    check(Prop.forAll(stream) { rows =>
      def merge(acc: List[Option[Int]], next: List[Option[Int]]) =
        acc.zip(next).map { case (a, n) => n.orElse(a) }
      val folded = rows.reduceLeft(merge)
      val expected = (0 until 3).map(i =>
        rows.flatMap(r => r(i)).lastOption).toList
      folded == expected
    })
  }

  /** The merge is associative (so partial/map-side merging is safe). */
  test("property: null-coalescing merge is associative") {
    val partial = Gen.listOfN(3, Gen.option(Gen.choose(-100, 100)))
    check(Prop.forAll(partial, partial, partial) { (a, b, c) =>
      def m(x: List[Option[Int]], y: List[Option[Int]]) =
        x.zip(y).map { case (p, q) => q.orElse(p) }
      m(m(a, b), c) == m(a, m(b, c))
    })
  }

  /** As-of attribution state machine: folding [[graft.streaming.AsofState.handle]]
    * over ANY micro-batch chunking of the (ts, id)-ordered event stream
    * must equal the brute-force argmax (latest prior touch per
    * purchase) — the chunk-INVARIANCE AsofStreamSpec samples at one
    * chunk size, here at 200 random (events, chunking) pairs with
    * deliberately colliding timestamps. */
  test("property: as-of state machine is micro-batch-chunking invariant") {
    import graft.streaming.AsofState
    import graft.streaming.AsofState.{Ev, Touch}
    import org.apache.spark.api.java.{Optional => JOpt}
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val evGen = for {
      n <- Gen.choose(1, 40)
      tss <- Gen.listOfN(n, Gen.choose(0L, 12L)) // dense -> many ts collisions
      types <- Gen.listOfN(n, Gen.oneOf("view", "click", "purchase"))
    } yield tss.zip(types).zipWithIndex.map { case ((ts, t), i) =>
      Ev(eventId = i.toLong, userId = 1L, eventType = t, tsUs = ts, value = i * 0.5)
    }
    val gen = for {
      evs <- evGen
      chunk <- Gen.choose(1, 7)
    } yield (evs, chunk)
    check(Prop.forAll(gen) { case (evs, chunk) =>
      val ordered = evs.sortBy(e => (e.tsUs, e.eventId))
      var state = Option.empty[Touch]
      val folded = ordered.grouped(chunk).flatMap { batch =>
        val st = org.apache.spark.sql.streaming.TestGroupState.create[Touch](
          state.map(JOpt.of[Touch]).getOrElse(JOpt.empty[Touch]()),
          GroupStateTimeout.NoTimeout, batchProcessingTimeMs = 0L,
          eventTimeWatermarkMs = JOpt.empty[Long](), hasTimedOut = false)
        val out = AsofState.handle(1L, batch.iterator, st).toList
        if (st.exists) state = Some(st.get)
        out
      }.toList
      val brute = ordered.filter(_.eventType == "purchase").map { p =>
        val t = evs.filter(e => e.eventType != "purchase" &&
          (e.tsUs < p.tsUs || (e.tsUs == p.tsUs && e.eventId < p.eventId)))
          .sortBy(e => (e.tsUs, e.eventId)).lastOption
        (p.eventId, t.map(_.eventId), t.map(_.eventType), t.map(p.tsUs - _.tsUs))
      }
      folded.map(a => (a.purchaseId, a.touchId, a.touchType, a.lagUs)) == brute
    })
  }

  /** Interval-join bucketing (EnrichJoin.intervalJoin): for any in-range
    * (click, purchase) pair the purchase's two bucket probes contain the
    * click's bucket (completeness — no pair can be missed), and the two
    * probes are distinct so a pair can never match twice (uniqueness —
    * no dedup pass needed). */
  test("property: interval bucketing is complete and match-once") {
    val H = 3600000000L
    val gen = for {
      c <- Gen.choose(0L, 10L * 365 * 24 * H / H * H) // ~10 years of us
      delta <- Gen.choose(-2 * H, 3 * H) // straddle the in-range boundary
    } yield (c, c + delta)
    check(Prop.forAll(gen) { case (cTs, pTs) =>
      (pTs < 0) || {
        val cb = cTs / H
        val probes = Set(pTs / H, pTs / H - 1)
        val inRange = pTs >= cTs && pTs <= cTs + H
        (!inRange || probes.contains(cb)) && probes.size == 2
      }
    })
  }

  /** Tumbling window assignment: every ts lands in exactly the bucket
    * containing it (reference fire/drop arithmetic,
    * test/EventTimeTest.java:166-178). */
  test("property: tumbling assignment start <= ts < start + size") {
    val gen = for {
      ts <- Gen.choose(0L, 1000000L)
      size <- Gen.choose(1L, 10000L)
    } yield (ts, size)
    check(Prop.forAll(gen) { case (ts, size) =>
      val start = ts - Math.floorMod(ts, size)
      start <= ts && ts < start + size && start % size == 0
    })
  }

  /** Sliding windows: ts belongs to exactly ceil(size/slide) windows when
    * size is a multiple of slide (reference: test/WindowTest.java:152-203). */
  test("property: sliding assignment yields size/slide windows") {
    val gen = for {
      ts <- Gen.choose(0L, 1000000L)
      slide <- Gen.choose(1L, 1000L)
      mult <- Gen.choose(1, 8)
    } yield (ts, slide, slide * mult)
    check(Prop.forAll(gen) { case (ts, slide, size) =>
      val starts = (0L until size / slide)
        .map(i => (ts / slide - i) * slide)
        .filter(st => st <= ts && ts < st + size)
      starts.size == size / slide
    })
  }

  /** Cross-form consistency: with only a final watermark (no mid-stream
    * fires or drops), the FlinkWindows engine must produce exactly the
    * same per-window sums as a plain bucket-arithmetic aggregation —
    * the property that ties the streaming engine to the batch
    * `tumbling_window` oracle form. */
  test("property: engine tumbling == batch bucket aggregation (no watermarks)") {
    import graft.streaming.FlinkWindows._
    val ev = for {
      ts <- Gen.choose(0L, 30000L)
      v <- Gen.choose(1, 100)
    } yield Event("k", v, ts, -1L) // no watermark → everything fires at end
    check(Prop.forAll(Gen.nonEmptyListOf(ev)) { events =>
      val size = 3000L
      val engine = tumbling(events, sizeMs = size).fired
        .map(f => (f.windowStart, f.sum)).toMap
      val batch = events.groupBy(e => e.ts - Math.floorMod(e.ts, size))
        .map { case (start, es) => (start, es.map(_.value).sum) }
      engine == batch
    })
  }

  /** Session engine conservation over random multi-key traces with
    * interleaved watermarks: every element either lands in exactly one
    * fired session or is tagged late — regression cover for the
    * late-only-key path (a key whose events all arrive late must tag
    * them without creating session state). */
  test("property: session engine conserves elements across keys") {
    import graft.streaming.FlinkWindows._
    val ev = for {
      k <- Gen.oneOf("a", "b", "c")
      ts <- Gen.choose(0L, 20000L)
      v <- Gen.choose(1, 100)
      wm <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, 20000L))
    } yield Event(k, v, ts, wm)
    check(Prop.forAll(Gen.nonEmptyListOf(ev)) { events =>
      val r = session(events, gapMs = 2000L)
      r.fired.map(_.count).sum + r.late.size == events.size &&
        r.fired.map(_.sum).sum + r.late.map(_.value).sum == events.map(_.value).sum
    })
  }

  /** FlinkWindows engine: fired counts + late count == input count for
    * any random trace (conservation — nothing lost, nothing duplicated
    * when no re-fires happen, i.e. lateness 0). */
  test("property: tumbling engine conserves elements (lateness 0)") {
    import graft.streaming.FlinkWindows._
    val ev = for {
      ts <- Gen.choose(0L, 20000L)
      v <- Gen.choose(1, 100)
      wm <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, 20000L))
    } yield Event("k", v, ts, wm)
    check(Prop.forAll(Gen.nonEmptyListOf(ev)) { events =>
      val r = tumbling(events, sizeMs = 3000L)
      r.fired.map(_.count).sum + r.late.size == events.size
    })
  }
}
