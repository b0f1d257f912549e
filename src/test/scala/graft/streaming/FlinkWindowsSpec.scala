package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import FlinkWindows._

/** The reference's hand-traced golden tables, asserted (the reference
  * itself never asserts — SURVEY.md §5). Each trace cites the comment
  * block it was transcribed from. */
class FlinkWindowsSpec extends AnyFunSuite {

  /** reference: test/EventTimeTest.java:60-83 — tumbling 2 s, manual
    * watermarks, late e3 dropped. */
  test("tumbling 2s: late element dropped after watermark passes (EventTimeTest:60-83)") {
    val events = Seq(
      Event("a", 20, 500L, -1L),
      Event("a", 30, 1800L, 2100L),
      Event("a", 11, 1900L, -1L), // wm 2100 > window-end 1999 → dropped
      Event("a", 22, 3000L, -1L))
    val r = tumbling(events, sizeMs = 2000L)
    assert(r.fired == Vector(
      Fired("a", 0L, 2000L, 50, 2),
      Fired("a", 2000L, 4000L, 22, 1)))
    assert(r.late.map(_.value) == Vector(11))
  }

  /** reference: test/EventTimeTest.java:186-210 — tumbling 3 s, 13 tuples,
    * four fires (55, 65, 17, 28), four drops. */
  test("tumbling 3s: 13-tuple fire/drop trace (EventTimeTest:186-210)") {
    val events = Seq(
      Event("a", 35, 1000L, -1L), Event("a", 20, 1500L, 3000L),
      Event("a", 11, 100L, -1L), Event("a", 23, 1700L, -1L),
      Event("a", 60, 3100L, -1L), Event("a", 5, 4000L, 7000L),
      Event("a", 3, 2300L, -1L), Event("a", 3, 1500L, 5000L),
      Event("a", 12, 6500L, -1L), Event("a", 5, 7100L, 10000L),
      Event("a", 27, 8900L, -1L), Event("a", 12, 9100L, -1L),
      Event("a", 16, 9300L, 13000L))
    val r = tumbling(events, sizeMs = 3000L)
    assert(r.fired.map(_.sum) == Vector(55, 65, 17, 28))
    assert(r.late.map(_.value) == Vector(11, 23, 3, 3, 27))
  }

  /** reference: test/EventTimeTest.java:246-327 — tumbling 3 s +
    * allowedLateness 2 s: allowed-late arrivals re-fire their window. */
  test("tumbling 3s + allowedLateness 2s: re-fire trace (EventTimeTest:246-327)") {
    val events = Seq(
      Event("a", 35, 1000L, -1L), Event("a", 11, 100L, -1L),
      Event("a", 13, 2800L, 6100L),
      Event("a", 2, 1500L, -1L),  // 2999+2000 <= 6100 → drop
      Event("a", 19, 2500L, -1L), // drop
      Event("a", 22, 3100L, -1L), // allowed late for [3000,6000) → fire 22
      Event("a", 18, 4700L, -1L), // → re-fire 40
      Event("a", 17, 5900L, -1L), // → re-fire 57
      Event("a", 29, 6000L, -1L), Event("a", 16, 8000L, -1L),
      Event("a", 77, 9100L, -1L), Event("a", 65, 9500L, -1L),
      Event("a", 14, 11000L, 13000L), // wm 13000: fire [6000,9000)=45, [9000,12000)=156
      Event("a", 89, 100L, -1L),   // drop
      Event("a", 72, 5500L, -1L),  // drop
      Event("a", 32, 7900L, -1L),  // drop
      Event("a", 10, 11500L, -1L)) // allowed late → re-fire 166
    val r = tumbling(events, sizeMs = 3000L, allowedLatenessMs = 2000L)
    assert(r.fired.map(_.sum) == Vector(59, 22, 40, 57, 45, 156, 166))
    assert(r.late.map(_.value) == Vector(2, 19, 89, 72, 32))
  }

  /** reference: test/EventTimeTest.java:329-428 — tumbling 5 s +
    * allowedLateness 2 s + late side output, 20 tuples. */
  test("tumbling 5s + lateness 2s + late side output: 20-tuple trace (EventTimeTest:329-428)") {
    val events = Seq(
      Event("a", 1, 1100L, -1L), Event("a", 2, 300L, -1L),
      Event("a", 3, 5100L, -1L), Event("a", 4, 4600L, -1L),
      Event("a", 5, 2900L, -1L), Event("a", 6, 13000L, -1L),
      Event("a", 7, 9100L, 11000L), // fires [0,5000)=12, [5000,10000)=10
      Event("a", 8, 3000L, -1L),    // 4999+2000 <= 11000 → late output
      Event("a", 9, 6700L, -1L),    // allowed late → re-fire 19
      Event("a", 10, 9900L, 18000L),// re-fire 29, then wm fires [10000,15000)=6
      Event("a", 11, 13000L, -1L),  // late output
      Event("a", 12, 8888L, -1L),   // late output
      Event("a", 13, 12000L, -1L),  // late output
      Event("a", 14, 15300L, -1L), Event("a", 15, 17200L, -1L),
      Event("a", 16, 1300L, -1L),   // late output
      Event("a", 17, 21000L, -1L), Event("a", 18, 23000L, -1L),
      Event("a", 19, 5000L, 26000L),// late output; wm fires [15000,20000)=29, [20000,25000)=35
      Event("a", 20, 19000L, -1L))  // late output
    val r = tumbling(events, sizeMs = 5000L, allowedLatenessMs = 2000L)
    assert(r.fired.map(_.sum) == Vector(12, 10, 19, 29, 6, 29, 35))
    assert(r.late.map(_.value) == Vector(8, 11, 12, 13, 16, 19, 20))
  }

  /** reference: test/WindowTest.java:222-242 — session gap 2 s with
    * window merging, two keys. */
  test("session windows gap 2s: merge trace (WindowTest:222-242)") {
    val events = Seq(
      Event("a", 21, 1000L, -1L), Event("a", 32, 1500L, -1L),
      Event("a", 13, 3600L, 5500L), // fires merged [1000,3500)=53
      Event("b", 3, 5600L, -1L), Event("b", 9, 6000L, -1L),
      Event("b", 22, 7500L, -1L),
      Event("b", 50, 10000L, -1L),
      Event("b", 12, 11000L, 9500L), // fires a:[3600,5600)=13, b:[5600,9500)=34
      Event("b", 5, 15000L, 13500L)) // fires b:[10000,13000)=62
    val r = session(events, gapMs = 2000L)
    assert(r.fired == Vector(
      Fired("a", 1000L, 3500L, 53, 2),
      Fired("a", 3600L, 5600L, 13, 1),
      Fired("b", 5600L, 9500L, 34, 3),
      Fired("b", 10000L, 13000L, 62, 2),
      Fired("b", 15000L, 17000L, 5, 1)))
    assert(r.late.isEmpty)
  }

  /** Flink's WindowOperator merges FIRST, then applies isWindowLate to the
    * post-merge window: an out-of-order event whose own gap window has
    * passed the watermark is KEPT when it overlaps a still-open session,
    * and only dropped when no open session absorbs it. */
  test("session lateness is judged post-merge, not on the event's own window") {
    val events = Seq(
      Event("a", 1, 1000L, -1L),   // session [1000,3000)
      Event("a", 2, 6000L, 2500L), // wm 2500; [1000,3000) still open (2999 > 2500)
      Event("a", 3, 400L, -1L),    // own window [400,2400) end-1=2399 <= wm,
                                   // but merges into open [1000,3000) → KEPT
      Event("a", 9, 300L, -1L),    // chains onto the merged [400,3000) → KEPT
      Event("b", 5, 100L, -1L),    // own window late, no open session → late output
      Event("a", 4, 10000L, 6000L)) // wm 6000 fires merged [300,3000)=13
    val r = session(events, gapMs = 2000L)
    assert(r.fired == Vector(
      Fired("a", 300L, 3000L, 13, 3),
      Fired("a", 6000L, 8000L, 2, 1),
      Fired("a", 10000L, 12000L, 4, 1)))
    assert(r.late.map(_.value) == Vector(5))
  }

  /** Sliding 10s every 5s: an event joins size/slide panes; fires follow
    * pane ends; an event late for its OLDEST pane still lands in its
    * newer pane (per-window lateness test), so the side output stays
    * empty until every pane has passed. */
  test("sliding 10s/5s: multi-pane assignment, per-pane fires, pane-aware lateness") {
    val events = Seq(
      Event("a", 1, 2000L, -1L),     // panes [-5000,5000) + [0,10000)
      Event("a", 2, 7000L, 10000L),  // panes [0,10000) + [5000,15000); wm 10000
      // fires at wm=10000: [-5000,5000)=1, [0,10000)=3
      Event("a", 4, 9000L, -1L),     // [0,10000) passed BUT [5000,15000) live → kept there only
      Event("a", 8, 12000L, 15000L), // panes [5000,15000)+[10000,20000); wm fires [5000,15000)=14
      Event("a", 16, 4000L, -1L))    // both its panes passed → late side output
    val r = sliding(events, sizeMs = 10000L, slideMs = 5000L, finalFire = false)
    assert(r.fired == Vector(
      Fired("a", -5000L, 5000L, 1, 1),
      Fired("a", 0L, 10000L, 3, 2),
      Fired("a", 5000L, 15000L, 14, 3)))
    assert(r.late.map(_.value) == Vector(16))
  }

  test("sliding(size, size) degenerates to tumbling(size) exactly") {
    val events = Seq(
      Event("a", 35, 1000L, -1L), Event("a", 20, 1500L, 3000L),
      Event("a", 11, 100L, -1L), Event("a", 23, 1700L, -1L),
      Event("a", 60, 3100L, -1L), Event("a", 5, 4000L, 7000L),
      Event("a", 3, 2300L, -1L), Event("a", 3, 1500L, 5000L),
      Event("b", 12, 6500L, -1L), Event("b", 5, 7100L, 10000L))
    val t = tumbling(events, sizeMs = 3000L)
    val s = sliding(events, sizeMs = 3000L, slideMs = 3000L)
    assert(s == t)
  }

  test("sliding with allowedLateness: allowed-late arrival re-fires its pane") {
    val events = Seq(
      Event("a", 10, 1000L, 12000L), // panes [-5000,5000)+[0,10000); wm 12000 fires both
      Event("a", 7, 3000L, -1L))     // both panes passed, but within lateness → re-fires both
    val r = sliding(events, sizeMs = 10000L, slideMs = 5000L,
      allowedLatenessMs = 10000L, finalFire = false)
    assert(r.fired == Vector(
      Fired("a", -5000L, 5000L, 10, 1),
      Fired("a", 0L, 10000L, 10, 1),
      Fired("a", -5000L, 5000L, 17, 2),
      Fired("a", 0L, 10000L, 17, 2)))
    assert(r.late.isEmpty)
  }
}
