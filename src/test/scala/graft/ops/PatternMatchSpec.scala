package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** pattern_match (CEP view→purchase-within-1h with no intervening
  * error): the single-window-pass form must agree with a literal
  * per-user sequential scan over the sorted event log. */
class PatternMatchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("window-pass matches a sequential per-user NFA walk") {
    val s = spark
    import s.implicits._
    val got = EventAnalytics.patternMatch(s, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toVector

    val events = graft.Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long, String, Long)].collect()
    val horizon = 3600L * 1000000L
    val want = events.groupBy(_._1).toVector.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._4, e._2)).toVector
      sorted.zipWithIndex.collect { case ((_, eid, "view", ts), i) =>
        // literal walk: first purchase strictly after, first error after
        val rest = sorted.drop(i + 1)
        val np = rest.collectFirst { case (_, _, "purchase", t) => t }
        val ne = rest.collectFirst { case (_, _, "error", t) => t }
        (eid, ts, np, ne)
      }.collect {
        case (eid, ts, Some(np), ne)
            if np - ts <= horizon && ne.forall(_ > np) =>
          (uid, eid, ts, np, np - ts)
      }
    }.sortBy(_._2)

    assert(got.nonEmpty, "fixture produces matches")
    assert(got == want)
  }

  test("the not-followed-by clause is load-bearing at sf0.01") {
    val s = spark
    import s.implicits._
    // sf0.001 has too few events to trip the veto; at sf0.01 dropping
    // the error clause must admit strictly more anchors
    val bigDir = "/root/testdata/sf0.01"
    val horizon = 3600L * 1000000L
    val events = graft.Tables.events(s, bigDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long, String, Long)].collect()
    def walk(veto: Boolean): Int = events.groupBy(_._1).toVector.map { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2)).toVector
      sorted.zipWithIndex.count { case ((_, _, tpe, ts), i) =>
        tpe == "view" && {
          val rest = sorted.drop(i + 1)
          val np = rest.collectFirst { case (_, _, "purchase", t) => t }
          val ne = rest.collectFirst { case (_, _, "error", t) => t }
          np.exists(p => p - ts <= horizon && (!veto || ne.forall(_ > p)))
        }
      }
    }.sum
    val full = walk(veto = true)
    assert(full == EventAnalytics.patternMatch(s, bigDir).count())
    assert(walk(veto = false) > full,
      "fixture must exercise the error veto, or the clause is untested")
  }
}
