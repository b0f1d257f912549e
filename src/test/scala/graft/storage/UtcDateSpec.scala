package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ground-truth check for [[Layout.utcDate]] — the arithmetic the whole
  * `<col>_date` partition contract stands on. The expression computes
  * the UTC calendar day via exact integer floor-division on epoch
  * micros; java.time computes the same day via its own proleptic
  * calendar. 4,000 pseudo-random instants across ±120 years (dense
  * around the epoch and around day boundaries, PRE-1970 included —
  * the case where truncation and floor diverge) must agree exactly,
  * and the derivation must be session-tz-independent. */
class UtcDateSpec extends SparkSpec {

  private def groundTruth(micros: Long): java.sql.Date = {
    val days = Math.floorDiv(micros, 86400000000L)
    java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days))
  }

  test("utcDate == java.time UTC day for random instants, pre-1970 included, any session tz") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260815L)
    val dayUs = 86400000000L
    val micros: Seq[Long] =
      // broad: ±120 years
      Seq.fill(2000)((rnd.nextDouble() * 2 - 1) * 120 * 365.25 * dayUs).map(_.toLong) ++
      // dense around day boundaries on both sides of the epoch
      Seq.fill(1000)(rnd.nextInt(2000) - 1000L match {
        case off => (rnd.nextInt(200) - 100) * dayUs + off }) ++
      // exact boundaries and the epoch itself
      Seq(-dayUs, -1L, 0L, 1L, dayUs - 1, dayUs, -dayUs + 1, -dayUs - 1)
    val prevTz = s.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "America/Los_Angeles", "Asia/Tokyo")) {
        s.conf.set("spark.sql.session.timeZone", tz)
        val got = micros.toDF("m")
          .select(col("m"), Layout.utcDate(timestamp_micros(col("m"))).as("d"))
          .collect()
        got.foreach { r =>
          val m = r.getLong(0)
          // DateType surfaces as java.sql.Date in the session tz; compare
          // the UNDERLYING epoch-day, which is what the directory name and
          // the inference rule both use
          val gotDay = r.getDate(1).toLocalDate
          val expDay = java.time.LocalDate.ofEpochDay(Math.floorDiv(m, dayUs))
          assert(gotDay == expDay,
            s"utcDate($m) = $gotDay, ground truth $expDay (tz=$tz)")
        }
        assert(got.length == micros.length)
      }
    } finally s.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("groundTruth helper sanity (floor, not truncation, below the epoch)") {
    assert(groundTruth(-1L).toLocalDate == java.time.LocalDate.of(1969, 12, 31))
    assert(groundTruth(0L).toLocalDate == java.time.LocalDate.of(1970, 1, 1))
  }
}
