package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property coverage for the partition-predicate inference rule: for
  * ANY generated predicate tree over `ts` (random comparisons in both
  * operand orders, null-safe equality, IN-lists, nested And/Or), the
  * row count through the marked date-partitioned layout — where the
  * rule derives partition bounds and prunes directories — must equal a
  * trust-nothing local evaluation of the same tree over the collected
  * rows. This is the property the rule's hand-written spec cases
  * sample pointwise: every derivation is an implication-preserving
  * conservative widening, so pruning can NEVER change an answer. A
  * single counterexample here is a silent wrong-results bug at 100 TB
  * (dropped directories), which is why it gets the generative
  * treatment rather than examples only. */
class PartitionDateInferencePropsSpec extends SparkSpec {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }

  /** Predicate AST with two interpreters: Catalyst Column (what the
    * query runs) and a local Boolean over epoch micros (the oracle).
    * `ts` is non-null throughout the fixture, so two-valued logic is
    * exact. */
  private sealed trait P
  private case class Cmp(op: Int, micros: Long, litFirst: Boolean) extends P
  private case class InP(micros: List[Long]) extends P
  private case class AndP(l: P, r: P) extends P
  private case class OrP(l: P, r: P) extends P

  private def tsLit(micros: Long) = timestamp_micros(lit(micros))

  private def toCol(p: P): Column = p match {
    case Cmp(0, m, false) => col("ts") >= tsLit(m)
    case Cmp(1, m, false) => col("ts") > tsLit(m)
    case Cmp(2, m, false) => col("ts") <= tsLit(m)
    case Cmp(3, m, false) => col("ts") < tsLit(m)
    case Cmp(4, m, false) => col("ts") === tsLit(m)
    case Cmp(5, m, false) => col("ts") <=> tsLit(m)
    case Cmp(0, m, true)  => tsLit(m) <= col("ts")
    case Cmp(1, m, true)  => tsLit(m) < col("ts")
    case Cmp(2, m, true)  => tsLit(m) >= col("ts")
    case Cmp(3, m, true)  => tsLit(m) > col("ts")
    case Cmp(4, m, true)  => tsLit(m) === col("ts")
    case Cmp(5, m, true)  => tsLit(m) <=> col("ts")
    case Cmp(op, _, _)    => sys.error(s"bad op $op")
    case InP(ms)          => col("ts").isin(ms.map(tsLit): _*)
    case AndP(l, r)       => toCol(l) && toCol(r)
    case OrP(l, r)        => toCol(l) || toCol(r)
  }

  private def eval(p: P, ts: Long): Boolean = p match {
    case Cmp(0, m, _) => ts >= m
    case Cmp(1, m, _) => ts > m
    case Cmp(2, m, _) => ts <= m
    case Cmp(3, m, _) => ts < m
    case Cmp(4, m, _) => ts == m
    case Cmp(5, m, _) => ts == m
    case InP(ms)      => ms.contains(ts)
    case AndP(l, r)   => eval(l, ts) && eval(r, ts)
    case OrP(l, r)    => eval(l, ts) || eval(r, ts)
  }

  // literal pool: every hour of fixture days 1..4 at :00 and :30 (only
  // :30 matches rows), plus a day before and after the fixture span —
  // bounds that land on, between, and outside the data
  private val hourUs = 3600L * 1000000
  private def fixtureMicros(day: Int, hour: Int, half: Boolean): Long = {
    val d0 = java.time.LocalDate.parse(f"2024-02-0$day%d")
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli * 1000
    d0 + hour * hourUs + (if (half) 1800L * 1000000 else 0L)
  }
  private val litGen: Gen[Long] = for {
    day <- Gen.choose(0, 5) // fixture holds days 1..4
    hour <- Gen.choose(0, 23)
    half <- Gen.oneOf(true, false)
  } yield fixtureMicros(math.max(1, math.min(4, day)), hour, half) +
    (if (day == 0) -2 * 24 * hourUs else if (day == 5) 2 * 24 * hourUs else 0L)

  private val leafGen: Gen[P] = Gen.frequency(
    8 -> (for {
      op <- Gen.choose(0, 5); m <- litGen; lf <- Gen.oneOf(true, false)
    } yield Cmp(op, m, lf)),
    2 -> Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, litGen).map(InP(_))))

  private def treeGen(depth: Int): Gen[P] =
    if (depth == 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      3 -> (for { l <- treeGen(depth - 1); r <- treeGen(depth - 1) } yield AndP(l, r)),
      3 -> (for { l <- treeGen(depth - 1); r <- treeGen(depth - 1) } yield OrP(l, r)))

  test("property: pruning through derived bounds NEVER changes a row count, for any And/Or/cmp/IN tree") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pdi_props").toString
    // 4 days × 24 hourly rows at :30, written by the layout contract
    val rows = (0 until 96).map(i => (i.toLong, f"2024-02-${1 + i / 24}%02dT${i % 24}%02d:30:00"))
    rows.toDF("id", "ts_s")
      .select(col("id"), col("ts_s").cast("timestamp").as("ts"))
      .withColumn("ts_date", graft.storage.Layout.utcDate(col("ts")))
      .write.mode("overwrite").partitionBy("ts_date").parquet(dir)
    graft.storage.Layout.markUtcDays(s, dir)
    val part = spark.read.parquet(dir)
    // the local oracle: the same instants as epoch micros (UTC session)
    val localTs: Seq[Long] = part.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(localTs.size == 96)

    check(Prop.forAll(treeGen(3)) { p =>
      val expected = localTs.count(eval(p, _)).toLong
      val actual = part.filter(toCol(p)).count()
      if (actual != expected)
        println(s"COUNTEREXAMPLE: $p expected=$expected actual=$actual")
      actual == expected
    })
  }
}
