package graft.storage

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: the Morton interleave must make file ranges tight on
  * BOTH clustered columns, so a box predicate prunes files that a
  * single-column linear sort cannot — measured with the same per-file
  * min/max decision a parquet footer-pruning scan makes. */
class ZOrderSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val Files = 16

  test("zValue: interleave is monotone per dimension and within bounds") {
    val s = spark
    import s.implicits._
    val df = (0L until 256L).flatMap(a => Seq((a, 0L), (a, 255L)))
      .toDF("a", "b")
      .withColumn("zv", Layout.zValue(col("a"), 0, 255, col("b"), 0, 255))
    val rows = df.as[(Long, Long, Long)].collect()
    assert(rows.forall { case (_, _, zv) => zv >= 0 && zv < (1L << 16) })
    // fixing b, zv grows with a's cell (Morton is monotone per axis)
    val fixedB = rows.filter(_._2 == 0L).sortBy(_._1).map(_._3)
    assert(fixedB.sliding(2).forall(p => p.head <= p.last))
  }

  test("z-order prunes a two-sided box better than a linear sort; content survives") {
    val s = spark
    val li = graft.Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey", "l_quantity")
    val total = li.count()

    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val zPath = s"$base/z"
    val linPath = s"$base/lin"
    Layout.writeZOrdered(li, zPath, "l_orderkey", "l_partkey", Files)
    // the incumbent layout: linear sort on the leading column
    li.repartitionByRange(Files, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(linPath)

    // nothing lost or duplicated by the rewrite
    assert(s.read.parquet(zPath).count() == total)

    // a ~1/8 × ~1/8 box on both dimensions
    val (okLo, okHi) = rangeSlice(li, "l_orderkey", 8)
    val (pkLo, pkHi) = rangeSlice(li, "l_partkey", 8)
    val box = Seq(("l_orderkey", okLo, okHi), ("l_partkey", pkLo, pkHi))

    // range-exchange sample boundaries jitter with the session's RDD-id
    // history, so file counts/edges are not bit-stable across suite
    // orders — every assertion below is a RATE, not an exact layout
    val (zTouch, zTotal) = Layout.filesTouched(s, zPath, box)
    val (lTouch, lTotal) = Layout.filesTouched(s, linPath, box)
    assert(zTotal >= Files / 2 && lTotal >= Files / 2,
      s"sane file fan-out: z=$zTotal linear=$lTotal")
    // linear layout: the box's l_partkey side prunes nothing — a
    // partkey-only predicate touches EVERY file. Z-order must prune it.
    val (zPk, _) = Layout.filesTouched(s, zPath, box.tail)
    val (lPk, _) = Layout.filesTouched(s, linPath, box.tail)
    assert(lPk == lTotal, s"linear sort cannot prune the non-sorted column ($lPk/$lTotal)")
    // jitter margin: a sampled boundary landing mid-curve-cell widens a
    // file's min/max to straddle two b-bands, so the prune rate wobbles
    // around its ~4/16 center — assert ≥1/3 pruned, not the typical ≥1/2
    assert(zPk * 3 <= zTotal * 2, s"z-order must prune the second dimension ($zPk/$zTotal)")
    // two-sided box: z-order stays in the same small-file ballpark as
    // the linear layout's sorted-column slice (the multiplicative win
    // grows with file count; at 16 files parity is the floor, and the
    // boundary-straddle jitter above adds up to a few touched files)
    assert(zTouch <= lTouch + 5, s"two-sided box: z=$zTouch linear=$lTouch")
  }

  test("quantile z-order keeps pruning on a long-tailed column where equal-width collapses") {
    val s = spark
    import s.implicits._
    // 99% of `a` mass in [0, 1000), 1% at ~10^12: equal-width cells over
    // the observed range put the entire body in cell 0 — the curve
    // degenerates to a linear sort on `b` and two-sided pruning dies.
    // Quantile edges give every cell equal row mass.
    val df = (0L until 20000L).map { id =>
      val a = if (id % 100 == 99) 1000000000000L + id else id % 1000
      (a, id % 4096)
    }.toDF("a", "b")
    val base = java.nio.file.Files.createTempDirectory("zq").toString
    Layout.writeZOrdered(df, s"$base/ew", "a", "b", Files)
    Layout.writeZOrderedQuantile(df, s"$base/q", "a", "b", Files)
    assert(s.read.parquet(s"$base/q").count() == 20000L)

    // an a-only predicate over ~1/8 of the BODY mass: this is where the
    // collapse shows — under equal-width every body row is a-cell 0, so
    // the a bits carry no information and the predicate cannot prune
    // body files at all (the curve degenerated to a b-sort)
    val aBox = Seq(("a", 100L, 220L))
    val (ewTouch, ewTotal) = Layout.filesTouched(s, s"$base/ew", aBox)
    val (qTouch, qTotal) = Layout.filesTouched(s, s"$base/q", aBox)
    assert(ewTotal >= Files / 2 && qTotal >= Files / 2, "sane fan-out")
    assert(ewTouch * 4 >= ewTotal * 3,
      s"fixture must make equal-width collapse on a ($ewTouch/$ewTotal)")
    // quantile: a-cells are equal-frequency, so the same predicate keeps
    // its top-bit pruning — at least 2× fewer files
    assert(qTouch * 2 <= ewTouch,
      s"quantile must out-prune equal-width ($qTouch vs $ewTouch)")
    // and the predicate's result is identical either way
    def boxCount(p: String) = s.read.parquet(p)
      .filter(col("a").between(100, 220)).count()
    assert(boxCount(s"$base/q") == boxCount(s"$base/ew"))
  }

  /** [lo, hi] covering roughly 1/`frac` of the column's value range. */
  private def rangeSlice(df: org.apache.spark.sql.DataFrame,
      c: String, frac: Int): (Long, Long) = {
    val r = df.agg(min(col(c)).cast("long"), max(col(c)).cast("long")).head
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val w = math.max(1L, (hi - lo + 1) / frac)
    val start = lo + (hi - lo + 1) / 3
    (start, start + w - 1)
  }
}
