package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** heavy_hitters: the CMS gate must be conservative (estimate ≥ exact for
  * EVERY key) and the gated exact pass must reproduce the plain exact
  * HAVING query bit-for-bit — the property that lets the DuckDB oracle
  * stay sketch-free. */
class SketchesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("heavy_hitters equals the exact HAVING computation") {
    val s = spark
    import s.implicits._
    val got = Sketches.heavyHitters(s, dir)
      .as[(String, Long)].collect().toVector

    // exact reference: plain groupBy + threshold, no sketch anywhere
    val grams = graft.Tables.documents(s, dir)
      .select(expr(graft.ops.Prims.wordsExpr).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
        .as("gram")).cache()
    val total = grams.count()
    val want = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * Sketches.HhDenom >= total)
      .orderBy("gram").as[(String, Long)].collect().toVector
    grams.unpersist()

    assert(want.nonEmpty, "threshold leaves a non-trivial heavy set")
    assert(got == want)
  }

  test("CMS estimate is an over-approximation for every gram") {
    val s = spark
    import s.implicits._
    // rebuild the sketch exactly as the operator does, then check
    // min-over-rows(cell) >= exact count per distinct gram
    val docs = graft.Tables.documents(s, dir)
    val grams = docs.select(expr(graft.ops.Prims.wordsExpr).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
        .as("gram")).cache()
    val exact = grams.groupBy("gram").agg(count(lit(1)).as("exact"))

    def bucket(i: Int) = pmod(
      graft.ops.Prims.hash60(concat(lit(s"$i#"), col("gram"))), lit(Sketches.Width))
    val cells = grams
      .select(explode(array((0 until Sketches.Depth).map(i =>
        struct(lit(i).as("r"), bucket(i).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))

    val est = (0 until Sketches.Depth).foldLeft(exact) { (df, i) =>
      val slice = cells.filter(col("r") === i)
        .select(col("b").as(s"b$i"), col("c").as(s"c$i"))
      df.withColumn(s"b$i", bucket(i)).join(broadcast(slice), Seq(s"b$i"))
    }.withColumn("est", least((0 until Sketches.Depth).map(i => col(s"c$i")): _*))

    val under = est.filter(col("est") < col("exact")).count()
    grams.unpersist()
    assert(under == 0, "CMS must never under-estimate")
  }
}
