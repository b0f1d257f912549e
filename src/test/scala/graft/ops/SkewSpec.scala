package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew helpers must be EXACT rewrites: on a hostile 50%-hot-key
  * fixture, the salted forms return bit-identical results to the
  * direct forms, and the salt actually spreads the hot key (the
  * mechanism, not just the outcome). */
class SkewSpec extends SparkSpec {

  // 20k rows, half on key 0, the rest uniform over 1..999
  private lazy val skewed = spark.range(20000).select(
    when(pmod(col("id"), lit(2)) === 0, lit(0L))
      .otherwise(pmod(col("id"), lit(1000))).as("k"),
    col("id").as("row_id"),
    (col("id") % 97).cast("double").as("v"))

  test("saltedCountSum equals the direct groupBy exactly") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(Prims.dec2(col("v"))).cast("double").as("sum_v"))
      .orderBy("k").collect()
    val salted = Skew.saltedCountSum(skewed, Seq("k"), Seq("row_id"),
        salt = 16, sumCols = Seq("v"))
      .orderBy("k").collect()
    assert(salted.toSeq == direct.toSeq)
    graft.HarnessUtil.releaseAll(spark)
  }

  test("saltedJoin equals the plain join exactly; build side replicates") {
    val dim = spark.range(1000).select(col("id").as("dk"),
      concat(lit("dim_"), col("id")).as("label"))
    val plain = skewed.join(dim, col("k") === col("dk"))
      .select("row_id", "k", "label").orderBy("row_id").collect()
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk",
        saltBy = Seq("row_id"), salt = 8)
      .select("row_id", "k", "label").orderBy("row_id").collect()
    assert(salted.toSeq == plain.toSeq)
    graft.HarnessUtil.releaseAll(spark)
  }

  test("the salt spreads the hot key across all salt values deterministically") {
    val hot = skewed.filter(col("k") === 0)
      .select(Skew.saltCol(16, col("row_id")).as("s"))
    val counts = hot.groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 16).toSet,
      s"hot key must land on every salt value: ${counts.keySet}")
    // no salt value owns more than a quarter of the hot key (10k rows
    // over 16 salts — a degenerate hash would concentrate them)
    assert(counts.values.max < 2500, s"salt distribution degenerate: $counts")
    // determinism: recomputing yields the identical assignment
    val again = hot.groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again == counts)
    graft.HarnessUtil.releaseAll(spark)
  }
}
