package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Determinism primitives: the shared hash, formatting, and global
  * row-number helpers every operator builds on. */
class PrimsSpec extends SparkSpec {

  test("hash60 equals DuckDB's definition on a known value") {
    val s = spark
    import s.implicits._
    // CAST('0x' || substr(md5('graft'), 1, 15) AS BIGINT) — md5('graft')
    // = 41a1a76938b1006... → first 15 hex digits as int64. Pinning the
    // constant guards the cross-engine contract itself, not just parity
    // on current data.
    val got = Seq("graft").toDF("x").select(Prims.hash60(col("x"))).as[Long].head()
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("graft".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    assert(got == expected)
  }

  test("joinedSortedLongs renders a canonical comma list") {
    val s = spark
    import s.implicits._
    val out = Seq(Seq(3L, 1L, 2L)).toDF("a")
      .select(Prims.joinedSortedLongs(col("a"))).as[String].head()
    assert(out == "1,2,3")
  }

  test("globalRowNumber: empty input yields empty output (guard branch)") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(Prims.globalRowNumber(empty, "rn", col("k")).count() == 0)
  }

  test("globalRowNumber equals a single-partition row_number on a known frame") {
    val s = spark
    import s.implicits._
    val df = (1L to 1000L).map(i => (1000L - i, i)).toDF("k", "v")
      .repartition(8) // scatter input so ranking crosses partitions
    val got = Prims.globalRowNumber(df, "rn", col("k"))
      .select($"k", $"rn".cast("long")).as[(Long, Long)].collect().sortBy(_._1)
    // k values are 0..999; rank by k ascending = k + 1
    assert(got.length == 1000)
    assert(got.forall { case (k, rn) => rn == k + 1 })
  }

  test("groupedRowNumber equals the window row_number on a skewed fixture") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // one dominant group holding ~90% of rows + a handful of small ones —
    // the few-huge-groups shape Window.partitionBy funnels into one task
    val df = s.range(0, 5000).select(
        when(col("id") % 10 === 0, concat(lit("small"), col("id") % 4))
          .otherwise(lit("big")).as("g"),
        (col("id") * 7919 % 104729).as("v"), col("id"))
      .repartition(8)
    val got = Prims.groupedRowNumber(df, "rk", Seq("g"), col("v"), col("id"))
      .select($"g", $"id", $"rk").as[(String, Long, Long)].collect().toSet
    val want = df.withColumn("rk", row_number().over(
        Window.partitionBy("g").orderBy("v", "id")).cast("long"))
      .select($"g", $"id", $"rk").as[(String, Long, Long)].collect().toSet
    assert(got == want)
    // and no Window.partitionBy survives in the scalable form's plan
    val plan = Prims.groupedRowNumber(df, "rk", Seq("g"), col("v"), col("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"grouped rank planned a Window stage:\n$plan")
  }

  test("groupedRowNumber: empty input yields empty output") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(String, Long)].toDF("g", "v")
    assert(Prims.groupedRowNumber(empty, "rk", Seq("g"), col("v")).count() == 0)
  }
}
