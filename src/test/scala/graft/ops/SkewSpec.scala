package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  test("saltedAgg equals direct aggregation on a skewed key distribution") {
    val s = spark
    import s.implicits._
    // hot key: 10k rows on 'hot', a few on others
    val df = s.range(10000).select(lit("hot").as("k"), col("id").as("v"))
      .unionByName(s.range(50).select(concat(lit("k"), col("id") % 7).as("k"), col("id").as("v")))
    val direct = df.groupBy("k").agg(sum("v").as("total"), count(lit(1)).as("n"))
      .orderBy("k").collect()
    val salted = Skew.saltedAgg(df, col("k"), buckets = 16,
        partials = Seq(sum("v").as("s"), count(lit(1)).as("c")),
        combines = Seq(sum("s").as("total"), sum("c").as("n")))
      .orderBy("key").collect()
    assert(direct.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
           salted.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}
