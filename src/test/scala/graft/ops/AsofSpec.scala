package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `asof_attribution` (the as-of join) against the BRUTE-FORCE join
  * form: every purchase × every prior touch of the same user, argmax by
  * the (ts_us, event_id) total order. The operator's window shape must
  * reproduce that exactly, including the no-prior-touch NULL rows and
  * same-timestamp tie-breaks; the DuckDB oracle then pins cross-engine
  * parity on the same definition. */
class AsofSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("asof_attribution matches the brute-force argmax join") {
    val s = spark
    val res = EnrichJoin.asofAttribution(s, dir).cache()

    val ev = graft.Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        Prims.epochUs(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_ts"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("t_id"), col("ts_us").as("t_ts"))

    // every purchase appears exactly once, matched or not
    assert(res.count() == purchases.count())
    assert(res.groupBy("purchase_id").count().filter("count > 1").count() == 0)

    val matchedBrute = purchases.join(touches, "user_id")
      .filter(col("t_ts") < col("p_ts") ||
        (col("t_ts") === col("p_ts") && col("t_id") < col("purchase_id")))
      .groupBy("purchase_id")
      .agg(max_by(col("t_id"), struct(col("t_ts"), col("t_id"))).as("want_touch"))

    // matched purchases carry exactly the argmax touch
    val disagree = res.join(matchedBrute, "purchase_id")
      .filter(col("touch_id").isNull || col("touch_id") =!= col("want_touch"))
      .count()
    assert(disagree == 0, s"$disagree purchases attribute a non-argmax touch")

    // purchases with NO prior touch carry NULLs across all touch columns
    val unmatched = res.join(matchedBrute, Seq("purchase_id"), "left_anti")
    assert(unmatched.filter(col("touch_id").isNotNull || col("touch_type").isNotNull ||
      col("touch_ts_us").isNotNull || col("lag_us").isNotNull).count() == 0)
    assert(unmatched.count() > 0, "fixture premise: some purchase has no prior touch")

    // attribution never reaches forward in time
    assert(res.filter(col("lag_us") < 0).count() == 0)
    res.unpersist()
    ()
  }
}
