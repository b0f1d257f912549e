package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling helpers — the 100 TB guard rails the engine contract
  * calls for on hot keys (a handful of keys carrying a disproportionate
  * share of rows makes the single reducer for that key the straggler).
  *
  * `saltedAgg` is the classic two-stage rewrite: aggregate on
  * (key, salt) first — spreading a hot key over `buckets` reducers —
  * then combine the partials per key. Correct for any algebraic
  * aggregate (sum/count/min/max); the caller supplies both phases.
  * AQE's skew-join handling covers the join side; this covers
  * aggregation.
  */
object Skew {

  /** Two-stage salted aggregation.
    * @param partials  per-(key,salt) aggregates, e.g. sum(x) as s
    * @param combines  per-key combiners over the partials, e.g. sum(s)
    */
  def saltedAgg(df: DataFrame, key: Column, buckets: Int,
                partials: Seq[Column], combines: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("__key"))
      .agg(combines.head, combines.tail: _*)
      .withColumnRenamed("__key", "key")
}
