package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 streaming form: watermarked stream-stream inner window join
  * (reference: test/WindowTest.java:410-425 — C⋈E on waybillCode inside a
  * tumbling window). The batch oracle twin is
  * [[graft.ops.EnrichJoin.windowJoin]]; this is the live operator.
  *
  * Both sides get a watermark and are bucketed to the same tumbling
  * window; the join condition is (key, window) EQUALITY, so the window
  * struct — an event-time-derived column on each side — gives Spark the
  * time constraint it needs to bound join state: rows of a window whose
  * end has passed BOTH watermarks can never match again and are evicted
  * from the state store. Without the window (or an interval condition) a
  * stream-stream inner join would have to buffer both streams forever.
  *
  * At scale this is the shape a 1000-executor join wants: state is
  * partitioned by (key, window) via the shuffle the join itself needs —
  * no extra repartition — and the per-window state footprint is bounded
  * by watermark eviction, not stream length.
  */
object StreamJoins {

  /** @param left  streaming side with (`keyCol`, `tsCol`, payload…)
    * @param right streaming side with (`keyCol`, `tsCol`, payload…) —
    *              payload column names must not collide with `left`'s
    * @param dur   tumbling window size, e.g. "3 seconds"
    * @param delay watermark delay for BOTH sides, e.g. "2 seconds"
    * @return inner-joined rows with `window_start` (epoch seconds) —
    *         one output row per (left, right) pair sharing key + window */
  def windowJoin(left: DataFrame, right: DataFrame, keyCol: String,
                 tsCol: String, dur: String, delay: String): DataFrame = {
    def bucket(df: DataFrame) = df
      .withWatermark(tsCol, delay)
      .withColumn("window", window(col(tsCol), dur))
      .drop(tsCol) // the window struct carries the event-time marker
    bucket(left).join(bucket(right), Seq(keyCol, "window"), "inner")
      .withColumn("window_start", col("window.start").cast("long"))
      .drop("window")
  }

  /** Streaming INTERVAL join — the live form of
    * [[graft.ops.EnrichJoin.intervalJoin]] and the semantics of Flink's
    * DataStream `intervalJoin` (right rows within
    * `[left.ts + lowerUs, left.ts + upperUs]` of a same-key left row).
    *
    * Spark-first: NOT a custom state machine. A watermarked
    * stream-stream equi-join whose extra predicate is a TIME-RANGE
    * between the two event-time columns is exactly the shape Structured
    * Streaming derives state bounds from: each side buffers only rows
    * the range + the other side's watermark can still match, then
    * evicts — Flink's two-sided interval buffer, implemented by the
    * engine. Matches emit immediately (inner join does not wait for the
    * watermark; the watermark only bounds state).
    *
    * Column names must be disjoint across the two sides (stream-stream
    * joins cannot alias-disambiguate shared names at state-store level);
    * the caller passes each side's key and event-time column explicitly.
    * State scales with per-key traffic inside one interval — the same
    * bound as the batch form's bucket occupancy. */
  def intervalJoin(left: DataFrame, lKey: String, lTs: String,
                   right: DataFrame, rKey: String, rTs: String,
                   lowerUs: Long, upperUs: Long, delay: String): DataFrame =
    left.withWatermark(lTs, delay)
      .join(right.withWatermark(rTs, delay),
        col(lKey) === col(rKey) &&
          expr(s"$rTs >= $lTs + INTERVAL $lowerUs MICROSECOND") &&
          expr(s"$rTs <= $lTs + INTERVAL $upperUs MICROSECOND"),
        "inner")
}
