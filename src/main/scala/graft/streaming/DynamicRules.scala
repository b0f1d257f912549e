package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Dynamic rule enrichment — the Spark-native answer to Flink's
  * broadcast-state pattern (`BroadcastProcessFunction`: a low-volume
  * rule stream replicated to every parallel instance of a main-stream
  * operator; the closest reference surface is the connect/CoProcess
  * shared-state demo, test/StateTest.java — J2).
  *
  * Spark has no broadcast STATE; the supported refresh idiom is
  * PER-BATCH RE-PLANNING: `foreachBatch` re-builds the rules frame from
  * storage on every trigger, so a newly published snapshot (a fresh
  * versioned directory made visible by an atomic pointer flip) is
  * visible to the very next micro-batch, the
  * replication to all tasks is the broadcast hash join the planner
  * already picks for a small side, and rule updates ride ordinary table
  * commits instead of bespoke keyed state. The tempting shortcut — a
  * plain stream–static join against the rules path — does NOT work: the
  * static side's file index is pinned when the streaming query starts,
  * so the first snapshot overwrite kills the query with
  * FAILED_READ_FILE (DynamicRulesSpec pins this failure as the
  * motivation). Trade vs Flink: rules apply per micro-batch, not
  * per-record interleaved with the data stream — the right trade
  * wherever rules change slowly relative to triggers, which is the
  * broadcast-state use case.
  *
  * At scale the per-batch cost is one metadata listing + a
  * rules-snapshot read (KB-sized), and the main stream never shuffles
  * (broadcast join): zero exchanges added to the streaming plan. */
object DynamicRules {

  final case class Rule(eventType: String, minValue: Double, tag: String)

  /** Kept for callers/specs that size prune expectations here. */
  val KeepVersions: Int = SnapshotStore.KeepVersions

  /** Publish a rules snapshot — [[SnapshotStore.publish]] (versioned
    * immutable `v<n>` dirs + atomically published numbered marker)
    * after the rules-specific invariant check. */
  def publish(spark: SparkSession, path: String, rules: Seq[Rule]): Unit = {
    require(rules.map(_.eventType).distinct.length == rules.length,
      "one rule per event type per snapshot (a join key must not fan out)")
    import spark.implicits._
    SnapshotStore.publish(spark, path, rules.toDF("eventType", "minValue", "tag"))
  }

  /** Resolve the newest published snapshot's directory. */
  def currentSnapshot(spark: SparkSession, path: String): String =
    SnapshotStore.current(spark, path)

  /** Enrich ONE batch (a micro-batch inside [[start]], or any batch
    * frame) against the newest snapshot at `rulesPath`: events matching
    * a rule (same type, value ≥ threshold) carry its tag; the rest pass
    * through tagged 'none'. Reading the snapshot here — not outside the
    * per-batch closure — is what makes the rules dynamic. */
  def enrich(events: DataFrame, rulesPath: String): DataFrame = {
    val spark = events.sparkSession
    val rules = spark.read.parquet(currentSnapshot(spark, rulesPath))
      .select(col("eventType").as("event_type"), col("minValue"), col("tag"))
    events.join(broadcast(rules), Seq("event_type"), "left")
      .withColumn("matched",
        col("tag").isNotNull && col("value") >= col("minValue"))
      .select(events.columns.map(col) :+
        when(col("matched"), col("tag")).otherwise(lit("none")).as("rule_tag"): _*)
  }

  /** Run a streaming event frame with per-trigger rule refresh: each
    * micro-batch re-reads the snapshot and hands the enriched batch to
    * `sink` (which owns output semantics, as always with foreachBatch). */
  def start(events: DataFrame, rulesPath: String)
           (sink: (DataFrame, Long) => Unit): StreamingQuery =
    events.writeStream
      .foreachBatch((batch: DataFrame, id: Long) =>
        sink(enrich(batch, rulesPath), id))
      .start()
}
