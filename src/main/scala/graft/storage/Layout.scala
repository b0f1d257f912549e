package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persistent storage layouts — the write-side half of the 100 TB
  * contract. Every read-side operator in graft assumes its inputs can be
  * laid out so the heavy exchanges disappear; this is the module that
  * produces those layouts.
  *
  * Two layouts, each matching a Spark planner capability:
  *
  *  - '''Bucketed tables''' (hash-partitioned files + catalog metadata):
  *    a join or aggregation keyed on the bucket column reads co-located
  *    buckets and plans with NO shuffle Exchange on the bucketed side.
  *    At 100 TB this converts the nightly fact⋈fact join from "shuffle
  *    both tables every run" to "shuffle once at write time, never at
  *    read time" — the single biggest recurring-cost lever a warehouse
  *    layout owns. `sortBy` additionally pre-sorts within each bucket
  *    file, which removes the per-run Sort under SortMergeJoin when
  *    there is one file per bucket.
  *
  *  - '''Hive-style partitioned directories''' (`partitionBy` columns in
  *    the path): a filter on the partition column prunes whole
  *    directories at PLANNING time — the scan never lists, opens, or
  *    reads a pruned partition. This is the layout for time-ranged fact
  *    data (`events` by day): an incremental job touching yesterday
  *    reads one directory of thousands regardless of total table size.
  *
  * The two compose (`writePartitionedBucketed`): partition directories
  * prune the time range, buckets inside each directory co-locate the
  * join key — the standard lakehouse fact layout.
  *
  * Bucketed writes go through `saveAsTable` (bucketing lives in catalog
  * metadata, not in the files), with an explicit `path` so the data
  * lands where the caller says (external table) rather than in the
  * session warehouse. Reads go through `spark.table(name)` — reading
  * the path directly sees plain parquet and silently loses the
  * exchange-free plans; LayoutSpec pins both directions.
  */
object Layout {

  /** Write `df` as an external bucketed parquet table: `buckets` hash
    * buckets on `key`, each bucket file sorted by `key` (plus any
    * `alsoSortBy` tiebreaks). Equi-joins and aggregations on `key`
    * against this table plan without a shuffle Exchange; matching
    * bucket counts on both join sides remove BOTH exchanges.
    *
    * The pre-write `repartition(buckets, key)` matters twice over: it
    * yields exactly ONE file per bucket (each writer task owns one
    * bucket id — repartition and bucketing share the same Murmur3
    * hash), which (a) lets the planner trust the per-bucket sort order
    * and drop the SortMergeJoin re-sort entirely, and (b) prevents the
    * tasks×buckets small-file explosion a naive bucketed write produces
    * at cluster parallelism. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int, alsoSortBy: Seq[String] = Nil): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key, alsoSortBy: _*)
      .option("path", path)
      .saveAsTable(table)

  /** Write `df` as Hive-style partitioned parquet directories. Callers
    * pick LOW-cardinality columns (a date, a source tag): each distinct
    * value is one directory, and at 100 TB a high-cardinality partition
    * column is death by small files. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** The composed lakehouse fact layout: partition directories for
    * pruning + buckets inside each for co-located joins. */
  def writePartitionedBucketed(df: DataFrame, table: String, path: String,
      partitionCols: Seq[String], key: String, buckets: Int): Unit =
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .partitionBy(partitionCols: _*)
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Catalog read — the ONLY read that sees bucket metadata. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Incremental re-ingest into a partitioned layout: replace ONLY the
    * partitions present in `df`, leaving every other directory's files
    * physically untouched. This is Spark's dynamic partition-overwrite
    * mode, scoped to this one write (the session conf is restored):
    * static mode — the default — would DELETE the whole table first,
    * which at 100 TB turns "re-run yesterday" into "rewrite three
    * years". The daily-correction workflow this exists for: recompute
    * one day, overwrite one directory. */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.get(key, "STATIC")
    spark.conf.set(key, "DYNAMIC")
    try df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
    finally spark.conf.set(key, prev)
  }

  /** Compact a parquet directory to approximately `targetBytes` files —
    * the small-file repair pass every long-lived ingest needs (streaming
    * sinks and fine-grained partition writes accumulate KB-sized files;
    * at 100 TB the scan's task-scheduling overhead becomes the
    * bottleneck long before the bytes do). Sizes the output file count
    * from the directory's actual on-disk bytes and rewrites to a
    * STAGING path: a compaction that rewrote in place would destroy the
    * source on a mid-job failure, so the atomic swap is left to the
    * caller's rename. Returns the file count written. */
  def compact(spark: SparkSession, path: String, stagingPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(stagingPath)
    nFiles
  }
}
