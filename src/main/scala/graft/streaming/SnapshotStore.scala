package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned atomic-pointer snapshot storage — the publish/resolve
  * machinery behind every "low-volume artifact refreshed under a running
  * stream" stage ([[DynamicRules]] rules, [[StreamingBpe]] merge
  * chains). Each publish writes a FRESH immutable `v<n>` directory, then
  * atomically flips the one-line `CURRENT` pointer file onto it
  * (temp-write + overwrite-rename — atomic on HDFS and posix
  * filesystems). A reader that resolved the pointer before the flip
  * keeps scanning its old snapshot's files, which a publish never
  * touches — so concurrent publish-while-reading can neither fail a
  * micro-batch nor show it a half-written set. A plain
  * `mode("overwrite")` of one directory would: overwrite deletes before
  * it commits. Single writer assumed (concurrent publishers race the
  * version number, as with any non-transactional table format). */
object SnapshotStore {

  /** Snapshot directories kept after a publish (beyond CURRENT's, which
    * is always kept): slack for readers still scanning an older version
    * when the pointer flips. */
  val KeepVersions = 3

  private def fsFor(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Publish `df` as the next snapshot version under `path` and flip
    * CURRENT onto it; snapshots older than the newest [[KeepVersions]]
    * are pruned. The frame is coalesced to one file — snapshot artifacts
    * are KB-sized metadata by contract, not data. */
  def publish(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val (fs, base) = fsFor(spark, path)
    val next = listVersions(fs, base).lastOption.map(_._1 + 1).getOrElse(1L)
    val snap = new org.apache.hadoop.fs.Path(base, f"v$next%08d")
    df.coalesce(1).write.mode("overwrite").parquet(snap.toString)
    val tmp = new org.apache.hadoop.fs.Path(base, s".CURRENT.$next.tmp")
    val out = fs.create(tmp, true)
    try out.write(snap.getName.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(base.toUri,
        spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new org.apache.hadoop.fs.Path(base, "CURRENT"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    listVersions(fs, base).dropRight(KeepVersions)
      .filterNot(_._2.getName == snap.getName)
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  private def listVersions(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d{8}"))
      .map(s => (s.getPath.getName.drop(1).toLong, s.getPath))
      .sortBy(_._1)

  /** Resolve the CURRENT pointer to its snapshot directory. Fails
    * loudly — a missing pointer means nothing was ever published, and
    * silently serving an empty artifact would mask it. */
  def current(spark: SparkSession, path: String): String = {
    val (fs, base) = fsFor(spark, path)
    val ptr = new org.apache.hadoop.fs.Path(base, "CURRENT")
    require(fs.exists(ptr),
      s"no snapshot published at $path (missing CURRENT pointer)")
    val in = fs.open(ptr)
    val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
               finally in.close()
    new org.apache.hadoop.fs.Path(base, name).toString
  }
}
