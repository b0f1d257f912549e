package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned atomic snapshot storage — the publish/resolve machinery
  * behind every "low-volume artifact refreshed under a running stream"
  * stage ([[DynamicRules]] rules, [[StreamingBpe]] merge chains). Each
  * publish writes a FRESH immutable `v<n>` directory, then publishes an
  * immutable numbered MARKER file (`p<n>`, temp-write + rename to a
  * fresh name — atomic) naming it; readers resolve the current snapshot
  * by listing markers and taking the maximum. A reader that resolved
  * before the next publish keeps scanning its old snapshot's files,
  * which a publish never touches — so concurrent publish-while-reading
  * can neither fail a micro-batch nor show it a half-written set. A
  * plain `mode("overwrite")` of one directory would: overwrite deletes
  * before it commits.
  *
  * Why a marker LOG and not a mutable `CURRENT` pointer: on checksummed
  * filesystems (Hadoop's local FS) an overwrite-rename moves the data
  * file and its `.crc` sidecar as two operations, so a hot reader can
  * observe new pointer bytes under the old checksum and fail the
  * resolve (`graft.storage.VersionedServing`'s racing-reader spec
  * caught exactly this against a pointer-based first cut; same physics
  * here). Immutable numbered files renamed into fresh names have no
  * overwrite, hence no torn pair. Why a marker at all (vs taking the
  * max `v<n>` dir): the snapshot directory EXISTS before its parquet
  * write completes — the marker is published only after, so resolving
  * by marker can never land on a half-written snapshot, and a publish
  * that dies mid-write leaves an unmarked orphan dir the next publish's
  * prune sweeps. Single writer assumed (concurrent publishers race the
  * version number, as with any non-transactional table format). */
object SnapshotStore {

  /** Snapshot directories kept after a publish (the newest, which is
    * always kept, plus slack for readers still scanning an older
    * version when a new one is published). */
  val KeepVersions = 3

  private def fsFor(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Publish `df` as the next snapshot version under `path` and mark it
    * current; snapshots older than the newest [[KeepVersions]] are
    * pruned, along with any unmarked orphan of a crashed publish. The
    * frame is coalesced to one file — snapshot artifacts are KB-sized
    * metadata by contract, not data. */
  def publish(spark: SparkSession, path: String, df: DataFrame): Unit = {
    val (fs, base) = fsFor(spark, path)
    val markers = listMarkers(fs, base)
    val next = markers.lastOption.map(_._1 + 1).getOrElse(1L)
    val snap = new org.apache.hadoop.fs.Path(base, f"v$next%08d")
    df.coalesce(1).write.mode("overwrite").parquet(snap.toString)
    // the snapshot is complete: publish its marker (immutable, fresh name)
    val tmp = new org.apache.hadoop.fs.Path(base, f".p$next%08d.tmp")
    val out = fs.create(tmp, true)
    try out.write(snap.getName.getBytes("UTF-8")) finally out.close()
    val marker = new org.apache.hadoop.fs.Path(base, f"p$next%08d")
    require(fs.rename(tmp, marker), s"failed to publish snapshot marker $marker")
    // prune: markers beyond the newest KeepVersions, their dirs, and any
    // v-dir no kept marker names (a crashed publish's orphan)
    val kept = (markers.map(_._1) :+ next).takeRight(KeepVersions).toSet
    markers.filterNot(m => kept(m._1)).foreach(m => fs.delete(m._2, false))
    if (fs.exists(base)) fs.listStatus(base).foreach { s =>
      if (s.isDirectory && s.getPath.getName.matches("v\\d{8}") &&
          !kept(s.getPath.getName.drop(1).toLong) &&
          s.getPath.getName.drop(1).toLong < next)
        fs.delete(s.getPath, true)
    }
  }

  private def listMarkers(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq
      .filter(s => s.isFile && s.getPath.getName.matches("p\\d{8}"))
      .map(s => (s.getPath.getName.drop(1).toLong, s.getPath))
      .sortBy(_._1)

  /** Resolve the newest published snapshot's directory. Fails loudly —
    * no marker means nothing was ever published, and silently serving
    * an empty artifact would mask it. Markers are immutable, so
    * list-then-open is race-free against a publish; the one theoretical
    * gap — [[KeepVersions]] publishes landing between the list and the
    * open, pruning the listed marker — gets one re-list. */
  def current(spark: SparkSession, path: String): String = {
    val (fs, base) = fsFor(spark, path)
    def resolve(retry: Boolean): String = listMarkers(fs, base).lastOption match {
      case None => throw new IllegalArgumentException(
        s"requirement failed: no snapshot published at $path (missing marker)")
      case Some((_, marker)) =>
        try {
          val in = fs.open(marker)
          val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                     finally in.close()
          new org.apache.hadoop.fs.Path(base, name).toString
        } catch {
          case _: java.io.FileNotFoundException if retry => resolve(retry = false)
        }
    }
    resolve(retry = true)
  }
}
