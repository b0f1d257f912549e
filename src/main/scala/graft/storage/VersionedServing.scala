package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The SNAPSHOT-ISOLATED form of the events serving copy — the layout
  * that makes re-sealing safe under live readers.
  *
  * The problem ([[graft.streaming.PartitionedIngest.sealDays]]'s one
  * documented seam): the in-place serving copy overwrites
  * `ts_date=<day>/` directories while a reader that already resolved
  * the directory listing may still be scanning the old files — the
  * overwrite deletes them mid-flight, and the reader fails (or worse,
  * silently reads a half-replaced day). That is the maintenance-window
  * contract of the in-place form. This object removes the window with
  * the same move table formats make (and the repo's own
  * [[graft.streaming.SnapshotStore]] makes for KB-sized artifacts):
  * writers publish NEW immutable files plus a new numbered manifest
  * (renamed into place atomically), and retain superseded files
  * long enough for in-flight scans to finish. Unlike SnapshotStore, a
  * 100 TB serving copy can never be republished wholesale — so versions
  * share unchanged days: the manifest maps each day to the GENERATION
  * directory holding its current files, and a re-seal writes only the
  * changed days into a fresh generation. Seal cost stays O(days
  * changed); flip cost is one small file rename.
  *
  * ==Physical layout==
  * {{{
  *   root/manifests/m00000007              lines: "<day>\t<gen>"; the
  *                                         HIGHEST-numbered file IS the
  *                                         current version
  *   root/data/gseal=3/ts_date=2024-03-01/ one day's parquet files
  *                                         (+ the _graft_utc_days marker)
  * }}}
  *
  * There is deliberately NO mutable pointer file: manifests are
  * immutable, published by tmp-write + rename-to-a-fresh-name (atomic,
  * and free of the overwrite-rename checksum race a mutable CURRENT
  * has on checksummed filesystems — Hadoop's local FS renames a data
  * file and its `.crc` sidecar as two operations, so a hot reader can
  * observe new bytes under the old checksum; the racing-reader spec
  * caught exactly that against a pointer-based first cut). Readers
  * resolve the current version by listing `manifests/` and taking the
  * maximum — the same move log-structured table formats make.
  *
  * ==Reading==
  * [[read]] resolves the newest manifest → the day directories it names,
  * and reads them with `basePath = root/data`, so Spark's partition
  * discovery re-derives `gseal` and `ts_date` as partition columns from
  * the directory names. That keeps BOTH scale properties of the plain
  * layout: `ts_date` is a real partition column, so
  * [[graft.plans.PartitionDateInference]] still turns `ts` predicates
  * into planning-time directory pruning (each day directory carries the
  * UTC-day provenance marker the rule's trust gate requires), and the
  * relation is an ordinary parquet `HadoopFsRelation` — no custom
  * source, no loss of pushdown/codegen.
  *
  * ==Isolation contract==
  * A reader holds the manifest it resolved: its scan touches only that
  * manifest's generation directories, which no later publish modifies.
  * Publishes retain the newest [[KeepManifests]] manifests and every
  * day directory any of them references; a reader is safe as long as
  * its query outlives fewer than [[KeepManifests]] publishes (at one
  * seal per night, that is days of grace for a scan). Single writer
  * assumed, as with any non-transactional table format.
  *
  * [[expire]] is metadata-only — it publishes a manifest without the
  * expired days, and the bytes follow when the old manifests age out —
  * so retention also cannot fail a concurrent scan.
  *
  * ==Crash safety==
  * A seal that dies mid-write leaves an ORPHAN generation: day
  * directories no manifest references. Readers never see it (the
  * manifest owns visibility — the same property the streaming sink's
  * commit log gives the ingest side), the next seal takes a fresh
  * generation number (no collision), and the next successful publish's
  * reclaim sweep deletes it (unreferenced by any kept manifest) —
  * self-cleaning, spec-pinned.
  */
object VersionedServing {

  /** Conf key for the reader grace window: how many manifests (and the
    * day generations they reference) a publish retains. Sizing is
    * per-deployment arithmetic: a reader is safe while its scan
    * outlives fewer than this many PUBLISHES, so the window must cover
    * `longest expected scan ÷ shortest publish interval`. At one
    * nightly seal the default 3 is days of grace; a deployment driving
    * [[sealDays]]/[[sealTouched]] per micro-batch compresses the same 3
    * to minutes and must raise this key (or pin long-lived snapshots
    * out of the window with [[archive]]). A scan that DOES outlive the
    * window fails mid-flight on deleted files — loudly, never silently
    * wrong, because superseded files are deleted, not replaced in
    * place (spec-pinned: VersionedServingSpec "a reader that outlives
    * the grace window"). */
  val KeepManifestsKey = "spark.graft.layout.serving.keepManifests"

  /** Default for [[KeepManifestsKey]]. */
  val KeepManifests = 3

  /** Conf key for the TIME floor on the grace window: manifests younger
    * than this many milliseconds are retained regardless of
    * [[KeepManifestsKey]]'s count. The count alone is publish-RATE
    * relative: the same `3` that gives days of grace at one nightly
    * seal compresses to minutes under a [[sealTouched]] driven
    * per-micro-batch — a burst of publishes could reclaim a manifest
    * out from under a scan that started seconds ago. The floor makes
    * the guarantee wall-clock: size it to the longest expected scan
    * (e.g. 6h = 21600000). Default 0 (disabled — count-only, the
    * historical behavior). Reclaim keeps the UNION of the newest
    * `keepManifests` and everything younger than the floor, so setting
    * both never weakens either. Age is computed from filesystem mtimes
    * on BOTH sides (each old manifest's mtime vs the newest manifest's
    * mtime) — one clock, the store's own — so writer-host clock skew
    * cannot shorten the guarantee; what remains assumed is only that
    * the store's mtimes are monotone across publishes. */
  val KeepManifestsMsKey = "spark.graft.layout.serving.keepManifestsMs"

  private def keepManifests(spark: SparkSession): Int = {
    val n = spark.conf.get(KeepManifestsKey, KeepManifests.toString).toInt
    require(n >= 1, s"$KeepManifestsKey must be >= 1 (got $n)")
    n
  }

  private def keepManifestsMs(spark: SparkSession): Long = {
    val ms = spark.conf.get(KeepManifestsMsKey, "0").toLong
    require(ms >= 0, s"$KeepManifestsMsKey must be >= 0 (got $ms)")
    ms
  }

  /** The generation partition column's name in the pool layout. Chosen
    * to be collision-unlikely; [[seal]]/[[sealDays]] refuse schemas
    * that already carry it. */
  val GenCol = "gseal"

  /** The transient Morton-curve column [[zCluster]] appends and drops
    * around the clustered write; seals refuse schemas that carry it. */
  private val ZCol = "__zv"

  /** Cluster one day slice on the Morton curve of two integer-like
    * columns before it lands in its generation directory — the
    * WITHIN-DAY analogue of the date partitioning: directories prune
    * the day, and per-file/row-group min-max stats then prune BOTH
    * clustered columns inside it ([[Layout.zValue]]'s contract; a
    * linear sort would leave the second column unprunable). Write-path
    * cost only: one narrow min/max pass over the slice plus a range
    * exchange on the curve — the read path stays an ordinary parquet
    * scan, now with tight footer rectangles. Bounds are computed per
    * sealed slice, so a day's 256 time cells span that day (not the
    * table's whole history — the bootstrap form's one compromise).
    *
    * Null handling: if EVERY bound is null the slice is empty and is
    * returned as-is (the caller's write then produces an empty
    * directory exactly as the unclustered path would); a null bound on
    * a non-empty slice means a null-valued cluster column, which has no
    * place on the curve — that raises rather than silently degrading
    * the layout the deployment was promised. */
  private def zCluster(df: DataFrame, nFiles: Int, zorder: (String, String)): DataFrame =
    zvalueFor(df, zorder) match {
      case None => df
      case Some(zv) =>
        df.withColumn(ZCol, zv)
          .repartitionByRange(nFiles, col(ZCol))
          .sortWithinPartitions(ZCol)
          .drop(ZCol)
    }

  /** The Morton value of `df` over the observed bounds of the two
    * cluster columns, or None when `df` is empty (every bound null —
    * the caller writes the empty slice exactly as the unclustered path
    * would). One narrow min/max pass. */
  private def zvalueFor(df: DataFrame,
      zorder: (String, String)): Option[org.apache.spark.sql.Column] = {
    val (a, b) = zorder
    require(!df.columns.contains(ZCol),
      s"sink schema already carries a '$ZCol' column — the clustered seal reserves it")
    val r = df.agg(min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).head
    if ((0 until 4).forall(r.isNullAt)) None
    else {
      require((0 until 4).forall(!r.isNullAt(_)),
        s"z-order columns ($a, $b) must be non-null integer-like; " +
          "got a null bound on a non-empty slice")
      Some(Layout.zValue(col(a), r.getLong(0), r.getLong(1),
        col(b), r.getLong(2), r.getLong(3)))
    }
  }

  private def fsFor(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Does `root` hold a versioned serving copy? (The deployment seam —
    * `Layout.EventsServingDirKey` — accepts either form and dispatches
    * on this.) True once the first manifest is published: point readers
    * at a versioned root only after its first seal. */
  def isVersioned(spark: SparkSession, root: String): Boolean = {
    val (fs, base) = fsFor(spark, root)
    manifestFiles(fs, base).nonEmpty
  }

  private def manifestFiles(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
    val mdir = new org.apache.hadoop.fs.Path(base, "manifests")
    if (!fs.exists(mdir)) Nil
    else fs.listStatus(mdir).toSeq
      .filter(s => s.isFile && s.getPath.getName.matches("m\\d{8}"))
      .map(_.getPath).sortBy(_.getName)
  }

  /** One published snapshot: the day→generation map, plus the READ
    * SCHEMA pinned at publish time (`#schema\t<ddl>` header line).
    * Pinning the schema in the manifest is what makes the copy
    * schema-EVOLVABLE: without it, a read over generations written
    * before and after a sink widening infers its columns from whichever
    * file the planner samples first — nondeterministic column presence,
    * the silent failure mode of mixed-schema multi-root reads. With it,
    * every snapshot reads with exactly the schema its publish declared
    * (older files null-fill columns they predate; removed columns are
    * ignored), and TIME TRAVEL is schema-exact: [[readAt]] serves each
    * version with the columns that version had. Manifests published
    * before this header existed have no pinned schema and fall back to
    * inference — the pre-evolution behavior they were written under.
    *
    * `sealedThrough` (`#sealedThrough\t<batchId>` header) is the
    * PRODUCER-side bookmark: the highest sink `_spark_metadata` batch id
    * whose files this snapshot is known to cover. [[sealTouched]] reads
    * it to derive "which days did the ingest touch since the last
    * close-out" without anyone naming the days — the twin of the
    * consumer-side [[readChangedDays]]. Carried forward by publishes
    * that learn nothing new about the sink ([[expire]], a manual
    * [[sealDays]], [[sealFrame]] over an arbitrary frame); absent on
    * roots never sealed from a sink (then [[sealTouched]]'s first run
    * covers the whole log). */
  private case class Manifest(days: Map[String, Long], schemaDdl: Option[String],
      sealedThrough: Option[Long],
      refused: Map[String, Long] = Map.empty)

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      mf: org.apache.hadoop.fs.Path): Manifest = {
    val in = fs.open(mf)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
                finally in.close()
    val schema = lines.collectFirst {
      case l if l.startsWith("#schema\t") => l.stripPrefix("#schema\t") }
    val sealedThrough = lines.collectFirst {
      case l if l.startsWith("#sealedThrough\t") =>
        l.stripPrefix("#sealedThrough\t").toLong }
    val refused = lines.collect {
      case l if l.startsWith("#refused\t") =>
        val Array(day, batch) = l.stripPrefix("#refused\t").split('\t')
        day -> batch.toLong
    }.toMap
    val days = lines.filter(l => l.nonEmpty && !l.startsWith("#")).map { l =>
      val Array(day, gen) = l.split('\t'); day -> gen.toLong
    }.toMap
    Manifest(days, schema, sealedThrough, refused)
  }

  /** Resolve the newest manifest's day→generation map. Empty map if
    * nothing was ever published. Manifests are immutable once renamed
    * into place, so list-then-open is race-free against a publish; the
    * one theoretical gap — [[KeepManifests]] publishes landing between
    * the list and the open, deleting the listed file — gets one
    * re-list. */
  def currentManifest(spark: SparkSession, root: String): Map[String, Long] =
    currentManifestFull(spark, root).days

  private def currentManifestFull(spark: SparkSession, root: String): Manifest = {
    val (fs, base) = fsFor(spark, root)
    manifestFiles(fs, base).lastOption match {
      case None => Manifest(Map.empty, None, None)
      case Some(mf) =>
        try readManifest(fs, mf)
        catch { case _: java.io.FileNotFoundException =>
          manifestFiles(fs, base).lastOption.map(readManifest(fs, _))
            .getOrElse(Manifest(Map.empty, None, None))
        }
    }
  }

  /** The snapshot read: the newest manifest's day directories under one basePath.
    * Returns the frame WITH the `gseal`/`ts_date` partition columns —
    * the serving accessor ([[Layout.servingEvents]]) drops them to the
    * raw schema. Fails loudly on an empty manifest: silently serving
    * zero rows would mask a never-sealed deployment. */
  def read(spark: SparkSession, root: String): DataFrame =
    readManifestMap(spark, root, currentManifestFull(spark, root),
      "no sealed days published at " + root)

  /** TIME TRAVEL: read the snapshot a specific manifest version
    * published — the reproducibility primitive a training pipeline
    * needs ("which exact corpus did run X read?"): record
    * [[currentVersion]] when a run starts, and any job inside the
    * retention window re-reads bit-identical data regardless of
    * re-seals since. Versions older than the [[KeepManifests]] window
    * are gone — this fails loudly then (extend the window, or archive
    * the manifest AND its generations, before relying on long-horizon
    * reproducibility). */
  def readAt(spark: SparkSession, root: String, version: Long): DataFrame = {
    val (fs, base) = fsFor(spark, root)
    val mf = manifestFiles(fs, base).find(_.getName.drop(1).toLong == version)
      .getOrElse(throw new IllegalArgumentException(
        s"version $version not retained at $root " +
          s"(have: ${versions(spark, root).mkString(", ")}; " +
          s"$KeepManifestsKey=${keepManifests(spark)})"))
    readManifestMap(spark, root, readManifest(fs, mf),
      s"version $version at $root is an empty snapshot")
  }

  /** ARCHIVE a retained version into a standalone versioned root — the
    * long-horizon leg of [[readAt]]'s reproducibility contract: the
    * rolling [[KeepManifests]] window guarantees days of grace, but a
    * training run that must be re-readable months later needs its
    * snapshot pinned OUTSIDE the window before it ages out. Copies the
    * version's day directories (generation structure preserved —
    * per-day cost, days it shares with newer versions are copied, not
    * referenced: an archive that referenced the live root would be
    * silently hollowed out by the very reclaim it exists to survive)
    * and publishes them under `archiveRoot` as that root's first
    * manifest, so every reader — [[read]], [[Layout.servingEvents]],
    * the `events.servingDir` deployment seam, and
    * [[graft.plans.PartitionDateInference]]'s provenance-gated pruning
    * (the markers travel with the day directories) — works on the
    * archive unchanged. Fails loudly if `archiveRoot` already has a
    * manifest (archives are immutable; use a fresh root per pin) or if
    * the version is no longer retained. Returns the bytes copied. */
  def archive(spark: SparkSession, root: String, version: Long,
      archiveRoot: String): Long = {
    val (fs, base) = fsFor(spark, root)
    val (afs, _) = fsFor(spark, archiveRoot) // may be a DIFFERENT filesystem (cold storage)
    require(manifestFiles(afs, new org.apache.hadoop.fs.Path(archiveRoot)).isEmpty,
      s"$archiveRoot already holds a versioned serving copy — archives are immutable")
    val mf = manifestFiles(fs, base).find(_.getName.drop(1).toLong == version)
      .getOrElse(throw new IllegalArgumentException(
        s"version $version not retained at $root (have: ${versions(spark, root).mkString(", ")})"))
    val m = readManifest(fs, mf)
    // enumerate once on the driver (O(files) metadata), copy on the
    // CLUSTER: a snapshot is table-sized, and a driver-side FileUtil
    // loop would bottleneck the pin on one machine's NIC. distcp-style:
    // each task copies whole files byte-identically (layout, footer
    // stats, and the provenance markers all survive).
    val files: Seq[(String, String, Long)] = m.days.toSeq.sortBy(_._1).flatMap {
      case (day, gen) =>
        val from = new org.apache.hadoop.fs.Path(s"$root/data/$GenCol=$gen/ts_date=$day")
        fs.listStatus(from).toSeq.filter(_.isFile).map { st =>
          (st.getPath.toString,
            s"$archiveRoot/data/$GenCol=$gen/ts_date=$day/${st.getPath.getName}",
            st.getLen)
        }
    }
    val bytes = files.map(_._3).sum
    val hc = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val slices = math.max(1, math.min(files.length,
      spark.sparkContext.defaultParallelism))
    spark.sparkContext
      .parallelize(files.map(f => (f._1, f._2)), slices)
      .foreach { case (src, dst) =>
        val sp = new org.apache.hadoop.fs.Path(src)
        val dp = new org.apache.hadoop.fs.Path(dst)
        val sfs = sp.getFileSystem(hc.value)
        val dfs = dp.getFileSystem(hc.value)
        if (!org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp, false, true, hc.value))
          throw new java.io.IOException(s"archive copy failed: $src -> $dst")
      }
    postArchiveCopyHook()
    // distcp-grade verification BEFORE the manifest publishes: every
    // copied file must exist at the destination with the source's exact
    // length — an archive is a reproducibility pin, and one that
    // published over a short or missing copy would silently fail the
    // one job it exists for, months later. Length is the right check
    // here: FileUtil.copy already streamed the bytes and parquet is
    // length-framed (footer offset at EOF), so a truncated file cannot
    // parse — what this guards is a copy that LIED about completing
    // (eventual-consistency visibility, a partial multipart commit).
    // Runs on the cluster like the copy itself; metadata-only per file.
    val bad = spark.sparkContext
      .parallelize(files.map(f => (f._2, f._3)), slices)
      .flatMap { case (dst, expected) =>
        val dp = new org.apache.hadoop.fs.Path(dst)
        val dfs = dp.getFileSystem(hc.value)
        val actual =
          if (dfs.exists(dp)) dfs.getFileStatus(dp).getLen else -1L
        if (actual == expected) None
        else Some(s"$dst: expected $expected bytes, found " +
          (if (actual < 0) "no file" else s"$actual"))
      }.collect()
    require(bad.isEmpty,
      s"archive verification failed — NOT publishing $archiveRoot " +
        s"(the copied files remain for inspection):\n${bad.mkString("\n")}")
    publish(spark, archiveRoot, m.days, m.schemaDdl, m.sealedThrough, m.refused)
    bytes
  }

  /** Test seam between [[archive]]'s copy and its verification pass
    * (the spec corrupts one copied file here to pin "a bad copy refuses
    * to publish"). Production no-op. */
  private[graft] var postArchiveCopyHook: () => Unit = () => ()

  /** What changed between two retained versions, manifest-level
    * (metadata-only — no data read): days re-sealed into a new
    * generation, days added, days dropped. The nightly audit: "last
    * night's close-out touched exactly yesterday plus the two
    * late-event days" is one call, not a directory crawl. */
  def diff(spark: SparkSession, root: String, fromVersion: Long,
      toVersion: Long): VersionDiff = {
    val (fs, base) = fsFor(spark, root)
    def manifestAt(v: Long) = manifestFiles(fs, base)
      .find(_.getName.drop(1).toLong == v)
      .map(readManifest(fs, _))
      .getOrElse(throw new IllegalArgumentException(
        s"version $v not retained at $root (have: ${versions(spark, root).mkString(", ")})"))
    val (from, to) = (manifestAt(fromVersion).days, manifestAt(toVersion).days)
    VersionDiff(
      resealed = to.keySet.intersect(from.keySet)
        .filter(d => to(d) != from(d)).toSeq.sorted,
      added = (to.keySet -- from.keySet).toSeq.sorted,
      dropped = (from.keySet -- to.keySet).toSeq.sorted)
  }

  /** [[diff]]'s result: day values per change class. */
  case class VersionDiff(resealed: Seq[String], added: Seq[String], dropped: Seq[String]) {
    def isEmpty: Boolean = resealed.isEmpty && added.isEmpty && dropped.isEmpty
  }

  /** The CHANGED-DAYS feed: everything version `toVersion` serves for
    * the days that changed since `fromVersion` (re-sealed or added —
    * dropped days have nothing to read). This is the incremental
    * consumer's primitive: a downstream job that processed v_from
    * (incremental dedup, a rollup delta, an index refresh) re-processes
    * exactly the day slices last night's close-out touched instead of
    * re-scanning the table — day-DELTA cost, manifest-resolved, no
    * directory crawl, no data read to decide. Day granularity is the
    * honest contract: a re-sealed day's rows are served whole (the
    * manifest does not know which rows within the day are late
    * arrivals), so consumers overwrite per day — idempotent by
    * construction, the same per-day replace discipline the seal itself
    * uses. Returns None when nothing changed (an empty multi-root
    * parquet read cannot be planned; None is the "skip tonight's run"
    * signal, distinct from an empty-but-changed day, which cannot
    * occur — a served day always has files). Reads with `toVersion`'s
    * pinned schema. */
  def readChangedDays(spark: SparkSession, root: String, fromVersion: Long,
      toVersion: Long): Option[DataFrame] = {
    val d = diff(spark, root, fromVersion, toVersion)
    val changed = (d.resealed ++ d.added).sorted
    if (changed.isEmpty) None
    else {
      val (fs, base) = fsFor(spark, root)
      val to = manifestFiles(fs, base)
        .find(_.getName.drop(1).toLong == toVersion)
        .map(readManifest(fs, _)).get // diff above already validated it
      Some(readManifestMap(spark, root,
        Manifest(to.days.view.filterKeys(changed.contains).toMap, to.schemaDdl,
          to.sealedThrough),
        s"no changed days between v$fromVersion and v$toVersion at $root"))
    }
  }

  /** Retained manifest versions, oldest first. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, base) = fsFor(spark, root)
    manifestFiles(fs, base).map(_.getName.drop(1).toLong)
  }

  /** The newest published version id (what [[read]] serves). */
  def currentVersion(spark: SparkSession, root: String): Long =
    versions(spark, root).lastOption.getOrElse(
      throw new IllegalArgumentException(s"nothing published at $root"))

  private def readManifestMap(spark: SparkSession, root: String,
      m: Manifest, emptyMsg: String): DataFrame = {
    require(m.days.nonEmpty, emptyMsg)
    val paths = m.days.toSeq.sortBy(_._1).map { case (day, gen) =>
      s"$root/data/$GenCol=$gen/ts_date=$day" }
    val reader = spark.read.option("basePath", s"$root/data")
    // the pinned schema makes mixed-schema generations deterministic
    // (see [[Manifest]]); manifests from before the header fall back to
    // sample-file inference, the behavior they were published under
    m.schemaDdl.map(ddl => reader.schema(
        org.apache.spark.sql.types.StructType.fromDDL(ddl)))
      .getOrElse(reader)
      .parquet(paths: _*)
  }

  /** Full snapshot seal of a streaming sink (the versioned counterpart
    * of [[graft.streaming.PartitionedIngest.seal]], same horizon
    * semantics): every kept day is rewritten into one fresh generation,
    * the manifest lists exactly those days, and days the previous
    * manifest had but the sink no longer does simply drop out — full
    * seal IS the snapshot. `keepFrom` days-strictly-older are excluded
    * and counted ([[graft.streaming.PartitionedIngest.SealStats]]'s
    * beyond-horizon alert hook) AND recorded as durable `#refused`
    * manifest entries ([[refusedLates]]) — the same survives-the-cron-
    * log contract as [[sealTouched]]'s refusal path, keyed by the
    * bookmark this seal advances to. */
  def seal(spark: SparkSession, sinkPath: String, root: String,
      keepFrom: Option[String] = None,
      zorder: Option[(String, String)] = None,
      writeOptions: Map[String, String] = Map.empty)
      : graft.streaming.PartitionedIngest.SealStats = {
    // a full seal of a streaming sink covers everything the commit log
    // has: bookmark the log's latest batch id so sealTouched's next
    // close-out only looks at batches after it. The bookmark is taken
    // BEFORE the sink DataFrame pins its committed-file snapshot
    // (MetadataLogFileIndex is built eagerly at spark.read) — bookmark
    // ≤ data snapshot, so a batch committed between the two is in the
    // sealed data AND re-sealed at the next close-out (over-report,
    // idempotent) rather than recorded-but-absent (stale forever).
    val bookmark = graft.streaming.PartitionedIngest.latestBatch(spark, sinkPath)
    preSealSnapshotHook()
    sealFrameWith(spark, spark.read.parquet(sinkPath), root, keepFrom, zorder,
      writeOptions, bookmark)
  }

  /** Test seam: runs between [[seal]]'s bookmark read and its sink
    * snapshot pin — the window a live ingest can commit into. The spec
    * drives a real mid-gap commit through it and proves the invariant
    * (bookmark ≤ snapshot: the commit is in the sealed data AND
    * re-discovered by the next close-out). No-op in production. */
  private[graft] var preSealSnapshotHook: () => Unit = () => ()

  /** [[seal]] over an arbitrary frame carrying a `ts_date` DateType
    * column — the batch BOOTSTRAP form: build the first versioned
    * serving copy directly from an existing batch table (no
    * intermediate sink-form write). [[ServingBootstrap]] is the CLI.
    *
    * `zorder = Some((a, b))` writes every day Z-ordered on the Morton
    * curve of the two columns ([[zCluster]]'s contract). The bootstrap
    * form computes ONE bound pass over the whole kept frame — so a
    * time-like cluster column's 256 cells span the full history, not
    * one day; the nightly [[sealDays]] re-seals with per-day bounds and
    * finer cells, converging the layout day by day. */
  def sealFrame(spark: SparkSession, all: DataFrame, root: String,
      keepFrom: Option[String] = None,
      zorder: Option[(String, String)] = None,
      writeOptions: Map[String, String] = Map.empty)
      : graft.streaming.PartitionedIngest.SealStats =
    // an arbitrary frame says nothing about a sink's commit log: carry
    // the current bookmark forward (None on a fresh bootstrap root)
    sealFrameWith(spark, all, root, keepFrom, zorder, writeOptions,
      currentManifestFull(spark, root).sealedThrough)

  private def sealFrameWith(spark: SparkSession, all: DataFrame, root: String,
      keepFrom: Option[String],
      zorder: Option[(String, String)],
      writeOptions: Map[String, String],
      sealedThrough: Option[Long])
      : graft.streaming.PartitionedIngest.SealStats = {
    require(!all.columns.map(_.toLowerCase).contains(GenCol),
      s"sink schema already carries a '$GenCol' column — the pool layout reserves it")
    val horizon = keepFrom.map(d => lit(d).cast("date"))
    val kept = horizon.map(h => all.filter(col("ts_date") >= h)).getOrElse(all)
    // per-day counts of the dropped slice (bounded by the day count):
    // the row total feeds SealStats, the day keys become durable
    // #refused records below — a full seal dropping beyond-horizon rows
    // must not be the one path whose alert lives only in the cron log
    val beyondByDay = horizon.map(h =>
        all.filter(col("ts_date") < h).groupBy(col("ts_date")).count()
          .collect().map(r => (r.get(0).toString, r.getLong(1))).toMap)
      .getOrElse(Map.empty[String, Long])
    val beyond = beyondByDay.values.sum
    val gen = nextGen(spark, root)
    val genDir = s"$root/data/$GenCol=$gen"
    val laid = zorder.flatMap(zvalueFor(kept, _)) match {
      case None => kept
      case Some(zv) =>
        // range by (day, curve): each output file holds one day's
        // contiguous curve segment, so the partitionBy split below
        // never shreds a file's rectangle across day directories
        kept.withColumn(ZCol, zv)
          .repartitionByRange(col("ts_date"), col(ZCol))
          .sortWithinPartitions("ts_date", ZCol)
          .drop(ZCol)
    }
    laid.write.options(writeOptions).partitionBy("ts_date").parquet(genDir)
    val days = markDays(spark, genDir)
    publish(spark, root, days.map(_ -> gen).toMap,
      Some(pinnedSchemaDdl(
        org.apache.spark.sql.types.StructType(
          laid.schema.filterNot(_.name == "ts_date")))),
      sealedThrough,
      // a full seal rewrites the data but does not act on PRIOR
      // refusals (the durable alert stands until acknowledged); days it
      // dropped at the horizon ITSELF join the record, keyed by the
      // bookmark batch (-1 on a bootstrap with no sink log) — same
      // durability contract as [[sealTouched]]'s refusal path
      currentManifestFull(spark, root).refused ++
        beyondByDay.keys.map(_ -> sealedThrough.getOrElse(-1L)))
    // count from the generation just written (ours, immutable): one
    // sink read for the data, footer-level reads for the statistic
    val rowsSealed = if (days.isEmpty) 0L else spark.read.parquet(genDir).count()
    graft.streaming.PartitionedIngest.SealStats(rowsSealed, beyond)
  }

  /** Incremental seal — the versioned counterpart of
    * [[graft.streaming.PartitionedIngest.sealDays]], same O(days
    * changed) cost shape and file-sizing arithmetic, but each day's new
    * files land in a FRESH generation directory and become visible only
    * at the manifest publish: a reader mid-scan of the old day keeps
    * its files (retained for [[KeepManifests]] publishes). Days listed
    * but absent from the sink are left at their current generation —
    * deleting a day is [[expire]]'s job. Returns rows written, counted
    * from the freshly written directories (one sink read per day, and
    * no race against a live ingest).
    *
    * `parallelism` > 1 runs the per-day jobs on that many driver
    * threads (Spark schedules concurrent jobs' tasks normally): the
    * nightly "yesterday plus every late-touched day" re-seal is a set
    * of INDEPENDENT day-sized jobs, and running them serially
    * under-utilizes a cluster by exactly that factor — each job alone
    * is one day's partitions wide. All days still become visible in
    * ONE manifest publish at the end, so partial progress is never
    * served; if any day's write fails, nothing publishes and the
    * written directories are the orphan generation the next publish's
    * sweep reclaims (the crash-safety contract).
    *
    * `zorder = Some((a, b))` lays each day out on the Morton curve of
    * the two columns with bounds computed from THAT day's slice
    * ([[zCluster]]): within-day min/max skipping on both columns, at
    * the cost of one narrow bound pass per day and a range exchange in
    * place of the plain round-robin one — priced in SCALEPROBE_r17.
    *
    * `writeOptions` pass through to the parquet writer of every day —
    * the seam for footer-self-contained physical knobs
    * ([[Layout.bloomOptions]] for point-lookup bloom filters, row-group
    * or dictionary sizing). Catalog-coupled layouts (bucketing) stay
    * excluded by design — see SCALING.md's serving-copy section. */
  def sealDays(spark: SparkSession, sinkPath: String, root: String,
      days: Seq[String], targetBytes: Long = 128L * 1024 * 1024,
      parallelism: Int = 1, zorder: Option[(String, String)] = None,
      writeOptions: Map[String, String] = Map.empty): Long =
    // a manual day list proves nothing about log coverage: carry the
    // bookmark forward unchanged (sealTouched may re-seal these days —
    // an idempotent per-day snapshot, never a wrong answer)
    sealDaysWith(spark, sinkPath, root, days, targetBytes, parallelism,
      zorder, writeOptions,
      currentManifestFull(spark, root).sealedThrough)

  private def sealDaysWith(spark: SparkSession, sinkPath: String, root: String,
      days: Seq[String], targetBytes: Long,
      parallelism: Int, zorder: Option[(String, String)],
      writeOptions: Map[String, String],
      sealedThrough: Option[Long],
      extraRefused: Map[String, Long] = Map.empty): Long = {
    require(days.nonEmpty, "sealDays needs at least one day")
    require(days.distinct.length == days.length, s"duplicate days in $days")
    val hc = spark.sparkContext.hadoopConfiguration
    val gen = nextGen(spark, root)

    def sealOne(day: String): Option[(Long, org.apache.spark.sql.types.StructType)] = {
      val dayDir = new org.apache.hadoop.fs.Path(s"$sinkPath/ts_date=$day")
      val fs = dayDir.getFileSystem(hc)
      if (!fs.exists(dayDir)) None
      else {
        val bytes = fs.getContentSummary(dayDir).getLength
        val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        val out = s"$root/data/$GenCol=$gen/ts_date=$day"
        val slice = spark.read.parquet(sinkPath)
          .filter(col("ts_date") === lit(day).cast("date"))
          .drop("ts_date") // the directory name IS the partition value
        require(!slice.columns.map(_.toLowerCase).contains(GenCol),
          s"sink schema already carries a '$GenCol' column — the pool layout reserves it")
        val laid = zorder.map(zCluster(slice, nFiles, _))
          .getOrElse(slice.repartition(nFiles))
        laid.write.options(writeOptions).parquet(out)
        Layout.markUtcDays(spark, out)
        Some((spark.read.parquet(out).count(), slice.schema))
      }
    }

    val written: Seq[(String, Long, org.apache.spark.sql.types.StructType)] =
      if (parallelism <= 1)
        days.flatMap(d => sealOne(d).map { case (n, sc) => (d, n, sc) })
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(parallelism, days.length))
        try {
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutor(pool)
          val fs = days.map(d => scala.concurrent.Future(
            sealOne(d).map { case (n, sc) => (d, n, sc) }))
          scala.concurrent.Await
            .result(scala.concurrent.Future.sequence(fs),
              scala.concurrent.duration.Duration.Inf)
            .flatten
        } finally pool.shutdown()
      }
    val cur = currentManifestFull(spark, root)
    // the re-seal's schema becomes the snapshot's (latest writer wins —
    // unchanged generations null-fill columns they predate), taken from
    // the day slices already read above: every slice shares the sink
    // read's inferred schema, so the first one IS the sink schema — no
    // extra sink-wide listing+inference pass per nightly publish. A
    // publish that wrote nothing carries the current schema forward.
    val schema =
      if (written.nonEmpty) Some(pinnedSchemaDdl(written.head._3))
      else cur.schemaDdl
    publish(spark, root, cur.days ++ written.map(w => w._1 -> gen), schema,
      sealedThrough, cur.refused ++ extraRefused)
    written.map(_._2).sum
  }

  /** What [[sealTouched]] did: the days it re-sealed (empty when the
    * sink committed nothing new), rows written, the sink batch id the
    * serving copy is now bookmarked through (unchanged when nothing
    * published), and any touched days it REFUSED to seal because they
    * fall before the retention horizon — the alert hook: a late row
    * for an expired day must never resurrect the partition, and a
    * silently skipped day is an operational blind spot. */
  final case class TouchedSealStats(days: Seq[String], rowsSealed: Long,
      sealedThrough: Option[Long], beyondHorizon: Seq[String])

  /** The SELF-DRIVING nightly close-out — [[sealDays]] with the day
    * list derived from the sink itself, closing the lifecycle's last
    * human-error seam: an operator-supplied day list can forget a
    * late-touched day, which then sits silently stale in the serving
    * copy forever (the consumer side has [[readChangedDays]]; this is
    * the producer-side twin). The day list comes from the sink's
    * `_spark_metadata` commit log: files committed in batches AFTER the
    * current manifest's `#sealedThrough` bookmark name their
    * `ts_date=` directories
    * ([[graft.streaming.PartitionedIngest.daysTouchedSince]]), and the
    * publish records the new bookmark — so a late event landing in an
    * old day is picked up by the next close-out without anyone naming
    * the day. Metadata-only when nothing changed: no data read, no
    * publish, no manifest churn.
    *
    * The bookmark is taken BEFORE the day slices are read, so rows a
    * live ingest commits mid-seal are both (a) included in the sealed
    * days they touch — sealing is a per-day snapshot of sink truth —
    * and (b) re-sealed by the NEXT close-out, whose log scan starts
    * below them. Conservative on both sides; never a lost row.
    * Over-report is equally safe: a log compaction inside the scanned
    * range replays old files, and if the pre-bookmark baseline has aged
    * out of the log those days re-seal as idempotent no-op rewrites
    * (under-report is impossible — see `daysTouchedSince`).
    *
    * `keepFrom` is the retention horizon ([[seal]]'s contract): touched
    * days strictly older are NOT sealed — a close-out must never
    * resurrect an expired partition — and come back in
    * [[TouchedSealStats.beyondHorizon]] for the caller's alerting.
    * Alert semantics: the refusal repeats at every close-out while
    * nothing else publishes (a refusal alone never advances the
    * bookmark). Once other days seal, the bookmark moves past the
    * refused rows — and THAT publish records them durably as `#refused`
    * manifest entries ([[refusedLates]]), carried by every later
    * publish until [[acknowledgeRefusals]]: the returned
    * `beyondHorizon` is delivered once, but the record survives the
    * cron log. The rows themselves are never lost: they stay in the
    * sink, and extending retention + a manual [[sealDays]] of the day
    * (or a full [[seal]]) folds them in.
    * Remaining knobs pass through to [[sealDays]]. */
  def sealTouched(spark: SparkSession, sinkPath: String, root: String,
      keepFrom: Option[String] = None,
      targetBytes: Long = 128L * 1024 * 1024,
      parallelism: Int = 1, zorder: Option[(String, String)] = None,
      writeOptions: Map[String, String] = Map.empty): TouchedSealStats = {
    val cur = currentManifestFull(spark, root)
    graft.streaming.PartitionedIngest
        .daysTouchedSince(spark, sinkPath, cur.sealedThrough) match {
      case None => // not a streaming sink, or no batch ever committed
        TouchedSealStats(Nil, 0L, cur.sealedThrough, Nil)
      case Some(t) =>
        val (beyond, due) = t.days.partition(d => keepFrom.exists(d < _))
        if (due.isEmpty)
          // nothing to write; leaving the bookmark unchanged keeps the
          // next scan metadata-cheap (it re-reads a few empty batches)
          // and avoids publishing a manifest that changes nothing
          TouchedSealStats(Nil, 0L, cur.sealedThrough, beyond)
        else {
          // this publish advances the bookmark PAST the refused days'
          // batches — the next scan will not re-surface them, so the
          // refusal is made DURABLE here (a #refused manifest record,
          // readable via [[refusedLates]] until acknowledged) instead
          // of living only in the returned stats and the cron log
          val rows = sealDaysWith(spark, sinkPath, root, due, targetBytes,
            parallelism, zorder, writeOptions, Some(t.throughBatch),
            extraRefused = beyond.map(_ -> t.throughBatch).toMap)
          TouchedSealStats(due, rows, Some(t.throughBatch), beyond)
        }
    }
  }

  /** The bookmark the current manifest carries ([[sealTouched]]'s
    * state), for the caller's audit. */
  def sealedThrough(spark: SparkSession, root: String): Option[Long] =
    currentManifestFull(spark, root).sealedThrough

  /** The DURABLE beyond-horizon refusal record: day → the sink batch id
    * whose close-out refused to seal it (the bookmark that moved past
    * its rows). [[sealTouched]] writes these `#refused` manifest
    * entries at the publish that advances the bookmark beyond a refused
    * day — the moment the alert would otherwise be delivered exactly
    * once and then exist nowhere but the cron log. Every later publish
    * carries them forward, so "rows were refused" is auditable for as
    * long as it stands; [[acknowledgeRefusals]] is how an operator acts
    * on it (after extending retention + a manual [[sealDays]], or
    * accepting the drop). */
  def refusedLates(spark: SparkSession, root: String): Map[String, Long] =
    currentManifestFull(spark, root).refused

  /** Operator acknowledgment of [[refusedLates]] entries: publishes a
    * manifest without the named days' refusal records (data and
    * bookmark unchanged) and returns what remains. Days not currently
    * refused are ignored; acknowledging nothing publishes nothing. */
  def acknowledgeRefusals(spark: SparkSession, root: String,
      days: Seq[String]): Map[String, Long] = {
    val cur = currentManifestFull(spark, root)
    val remaining = cur.refused -- days
    if (remaining.size != cur.refused.size)
      publish(spark, root, cur.days, cur.schemaDdl, cur.sealedThrough, remaining)
    remaining
  }

  /** Retention, metadata-only: publish a manifest without the days
    * strictly older than `keepFrom`. The bytes are reclaimed when the
    * manifests still referencing them age out of [[KeepManifests]] —
    * so an expire can never fail a reader mid-scan, unlike the in-place
    * layout's directory delete. Returns the days dropped. */
  def expire(spark: SparkSession, root: String, keepFrom: String): Seq[String] = {
    val cur = currentManifestFull(spark, root)
    val (drop, keep) = cur.days.partition(_._1 < keepFrom)
    if (drop.nonEmpty)
      publish(spark, root, keep, cur.schemaDdl, cur.sealedThrough, cur.refused)
    drop.keys.toSeq.sorted
  }

  /** Days currently served (for the caller's audit). */
  def servedDays(spark: SparkSession, root: String): Seq[String] =
    currentManifest(spark, root).keys.toSeq.sorted

  // ---------------------------------------------------------------- internals

  private def nextGen(spark: SparkSession, root: String): Long = {
    val (fs, base) = fsFor(spark, s"$root/data")
    if (!fs.exists(base)) 1L
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$GenCol="))
      .map(_.getPath.getName.stripPrefix(s"$GenCol=").toLong)
      .foldLeft(0L)(math.max) + 1L
  }

  /** Mark every `ts_date=` child of a freshly written generation dir
    * with the UTC-day provenance marker (each day dir is a ROOT PATH of
    * the snapshot read, and [[graft.plans.PartitionDateInference]]'s
    * trust gate stats markers per root). Returns the day values. */
  private def markDays(spark: SparkSession, genDir: String): Seq[String] = {
    val (fs, base) = fsFor(spark, genDir)
    if (!fs.exists(base)) return Nil
    fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("ts_date="))
      .map { s =>
        Layout.markUtcDays(spark, s.getPath.toString)
        s.getPath.getName.stripPrefix("ts_date=")
      }.sorted
  }

  /** Publish the next manifest: write the content to a hidden tmp name,
    * then rename to the final `m%08d` — renaming to a FRESH name is
    * atomic and carries its checksum sidecar with it before any reader
    * can know the name exists (the overwrite-rename form a mutable
    * pointer needs is NOT pair-atomic on checksummed filesystems — see
    * the object scaladoc). Then reclaim: manifests beyond the newest
    * [[KeepManifests]] are deleted, and any day directory no kept
    * manifest references is deleted with them — that deferred delete
    * IS the reader grace window. */
  /** The schema a publish pins for its snapshot's readers: the data
    * columns as written inside the day directories, then the two
    * partition columns in path order (`gseal=`, then `ts_date=`) —
    * matching the column order sample-file inference produced before
    * the header existed, so pinned and legacy manifests of one root
    * present the same shape. */
  private def pinnedSchemaDdl(data: org.apache.spark.sql.types.StructType): String = {
    require(!data.fieldNames.contains("ts_date") && !data.fieldNames.contains(GenCol),
      s"data schema must not carry the partition columns (got ${data.fieldNames.mkString(", ")})")
    data.add(GenCol, org.apache.spark.sql.types.LongType)
      .add("ts_date", org.apache.spark.sql.types.DateType)
      .toDDL
  }

  private def publish(spark: SparkSession, root: String,
      manifest: Map[String, Long], schemaDdl: Option[String],
      sealedThrough: Option[Long],
      refused: Map[String, Long] = Map.empty): Unit = {
    val (fs, base) = fsFor(spark, root)
    val mdir = new org.apache.hadoop.fs.Path(base, "manifests")
    fs.mkdirs(mdir)
    val existing = manifestFiles(fs, base)
    val next = existing.lastOption
      .map(_.getName.drop(1).toLong + 1).getOrElse(1L)
    val mf = new org.apache.hadoop.fs.Path(mdir, f"m$next%08d")
    val tmp = new org.apache.hadoop.fs.Path(mdir, f".m$next%08d.tmp")
    val out = fs.create(tmp, true)
    try out.write((schemaDdl.map(d => s"#schema\t$d").toSeq ++
        sealedThrough.map(b => s"#sealedThrough\t$b").toSeq ++
        refused.toSeq.sortBy(_._1).map { case (d, b) => s"#refused\t$d\t$b" } ++
        manifest.toSeq.sortBy(_._1).map { case (d, g) => s"$d\t$g" })
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, mf), s"failed to publish manifest $mf")
    // reclaim beyond the grace window: keep the newest `keepManifests`
    // PLUS everything younger than the time floor (see the two conf
    // keys' scaladoc for the per-deployment arithmetic) — the union, so
    // a publish burst can never compress the wall-clock guarantee
    val keep = keepManifests(spark)
    val floorMs = keepManifestsMs(spark)
    // age is measured against the manifest JUST published, mtime vs
    // mtime — one clock (the filesystem's own), so skew between the
    // publishing host and the store can never silently shorten the
    // wall-clock grace the floor promises
    val cutoff =
      if (floorMs > 0) fs.getFileStatus(mf).getModificationTime - floorMs
      else Long.MinValue
    val all = existing :+ mf
    val keptFiles = all.zipWithIndex.collect {
      case (f, i) if i >= all.length - keep ||
        (floorMs > 0 && fs.getFileStatus(f).getModificationTime >= cutoff) => f
    }
    val keptSet = keptFiles.toSet
    all.filterNot(keptSet).foreach(fs.delete(_, false))
    val referenced: Set[(Long, String)] = keptFiles.flatMap { f =>
      // toSeq BEFORE inverting: mapping a Map to (gen, day) would
      // collapse every day of one generation onto a single key
      readManifest(fs, f).days.toSeq.map { case (day, gen) => (gen, day) }
    }.toSet
    val dataDir = new org.apache.hadoop.fs.Path(base, "data")
    if (fs.exists(dataDir)) {
      fs.listStatus(dataDir).foreach { g =>
        if (g.isDirectory && g.getPath.getName.startsWith(s"$GenCol=")) {
          val gen = g.getPath.getName.stripPrefix(s"$GenCol=").toLong
          val kids = fs.listStatus(g.getPath)
          kids.foreach { d =>
            if (d.isDirectory && d.getPath.getName.startsWith("ts_date=") &&
                !referenced((gen, d.getPath.getName.stripPrefix("ts_date="))))
              fs.delete(d.getPath, true)
          }
          // a generation with no referenced days left is dead weight
          if (fs.listStatus(g.getPath).forall(s => !s.isDirectory))
            fs.delete(g.getPath, true)
        }
      }
    }
  }
}
