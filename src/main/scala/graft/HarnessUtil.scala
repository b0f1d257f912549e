package graft

import org.apache.spark.sql.SparkSession

/** Shared plumbing for the harness mains (Verify / Bench / Scratch /
  * ScaleProbe) — one JSON escaper and one between-queries release, so the
  * three mains can never drift apart. */
private[graft] object HarnessUtil {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  def jsonQ(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Data-sized `SparkContext.broadcast` handles issued by plan
    * builders (the Bloom filter in `contaminatedViaBloom` is ~120 MB at
    * production fpp/held-set sizes), queued here so [[releaseAll]] can
    * destroy them EAGERLY. Without this the only reclamation path is
    * the lazy plan becoming unreachable plus ContextCleaner/GC — a
    * harness loop (or any long-lived session) that constructs the
    * pipeline repeatedly stacks filter-sized broadcasts on the driver
    * and every executor in the meantime. */
  private val issuedBroadcasts =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.broadcast.Broadcast[_]]()

  /** Register a broadcast for destruction at the next [[releaseAll]].
    * Same lifetime contract as localCheckpoint blocks: the handle must
    * not be executed again after that release. */
  def trackBroadcast[T](bc: org.apache.spark.broadcast.Broadcast[T]): org.apache.spark.broadcast.Broadcast[T] = {
    issuedBroadcasts.add(bc)
    bc
  }

  /** Snapshot of broadcasts tracked but not yet destroyed (test hook for
    * the Bloom-broadcast lifecycle spec — a construction that stacked a
    * second filter broadcast, or a release that failed to drain, shows
    * up here). */
  private[graft] def pendingBroadcasts: Seq[org.apache.spark.broadcast.Broadcast[_]] = {
    val it = issuedBroadcasts.iterator()
    val buf = Seq.newBuilder[org.apache.spark.broadcast.Broadcast[_]]
    while (it.hasNext) buf += it.next()
    buf.result()
  }

  /** Drain the async listener bus so metrics accumulated by a
    * SparkListener (per-query shuffle-byte deltas in Bench/Scratch) are
    * fully delivered before the counter is read — a fixed sleep lags
    * behind the bus under load and bleeds one query's task metrics into
    * the next query's delta. A bus that cannot drain within 10 s is
    * treated as drained-as-far-as-it-goes (same best-effort the sleep
    * gave, minus the systematic lag). */
  def drainListeners(spark: SparkSession): Unit =
    try org.apache.spark.GraftSparkShim.waitListenerBusEmpty(spark.sparkContext, 10000L)
    catch { case _: java.util.concurrent.TimeoutException => () }

  /** Apply `SPARK_GRAFT_CONF="k=v;k=v"` to the session — the generic
    * knob for running a harness main under non-default session confs.
    * The motivating use: Verify over the SERVING LAYOUTS
    * (`SPARK_GRAFT_CONF="spark.graft.layout.enabled=true;..."`) proves
    * on the FULL oracle surface that no layout changes a result — the
    * per-query LayoutSpec identity checks, promoted to all of
    * SparkEntry. */
  def applyEnvConf(spark: SparkSession): Unit =
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ => ()
      }
    })

  /** Free everything a finished query pinned: catalog cache entries,
    * localCheckpoint blocks, AND tracked data-sized broadcasts.
    * clearCache() alone misses the latter two (RDD-level persists and
    * broadcast blocks are invisible to the catalog), which would leave
    * corpus-sized blocks resident until driver GC and skew later
    * timings. Only safe BETWEEN queries — a live DataFrame whose
    * checkpoint blocks (or tracked broadcast) are dropped cannot
    * recompute (lineage is truncated / the handle is destroyed). */
  def releaseAll(spark: SparkSession, gc: Boolean = false): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    var bc = issuedBroadcasts.poll()
    while (bc != null) {
      try bc.destroy()
      catch { case scala.util.control.NonFatal(_) => () } // already cleaned: fine
      bc = issuedBroadcasts.poll()
    }
    // gc=true (Bench between queries): collect the freed blocks NOW so a
    // heavy query's garbage is not paid for — as a collection pause — by
    // whichever query happens to run next. Sustained cross-query heap
    // pressure inflated four recorded bench lines up to 6.6x in round 5.
    if (gc) System.gc()
  }
}
