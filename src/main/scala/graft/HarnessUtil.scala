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

  /** Free everything a finished query pinned: catalog cache entries AND
    * localCheckpoint blocks. clearCache() alone misses the latter (they
    * are RDD-level persists, invisible to the catalog), which would
    * leave corpus-sized blocks resident until driver GC and skew later
    * timings. Only safe BETWEEN queries — a live DataFrame whose
    * checkpoint blocks are dropped cannot recompute (lineage is
    * truncated). */
  def releaseAll(spark: SparkSession, gc: Boolean = false): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    // gc=true (Bench between queries): collect the freed blocks NOW so a
    // heavy query's garbage is not paid for — as a collection pause — by
    // whichever query happens to run next. Sustained cross-query heap
    // pressure inflated four recorded bench lines up to 6.6x in round 5.
    if (gc) System.gc()
  }
}
