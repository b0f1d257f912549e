package org.apache.spark.sql.execution.streaming

/** Bridge into the `private[sql]` streaming internals — the sink-path
  * accessor behind [[graft.streaming.PartitionedIngest.vacuumOrphans]]'s
  * active-writer gate. A janitor deciding whether a file is an orphan
  * must know whether a RUNNING query in this session is still writing
  * the sink; the public `StreamingQuery` surface only exposes the sink
  * through `lastProgress` (null until the first batch completes —
  * exactly the window the gate exists for), so this reads the
  * `StreamExecution.sink` field directly. Same scope-only pattern as
  * [[org.apache.spark.sql.GraftShim]]. */
object GraftStreamingShim {

  /** The output path of an active query's file sink, if its sink is a
    * `FileStreamSink` — parsed from the sink's stable `toString`
    * (`"FileSink[<path>]"`, the same string the progress reporter
    * publishes as `sink.description`). None for non-file sinks. */
  def fileSinkPath(q: org.apache.spark.sql.streaming.StreamingQuery): Option[String] =
    q match {
      case w: runtime.StreamingQueryWrapper =>
        val s = w.streamingQuery.sink.toString
        if (s.startsWith("FileSink[") && s.endsWith("]"))
          Some(s.substring("FileSink[".length, s.length - 1))
        else None
      case _ => None
    }
}
