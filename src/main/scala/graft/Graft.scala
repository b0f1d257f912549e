package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing entry points.
  *
  * The reference has no SQL layer (SURVEY §0); on Spark one comes free —
  * `registerTables` exposes the testdata tables as temp views (with the
  * events timestamp normalization applied), so every capability is also
  * reachable as plain `spark.sql(...)`, optimizer included. The graft
  * native functions (qdot + the lambda-idiom rewrite) ride along via
  * GraftExtensions/ensure. */
object Graft {

  /** Register all tables of a scale-factor directory as temp views. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables(spark, dir, n)
      df.createOrReplaceTempView(n)
    }

  /** Convenience: register + run one SQL statement. */
  def sql(spark: SparkSession, dir: String, statement: String): DataFrame = {
    registerTables(spark, dir)
    spark.sql(statement)
  }
}
