package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism primitives shared by every operator.
  *
  * The driver's correctness gate hashes our parquet output against a DuckDB
  * run of the oracle SQL, so every value we emit must be bit-identical across
  * the two engines:
  *
  *   - Floating-point SUMS are order-dependent (Spark partial-aggregates over
  *     32 partitions; DuckDB may use a different association). We therefore
  *     aggregate in exact DECIMAL (order-independent) and cast the final
  *     value to double — both engines then produce the same IEEE double.
  *   - Per-row double arithmetic (a*b, 1-x, ...) is deterministic as long as
  *     the expression shape matches the oracle SQL, so it stays in double.
  *   - Timestamps are compared as epoch integers (seconds or micros), never
  *     as engine-native timestamp values.
  */
object Prims {
  /** Exact money/measure type: matches `CAST(x AS DECIMAL(18,2))` in DuckDB. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Decimal-exact, order-independent sum, surfaced as a double. */
  def sumDec2(c: Column): Column = sum(dec2(c)).cast("double")

  /** Decimal-exact mean: exact sum divided by count, as a double. */
  def avgDec2(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c)

  /** Epoch microseconds of a TimestampType column (matches DuckDB
    * `epoch_us(CAST(ts AS TIMESTAMP))`). */
  def epochUs(c: Column): Column = unix_micros(c)

  /** Join an array<long> deterministically as "1,2,3" (sorted ascending);
    * matches DuckDB `string_agg(x::varchar, ',' ORDER BY x)`. */
  def joinedSortedLongs(arr: Column): Column =
    array_join(transform(array_sort(arr), _.cast("string")), ",")

  /** 2^31 - 1 — modulus for all hash-sketch arithmetic (MinHash, rolling
    * fingerprints). Chosen so `a * (h % P31) + b` stays inside int64. */
  val P31 = 2147483647L

  /** Deterministic 60-bit hash both engines can compute identically:
    * first 15 hex digits of md5, parsed as an integer. DuckDB:
    * CAST('0x' || substr(md5(x),1,15) AS BIGINT). Engine-native hash
    * functions (murmur3 etc.) differ between Spark and DuckDB, so every
    * sketch is built on this one.
    *
    * Spark side is the native graft.functions.Hash60 expression (digest
    * bytes read directly — no hex-string round trip; this is the single
    * hottest scalar in the sketch family). [[hash60Composed]] keeps the
    * built-in-function spelling; Hash60Spec property-checks the two
    * against each other. Registration rides GraftExtensions (ensured by
    * Tables at first use, like qdot). */
  def hash60(c: Column): Column =
    org.apache.spark.sql.functions.call_function("hash60", c)

  /** The composed-builtins form of [[hash60]] (Spark SQL only). */
  def hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB rendering of hash60 (for generated oracle SQL). */
  def hash60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  /** THE whitespace tokenizer (Spark SQL form) — single definition shared
    * by every text operator (token_count, quality, repetition, split,
    * decontamination, shingling) so a tokenizer change can never make
    * two operators disagree about what a "word" is. */
  val wordsExpr = "filter(split(lower(text), ' '), w -> w <> '')"

  /** DuckDB twin of [[wordsExpr]] for generated oracle SQL. */
  val wordsSql = "list_filter(string_split(lower(text), ' '), x -> x <> '')"

  /** Two-phase global row number over the total order given by
    * `sortCols` (which must order rows uniquely): range-partition on the
    * sort key, count rows per partition (a numPartitions-sized metadata
    * collect), broadcast the cumulative offsets as a map literal, then
    * rank WITHIN partitions and add the offset. Same result as an
    * unpartitioned row_number, but no partition ever holds more than its
    * range slice — the scalable form of a global total order
    * (countWindowAll's W1 shape, shared with corpus shuffling). */
  def globalRowNumber(df: DataFrame, rnCol: String, sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      // counts pass and ranking pass must see identical partitions
      // (repartitionByRange samples boundaries, so a recompute could
      // re-draw them); eager localCheckpoint pins the partitioning AND
      // frees itself with the RDD — no cache entry outlives this call
      .localCheckpoint(true)
    val counts = ranged.groupBy("__pid").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = if (counts.isEmpty) 0 else counts.keys.max + 1
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L)).init
    val offsetOf = // empty-input guard: map() with zero entries won't analyze
      if (nParts == 0) map(lit(0), lit(0L))
      else map((0 until nParts).flatMap(p => Seq(lit(p), lit(offsets(p)))): _*)
    ranged
      .withColumn(rnCol,
        row_number().over(Window.partitionBy("__pid").orderBy(sortCols: _*))
          + element_at(offsetOf, col("__pid")))
      .drop("__pid")
  }

  /** Two-phase EXCLUSIVE global prefix sum of `valCol` over the total
    * order given by `sortCols` — the scalable form of
    * `sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING AND 1
    * PRECEDING)`. Same shape as [[globalRowNumber]]: range-partition on
    * the sort key, per-partition SUMS as a numPartitions-sized metadata
    * collect, broadcast cumulative offsets, then a within-partition
    * running sum plus the partition offset. No partition ever holds more
    * than its range slice; the global pass is O(numPartitions). */
  def globalPrefixSum(df: DataFrame, valCol: String, outCol: String,
                      sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranged = df.repartitionByRange(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      // same pinning rationale as globalRowNumber: the sums pass and the
      // running-sum pass must see identical partition boundaries
      .localCheckpoint(true)
    val sums = ranged.groupBy("__pid").agg(sum(col(valCol)).as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = if (sums.isEmpty) 0 else sums.keys.max + 1
    val offsets = (0 until nParts)
      .scanLeft(0L)((acc, p) => acc + sums.getOrElse(p, 0L)).init
    val offsetOf =
      if (nParts == 0) map(lit(0), lit(0L))
      else map((0 until nParts).flatMap(p => Seq(lit(p), lit(offsets(p)))): _*)
    ranged
      .withColumn(outCol,
        coalesce(
          sum(col(valCol)).over(Window.partitionBy("__pid").orderBy(sortCols: _*)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)) + element_at(offsetOf, col("__pid")))
      .drop("__pid")
  }
}
