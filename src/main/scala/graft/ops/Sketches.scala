package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Prims._

/** Sketch-gated exact analytics — the "sketch finds candidates, exact pass
  * confirms" pattern that makes frequency questions answerable at corpus
  * scale without ever shuffling the full key space.
  *
  * The reference has no sketch surface (its aggregations are exact keyed
  * state, `test/StateTest.java`); this family is part of the LLM-pipeline
  * extension the build prompt asks for: frequency tables over n-grams feed
  * boilerplate detection, contamination screens, and tokenizer training,
  * and at 100 TB the n-gram key space (billions distinct) cannot be
  * hash-shuffled just to discover that almost all of it is rare.
  *
  * Shape (heavy_hitters): one pass builds a count–min sketch as a
  * DataFrame aggregation — the shuffle after map-side combine is bounded
  * by Depth×Width rows (a few thousand), NOT by the vocabulary. The tiny
  * sketch then comes back to the token stream as Depth broadcast hash
  * joins (map-side, codegen, no UDF), giving every token occurrence its
  * CMS estimate; tokens whose estimate clears the φ·N threshold — a
  * SUPERSET of the true heavy hitters, since CMS only ever
  * over-estimates — are exact-counted and re-filtered. Only candidate
  * tokens reach that exact groupBy, so the one vocabulary-keyed shuffle
  * in the plan carries the heavy tail only. The result is bit-exact
  * (collisions can only add false candidates, and the exact re-count
  * removes them), so the DuckDB oracle is the plain exact HAVING query —
  * no sketch mirroring needed.
  */
object Sketches {
  /** Sketch rows (independent hash functions). */
  val Depth = 4
  /** Buckets per sketch row. 8192 keeps the whole sketch ≤ a few hundred
    * KB — broadcast-trivial — while at width≫heavy-count the expected
    * over-estimate is total/Width per row, far under any φ·N gate. */
  val Width = 8192
  /** Heavy-hitter support: cnt · HhDenom ≥ total (φ = 1/HhDenom). */
  val HhDenom = 1000L

  /** The corpus bigram stream — same gram definition as
    * [[TextAnalysis.ngramCounts]] so the two frequency surfaces agree. */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(expr(wordsExpr).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
        .as("gram"))

  /** Row-i CMS bucket of a key: xxhash64 seeded by the row index, mod
    * Width. The bucket hash never reaches the output — the CMS gate is
    * conservative for ANY hash family (estimate ≥ true count, no false
    * negatives) and the exact re-count drops false positives — so unlike
    * every oracle-visible sketch it does NOT need the cross-engine
    * hash60/md5 discipline; the JVM-native xxhash64 costs ~an order of
    * magnitude less per gram than md5 and takes the salt as a seed column
    * instead of allocating a concatenated string per cell (r20: the Depth
    * × 2-pass md5 stream was the query's dominant CPU). Output is
    * bit-identical by the gate/confirm argument above; the oracle (exact
    * HAVING) is unchanged. */
  private def bucket(i: Int, key: Column): Column =
    pmod(xxhash64(lit(i), key), lit(Width.toLong))

  /** heavy_hitters: every bigram with frequency ≥ total/[[HhDenom]],
    * with its exact count — CMS gate + exact confirm as described above.
    * Output: (gram, cnt) ORDER BY gram. */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val grams = bigrams(Tables.documents(s, dir))

    // Pass 1 — build the sketch: explode each gram into its Depth
    // (row, bucket) cells, count cells. Partial aggregation combines
    // map-side, so the exchange moves ≤ partitions × Depth × Width rows
    // regardless of token volume or vocabulary size.
    val cms = grams
      .select(explode(array((0 until Depth).map(i =>
        struct(lit(i).as("r"), bucket(i, col("gram")).as("b"))): _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
      .materialized // one job; reread per broadcast slice below

    // Total token mass = sum of any one sketch row (every gram lands in
    // exactly one bucket per row) — no extra pass over the corpus.
    val totals = cms.filter(col("r") === 0).agg(sum("c").as("total"))

    // Pass 2 — gate + exact count in ONE pass over the grams: Depth
    // broadcast joins pin each occurrence's per-row cell counts, the
    // min of them is its CMS estimate (≥ true count, always), and only
    // occurrences clearing the gate reach the exact groupBy.
    val estimated = (0 until Depth).foldLeft(grams) { (df, i) =>
      val slice = cms.filter(col("r") === i)
        .select(col("b").as(s"b$i"), col("c").as(s"c$i"))
      df.withColumn(s"b$i", bucket(i, col("gram")))
        .join(broadcast(slice), Seq(s"b$i"))
    }
    estimated
      .withColumn("est", least((0 until Depth).map(i => col(s"c$i")): _*))
      .crossJoin(broadcast(totals))
      .filter(col("est") * HhDenom >= col("total"))
      .groupBy("gram", "total").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * HhDenom >= col("total"))
      .select(col("gram"), col("cnt"))
      .orderBy("gram")
  }

  /** Exact oracle — the gate is conservative (no false negatives) and the
    * exact re-count removes false positives, so plain HAVING is the
    * ground truth the sketch path must reproduce bit-for-bit. */
  def heavyHittersSql: String =
    s"""WITH w AS (SELECT $wordsSql AS ws FROM documents),
       |g AS (SELECT ws[i] || ' ' || ws[i+1] AS gram
       |  FROM w, unnest(range(1, len(ws))) AS t(i)
       |  WHERE len(ws) >= 2),
       |tot AS (SELECT count(*) AS total FROM g)
       |SELECT gram, count(*) AS cnt
       |FROM g, tot GROUP BY gram, total
       |HAVING count(*) * $HhDenom >= total
       |ORDER BY gram""".stripMargin

  val oracles: Map[String, String] = Map(
    "heavy_hitters" -> heavyHittersSql,
  )
}
