package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Prims._

/** Text-analysis operators for a training-data pipeline over `documents`:
  * language ID (stopword-list heuristic), quality scoring, token counting,
  * and rolling-hash document fingerprinting.
  *
  * Everything is a narrow map stage or a keyed aggregation with map-side
  * combine — no driver loops, no UDFs (pure Catalyst expressions, all
  * inside WholeStageCodegen). Ratios are double divisions of exact integer
  * counts with identical operand shapes in the DuckDB oracle.
  */
object TextAnalysis {

  private val StopWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit"),
    "zh" -> Seq("de", "le", "he", "shi", "zai", "you", "wo"),
  )


  /** Language ID: score each language by stopword hits, argmax with
    * deterministic tie-break (higher hits, then lexicographic lang); no
    * hits at all → 'und'.
    *
    * ONE NARROW projection: the per-language hit counts are 5 in-row
    * array filters against literal stopword lists, and the argmax is
    * `array_min` over (−hits, lang) structs — Spark orders structs
    * field-by-field, so the minimum IS "most hits, then lexicographic
    * lang", and a zero best maps to 'und'. Through round 9 this op
    * exploded the corpus to tokens, joined a broadcast keyword table,
    * aggregated (doc, lang) hits, ranked them with a per-doc window, and
    * joined back — four corpus-scale exchanges replaced by per-row map
    * work; the winner (and therefore the oracle) is unchanged, because
    * languages with zero hits can never out-rank a positive score and
    * the all-zero case was already 'und'. */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val cands = StopWords.toSeq.sortBy(_._1).map { case (l, ws) =>
      val inList = ws.map(w => s"'$w'").mkString(", ")
      struct(
        (-expr(s"size(filter(ws, w -> w IN ($inList)))").cast("long")).as("neg"),
        lit(l).as("lang"))
    }
    Tables.documents(s, dir)
      // NULL text must classify as 'und' with 0 hits (the former
      // join-based form got that from its left join's no-match; the
      // oracle still does): coalesce to an empty token array so every
      // candidate scores 0 rather than NULL-poisoning the argmin
      .select(col("doc_id"), col("lang").as("true_lang"),
        coalesce(expr(wordsExpr), expr("array()").cast("array<string>")).as("ws"))
      .withColumn("best", array_min(array(cands: _*)))
      .select(col("doc_id"),
        when(col("best.neg") === 0, "und").otherwise(col("best.lang")).as("pred_lang"),
        (-col("best.neg")).as("hits"),
        col("true_lang"))
      .withColumn("correct", col("pred_lang") === col("true_lang"))
      .orderBy("doc_id")
  }

  def langIdSql: String = {
    val vals = StopWords.toSeq.sortBy(_._1)
      .flatMap { case (l, ws) => ws.map(w => s"('$l', '$w')") }.mkString(", ")
    s"""WITH stop(cand_lang, w) AS (VALUES $vals),
       |toks AS (SELECT doc_id, unnest($wordsSql) AS w FROM documents),
       |scores AS (SELECT doc_id, cand_lang, count(*) AS hits
       |  FROM toks JOIN stop ON toks.w = stop.w GROUP BY 1, 2),
       |winner AS (SELECT doc_id, cand_lang AS pred_lang, hits FROM (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rk
       |  FROM scores) WHERE rk = 1)
       |SELECT d.doc_id, coalesce(pred_lang, 'und') AS pred_lang,
       |  coalesce(hits, 0) AS hits, d.lang AS true_lang,
       |  coalesce(pred_lang, 'und') = d.lang AS correct
       |FROM documents d LEFT JOIN winner ON d.doc_id = winner.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Narrow quality-metric projection over (doc_id, text, ...) rows —
    * pure per-row expressions, so it applies UNCHANGED to a streaming
    * DataFrame (stateless lift: the batch query and the streaming form
    * share this single definition; StreamingLiftSpec pins the
    * equivalence). */
  private[graft] def qualityMetrics(docs: DataFrame): DataFrame =
    qualityMetricsFromToks(Prims.tokenized(docs))

  /** [[qualityMetrics]] over a pre-tokenized `(doc_id, ws)` frame —
    * composed pipelines (curate_manifest, corpus_health) feed this from
    * their one shared corpus-tokenize pass. */
  private[graft] def qualityMetricsFromToks(toks: DataFrame): DataFrame = {
    val enStops = StopWords("en").map(w => s"'$w'").mkString(", ")
    toks
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        size(array_distinct(col("ws"))).cast("long").as("n_distinct"),
        expr("aggregate(ws, CAST(0 AS BIGINT), (a, w) -> a + length(w))").as("sum_wlen"),
        expr(s"size(filter(ws, w -> w IN ($enStops)))").cast("long").as("stop_hits"))
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_words")).as("distinct_ratio"),
        (col("sum_wlen").cast("double") / col("n_words")).as("mean_wlen"),
        (col("stop_hits").cast("double") / col("n_words")).as("stop_ratio"))
      .withColumn("score",
        lit(0.3) * least(col("n_words").cast("double") / 200.0, lit(1.0)) +
        lit(0.3) * col("distinct_ratio") +
        lit(0.2) * least(col("mean_wlen") / 8.0, lit(1.0)) +
        lit(0.2) * least(col("stop_ratio") * 5.0, lit(1.0)))
  }

  /** Quality scoring: length, vocabulary diversity, mean word length,
    * stopword ratio → composite score in [0,1]. Identical double
    * expression shape on both sides. */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    qualityMetrics(Tables.documents(s, dir)).orderBy("doc_id")

  /** DuckDB rendering of the English stopword list — derived from THE
    * [[StopWords]] map, never re-hardcoded in an oracle. */
  private[graft] def enStopsSql: String =
    StopWords("en").map(w => s"'$w'").mkString(", ")

  /** DuckDB CTE computing [[qualityMetrics]]' integer metric columns
    * (reads a prior CTE `t(doc_id, ws)`). ONE definition shared by the
    * quality_score and curate_manifest oracles so an edit to the metric
    * set cannot desynchronize them from the Spark plan. */
  private[graft] def qualityMetricsCteSql: String =
    s"""m AS (SELECT doc_id,
       |    CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
       |    CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_wlen,
       |    CAST(len(list_filter(ws, w -> w IN ($enStopsSql))) AS BIGINT) AS stop_hits
       |  FROM t)""".stripMargin

  /** DuckDB score expression over [[qualityMetricsCteSql]]'s columns —
    * the oracle twin of [[qualityMetrics]]' `score` (identical double
    * expression shape, shared like the metric CTE). */
  private[graft] def qualityScoreExprSql: String =
    """0.3 * least(CAST(n_words AS DOUBLE) / 200.0, 1.0) +
      |  0.3 * (CAST(n_distinct AS DOUBLE) / n_words) +
      |  0.2 * least((CAST(sum_wlen AS DOUBLE) / n_words) / 8.0, 1.0) +
      |  0.2 * least((CAST(stop_hits AS DOUBLE) / n_words) * 5.0, 1.0)""".stripMargin

  def qualityScoreSql: String =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       |$qualityMetricsCteSql
       |SELECT doc_id, n_words, n_distinct,
       |  CAST(n_distinct AS DOUBLE) / n_words AS distinct_ratio,
       |  CAST(sum_wlen AS DOUBLE) / n_words AS mean_wlen,
       |  CAST(stop_hits AS DOUBLE) / n_words AS stop_ratio,
       |  $qualityScoreExprSql AS score
       |FROM m ORDER BY doc_id""".stripMargin

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs / digit runs / single other chars). */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr(s"size($wordsExpr)").cast("long").as("ws_tokens"),
        regexp_count(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long").as("re_tokens"),
        length(col("text")).cast("long").as("len_chars"))
      .orderBy("doc_id")

  def tokenCountSql: String =
    s"""SELECT doc_id,
       |  CAST(len($wordsSql) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS re_tokens,
       |  CAST(length(text) AS BIGINT) AS len_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  private val FpB = 131L

  /** Document fingerprint: minimum of a rolling polynomial hash over
    * 4-word windows (Rabin-Karp / winnowing style), plus the size of the
    * doc's fingerprint-collision group — a cheap near-dup prefilter.
    *
    * The per-doc rolling min is ONE NARROW array expression (the
    * [[winnowFps]] idiom: words → per-word hashes → windowed polynomial
    * → array_min, all within the row), so the only exchanges left are
    * the doc-sized fingerprint aggregation and group stats. Through
    * round 9 this op exploded to (doc, pos) rows, joined a distinct-word
    * dictionary (string-keyed exchange), and ran lead() windows over a
    * per-doc sort — three corpus-token-sized shuffles replaced by map
    * CPU; a doc with fewer than 4 words has no 4-window and is excluded,
    * exactly as the lead-based form excluded it.
    *
    * The eager localCheckpoint is a REQUIRED optimizer barrier, a second
    * species of the winnow_pairs O(n³) trap: the downstream group-size
    * join pushes `isnotnull(fingerprint)` down, and predicate pushdown
    * SUBSTITUTES the whole nested higher-order expression through both
    * projections — the filter then re-evaluates the full per-word hash
    * array for every window term, O(words²) interpreted md5 per doc
    * (measured: 44 s vs 1.2 s for the barriered form at sf0.1; the
    * former lead-window form was immune only because its aggregate
    * blocked the substitution). The checkpoint holds one 16-byte row
    * per doc. */
  def docFingerprint(s: SparkSession, dir: String): DataFrame = {
    val fps = Tables.documents(s, dir)
      .select(col("doc_id"), expr(wordsExpr).as("ws"))
      .filter(size(col("ws")) >= 4)
      .select(col("doc_id"),
        expr(s"transform(ws, x -> pmod(hash60(x), ${P31}L))").as("hs"))
      .select(col("doc_id"), expr(
        s"""array_min(transform(sequence(1, size(hs) - 3),
           |  i -> pmod(element_at(hs, i) * ${FpB * FpB * FpB}L
           |          + element_at(hs, i + 1) * ${FpB * FpB}L
           |          + element_at(hs, i + 2) * ${FpB}L
           |          + element_at(hs, i + 3), ${P31}L)))""".stripMargin)
          .as("fingerprint"))
      .materialized
    val groups = fps.groupBy("fingerprint").agg(count(lit(1)).as("n_same"))
    fps.join(groups, "fingerprint")
      .select("doc_id", "fingerprint", "n_same")
      .orderBy("doc_id")
  }

  def docFingerprintSql: String = {
    val b3 = FpB * FpB * FpB; val b2 = FpB * FpB
    s"""WITH toks AS (
       |  SELECT doc_id, i AS pos, ${hash60Sql("ws[i]")} % $P31 AS h
       |  FROM (SELECT doc_id, $wordsSql AS ws FROM documents),
       |       unnest(range(1, len(ws) + 1)) AS t(i)),
       |rolled AS (SELECT doc_id,
       |    (h * $b3 + (lead(h, 1) OVER w) * $b2 + (lead(h, 2) OVER w) * $FpB + (lead(h, 3) OVER w)) % $P31 AS r
       |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |fps AS (SELECT doc_id, min(r) AS fingerprint FROM rolled WHERE r IS NOT NULL GROUP BY doc_id),
       |gs AS (SELECT fingerprint, count(*) AS n_same FROM fps GROUP BY fingerprint)
       |SELECT doc_id, fps.fingerprint, n_same FROM fps JOIN gs ON fps.fingerprint = gs.fingerprint
       |ORDER BY doc_id""".stripMargin
  }

  /** The composed training-data cleaning pipeline a real user runs:
    * quality-filter → exact-dedup (keep lowest doc_id per content hash)
    * → per-survivor token statistics. One narrow filter stage, one
    * hash-groupBy, one join — the whole clean at any scale is two
    * shuffles. */
  def pipelineClean(s: SparkSession, dir: String): DataFrame = {
    val scored = qualityScore(s, dir).select("doc_id", "score")
    val docs = Tables.documents(s, dir)
      .join(scored, "doc_id")
      .filter(col("score") >= 0.5)
    val keep = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.join(keep, "doc_id")
      .select(col("doc_id"), col("lang"), col("score"),
        expr(s"size($wordsExpr)").cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  def pipelineCleanSql: String = {
    val enStops = StopWords("en").map(w => s"'$w'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, text, lang, $wordsSql AS ws FROM documents),
       |m AS (SELECT doc_id, text, lang,
       |    CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
       |    CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS sum_wlen,
       |    CAST(len(list_filter(ws, w -> w IN ($enStops))) AS BIGINT) AS stop_hits,
       |    CAST(len(ws) AS BIGINT) AS n_tokens
       |  FROM t),
       |scored AS (SELECT doc_id, text, lang, n_tokens,
       |    0.3 * least(CAST(n_words AS DOUBLE) / 200.0, 1.0) +
       |    0.3 * (CAST(n_distinct AS DOUBLE) / n_words) +
       |    0.2 * least((CAST(sum_wlen AS DOUBLE) / n_words) / 8.0, 1.0) +
       |    0.2 * least((CAST(stop_hits AS DOUBLE) / n_words) * 5.0, 1.0) AS score
       |  FROM m),
       |good AS (SELECT * FROM scored WHERE score >= 0.5),
       |keep AS (SELECT min(doc_id) AS doc_id FROM good GROUP BY md5(text))
       |SELECT g.doc_id, g.lang, g.score AS score, g.n_tokens
       |FROM good g JOIN keep ON g.doc_id = keep.doc_id
       |ORDER BY g.doc_id""".stripMargin
  }

  private val ChunkSize = 50
  private val ChunkStride = 40 // 10-word overlap

  /** Document chunking: token-bounded windows with overlap — the
    * standard pre-tokenization step of a training pipeline. Pure
    * array arithmetic (sequence + slice), one narrow map stage; chunk
    * starts at word offsets 0, 40, 80, … so consecutive chunks share a
    * 10-word overlap, and the tail chunk may be short but never empty. */
  def docChunking(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), expr(wordsExpr).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, CAST(greatest(ceil((size(ws) - $ChunkSize) / $ChunkStride.0), 0) AS INT)),
             |  i -> array_join(slice(ws, i * $ChunkStride + 1, $ChunkSize), ' '))""".stripMargin))
          .as(Seq("chunk_id", "chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("chunk"),
        expr("size(split(chunk, ' '))").cast("long").as("chunk_tokens"))
      .orderBy("doc_id", "chunk_id")

  def docChunkingSql: String =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       |n AS (SELECT doc_id, ws,
       |    CAST(greatest(ceil((len(ws) - $ChunkSize) / $ChunkStride.0), 0) AS BIGINT) AS last_chunk
       |  FROM t WHERE len(ws) > 0)
       |SELECT doc_id, i AS chunk_id,
       |  array_to_string(list_slice(ws, i * $ChunkStride + 1, i * $ChunkStride + $ChunkSize), ' ') AS chunk,
       |  CAST(len(string_split(array_to_string(list_slice(ws, i * $ChunkStride + 1, i * $ChunkStride + $ChunkSize), ' '), ' ')) AS BIGINT) AS chunk_tokens
       |FROM n, unnest(range(0, last_chunk + 1)) AS u(i)
       |ORDER BY doc_id, chunk_id""".stripMargin

  /** Repetition filtering (the Gopher-rules family): fraction of 2-gram
    * instances taken by the single most frequent 2-gram, and fraction of
    * 3-gram instances that are repeats — high values flag boilerplate /
    * template spam. Defined over docs with ≥ 3 words (same domain rule
    * as shingling).
    *
    * ZERO cross-doc aggregation (r21). Every statistic here is a
    * function of one doc's OWN gram multiset (the top 2-gram's
    * multiplicity; 3-gram instances whose gram repeats), so the r20
    * corpus explode → (doc_id, g) exchange → per-doc re-aggregation was
    * shuffling gram volume only to group rows that were never apart. A
    * per-row array_sort + run-length `aggregate` fold per family
    * computes the same integer counts inside the scan stage: one corpus
    * pass, no explode, no gram exchange at ANY scale — the only
    * exchange left is the deterministic ORDER BY (guide §1.2 step 1,
    * §2.4 "remove shuffles outright"). Exactness: top2 = longest equal
    * run of the sorted 2-gram array = max 2-gram count; dup3 =
    * tot3 − (number of length-1 runs) = Σ c over grams with c > 1; the
    * final divisions are the same int/int → double as the grouped form,
    * bit-identical to the oracle. Per-doc cost is O(g log g) in the
    * doc's OWN gram count — embarrassingly parallel, no skew coupling
    * between docs (a giant doc only sorts its own grams). */
  def repetitionScore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), expr(wordsExpr).as("ws"))
      .filter(size(col("ws")) >= 3)
    // max multiplicity of any 2-gram = longest run in the sorted array
    // ('' as the initial prev is safe: grams join non-empty words, so a
    // gram is never the empty string)
    val top2 = expr(
      """aggregate(
        |  array_sort(transform(sequence(1, size(ws) - 1),
        |    i -> array_join(slice(ws, i, 2), ' '))),
        |  named_struct('prev', '', 'run', 0L, 'best', 0L),
        |  (acc, g) -> named_struct(
        |    'prev', g,
        |    'run',  IF(g = acc.prev, acc.run + 1L, 1L),
        |    'best', greatest(acc.best, IF(g = acc.prev, acc.run + 1L, 1L))),
        |  acc -> acc.best)""".stripMargin)
    // number of 3-grams occurring exactly once = number of length-1 runs
    val singles3 = expr(
      """aggregate(
        |  array_sort(transform(sequence(1, size(ws) - 2),
        |    i -> array_join(slice(ws, i, 3), ' '))),
        |  named_struct('prev', '', 'run', 0L, 'sing', 0L),
        |  (acc, g) -> IF(g = acc.prev,
        |    named_struct('prev', g, 'run', acc.run + 1L, 'sing', acc.sing),
        |    named_struct('prev', g, 'run', 1L,
        |      'sing', acc.sing + IF(acc.run = 1L, 1L, 0L))),
        |  acc -> acc.sing + IF(acc.run = 1L, 1L, 0L))""".stripMargin)
    val tot2 = (size(col("ws")) - 1).cast("long")
    val tot3 = (size(col("ws")) - 2).cast("long")
    docs
      .select(col("doc_id"),
        (top2.cast("double") / tot2).as("top2_frac"),
        ((tot3 - singles3).cast("double") / tot3).as("dup3_frac"))
      .withColumn("keep", col("top2_frac") <= 0.20 && col("dup3_frac") <= 0.30)
      .orderBy("doc_id")
  }

  def repetitionScoreSql: String =
    s"""WITH t AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       |d AS (SELECT doc_id, ws FROM t WHERE len(ws) >= 3),
       |c2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g, count(*) AS c
       |  FROM d, unnest(range(1, len(ws))) AS u(i) GROUP BY 1, 2),
       |a2 AS (SELECT doc_id, max(c) AS top2, sum(c) AS tot2 FROM c2 GROUP BY 1),
       |c3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g, count(*) AS c
       |  FROM d, unnest(range(1, len(ws) - 1)) AS u(i) GROUP BY 1, 2),
       |a3 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup3,
       |  sum(c) AS tot3 FROM c3 GROUP BY 1)
       |SELECT doc_id,
       |  CAST(top2 AS DOUBLE) / tot2 AS top2_frac,
       |  CAST(dup3 AS DOUBLE) / tot3 AS dup3_frac,
       |  CAST(top2 AS DOUBLE) / tot2 <= 0.20 AND CAST(dup3 AS DOUBLE) / tot3 <= 0.30 AS keep
       |FROM a2 JOIN a3 USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  private val TfidfTopK = 5

  /** tfidf_top_terms: the SURVEY §7 M5 tokenize/tf-idf item — the
    * `TfidfTopK` most distinctive terms per document.
    *
    * The idf factor is LINEAR (score = tf · N / df as one double
    * division over exact int64 operands), not log: IEEE division is
    * correctly rounded so both engines produce the identical double,
    * whereas libm `ln` differs in the last ulp between JVM and DuckDB —
    * the same determinism discipline as corpus_stats' discrete
    * quantiles. Production code wanting log-idf swaps one expression;
    * the pipeline shape is identical.
    *
    * Scale posture: two map-side-combinable aggregations — (doc, term)
    * term frequencies, then term document frequencies (vocabulary-sized,
    * broadcastable in production) — a join co-partitioned on term, and a
    * per-doc top-K window that WindowGroupLimit pushes into the shuffle.
    * No stage ever holds more than a vocabulary or one doc's terms. */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nDocs = docs.count() // scalar metadata action, mirrored as a CTE scalar
    val tf = docs
      .select(col("doc_id"), explode(expr(wordsExpr)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf") * lit(nDocs)).cast("double") / col("df")).as("score"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("rank") <= TfidfTopK)
      .select("doc_id", "rank", "term", "tf", "df", "score")
      .orderBy("doc_id", "rank")
  }

  def tfidfTopTermsSql: String =
    s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       |n AS (SELECT count(*) AS nd FROM documents),
       |t AS (SELECT doc_id, unnest(ws) AS term FROM w),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |s AS (SELECT doc_id, term, tf, df,
       |    CAST(tf * nd AS DOUBLE) / df AS score
       |  FROM tf JOIN df USING (term), n),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |    ORDER BY score DESC, term) AS rank FROM s)
       |SELECT doc_id, rank, term, tf, df, score FROM r WHERE rank <= $TfidfTopK
       |ORDER BY doc_id, rank""".stripMargin

  /** Global top-K corpus bigrams. */
  private val NgramTopK = 50

  /** ngram_counts: the corpus's [[NgramTopK]] most frequent word bigrams
    * — the frequency table behind contamination screens, boilerplate
    * detection, and tokenizer training. Shape: narrow bigram explode →
    * map-side-combinable count → global top-K as a TakeOrdered
    * (per-partition top-K, K-row gather) — no global sort, no
    * single-task aggregation. Ties at the cutoff break on the gram
    * itself so both engines pick the identical K rows. */
  def ngramCounts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(expr(wordsExpr).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"))
        .as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit(NgramTopK)

  def ngramCountsSql: String =
    s"""WITH w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       |b AS (SELECT ws[i] || ' ' || ws[i+1] AS gram
       |  FROM w, unnest(range(1, len(ws))) AS t(i)
       |  WHERE len(ws) >= 2)
       |SELECT gram, count(*) AS cnt FROM b GROUP BY gram
       |ORDER BY cnt DESC, gram LIMIT $NgramTopK""".stripMargin

  /** text_normalize: canonical whitespace/case cleanup — lowercase,
    * collapse space/tab runs to one space, trim — the first stage of any
    * ingest pipeline. A narrow per-row codegen regexp chain, scale-free.
    * The fixture corpus is already clean, so deterministic mess (mixed
    * case, a tab, double and trailing spaces) is injected first and the
    * oracle injects identically — the gate verifies the NORMALIZATION,
    * not the fixture (same pattern as pii_scrub). */
  def textNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        concat(col("text"), lit("  MiXeD\tCase  trail ")).as("text"))
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "[ \\t]+", " ")).as("norm_text"))
      .orderBy("doc_id")

  def textNormalizeSql: String =
    s"""WITH inj AS (SELECT doc_id,
       |    text || '  MiXeD' || chr(9) || 'Case  trail ' AS text
       |  FROM documents)
       |SELECT doc_id,
       |  trim(regexp_replace(lower(text), '[ \\t]+', ' ', 'g')) AS norm_text
       |FROM inj ORDER BY doc_id""".stripMargin

  /** Winnowing window: fingerprints = per-window minima over this many
    * consecutive shingle hashes (Schleimer et al., the MOSS scheme). */
  private val WinnowW = 4

  /** winnow_fingerprint: WINNOWED document fingerprints — the guarantee
    * the plain rolling-hash fingerprint lacks: any shared substring of
    * at least w+k-1 words between two docs yields at least one SHARED
    * selected hash, while keeping only ~1/w of all gram hashes (w=4
    * here: a 4× sketch compression with a detection floor of 6 shared
    * words). Per doc: the ordered 3-gram hash stream, a min over each
    * w-window (windows clip at the tail, so short docs keep one
    * whole-doc window), then the distinct selected set — emitted sorted
    * and joined, plus gram/fingerprint counts.
    *
    * Scale shape: pure per-row ARRAY arithmetic (transform/slice/
    * array_min — all codegen, no explode, no shuffle until the final
    * sort); selection is position-local so the operator composes with
    * any downstream index (group fingerprints, not docs, to find
    * cross-doc overlap — the substring analogue of the shingle index).
    * Every engine-shared value rides pmod(hash60, P31) like the rest of
    * the sketch family. */
  /** (doc_id, n_grams, fps: array<long>) — the winnowed selected-hash set
    * per doc, shared by the per-doc sketch query and the cross-doc
    * overlap detector. Pure narrow array arithmetic (see
    * [[winnowFingerprint]]'s scale notes). */
  private[graft] def winnowFps(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr(wordsExpr).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), expr(
        s"""transform(sequence(1, size(ws) - 2),
           |  i -> pmod(hash60(concat(element_at(ws, i), ' ',
           |                          element_at(ws, i + 1), ' ',
           |                          element_at(ws, i + 2))), ${P31}L))""".stripMargin)
        .as("hs"))
      .select(col("doc_id"), size(col("hs")).cast("long").as("n_grams"), expr(
        s"""array_distinct(transform(
           |  sequence(1, greatest(size(hs) - ${WinnowW - 1}, 1)),
           |  i -> array_min(slice(hs, i, $WinnowW))))""".stripMargin)
        .as("fps"))

  def winnowFingerprint(s: SparkSession, dir: String): DataFrame =
    winnowFps(Tables.documents(s, dir))
      .select(col("doc_id"), col("n_grams"),
        size(col("fps")).cast("long").as("n_fp"),
        joinedSortedLongs(col("fps")).as("fp"))
      .orderBy("doc_id")

  /** DuckDB CTE chain producing `f(doc_id, n_grams, fps)` — the oracle
    * twin of [[winnowFps]], shared by both winnow oracles. */
  private def winnowFpsCtesSql: String = {
    val h = hash60Sql("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")
    s"""w AS (SELECT doc_id, $wordsSql AS ws FROM documents),
       |g AS (SELECT doc_id,
       |    list_transform(range(1, len(ws) - 1), i -> $h % $P31) AS hs
       |  FROM w WHERE len(ws) >= 3),
       |f AS (SELECT doc_id, CAST(len(hs) AS BIGINT) AS n_grams,
       |    list_distinct(list_transform(
       |      range(1, greatest(len(hs) - ${WinnowW - 1}, 1) + 1),
       |      i -> list_min(hs[i:i+${WinnowW - 1}]))) AS fps
       |  FROM g)""".stripMargin
  }

  def winnowFingerprintSql: String =
    s"""WITH $winnowFpsCtesSql
       |SELECT doc_id, n_grams, CAST(len(fps) AS BIGINT) AS n_fp,
       |  array_to_string(list_sort(fps), ',') AS fp
       |FROM f ORDER BY doc_id""".stripMargin

  /** Max docs sharing one winnow fingerprint before its bucket degrades
    * from all-pairs to star pairs on the bucket-min doc — the same
    * hub-star policy as `Dedup.MaxBandBucket` (a boilerplate span shared
    * by everything must not fan out O(m²); the star keeps every member
    * reachable for a downstream cluster collapse). */
  private val MaxFpDf = 100

  /** winnow_pairs: the cross-doc overlap detector the winnow sketch
    * exists for — docs sharing any selected fingerprint, with the count
    * of shared fingerprints. By the winnowing guarantee, two docs
    * sharing a substring of ≥ w+k-1 words (6 here) ALWAYS share at
    * least one selected hash, so every such pair appears with
    * n_shared_fps ≥ 1; counts above that grow with the overlap length
    * (≈ one fingerprint per [[WinnowW]] shared grams), making the count
    * a cheap overlap-size proxy a trim/drop decision can read.
    *
    * Scale shape: invert the per-doc sketch (explode — the stream is
    * ~1/w of the gram stream, the compression winnowing bought), size
    * each fingerprint bucket with a map-side-combinable aggregation,
    * then pair within buckets: ≤ [[MaxFpDf]] buckets self-join into
    * full pairs; hot buckets emit O(m) star pairs on their minimum doc
    * (boilerplate spans stay reachable, never quadratic). The only
    * exchanges are on the int64 fingerprint key and the final pair
    * aggregation — work is proportional to collisions, exactly like
    * the shingle index ([[Dedup]] `ngram_jaccard`). */
  def winnowPairs(s: SparkSession, dir: String): DataFrame = {
    // Materialize the per-doc sketch BEFORE exploding: with `fps` consumed
    // only once (by the explode), the optimizer inlines the whole
    // split→gram-hash→window-min pipeline into the generator, and the
    // higher-order functions it is built from evaluate INTERPRETED with
    // nested recompute — every window re-hashes every gram, every gram
    // re-splits the text: O(words³) per doc (measured: minutes at sf0.1
    // vs seconds materialized). The checkpoint evaluates the sketch once
    // per doc and is the barrier the single-reference projection lacks.
    val fps = winnowFps(Tables.documents(s, dir))
      .select("doc_id", "fps")
      .materialized
    // referenced three times (bucket stats + both join sides): pin once,
    // blocks freed with the RDD — the same discipline as the LSH banding
    val ex = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
      .materialized
    val stats = ex.groupBy("fp")
      .agg(count(lit(1)).as("n"), min("doc_id").as("fmin"))
    val kept = ex.join(stats.filter(col("n") <= MaxFpDf).select("fp"), Seq("fp"))
    val fullPairs = kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val starPairs = ex.join(
        stats.filter(col("n") > MaxFpDf).select("fp", "fmin"), Seq("fp"))
      .filter(col("doc_id") =!= col("fmin"))
      .select(col("fmin").as("doc_a"), col("doc_id").as("doc_b"))
    fullPairs.unionByName(starPairs)
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared_fps"))
      .orderBy("doc_a", "doc_b")
  }

  def winnowPairsSql: String =
    s"""WITH $winnowFpsCtesSql,
       |ex AS (SELECT doc_id, unnest(fps) AS fp FROM f),
       |stats AS (SELECT fp, count(*) AS n, min(doc_id) AS fmin
       |  FROM ex GROUP BY fp),
       |kept AS (SELECT ex.doc_id, ex.fp FROM ex JOIN stats USING (fp)
       |  WHERE n <= $MaxFpDf),
       |prs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  UNION ALL
       |  SELECT stats.fmin, ex.doc_id
       |  FROM ex JOIN stats USING (fp)
       |  WHERE n > $MaxFpDf AND ex.doc_id <> stats.fmin)
       |SELECT doc_a, doc_b, count(*) AS n_shared_fps
       |FROM prs GROUP BY doc_a, doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Vocabulary size for the coverage audit — deliberately smaller than
    * the fixture's full vocabulary so the OOV path is exercised. */
  private val VocabN = 20

  /** vocab_coverage: per-document OUT-OF-VOCABULARY rate against the
    * corpus's own top-[[VocabN]] token vocabulary — the audit a
    * tokenizer/vocab decision reads (how much of each doc a fixed
    * vocabulary fails to cover; high-OOV docs are the ones a BPE merge
    * table truncates into byte fallbacks). Vocabulary = the VocabN most
    * frequent tokens under a deterministic (count desc, token) order.
    *
    * Scale shape: the vocabulary build is ONE map-side-combinable token
    * count + a distributed top-K (TakeOrdered: per-partition heads,
    * VocabN-sized gather — never a global sort); coverage is then a
    * broadcast left-join over the token stream + a per-doc aggregation.
    * Two passes over the tokens, no corpus-wide exchange other than the
    * per-doc groupBy. */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr(wordsExpr)).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w")).limit(VocabN)
      .select(col("w"), lit(1).as("in_v"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_v").isNull, 1)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
      .orderBy("doc_id")
  }

  def vocabCoverageSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($wordsSql) AS w FROM documents),
       |vocab AS (SELECT w, 1 AS in_v FROM (
       |  SELECT w, count(*) AS cnt FROM toks GROUP BY w
       |  ORDER BY cnt DESC, w LIMIT $VocabN)),
       |cov AS (SELECT doc_id, count(*) AS n_tokens,
       |    count(*) FILTER (WHERE in_v IS NULL) AS n_oov
       |  FROM toks LEFT JOIN vocab USING (w) GROUP BY doc_id)
       |SELECT doc_id, n_tokens, n_oov,
       |  CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
       |FROM cov ORDER BY doc_id""".stripMargin

  /** unigram_logprob: per-document surprisal under the corpus's own
    * top-[[VocabN]] unigram language model — the CCNet-style
    * "perplexity proxy" quality signal (docs whose tokens the corpus LM
    * finds surprising are the boilerplate/garbage candidates). Shares
    * [[vocabCoverage]]'s vocabulary definition (count desc, token) so
    * the two audits agree on what "in-vocabulary" means; OOV tokens take
    * a floor probability of 0.5/total.
    *
    * Determinism across engines: log-probs are quantized ONCE, at the
    * vocabulary layer, to integer micro-nats (round(ln(p)·1e6) — ~21
    * values; a 1-ulp libm divergence only moves the rounded integer in
    * the measure-zero case where ln(p)·1e6 lands within an ulp of an
    * exact .5 boundary, which none of these vocab entries do),
    * so every per-document number downstream is exact integer
    * arithmetic: sums are association-free BIGINTs and the mean is one
    * double division of two integers.
    *
    * Scale shape: the LM "training" is ONE map-side-combinable token
    * count + distributed top-K, collapsing to a VocabN-entry artifact —
    * which rides back over the corpus as a map LITERAL inside a single
    * narrow codegen projection (`aggregate` over the token array): no
    * token explode, no per-doc shuffle, no join. At 100 TB the scoring
    * pass touches each document exactly once and exchanges nothing but
    * the final ORDER BY. */
  /** The LM-scored doc frame (doc_id, n_tok, surprisal_mnats) shared by
    * [[unigramLogprob]] and [[qualityBuckets]]. */
  private def unigramScoredDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val counts = docs.select(explode(expr(wordsExpr)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt")).head.getLong(0)
    val vocab = counts.orderBy(col("cnt").desc, col("w")).limit(VocabN)
      .collect()
      .map(r => r.getString(0) ->
        math.round(math.log(r.getLong(1).toDouble / total) * 1e6))
      .toMap
    val floorM = math.round(math.log(0.5 / total) * 1e6)
    val lm = typedLit(vocab)
    docs.select(col("doc_id"), expr(wordsExpr).as("ws"))
      .filter(size(col("ws")) >= 1)
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tok"),
        aggregate(col("ws"), lit(0L),
          (acc, w) => acc - coalesce(element_at(lm, w), lit(floorM)))
          .as("surprisal_mnats"))
  }

  def unigramLogprob(s: SparkSession, dir: String): DataFrame =
    unigramScoredDocs(s, dir)
      .withColumn("mean_mnats",
        col("surprisal_mnats").cast("double") / col("n_tok"))
      .orderBy("doc_id")

  /** quality_buckets: the CCNet head/middle/tail split — rank every doc
    * by per-token surprisal under the corpus's own unigram LM and cut
    * the corpus into fluency terciles (head = least surprising), then
    * report each bucket's doc/token mass and exact surprisal totals.
    * This is the bucketing CCNet uses to stratify CommonCrawl by LM
    * perplexity before sampling; downstream mixes quote "head-only" or
    * "head+middle" corpora in exactly these terms.
    *
    * Scale shape: scoring is the [[unigramScoredDocs]] narrow
    * projection; the tercile cut uses the two-phase global row number
    * (one range exchange, no single-task sort — the rfm_segments idiom)
    * ordered by (mean_mnats, doc_id), where mean_mnats is ONE double
    * division of two exact int64s — IEEE-identical on both engines, so
    * ranks and band edges agree bit-for-bit; the final rollup is a
    * 3-group aggregation. */
  def qualityBuckets(s: SparkSession, dir: String): DataFrame = {
    // pinned: consumed by the count rollup, the rank's range-partitioner
    // sampling pass, and the range exchange — three executions of the
    // per-doc LM-scoring projection without the pin (the rfm_segments
    // r21 pattern: pin rank inputs whose upstream is a non-trivial
    // aggregation/scoring chain, not a bare scan projection)
    val scored = unigramScoredDocs(s, dir)
      .withColumn("mean_mnats",
        col("surprisal_mnats").cast("double") / col("n_tok"))
      .materialized
    val n = scored.agg(count(lit(1)).as("n"))
    val ranked = Prims.globalRowNumber(
      scored.crossJoin(broadcast(n)), "rn", col("mean_mnats"), col("doc_id"))
    ranked
      .withColumn("bucket",
        element_at(typedLit(Seq("head", "middle", "tail")),
          (expr("((rn - 1) * 3) div n") + 1).cast("int")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tok"),
        sum(col("surprisal_mnats")).as("surprisal_mnats"))
      .withColumn("mnats_per_tok",
        col("surprisal_mnats").cast("double") / col("n_tok"))
      .orderBy("bucket")
  }

  /** zipf_slope: the corpus-health power-law fit — OLS over
    * (ln rank, ln count) of the word-frequency table, reporting slope
    * (Zipf's law predicts ≈ −1 for natural text; synthetic/templated
    * corpora flatten toward 0), intercept, and r². A curation pipeline
    * watches this number drift as ingest sources change.
    *
    * Scale shape: the frequency table is ONE map-side-combinable count
    * whose size is the vocabulary (Heaps-sublinear); ranking uses the
    * two-phase global row number (no single-task sort even for a
    * million-word vocabulary). Determinism: ln(rank)/ln(cnt) quantize
    * ONCE to integer micro-nats; the five OLS sums are exact int64
    * (bounded: |Σxy| ≤ vocab · (18·10⁶)² needs vocab < 2.8·10⁴ before
    * long overflow — far above any fixture vocabulary, and the final
    * combination happens in double on identical operands, so both
    * engines produce the same bits). */
  def zipfSlope(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(expr(wordsExpr)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      // pinned: the rank's sampling pass + range exchange would each
      // re-run the corpus-wide word-count aggregation (same rationale
      // as the rfm_segments/quality_buckets pins)
      .materialized
    val ranked = Prims.globalRowNumber(counts, "rank", col("cnt").desc, col("w"))
    ranked
      .select(expr("CAST(round(ln(rank) * 1e6) AS BIGINT)").as("x"),
        expr("CAST(round(ln(cnt) * 1e6) AS BIGINT)").as("y"))
      .agg(count(lit(1)).as("n_words"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n_words"),
        expr("""(CAST(n_words AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n_words AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)""")
          .as("slope"),
        expr("""(CAST(sy AS DOUBLE) - ((CAST(n_words AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n_words AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
                / n_words""").as("intercept"),
        expr("""pow(CAST(n_words AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy, 2)
                / ((CAST(n_words AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   * (CAST(n_words AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))""")
          .as("r2"))
  }

  def zipfSlopeSql: String =
    s"""WITH c AS (SELECT w, count(*) AS cnt
       |  FROM (SELECT unnest($wordsSql) AS w FROM documents) GROUP BY w),
       |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank FROM c),
       |q AS (SELECT CAST(round(ln(rank) * 1e6) AS BIGINT) AS x,
       |    CAST(round(ln(cnt) * 1e6) AS BIGINT) AS y FROM rk),
       |sums AS (SELECT count(*) AS n_words,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM q)
       |SELECT n_words,
       |  (CAST(n_words AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       |    / (CAST(n_words AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS slope,
       |  (CAST(sy AS DOUBLE) - ((CAST(n_words AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
       |    / (CAST(n_words AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * sx)
       |    / n_words AS intercept,
       |  pow(CAST(n_words AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy, 2)
       |    / ((CAST(n_words AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
       |       * (CAST(n_words AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) AS r2
       |FROM sums""".stripMargin

  def qualityBucketsSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($wordsSql) AS w FROM documents),
       |c AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
       |tot AS (SELECT sum(cnt) AS total FROM c),
       |v AS (SELECT w, CAST(round(ln(CAST(cnt AS DOUBLE) / total) * 1e6) AS BIGINT) AS mn
       |  FROM c, tot ORDER BY cnt DESC, w LIMIT $VocabN),
       |fl AS (SELECT CAST(round(ln(0.5 / total) * 1e6) AS BIGINT) AS fm FROM tot),
       |j AS (SELECT doc_id, coalesce(v.mn, fl.fm) AS mn
       |  FROM toks LEFT JOIN v USING (w), fl),
       |sc AS (SELECT doc_id, count(*) AS n_tok, CAST(-sum(mn) AS BIGINT) AS sm,
       |    CAST(-sum(mn) AS DOUBLE) / count(*) AS mean_mnats
       |  FROM j GROUP BY doc_id),
       |nn AS (SELECT count(*) AS n FROM sc),
       |rk AS (SELECT sc.*, n,
       |    row_number() OVER (ORDER BY mean_mnats, doc_id) AS rn FROM sc, nn),
       |bd AS (SELECT *, (['head', 'middle', 'tail'])[((rn - 1) * 3) // n + 1] AS bucket
       |  FROM rk)
       |SELECT bucket, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tok,
       |  CAST(sum(sm) AS BIGINT) AS surprisal_mnats,
       |  CAST(sum(sm) AS DOUBLE) / sum(n_tok) AS mnats_per_tok
       |FROM bd GROUP BY 1 ORDER BY 1""".stripMargin

  def unigramLogprobSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($wordsSql) AS w FROM documents),
       |c AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
       |tot AS (SELECT sum(cnt) AS total FROM c),
       |v AS (SELECT w, CAST(round(ln(CAST(cnt AS DOUBLE) / total) * 1e6) AS BIGINT) AS mn
       |  FROM c, tot ORDER BY cnt DESC, w LIMIT $VocabN),
       |fl AS (SELECT CAST(round(ln(0.5 / total) * 1e6) AS BIGINT) AS fm FROM tot),
       |j AS (SELECT doc_id, coalesce(v.mn, fl.fm) AS mn
       |  FROM toks LEFT JOIN v USING (w), fl)
       |SELECT doc_id, count(*) AS n_tok,
       |  CAST(-sum(mn) AS BIGINT) AS surprisal_mnats,
       |  CAST(-sum(mn) AS DOUBLE) / count(*) AS mean_mnats
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** nb_classifier: a trained multinomial Naive Bayes language
    * classifier with a held-out confusion matrix — the fastText-style
    * supervised classifier a curation pipeline trains on its own
    * labels (domain/quality/language routing), end to end: hash-stable
    * 80/20 split, Laplace-smoothed per-class word likelihoods over the
    * top-[[VocabN]] training vocabulary (OOV floor per class), argmax
    * scoring of the held-out fold, confusion counts.
    *
    * Same engineering as [[unigramLogprob]] taken per-class: training
    * collapses to C×(VocabN+2) integers (map-side-combinable counts +
    * distributed top-K; constant-size driver artifact), scoring is ONE
    * narrow projection — C `aggregate` folds over the token array
    * against map literals, argmax via `array_min` over (-score, class)
    * structs so ties break on the lexicographically first class — and
    * every score is exact integer micro-nats, so the confusion matrix
    * is bit-stable across engines. The fixture's synthetic text gives
    * the classifier little real signal; the OPERATOR contract (split /
    * train / score / confuse, deterministically) is what's pinned. */
  def nbClassifier(s: SparkSession, dir: String): DataFrame = {
    // (no scanFanout: training is several separate jobs and each would
    // re-pay the fan-out exchange — r20 A/B: 1.14 → 1.71 s with it)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), expr(wordsExpr).as("ws"))
      .withColumn("fold",
        pmod(hash60(concat(lit("nbsplit_"), col("doc_id"))), lit(5)))
    val train = docs.filter(col("fold") =!= 0)
    val trainToks = train.select(col("lang"), explode(col("ws")).as("w"))

    // vocabulary: top-VocabN training words (count desc, word)
    val vocab = trainToks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(VocabN)
      .select("w").collect().map(_.getString(0))
    // class priors + token totals in ONE training job (r20: these were
    // two separate corpus-scanning collects; per-class doc count and
    // token count are one combinable aggregation — Σ size(ws) per class
    // equals the exploded token count exactly)
    // NULL-text docs: explode(ws) contributes 0 tokens, but size(NULL)
    // is -1/NULL depending on spark.sql.legacy.sizeOfNull — so the token
    // total coalesces per doc to 0 (the langId NULL-handling discipline),
    // keeping Σ per-class tokens ≡ the exploded token count for every
    // input, not just NULL-free fixtures.
    val wsTokens = when(col("ws").isNull, lit(0L))
      .otherwise(size(col("ws")).cast("long"))
    val classStats = train.groupBy("lang")
      .agg(count(lit(1)).as("nc"), sum(wsTokens).as("tc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val classes = classStats.map { case (l, (nc, _)) => l -> nc }
    val nTrain = classes.values.sum
    val tokTotals = classStats.map { case (l, (_, tc)) => l -> tc }
    val vocabSet = vocab.toSet
    val cwCounts = trainToks.filter(col("w").isInCollection(vocabSet))
      .groupBy("lang", "w").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    def mnats(x: Double): Long = math.round(math.log(x) * 1e6)
    val langs = classes.keys.toSeq.sorted
    val cands = langs.map { c =>
      val tc = tokTotals.getOrElse(c, 0L)
      val denom = (tc + VocabN + 1).toDouble
      val lpMap = vocab.map(w =>
        w -> mnats((cwCounts.getOrElse((c, w), 0L) + 1).toDouble / denom)).toMap
      val floorM = mnats(1.0 / denom)
      val priorM = mnats(classes(c).toDouble / nTrain)
      val score = aggregate(col("ws"), lit(priorM),
        (acc, w) => acc + coalesce(element_at(typedLit(lpMap), w), lit(floorM)))
      struct((-score).as("neg"), lit(c).as("cls"))
    }
    docs.filter(col("fold") === 0)
      .filter(size(col("ws")) >= 1) // mirror the oracle's unnest (empty docs score nowhere)
      .select(col("lang").as("true_lang"),
        array_min(array(cands: _*)).getField("cls").as("pred_lang"))
      .groupBy("true_lang", "pred_lang").agg(count(lit(1)).as("n"))
      .orderBy("true_lang", "pred_lang")
  }

  def nbClassifierSql: String = {
    val splitH = Prims.hash60Sql("'nbsplit_' || CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (SELECT doc_id, lang, $wordsSql AS ws,
       |    $splitH % 5 AS fold FROM documents),
       |tr AS (SELECT * FROM d WHERE fold <> 0),
       |te AS (SELECT * FROM d WHERE fold = 0),
       |ttok AS (SELECT lang, unnest(ws) AS w FROM tr),
       |v AS (SELECT w FROM (SELECT w, count(*) AS c FROM ttok GROUP BY w
       |  ORDER BY c DESC, w LIMIT $VocabN)),
       |cls AS (SELECT lang, count(*) AS nc FROM tr GROUP BY lang),
       |ntr AS (SELECT count(*) AS n FROM tr),
       |tokc AS (SELECT lang, count(*) AS tc FROM ttok GROUP BY lang),
       |cw AS (SELECT t.lang, t.w, count(*) AS cnt FROM ttok t
       |  JOIN v USING (w) GROUP BY 1, 2),
       |lp AS (SELECT c.lang, v.w,
       |    CAST(round(ln((coalesce(cw.cnt, 0) + 1.0) / (tokc.tc + ${VocabN + 1})) * 1e6) AS BIGINT) AS mn
       |  FROM cls c CROSS JOIN v
       |  LEFT JOIN cw ON cw.lang = c.lang AND cw.w = v.w
       |  JOIN tokc ON tokc.lang = c.lang),
       |fl AS (SELECT lang, CAST(round(ln(1.0 / (tc + ${VocabN + 1})) * 1e6) AS BIGINT) AS fm
       |  FROM tokc),
       |pr AS (SELECT cls.lang, CAST(round(ln(CAST(nc AS DOUBLE) / n) * 1e6) AS BIGINT) AS pm
       |  FROM cls, ntr),
       |tetok AS (SELECT doc_id, lang AS true_lang, unnest(ws) AS w FROM te),
       |sc AS (SELECT t.doc_id, t.true_lang, c.lang AS cand,
       |    CAST(pr.pm + sum(coalesce(lp.mn, fl.fm)) AS BIGINT) AS score
       |  FROM tetok t CROSS JOIN cls c
       |  LEFT JOIN lp ON lp.lang = c.lang AND lp.w = t.w
       |  JOIN fl ON fl.lang = c.lang
       |  JOIN pr ON pr.lang = c.lang
       |  GROUP BY t.doc_id, t.true_lang, c.lang, pr.pm),
       |best AS (SELECT doc_id, true_lang, cand AS pred_lang,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
       |  FROM sc)
       |SELECT true_lang, pred_lang, count(*) AS n FROM best WHERE rn = 1
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** source_divergence: per-source KL divergence D(p_source ‖ p_corpus)
    * over the top-[[VocabN]]+OOV word distribution — the domain-drift
    * monitor a pipeline runs per ingest source (a source whose token
    * distribution walks away from the corpus is the first sign of a
    * scraper change, spam influx, or template leak). Laplace-smoothed
    * (+1 over VocabN+1 buckets) so every bucket has mass on both sides.
    *
    * Determinism: per-bucket log-probs quantize to integer micro-nats
    * IN-ENGINE — both engines apply round(ln(x)·1e6) to bit-identical
    * doubles ((cnt+1)/(tok+V+1), exact integer ratios) — and the KL
    * numerator Σ (cnt+1)·(mn_src − mn_corpus) is pure int64, so the
    * one final double division matches bit-for-bit. Everything is
    * bounded aggregation: counts collapse to sources×(V+1) cells before
    * any join; no corpus-sized shuffle beyond the word count. */
  def sourceDivergence(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(expr(wordsExpr)).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(VocabN)
      .select(col("w")).withColumn("in_v", lit(1))
    val bucketed = toks.join(broadcast(vocab), Seq("w"), "left")
      .select(col("source"),
        when(col("in_v").isNotNull, col("w")).otherwise(lit("OOV")).as("b"))
    // ONE corpus-scale aggregation; every other distribution derives
    // from this (sources × V+1)-cell frame, materialized so the corpus
    // is scanned once, not once per marginal
    val srcCnt = bucketed.groupBy("source", "b").agg(count(lit(1)).as("cnt"))
      .materialized
    val srcTok = srcCnt.groupBy("source").agg(sum("cnt").as("tok"))
    val corpCnt = srcCnt.groupBy("b").agg(sum("cnt").as("ccnt"))
    val corpTot = corpCnt.agg(sum("ccnt").as("ctot"))
    val buckets = vocab.select(col("w").as("b"))
      .unionByName(s.range(1).select(lit("OOV").as("b")))
    def mn(num: org.apache.spark.sql.Column,
           den: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      round(log(num.cast("double") / den.cast("double")) * lit(1e6)).cast("long")
    // full source × bucket grid (zero cells carry Laplace mass)
    val grid = srcTok.crossJoin(broadcast(buckets))
      .join(srcCnt, Seq("source", "b"), "left").na.fill(Map("cnt" -> 0L))
      .join(broadcast(corpCnt.crossJoin(corpTot)), Seq("b"))
      .select(col("source"), col("tok"), (col("cnt") + 1).as("m"),
        mn(col("cnt") + 1, col("tok") + VocabN + 1).as("mns"),
        mn(col("ccnt") + 1, col("ctot") + VocabN + 1).as("mnc"))
    grid.groupBy("source", "tok")
      .agg(sum(col("m") * (col("mns") - col("mnc"))).as("num"))
      .select(col("source"), col("tok").as("n_tokens"),
        (col("num").cast("double") / (col("tok") + VocabN + 1)).as("kl_mnats"))
      .orderBy("source")
  }

  def sourceDivergenceSql: String =
    s"""WITH toks AS (SELECT source, unnest($wordsSql) AS w FROM documents),
       |v AS (SELECT w FROM (SELECT w, count(*) AS c FROM toks GROUP BY w
       |  ORDER BY c DESC, w LIMIT $VocabN)),
       |bk AS (SELECT source,
       |    CASE WHEN v.w IS NOT NULL THEN toks.w ELSE 'OOV' END AS b
       |  FROM toks LEFT JOIN v ON toks.w = v.w),
       |sc AS (SELECT source, b, count(*) AS cnt FROM bk GROUP BY 1, 2),
       |st AS (SELECT source, count(*) AS tok FROM bk GROUP BY 1),
       |cc AS (SELECT b, count(*) AS ccnt FROM bk GROUP BY 1),
       |ct AS (SELECT count(*) AS ctot FROM bk),
       |bs AS (SELECT w AS b FROM v UNION ALL SELECT 'OOV'),
       |grid AS (SELECT st.source, st.tok, coalesce(sc.cnt, 0) + 1 AS m,
       |    CAST(round(ln(CAST(coalesce(sc.cnt, 0) + 1 AS DOUBLE) / (st.tok + ${VocabN + 1})) * 1e6) AS BIGINT) AS mns,
       |    CAST(round(ln(CAST(cc.ccnt + 1 AS DOUBLE) / (ct.ctot + ${VocabN + 1})) * 1e6) AS BIGINT) AS mnc
       |  FROM st CROSS JOIN bs
       |  LEFT JOIN sc ON sc.source = st.source AND sc.b = bs.b
       |  JOIN cc ON cc.b = bs.b, ct)
       |SELECT source, tok AS n_tokens,
       |  CAST(CAST(sum(m * (mns - mnc)) AS BIGINT) AS DOUBLE) / (tok + ${VocabN + 1}) AS kl_mnats
       |FROM grid GROUP BY source, tok ORDER BY source""".stripMargin

  val oracles: Map[String, String] = Map(
    "source_divergence" -> sourceDivergenceSql,
    "nb_classifier" -> nbClassifierSql,
    "unigram_logprob" -> unigramLogprobSql,
    "quality_buckets" -> qualityBucketsSql,
    "zipf_slope" -> zipfSlopeSql,
    "vocab_coverage" -> vocabCoverageSql,
    "winnow_fingerprint" -> winnowFingerprintSql,
    "winnow_pairs" -> winnowPairsSql,
    "ngram_counts" -> ngramCountsSql,
    "text_normalize" -> textNormalizeSql,
    "tfidf_top_terms" -> tfidfTopTermsSql,
    "repetition_score" -> repetitionScoreSql,
    "doc_chunking" -> docChunkingSql,
    "pipeline_clean" -> pipelineCleanSql,
    "lang_id" -> langIdSql,
    "quality_score" -> qualityScoreSql,
    "token_count" -> tokenCountSql,
    "doc_fingerprint" -> docFingerprintSql,
  )
}
