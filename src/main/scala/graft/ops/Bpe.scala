package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Prims._

/** BPE tokenizer training over the corpus — the natural next step after
  * the n-gram frequency surfaces ([[Sketches.heavyHitters]] is exactly
  * the first merge round's candidate table): iteratively merge the
  * highest-weight adjacent symbol pair, producing the ordered merge list
  * a byte-pair-encoding tokenizer is defined by (Sennrich et al., ACL
  * 2016 — classic BPE trains on the WORD-FREQUENCY table, not the raw
  * token stream).
  *
  * Scale shape: ONE corpus tokenize pass (the shared [[Prims.wordsExpr]]
  * definition) reduces 100 TB of text to a word-frequency table — vocab-
  * sized, Heaps-law sublinear in the corpus. Every merge round is then a
  * distributed pair-count aggregation over that vocab table plus ONE
  * argmax row collected to the driver (bounded metadata, like the
  * codebook collects in [[Similarity]]); the corpus is never touched
  * again. Rounds are bounded by [[MergeRounds]] so the unrolled SQL
  * oracle stays tractable, the PageRank-oracle pattern
  * (`Dedup.pagerankDocsSql`).
  *
  * Merge application is two literal-replace passes over the space-
  * delimited symbol sequence ` a b c `: boundary spaces make the pattern
  * ` x y ` match only whole symbols, and the left-to-right scan that
  * consumes each match's trailing space (hiding an immediately-following
  * occurrence — ` x y x y ` → ` xy x y `) leaves every missed occurrence
  * directly preceded by a merged symbol, so a second pass catches them
  * all. Spark's `replace` and DuckDB's `replace` share this scan-after-
  * replacement semantics (verified on the adversarial cases), which is
  * what makes the oracle exact.
  */
object Bpe {

  /** Merge rounds — bounded so the SQL-unrolled oracle stays tractable. */
  val MergeRounds = 12

  /** The word-frequency substrate with initial character-level symbol
    * sequences: `("hello", cnt, " h e l l o ")`. */
  private def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(expr(wordsExpr)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"),
        concat(regexp_replace(col("word"), "(.)", " $1"), lit(" ")).as("seq"))

  /** bpe_merges: the ordered [[MergeRounds]]-row merge table
    * (round, left_sym, right_sym, merged, pair_count) ORDER BY round,
    * where pair_count is the corpus-weighted adjacent-pair count that
    * won round r (ties break on (left_sym, right_sym) — exact integer
    * counts, so the argmax is deterministic cross-engine). */
  def bpeMerges(s: SparkSession, dir: String): DataFrame =
    bpeMergesOf(Tables.documents(s, dir))

  def bpeMergesOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    trainedOf(docs)
      .toDF("round", "left_sym", "right_sym", "merged", "pair_count")
      .orderBy("round")
  }

  /** One-deep memo of the trained merge chain per (session, input plan):
    * a caller needing several artifacts of the same corpus in one
    * session — merges, apply, histogram — shares ONE MergeRounds
    * training loop instead of re-running it. The memo holds DRIVER
    * METADATA only (a Vector of ≤ [[MergeRounds]] tuples, the
    * `Similarity.codebookMemo` contract): memoizing the trained words
    * DATAFRAME would pin executor checkpoint blocks that a harness's
    * cleanup between queries legitimately unpersists, leaving later
    * reads dangling on dead blocks (the rule written down at
    * [[Dedup]].clusterLabels; violating it here surfaced as
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND in the bench fleet). Keyed on
    * [[corpusKey]] — the canonicalized plan's semanticHash PLUS a
    * content fingerprint (name+len+mtime) of every file-source root in
    * the plan. The fingerprint term matters because Spark's
    * InMemoryFileIndex equality compares only rootPaths: a re-read of
    * the SAME path after its parquet files were regenerated
    * canonicalizes EQUAL, and a plan-only key would serve a stale
    * trained chain (and StreamingBpe.trainAndPublish would publish a
    * stale tokenizer). The key is a plain String — nothing in the memo
    * value references the plan or the session, so the WeakHashMap's
    * weak-on-session eviction actually fires (a retained canonicalized
    * plan would strongly reference the session via HadoopFsRelation and
    * pin the entry for the JVM lifetime). */
  private val trainedMemo = new java.util.WeakHashMap[
    SparkSession,
    (String, Vector[(Long, String, String, String, Long)])]()

  /** Session-independent identity of a corpus plan: semanticHash of the
    * canonicalized analyzed plan + per-root source-listing fingerprints
    * (graft.storage.Layout.listingFingerprint) for every file relation
    * in it. LocalRelation corpora contribute no file roots — their data
    * lives in the plan and the semanticHash term covers it. */
  private def corpusKey(docs: DataFrame): String = {
    val plan = docs.queryExecution.analyzed.canonicalized
    val srcFps = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(p =>
              graft.storage.Layout.listingFingerprint(docs.sparkSession, p.toString))
          case other => Seq(other.getClass.getName)
        }
    }.flatten
    s"${plan.semanticHash()}|${srcFps.mkString(";")}"
  }

  /** The ordered merge list for `docs` — memo hit or fresh training. */
  private def trainedOf(docs: DataFrame)
      : Vector[(Long, String, String, String, Long)] =
    trainedMemo.synchronized {
      val key = corpusKey(docs)
      Option(trainedMemo.get(docs.sparkSession)) match {
        case Some((k, cached)) if k == key => cached
        case _ =>
          val trained = trainNow(docs)
          trainedMemo.put(docs.sparkSession, (key, trained))
          trained
      }
    }

  /** Observability hook for the memo spec: counts actual training runs. */
  private[graft] var trainingRuns = 0

  private def trainNow(docs: DataFrame)
      : Vector[(Long, String, String, String, Long)] = {
    trainingRuns += 1
    // vocab-sized; materialized once — rounds re-aggregate THIS table
    var words = wordTable(docs).materialized

    val merges = Vector.newBuilder[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= MergeRounds && !exhausted) {
      val best = words
        .select(col("cnt"), split(trim(col("seq")), " ").as("l"))
        .filter(size(col("l")) >= 2) // guard BEFORE sequence(): sequence(1,0) is descending, not empty
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(l) - 1), i -> struct(l[i-1] AS x, l[i] AS y))")).as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("x"), col("y")).limit(1)
        .collect() // ONE argmax row of driver metadata per round
      if (best.isEmpty) exhausted = true // every word fully merged — the
        // oracle's CTE chain goes empty from this round on too
      else {
        val (x, y, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        val pat = lit(s" $x $y "); val rep = lit(s" $x$y ")
        words = words
          .withColumn("seq", replace(replace(col("seq"), pat, rep), pat, rep))
          .materialized // flat lineage: round r+1 reads this, not a 2r-deep replace chain
        merges += ((r.toLong, x, y, x + y, c))
        r += 1
      }
    }
    merges.result()
  }

  /** bpe_apply: ENCODE the corpus with the trained tokenizer — the
    * consuming half of the BPE loop ([[bpeMerges]] trains; this applies
    * the learned merges to every document and reports the per-doc token
    * economics a data pipeline budgets with: (doc_id, n_words, n_chars,
    * n_tokens) ORDER BY doc_id).
    *
    * Scale shape: training reduces to vocab-table work as in
    * [[bpeMerges]]; the merge list then comes back to the ENCODE side as
    * 2×[[MergeRounds]] literal `replace` calls folded into one codegen
    * projection — the map-literal posture of unigram_logprob's scoring,
    * NO join against the vocabulary and no second pass over the corpus.
    * (Applying the ordered chain to a fresh char-split word reproduces
    * the training rewrite exactly, because training applied that same
    * chain to every vocab word.) The only exchange is the map-side-
    * combined per-doc aggregation — scan-proportional at 100 TB.
    *
    * Oracle note: like bpeMergesSql, the SQL twin unrolls all
    * [[MergeRounds]] rounds and assumes the corpus supports them (the
    * CTE chain goes empty past an exhausted round on both sides of the
    * training table, but the encode side here keeps whatever merges
    * exist — fine for any real corpus; BpeSpec covers tiny ones). */
  def bpeApply(s: SparkSession, dir: String): DataFrame =
    bpeApplyOf(Tables.documents(s, dir))

  def bpeApplyOf(docs: DataFrame): DataFrame =
    encodeWith(docs, trainedOf(docs).map(m => (m._2, m._3))).orderBy("doc_id")

  /** The encode projection for an already-trained ORDERED merge chain
    * `(left_sym, right_sym)*`: per-doc token economics (doc_id, n_words,
    * n_chars, n_tokens), unordered. The chain comes back as 2×|chain|
    * literal `replace` calls folded into ONE codegen projection — no
    * vocab join, one map-side-combined per-doc aggregation. Shared by
    * the batch surface ([[bpeApply]]) and the ingest-time twin
    * ([[graft.streaming.StreamingBpe]], which re-reads a published chain
    * per micro-batch). */
  private[graft] def encodeWith(docs: DataFrame,
      chain: Seq[(String, String)]): DataFrame = {
    val charSplit = concat(regexp_replace(col("word"), "(.)", " $1"), lit(" "))
    val seqCol = chain.foldLeft(charSplit) { case (c, (x, y)) =>
      val pat = lit(s" $x $y "); val rep = lit(s" $x$y ")
      replace(replace(c, pat, rep), pat, rep)
    }
    docs.select(col("doc_id"), explode(expr(wordsExpr)).as("word"))
      .select(col("doc_id"), col("word"),
        size(split(trim(seqCol), " ")).cast("long").as("ntok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("n_chars"),
        sum(col("ntok")).as("n_tokens"))
  }

  /** bpe_token_histogram: the corpus-wide token frequency table under
    * the trained tokenizer — (token, occurrences) ORDER BY token, the
    * table that feeds vocab-coverage and packing decisions downstream.
    * Rebuilds the final trained word table by applying the (memoized
    * driver-metadata) merge chain to a fresh char-split vocab table in
    * ONE projection — identical to training's round-by-round rewrite,
    * because training applied exactly this ordered chain to every vocab
    * word. Costs one corpus tokenize + a vocab-sized groupBy per call;
    * holding the trained DataFrame across calls instead would pin
    * checkpoint blocks past harness cleanup (see [[trainedMemo]]). */
  def bpeTokenHistogram(s: SparkSession, dir: String): DataFrame =
    bpeTokenHistogramOf(Tables.documents(s, dir))

  def bpeTokenHistogramOf(docs: DataFrame): DataFrame = {
    val seqCol = trainedOf(docs).foldLeft(col("seq")) { case (c, (_, x, y, _, _)) =>
      val pat = lit(s" $x $y "); val rep = lit(s" $x$y ")
      replace(replace(c, pat, rep), pat, rep)
    }
    wordTable(docs)
      .select(explode(split(trim(seqCol), " ")).as("token"), col("cnt"))
      .groupBy("token").agg(sum(col("cnt")).as("occurrences"))
      .orderBy("token")
  }


  /** The shared DuckDB training chain: w0 (char-split word-frequency
    * table) → (p_r pair counts → b_r argmax → w_r rewrite) ×
    * MergeRounds. All three BPE oracles hang off it. */
  private def cteChain: String = {
    val rep = "' '||x||' '||y||' ', ' '||x||y||' '"
    val rounds = (1 to MergeRounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT l[i] AS x, l[i+1] AS y, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT string_split(trim(seq), ' ') AS l, cnt FROM w${r - 1}) t,
         |    UNNEST(generate_series(1, len(l) - 1)) AS u(i)
         |  WHERE len(l) >= 2 GROUP BY 1, 2),
         |b$r AS MATERIALIZED (SELECT x, y, c FROM p$r ORDER BY c DESC, x, y LIMIT 1),
         |w$r AS MATERIALIZED (SELECT word, cnt,
         |    replace(replace(seq, $rep), $rep) AS seq
         |  FROM w${r - 1}, b$r)""".stripMargin
    }.mkString(",\n")
    s"""w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt,
       |    regexp_replace(word, '(.)', ' \\1', 'g') || ' ' AS seq
       |  FROM (SELECT unnest($wordsSql) AS word FROM documents) t
       |  GROUP BY word),
       |$rounds""".stripMargin
  }

  /** DuckDB oracle for bpe_merges: the training chain's per-round argmax
    * rows. */
  def bpeMergesSql: String = {
    val sel = (1 to MergeRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) AS round, x AS left_sym, y AS right_sym, " +
        s"x||y AS merged, c AS pair_count FROM b$r").mkString("\nUNION ALL ")
    s"""WITH $cteChain
       |$sel
       |ORDER BY round""".stripMargin
  }

  /** DuckDB oracle for bpe_apply: per-word token counts from the final
    * training table w[[MergeRounds]] joined onto the exploded corpus —
    * every corpus word is in the vocab by construction, so the join is
    * total and the per-doc sums mirror Spark's inline replace chain. */
  def bpeApplySql: String =
    s"""WITH $cteChain,
       |wt AS (SELECT word, len(word) AS nch,
       |    len(string_split(trim(seq), ' ')) AS ntok FROM w$MergeRounds)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(nch) AS BIGINT) AS n_chars,
       |  CAST(sum(ntok) AS BIGINT) AS n_tokens
       |FROM (SELECT doc_id, unnest($wordsSql) AS word FROM documents) d
       |JOIN wt USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for bpe_token_histogram: the final training table's
    * symbol sequences exploded, weighted by corpus word count. */
  def bpeTokenHistogramSql: String =
    s"""WITH $cteChain
       |SELECT token, CAST(sum(cnt) AS BIGINT) AS occurrences
       |FROM (SELECT unnest(string_split(trim(seq), ' ')) AS token, cnt
       |      FROM w$MergeRounds) t
       |GROUP BY token ORDER BY token""".stripMargin

  val oracles: Map[String, String] = Map(
    "bpe_merges" -> bpeMergesSql,
    "bpe_apply" -> bpeApplySql,
    "bpe_token_histogram" -> bpeTokenHistogramSql)
}
