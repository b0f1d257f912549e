package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has one entry in `queries`
  * (Spark DataFrame form, run on the parquet testdata) and, where
  * SQL-expressible, a matching DuckDB oracle in `oracleSql`. Column names and
  * row order are deterministic and identical on both sides — the driver
  * sorts columns by name and hashes values, so every aggregate is aliased
  * the same way in both forms and every query ends in an ORDER BY over a
  * unique key.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EnrichJoin.enrichWideRow(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.3 stateless transforms (T1–T11)
    "word_count"        -> (Relational.wordCount _),
    "projection"        -> (Relational.projection _),
    "filter"            -> (Relational.filterQuery _),
    "string_funcs"      -> (Relational.stringFuncs _),
    "date_funcs"        -> (Relational.dateFuncs _),
    "decimal_arith"     -> (Relational.decimalArith _),
    "json_extract"      -> (Relational.jsonExtract _),
    "union_streams"     -> (Relational.unionStreams _),
    "side_output_split" -> (Relational.sideOutputSplit _),
    "iterate_until"     -> (Relational.iterateUntil _),
    // §2.4 keyed rolling aggregation (A1–A5)
    "rolling_sum"       -> (Rolling.rollingSum _),
    "group_agg"         -> (Rolling.groupAgg _),
    "max_min"           -> (Rolling.maxMin _),
    "fold_cumsum"       -> (Rolling.foldCumsum _),
    "last_nonnull_merge"-> (Rolling.lastNonNullMerge _),
    // §2.5 windows (W1–W11)
    "tumbling_window"   -> (Windows.tumbling _),
    "sliding_window"    -> (Windows.sliding _),
    "session_window"    -> (Windows.session _),
    "late_split"        -> (Windows.lateSplit _),
    "count_window_all"  -> (CountWindows.countWindowAll _),
    "count_window_keyed"-> (CountWindows.countWindowKeyed _),
    "trigger_evictor"   -> (CountWindows.triggerEvictor _),
    // §2.6 joins & stateful enrichment (J1–J4, E3)
    "window_join"       -> (EnrichJoin.windowJoin _),
    "coprocess_merge"   -> (EnrichJoin.coProcessMerge _),
    "state_kinds"       -> (EnrichJoin.stateKinds _),
    "enrich_wide_row"   -> (EnrichJoin.enrichWideRow _),
    "funnel"            -> (EnrichJoin.funnel _),
    "asof_attribution"  -> (EnrichJoin.asofAttribution _),
    "interval_join"     -> (EnrichJoin.intervalJoin _),
    "multitouch_attribution" -> (EnrichJoin.multitouchAttribution _),
    "cohort_retention"  -> (EventAnalytics.cohortRetention _),
    "debounce"          -> (EventAnalytics.debounce _),
    "events_rollup"     -> (EventAnalytics.eventsRollup _),
    "events_incremental_rollup" -> (EventAnalytics.incrementalRollup _),
    "events_week_compare" -> (EventAnalytics.weekCompare _),
    "events_day_slice"  -> (EventAnalytics.daySlice _),
    "events_box_slice"  -> (EventAnalytics.boxSlice _),
    "events_user_lookup" -> (EventAnalytics.userLookup _),
    "sessionize"        -> (EventAnalytics.sessionize _),
    "user_journey"      -> (EventAnalytics.userJourney _),
    "events_pivot"      -> (EventAnalytics.eventsPivot _),
    "events_window_funcs" -> (EventAnalytics.windowFuncs _),
    "events_cube"       -> (EventAnalytics.eventsCube _),
    "user_overlap"      -> (EventAnalytics.userOverlap _),
    "pattern_match"     -> (EventAnalytics.patternMatch _),
    "inactive_customers" -> (Tpch.inactiveCustomers _),
    "rfm_segments"      -> (Tpch.rfmSegments _),
    "moving_avg"        -> (Tpch.movingAvg _),
    "top_parts_per_brand" -> (Tpch.topPartsPerBrand _),
    "tpch_q3"           -> (EnrichJoin.tpchQ3 _),
    "tpch_q5"           -> (EnrichJoin.tpchQ5 _),
    "tpch_q1"           -> (Tpch.tpchQ1 _),
    "tpch_q2"           -> (Tpch.tpchQ2 _),
    "tpch_q11"          -> (Tpch.tpchQ11 _),
    "tpch_q16"          -> (Tpch.tpchQ16 _),
    "tpch_q4"           -> (Tpch.tpchQ4 _),
    "tpch_q6"           -> (Tpch.tpchQ6 _),
    "tpch_q7"           -> (Tpch.tpchQ7 _),
    "tpch_q8"           -> (Tpch.tpchQ8 _),
    "tpch_q9"           -> (Tpch.tpchQ9 _),
    "tpch_q10"          -> (Tpch.tpchQ10 _),
    "tpch_q12"          -> (Tpch.tpchQ12 _),
    "tpch_q13"          -> (Tpch.tpchQ13 _),
    "tpch_q14"          -> (Tpch.tpchQ14 _),
    "tpch_q15"          -> (Tpch.tpchQ15 _),
    "tpch_q17"          -> (Tpch.tpchQ17 _),
    "tpch_q18"          -> (Tpch.tpchQ18 _),
    "tpch_q19"          -> (Tpch.tpchQ19 _),
    "tpch_q20"          -> (Tpch.tpchQ20 _),
    "tpch_q21"          -> (Tpch.tpchQ21 _),
    "tpch_q22"          -> (Tpch.tpchQ22 _),
    // LLM training-data pipeline ops (north-star extensions, SURVEY.md §7.2 M5)
    "dedup_exact"       -> (Dedup.dedupExact _),
    "dedup_substring"   -> (Dedup.dedupSubstring _),
    "dedup_incremental" -> (Dedup.dedupIncremental _),
    "editdist_pairs"    -> (Dedup.editdistPairs _),
    "dedup_clusters"    -> (Dedup.dedupClusters _),
    "cluster_size_histogram" -> (Dedup.clusterSizeHistogram _),
    "dedup_survivors"   -> (Dedup.dedupSurvivors _),
    "dedup_near_minhash"-> (Dedup.dedupNearMinhash _),
    "minhash_calibration" -> (Dedup.minhashCalibration _),
    "source_overlap"    -> (Dedup.sourceOverlap _),
    "simhash_dedup"     -> (Dedup.simhashDedup _),
    "simhash_hamming_pairs" -> (Dedup.simhashHammingPairs _),
    "ngram_jaccard"     -> (Dedup.ngramJaccard _),
    "pagerank_docs"     -> (Dedup.pagerankDocs _),
    "dedup_central_survivors" -> (Dedup.dedupCentralSurvivors _),
    "containment_pairs" -> (Dedup.containmentPairs _),
    "ann_topk"          -> (Similarity.annTopK _),
    "ann_lsh_pairs"     -> (Similarity.annLshPairs _),
    "cosine_near_dup"   -> (Similarity.cosineNearDup _),
    "decontaminate_semantic" -> (Similarity.decontaminateSemantic _),
    "ann_ivf_topk"      -> (Similarity.annIvfTopK _),
    "ann_pq_topk"       -> (Similarity.annPqTopK _),
    "ann_pq_recall"     -> (Similarity.annPqRecall _),
    "hard_negatives"    -> (Similarity.hardNegatives _),
    "ann_ivf_recall"    -> (Similarity.annIvfRecall _),
    "ann_ivf_sampled_recall" -> (Similarity.annIvfSampledRecall _),
    "embed_cluster_profile" -> (Similarity.embedClusterProfile _),
    "density_prune"     -> (Similarity.densityPrune _),
    "semantic_dedup"    -> (Similarity.semanticDedup _),
    "semantic_incremental" -> (Similarity.semanticIncremental _),
    "lang_id"           -> (TextAnalysis.langId _),
    "quality_score"     -> (TextAnalysis.qualityScore _),
    "token_count"       -> (TextAnalysis.tokenCount _),
    "doc_fingerprint"   -> (TextAnalysis.docFingerprint _),
    "winnow_fingerprint" -> (TextAnalysis.winnowFingerprint _),
    "winnow_pairs"      -> (TextAnalysis.winnowPairs _),
    "vocab_coverage"    -> (TextAnalysis.vocabCoverage _),
    "unigram_logprob"   -> (TextAnalysis.unigramLogprob _),
    "quality_buckets"   -> (TextAnalysis.qualityBuckets _),
    "zipf_slope"        -> (TextAnalysis.zipfSlope _),
    "nb_classifier"     -> (TextAnalysis.nbClassifier _),
    "source_divergence" -> (TextAnalysis.sourceDivergence _),
    "repetition_score"  -> (TextAnalysis.repetitionScore _),
    "tfidf_top_terms"   -> (TextAnalysis.tfidfTopTerms _),
    "ngram_counts"      -> (TextAnalysis.ngramCounts _),
    "text_normalize"    -> (TextAnalysis.textNormalize _),
    "pipeline_clean"    -> (TextAnalysis.pipelineClean _),
    "doc_chunking"      -> (TextAnalysis.docChunking _),
    "multimodal_features" -> (Multimodal.multimodalFeatures _),
    "frame_sample"      -> (Multimodal.frameSample _),
    "phash_near_dup"    -> (Multimodal.phashNearDup _),
    "phash_clusters"    -> (Multimodal.phashClusters _),
    "phash_calibration" -> (Multimodal.phashCalibration _),
    "frame_near_dup"    -> (Multimodal.frameNearDup _),
    "train_val_split"   -> (PipelineOps.trainValSplit _),
    "split_leakage"     -> (PipelineOps.splitLeakage _),
    "train_val_split_cluster" -> (PipelineOps.trainValSplitCluster _),
    "decontaminate"     -> (PipelineOps.decontaminate _),
    "decontaminate_bloom" -> (PipelineOps.decontaminateBloom _),
    "source_cardinality"  -> (PipelineOps.sourceCardinality _),
    "domain_mix"        -> (PipelineOps.domainMix _),
    "domain_mix_temperature" -> (PipelineOps.domainMixTemperature _),
    "domain_mix_weighted" -> (PipelineOps.domainMixWeighted _),
    "corpus_shuffle"    -> (PipelineOps.corpusShuffle _),
    "corpus_stats"      -> (PipelineOps.corpusStats _),
    "quantile_sketch_gate" -> (PipelineOps.quantileSketchGate _),
    "corpus_pack"       -> (PipelineOps.corpusPack _),
    "pack_bins"         -> (PipelineOps.packBins _),
    "curate_manifest"   -> (PipelineOps.curateManifest _),
    "corpus_health"     -> (PipelineOps.corpusHealth _),
    "pii_scrub"         -> (PipelineOps.piiScrub _),
    "stratified_sample" -> (PipelineOps.stratifiedSample _),
    "doc_len_histogram" -> (PipelineOps.docLenHistogram _),
    "heavy_hitters"     -> (Sketches.heavyHitters _),
    "bpe_merges"        -> (Bpe.bpeMerges _),
    "bpe_apply"         -> (Bpe.bpeApply _),
    "bpe_token_histogram" -> (Bpe.bpeTokenHistogram _),
    // E3 flagship: full six-source enrichment DAG through four
    // flatMapGroupsWithState stages (graft.streaming.EnrichDag)
    "enrich_dag"        -> (graft.streaming.EnrichDag.enrichDag _),
  )

  /** DuckDB-dialect oracle for each query (same tables, same column names,
    * same ORDER BY). Timestamps are compared as epoch integers; double sums
    * go through DECIMAL(18,2) on both sides so association order can't
    * change the value. */
  def oracleSql: Map[String, String] = Map(
    "word_count" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents) t
        |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,

    "projection" ->
      """SELECT c_custkey AS cust_id, c_name AS cust_name, c_mktsegment AS segment
        |FROM customer ORDER BY cust_id""".stripMargin,

    "filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "string_funcs" ->
      """SELECT p_partkey,
        |  p_brand || '|' || p_type AS brand_type,
        |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |  upper(trim(p_name)) AS name_up,
        |  printf('%s#%04d', p_brand, p_size) AS tag,
        |  (p_name LIKE '%red%') AS has_red
        |FROM part ORDER BY p_partkey""".stripMargin,

    "date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mon, quarter(o_orderdate) AS qtr,
        |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "decimal_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1 - l_discount) AS revenue,
        |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "json_extract" ->
      """SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "union_streams" ->
      """SELECT src, name FROM (
        |  SELECT 'customer' AS src, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT 'supplier' AS src, s_name AS name FROM supplier
        |) ORDER BY src, name""".stripMargin,

    "side_output_split" ->
      """SELECT event_id, value,
        |  CASE WHEN value < 10 THEN 'side' ELSE 'main' END AS route
        |FROM events ORDER BY event_id""".stripMargin,

    "iterate_until" ->
      """SELECT event_id,
        |  CAST(CASE WHEN event_id % 10 > 5 THEN event_id % 10 ELSE 6 END AS INTEGER) AS x_final
        |FROM events ORDER BY event_id""".stripMargin,

    "rolling_sum" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_sum
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "group_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "max_min" ->
      """SELECT user_id, max(value) AS max_value, min(value) AS min_value, count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "fold_cumsum" ->
      """SELECT user_id, event_id, value,
        |  row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS seq,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "last_nonnull_merge" ->
      """SELECT user_id,
        |  coalesce(max_by(value, event_id) FILTER (WHERE event_type = 'click'), -1.0) AS last_click,
        |  coalesce(max_by(value, event_id) FILTER (WHERE event_type = 'view'), -1.0) AS last_view,
        |  coalesce(max_by(value, event_id) FILTER (WHERE event_type = 'purchase'), -1.0) AS last_purchase,
        |  coalesce(max_by(value, event_id) FILTER (WHERE event_type = 'signup'), -1.0) AS last_signup,
        |  coalesce(max_by(value, event_id) FILTER (WHERE event_type = 'error'), -1.0) AS last_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "tumbling_window" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600 AS window_start,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "sliding_window" ->
      """WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type FROM events)
        |SELECT (us // 900000000 - i) * 900 AS window_start, event_type, count(*) AS n
        |FROM e, (VALUES (0),(1),(2),(3)) AS g(i)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events
        |), flagged AS (
        |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |                   OR us - lag(us) OVER w >= 1800000000
        |                 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
        |), sess AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, min(us) // 1000000 AS session_start,
        |  (max(us) + 1800000000) // 1000000 AS session_end,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "late_split" ->
      """SELECT user_id, event_id,
        |  coalesce(epoch_us(CAST(ts AS TIMESTAMP)) <
        |    max(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - 1800000000,
        |    FALSE) AS is_late
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "count_window_all" ->
      """WITH t AS (SELECT event_id, value, row_number() OVER (ORDER BY event_id) AS rn FROM events)
        |SELECT (rn - 1) // 5 AS win_id,
        |  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS ids,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM t GROUP BY 1 HAVING count(*) = 5 ORDER BY 1""".stripMargin,

    "count_window_keyed" ->
      """WITH t AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn FROM events)
        |SELECT user_id, (rn - 1) // 3 AS win_id,
        |  string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id) AS ids,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM t GROUP BY 1, 2 HAVING count(*) = 3 ORDER BY 1, 2""".stripMargin,

    "trigger_evictor" ->
      """WITH t AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        |      PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS buf_sum
        |  FROM events)
        |SELECT user_id, rn, buf_sum FROM t WHERE rn % 2 = 0 ORDER BY user_id, rn""".stripMargin,

    "window_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600 AS window_start FROM events)
        |SELECT v.user_id, v.window_start, v.event_id AS view_id, c.event_id AS click_id
        |FROM e v JOIN e c ON v.user_id = c.user_id AND v.window_start = c.window_start
        |WHERE v.event_type = 'view' AND c.event_type = 'click'
        |ORDER BY 1, 2, 3, 4""".stripMargin,

    "coprocess_merge" ->
      """SELECT user_id,
        |  coalesce(max_by(value, event_id) FILTER (WHERE event_type = 'click'), -1.0) AS last_click,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |  coalesce(max_by(value, event_id) FILTER (WHERE event_type = 'view'), -1.0) AS last_view,
        |  count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events WHERE event_type IN ('click', 'view')
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "state_kinds" ->
      """WITH base AS (
        |  SELECT user_id,
        |    max_by(value, event_id) AS value_state,
        |    coalesce(string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY event_id)
        |      FILTER (WHERE event_type = 'error'), '') AS list_state,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS reducing_state,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS aggregating_state
        |  FROM events GROUP BY user_id
        |), ms AS (
        |  SELECT user_id, string_agg(s, ',' ORDER BY s) AS map_state FROM (
        |    SELECT user_id, event_type || ':' || CAST(count(*) AS VARCHAR) AS s
        |    FROM events GROUP BY user_id, event_type
        |  ) GROUP BY user_id
        |)
        |SELECT b.user_id, value_state, list_state, map_state, reducing_state, aggregating_state
        |FROM base b JOIN ms USING (user_id) ORDER BY user_id""".stripMargin,

    "enrich_wide_row" ->
      """WITH li AS (
        |  SELECT l_orderkey, count(*) AS n_lines,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY l_orderkey
        |)
        |SELECT o.o_orderkey, o.o_orderstatus,
        |  coalesce(c.c_name, 'UNKNOWN') AS cust_name,
        |  coalesce(n.n_name, 'UNKNOWN') AS nation_name,
        |  coalesce(r.r_name, 'UNKNOWN') AS region_name,
        |  coalesce(li.n_lines, 0) AS n_lines,
        |  coalesce(li.sum_qty, 0.0) AS sum_qty,
        |  coalesce(li.revenue, 0.0) AS revenue
        |FROM orders o
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |LEFT JOIN li ON o.o_orderkey = li.l_orderkey
        |ORDER BY o.o_orderkey""".stripMargin,
  ) ++ Dedup.oracles ++ Similarity.oracles ++ TextAnalysis.oracles ++
    Multimodal.oracles ++ PipelineOps.oracles ++ Sketches.oracles ++
    Bpe.oracles ++ Map(
      "enrich_dag" -> graft.streaming.EnrichDag.enrichDagSql,
      "funnel" -> EnrichJoin.funnelSql,
      "asof_attribution" -> EnrichJoin.asofAttributionSql,
      "interval_join" -> EnrichJoin.intervalJoinSql,
      "multitouch_attribution" -> EnrichJoin.multitouchAttributionSql,
      "cohort_retention" -> EventAnalytics.cohortRetentionSql,
      "debounce" -> EventAnalytics.debounceSql,
      "events_rollup" -> EventAnalytics.eventsRollupSql,
      "events_incremental_rollup" -> EventAnalytics.incrementalRollupSql,
      "events_week_compare" -> EventAnalytics.weekCompareSql,
      "events_day_slice" -> EventAnalytics.daySliceSql,
      "events_box_slice" -> EventAnalytics.boxSliceSql,
      "events_user_lookup" -> EventAnalytics.userLookupSql,
      "sessionize" -> EventAnalytics.sessionizeSql,
      "user_journey" -> EventAnalytics.userJourneySql,
      "events_pivot" -> EventAnalytics.eventsPivotSql,
      "events_window_funcs" -> EventAnalytics.windowFuncsSql,
      "events_cube" -> EventAnalytics.eventsCubeSql,
      "user_overlap" -> EventAnalytics.userOverlapSql,
      "pattern_match" -> EventAnalytics.patternMatchSql,
      "inactive_customers" -> Tpch.inactiveCustomersSql,
      "rfm_segments" -> Tpch.rfmSegmentsSql,
      "moving_avg" -> Tpch.movingAvgSql,
      "top_parts_per_brand" -> Tpch.topPartsPerBrandSql,
      "tpch_q3" -> EnrichJoin.tpchQ3Sql,
      "tpch_q5" -> EnrichJoin.tpchQ5Sql,
      "tpch_q1" -> Tpch.tpchQ1Sql,
      "tpch_q4" -> Tpch.tpchQ4Sql,
      "tpch_q6" -> Tpch.tpchQ6Sql,
      "tpch_q2" -> Tpch.tpchQ2Sql,
      "tpch_q7" -> Tpch.tpchQ7Sql,
      "tpch_q8" -> Tpch.tpchQ8Sql,
      "tpch_q9" -> Tpch.tpchQ9Sql,
      "tpch_q10" -> Tpch.tpchQ10Sql,
      "tpch_q11" -> Tpch.tpchQ11Sql,
      "tpch_q12" -> Tpch.tpchQ12Sql,
      "tpch_q13" -> Tpch.tpchQ13Sql,
      "tpch_q14" -> Tpch.tpchQ14Sql,
      "tpch_q15" -> Tpch.tpchQ15Sql,
      "tpch_q16" -> Tpch.tpchQ16Sql,
      "tpch_q17" -> Tpch.tpchQ17Sql,
      "tpch_q18" -> Tpch.tpchQ18Sql,
      "tpch_q19" -> Tpch.tpchQ19Sql,
      "tpch_q20" -> Tpch.tpchQ20Sql,
      "tpch_q21" -> Tpch.tpchQ21Sql,
      "tpch_q22" -> Tpch.tpchQ22Sql)
}
