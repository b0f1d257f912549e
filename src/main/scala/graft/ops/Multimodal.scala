package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, plus feature-extraction and frame-sampling over them.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * `fake_width`/`fake_height` are deterministic fakes derived from the
  * payload (clearly marked below). Everything around the stub is the real
  * Spark-side design: binary columns survive parquet round-trips, the
  * per-record work is a narrow map stage (no shuffle), and at 100 TB the
  * payloads stay columnar-compressed with metadata readable WITHOUT
  * fetching payload bytes (column pruning drops `payload` for
  * metadata-only queries).
  *
  * The typed API (graft.multimodal.Media) carries the same schema through
  * a Dataset[MediaRecord] with a mapPartitions-based extractor, the shape
  * a real decoder (batched, per-partition codec init) would use.
  */
object Multimodal {

  /** Batch query: synthesize a payload per document (utf-8 bytes of the
    * text — a stand-in for real image/audio bytes), attach modality
    * metadata, extract features, sample 4 "frames". */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"),
        encode(col("text"), "utf-8").as("payload"))
      .select(
        col("doc_id"),
        // modality from the source id: src<k> → k % 3
        expr("element_at(array('image', 'audio', 'video'), CAST(substring(source, 4, 10) AS INT) % 3 + 1)")
          .as("modality"),
        length(col("payload")).cast("long").as("byte_len"),
        hex(encode(expr("substring(text, 1, 8)"), "utf-8")).as("header_hex"), // 8 CHARS, matching the oracle's substr
        // STUB decode: real decoders need codec libs absent from this
        // container; deterministic fakes keep the pipeline testable.
        (length(col("payload")) % 640).cast("long").as("fake_width"),
        (length(col("payload")) * 7 % 480).cast("long").as("fake_height"),
        // frame sampling: 4 evenly-spaced 64-char slices, fingerprinted
        concat_ws(",",
          (0 until 4).map(i => md5(substring(col("text"), 1 + i * 64, 64))): _*)
          .as("frames"))
      .orderBy("doc_id")

  def multimodalFeaturesSql: String = {
    val frames = (0 until 4).map(i => s"md5(substr(text, ${1 + i * 64}, 64))")
      .mkString(" || ',' || ")
    s"""SELECT doc_id,
       |  ['image', 'audio', 'video'][CAST(substr(source, 4) AS INT) % 3 + 1] AS modality,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       |  hex(substr(text, 1, 8)) AS header_hex,
       |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS fake_width,
       |  CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS fake_height,
       |  $frames AS frames
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Frame stride in chars of the synthetic payload (stands in for a
    * fixed frame interval in a real video/audio stream). */
  private val FrameStride = 64
  /** Frame-count cap per record — a real sampler caps frames per video
    * so one long video cannot dominate a task. */
  private val MaxFrames = 8

  /** frame_sample: explode each media record into its sampled FRAMES —
    * one output row per (record, frame index), with the frame's offset,
    * byte length, and content fingerprint. This is the row shape that
    * makes per-frame work (decode, feature-extract, embed) scale past
    * document granularity: after the narrow explode each frame is an
    * independent row, so a `repartition` spreads one huge video's
    * frames across the cluster instead of pinning them to the task that
    * read the record. The frame CONTENT here is a text slice (decode is
    * stubbed — see the class doc); the explode arithmetic, per-frame
    * cap, and fingerprinting are the real plumbing. */
  def frameSample(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      // guard empty payloads BEFORE the sequence: Spark's sequence(1, 0)
      // is a DESCENDING [1, 0] (not empty like DuckDB's range(1, 1)), so
      // an empty record would emit two phantom frames instead of none
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, least((length(text) + ${FrameStride - 1}) div $FrameStride,
           |                            $MaxFrames)),
           |  i -> substring(text, (i - 1) * $FrameStride + 1, $FrameStride))"""
          .stripMargin))).toDF("doc_id", "pos", "frame")
      .select(col("doc_id"),
        (col("pos") + 1).cast("long").as("frame_idx"),
        (col("pos").cast("long") * FrameStride + 1L).as("off"),
        length(encode(col("frame"), "utf-8")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  def frameSampleSql: String =
    s"""WITH f AS (SELECT doc_id, i,
       |    substr(text, (i - 1) * $FrameStride + 1, $FrameStride) AS frame
       |  FROM documents,
       |    unnest(range(1, least((len(text) + ${FrameStride - 1}) // $FrameStride,
       |                          $MaxFrames) + 1)) AS t(i))
       |SELECT doc_id, i AS frame_idx,
       |  (i - 1) * $FrameStride + 1 AS off,
       |  CAST(octet_length(encode(frame)) AS BIGINT) AS frame_bytes,
       |  md5(frame) AS frame_md5
       |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** dHash grid: 8×8 cells, each sampled from [[PhashStride]] chars of
    * the decoded frame (decode stubbed — the payload is the text bytes,
    * see the class doc; the grid/compare/band plumbing is the real
    * image-dedup design). */
  private val PhashGrid = 8
  private val PhashStride = 8
  /** 7 horizontal comparisons × 8 rows = 56 fingerprint bits — kept
    * inside the POSITIVE int64 range so the cross-engine arithmetic is
    * sign-free (the hash60 discipline; a 64-bit dHash's top bit would
    * make the DuckDB power-sum overflow signed BIGINT). */
  private val PhashBits = PhashGrid * (PhashGrid - 1)
  /** Max Hamming distance for [[phashNearDup]] to report a pair; 4
    * pigeonhole bands of 14 bits. */
  private val PhashHammingK = 3

  /** The (doc_id, phash) fingerprint table: a difference-hash (dHash)
    * over the decoded frame's luminance grid — cell (r,c) is a 0..255
    * "gray" value hashed from the frame's byte window, bit (r,c) is
    * set when cell (r,c) outweighs its right neighbor. Gradient
    * direction survives uniform brightness/contrast shifts, which is
    * why dHash is the standard cheap image near-dup fingerprint. One
    * narrow codegen'd projection per document — no shuffle, no UDF. */
  private[graft] def phashFps(s: SparkSession, dir: String): DataFrame =
    phashGridOf(Tables.documents(s, dir))
      .select(col("doc_id"), dhashFp.as("phash"))

  /** The raw 8×8 luminance grid behind [[phashFps]] — (doc_id, g0..g63),
    * each cell a 0..255 "gray" sampled from [[PhashStride]] chars of the
    * stub-decoded payload. Exposed separately because the calibration
    * audit needs the CELLS, not just the folded fingerprint bits. */
  private def phashGridOf(docs: DataFrame): DataFrame = {
    import graft.ops.Prims.hash60
    val cells = (0 until PhashGrid * PhashGrid).map(i =>
      pmod(hash60(substring(col("text"), 1 + i * PhashStride, PhashStride)),
        lit(256L)).as(s"g$i"))
    // (no scanFanout here, unlike [[frameFps]]: 64 md5s per DOCUMENT is
    // ~8× less work than the frame path's per-frame grids, and the r20
    // A/B showed the fan-out exchange costing more than the serial scan
    // saves — phash_near_dup 0.97 → 1.39 s with it)
    docs.select((col("doc_id") +: cells): _*)
  }

  /** The dHash bit-fold over grid columns g0..g63 (one codegen'd
    * projection): bit (r,c) set when cell (r,c) outweighs its right
    * neighbor — shared by the document path and the per-frame path. */
  private def dhashFp: org.apache.spark.sql.Column =
    (0 until PhashGrid).flatMap { r =>
      (0 until PhashGrid - 1).map { c =>
        when(col(s"g${r * PhashGrid + c}") > col(s"g${r * PhashGrid + c + 1}"),
          lit(1L << (r * (PhashGrid - 1) + c))).otherwise(lit(0L))
      }
    }.reduce(_ bitwiseOR _)

  /** phash_near_dup: image near-duplicate PAIRS by perceptual-hash
    * Hamming distance ≤ [[PhashHammingK]] — the standard image-dedup
    * operator of a multimodal training pipeline (re-encoded, resized,
    * or brightness-shifted copies of one image share most of their
    * gradient bits). Candidates and verification ride the EXACT
    * machinery the text side already ships
    * ([[graft.ops.Dedup.hammingPairs]]): pigeonhole banding on 14-bit
    * fingerprint slices, bucket join capped hub-star, exact
    * `bit_count(xor)` — never all-pairs, same 100 TB shape as
    * `simhash_hamming_pairs`. */
  def phashNearDup(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.hammingPairs(phashFps(s, dir), "phash",
      PhashBits, PhashHammingK)

  /** DuckDB CTE chain to `pairs(doc_a, doc_b, hamming)` — the oracle
    * twin of [[phashFps]] + [[graft.ops.Dedup.hammingPairs]], shared by
    * the pair and cluster oracles so the fingerprint semantics can
    * never desynchronize between them. */
  /** The dHash bit-sum as a DuckDB expression over g0..g63 columns —
    * twin of [[dhashFp]], shared by the doc and frame fingerprint CTEs. */
  private def dhashFpSql: String =
    (0 until PhashGrid).flatMap { r =>
      (0 until PhashGrid - 1).map { c =>
        s"CASE WHEN g${r * PhashGrid + c} > g${r * PhashGrid + c + 1} " +
          s"THEN ${1L << (r * (PhashGrid - 1) + c)} ELSE 0 END"
      }
    }.mkString(" + ")

  /** DuckDB CTEs `g(doc_id, g0..g63)` + `fps(doc_id, phash)` — the
    * oracle twin of [[phashGridOf]] + [[dhashFp]] over `documents`;
    * the calibration oracle reads the `g` cells directly. */
  private def phashFpsCtesSql: String = {
    import graft.ops.Prims.hash60Sql
    val cells = (0 until PhashGrid * PhashGrid).map(i =>
      s"${hash60Sql(s"substr(text, ${1 + i * PhashStride}, $PhashStride)")} % 256 AS g$i")
      .mkString(",\n    ")
    s"""g AS (SELECT doc_id,
       |    $cells
       |  FROM documents),
       |fps AS (SELECT doc_id, CAST($dhashFpSql AS BIGINT) AS phash FROM g)""".stripMargin
  }

  /** Banded-Hamming CTE chain appended after an `fps(doc_id, <fpCol>)`
    * CTE — bands/bstats/bk/fullp/starp → `pairs(doc_a, doc_b, hamming)`,
    * the oracle twin of [[graft.ops.Dedup.hammingPairs]] at
    * [[PhashBits]]/[[PhashHammingK]]; parameterized on the fingerprint
    * column so the document path and the per-frame path share one
    * rendering and cannot desynchronize. */
  private def bandedPairsCtesSql(fpCol: String): String = {
    val bandBits = PhashBits / (PhashHammingK + 1)
    val bandMask = (1L << bandBits) - 1
    s"""bands AS (SELECT doc_id, $fpCol, CAST(t.band AS INT) AS band,
       |    ($fpCol >> ($bandBits * CAST(t.band AS INT))) & $bandMask AS bval
       |  FROM fps, unnest(range(0, ${PhashHammingK + 1})) AS t(band)),
       |bstats AS (SELECT band, bval, count(*) AS bn, min(doc_id) AS bmin,
       |    arg_min($fpCol, doc_id) AS minfp
       |  FROM bands GROUP BY band, bval),
       |bk AS (SELECT bands.doc_id, bands.$fpCol, bands.band, bands.bval
       |  FROM bands JOIN bstats USING (band, bval) WHERE bn <= ${graft.ops.Dedup.MaxBandBucket}),
       |fullp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    bit_count(xor(a.$fpCol, b.$fpCol)) AS hamming
       |  FROM bk a JOIN bk b
       |    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id),
       |starp AS (SELECT bstats.bmin AS doc_a, bands.doc_id AS doc_b,
       |    bit_count(xor(bstats.minfp, bands.$fpCol)) AS hamming
       |  FROM bands JOIN bstats USING (band, bval)
       |  WHERE bn > ${graft.ops.Dedup.MaxBandBucket} AND bands.doc_id <> bstats.bmin),
       |pairs AS (SELECT DISTINCT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
       |  FROM (SELECT * FROM fullp UNION ALL SELECT * FROM starp)
       |  WHERE hamming <= $PhashHammingK)""".stripMargin
  }

  private def phashPairsCtesSql: String =
    s"$phashFpsCtesSql,\n${bandedPairsCtesSql("phash")}"

  def phashNearDupSql: String =
    s"""WITH $phashPairsCtesSql
       |SELECT doc_a, doc_b, hamming FROM pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** phash_clusters: connected components over the [[phashNearDup]]
    * pair graph — the cluster report an image-dedup pass keeps one
    * canonical per (re-encode/resize chains are transitive: A≈B and
    * B≈C cluster even when A and C drift past the pair threshold).
    * Same size-gated alternating-star core and report shape as the
    * text side's `dedup_clusters`
    * ([[graft.ops.Dedup.clustersOverPairs]]). */
  def phashClusters(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.clustersOverPairs(s, phashNearDup(s, dir))

  def phashClustersSql: String =
    s"""WITH RECURSIVE $phashPairsCtesSql,
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |),
       |labels AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS label
       |  FROM reach GROUP BY src)
       |SELECT label AS cluster_id, count(*) AS cluster_size,
       |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
       |FROM labels GROUP BY label ORDER BY cluster_id""".stripMargin

  /** phash_calibration: the image family's threshold-picking audit —
    * the twin of the text side's `minhash_calibration`. The phash bit
    * (a gradient SIGN) is a lossy summary of the underlying 0..255
    * luminance cells; before anyone trusts "Hamming ≤ k means
    * near-identical image", this report says what each Hamming distance
    * actually corresponds to in EXACT grid distance (L1 over the 64
    * gray cells — the stand-in for pixel-level difference a real
    * decoder would measure). Per Hamming value over the banded pair
    * set: pair count and the sum/min/max of grid L1 — an operator reads
    * the max column to see the worst true distance a given k admits.
    *
    * All-integer arithmetic (cells are int64 0..255, L1 ≤ 64·255), so
    * the oracle hash-matches bit-for-bit. Scale shape: the pair set is
    * the already-banded candidate output (never all-pairs); the two
    * grid attaches are doc_id-keyed joins moving one 64-cell row per
    * pair side; the final aggregation has [[PhashHammingK]]+1 groups. */
  def phashCalibration(s: SparkSession, dir: String): DataFrame = {
    val n = PhashGrid * PhashGrid
    val pairs = graft.ops.Dedup.hammingPairsUnordered(
      phashFps(s, dir), "phash", PhashBits, PhashHammingK)
    val grid = phashGridOf(Tables.documents(s, dir))
    val ga = grid.toDF("doc_a" +: (0 until n).map(i => s"a$i"): _*)
    val gb = grid.toDF("doc_b" +: (0 until n).map(i => s"b$i"): _*)
    val l1 = (0 until n).map(i => abs(col(s"a$i") - col(s"b$i"))).reduce(_ + _)
    pairs.join(ga, Seq("doc_a")).join(gb, Seq("doc_b"))
      .select(col("hamming"), l1.as("grid_l1"))
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"),
        sum("grid_l1").as("sum_grid_l1"),
        min("grid_l1").as("min_grid_l1"),
        max("grid_l1").as("max_grid_l1"))
      .orderBy("hamming")
  }

  def phashCalibrationSql: String = {
    val l1 = (0 until PhashGrid * PhashGrid)
      .map(i => s"abs(a.g$i - b.g$i)").mkString(" + ")
    s"""WITH $phashPairsCtesSql,
       |pl AS (SELECT p.hamming, $l1 AS grid_l1
       |  FROM pairs p
       |  JOIN g a ON a.doc_id = p.doc_a
       |  JOIN g b ON b.doc_id = p.doc_b)
       |SELECT hamming, count(*) AS n_pairs,
       |  CAST(sum(grid_l1) AS BIGINT) AS sum_grid_l1,
       |  CAST(min(grid_l1) AS BIGINT) AS min_grid_l1,
       |  CAST(max(grid_l1) AS BIGINT) AS max_grid_l1
       |FROM pl GROUP BY hamming ORDER BY hamming""".stripMargin
  }

  /** Frame-id packing base for [[frameNearDup]]: fid = doc_id ·
    * [[FrameIdBase]] + frame index. [[MaxFrames]] = 8 < 16, so the
    * packing is collision-free and invertible by integer division. */
  private val FrameIdBase = 16L
  /** Minimum near-identical frame pairs for [[frameNearDup]] to report
    * a document pair. */
  private val MinSharedFrames = 2L

  /** Per-FRAME perceptual fingerprints — (fid, fph) where fid packs
    * (doc, frame) into one int64 key and fph is the 56-bit dHash of the
    * frame's own 8×8 grid (stride 1: a frame is one [[FrameStride]]-char
    * slice, so its 64 cells tile it at char granularity). The same
    * narrow no-shuffle projection shape as [[phashFps]], one row per
    * sampled frame. */
  private def frameFps(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Prims.hash60
    // scanFanout: this projection computes 64 oracle-parity md5s PER
    // FRAME (up to 8 frames/doc — by far the heaviest per-row compute in
    // the fleet), and a few-row-group corpus file would otherwise run all
    // of it fused into a near-serial scan stage (guide §2.5's
    // unsplittable-input fix; no-op when the scan is already parallel)
    val frames = graft.ops.Prims.scanFanout(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        col("doc_id"))
      .filter(length(col("text")) >= 1) // see [[frameSample]]'s guard
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, least((length(text) + ${FrameStride - 1}) div $FrameStride,
           |                            $MaxFrames)),
           |  i -> substring(text, (i - 1) * $FrameStride + 1, $FrameStride))"""
          .stripMargin))).toDF("doc_id", "pos", "frame")
    val cells = (0 until PhashGrid * PhashGrid).map(i =>
      pmod(hash60(substring(col("frame"), 1 + i, 1)), lit(256L)).as(s"g$i"))
    frames
      .select(((col("doc_id") * FrameIdBase + col("pos") + lit(1L)).as("doc_id") +: cells): _*)
      .select(col("doc_id"), dhashFp.as("fph"))
  }

  /** frame_near_dup: VIDEO near-duplicate pairs — documents sharing at
    * least [[MinSharedFrames]] near-identical frames (per-frame phash
    * Hamming ≤ [[PhashHammingK]]). This is the operator that catches
    * re-cut / re-encoded video the document-level [[phashNearDup]]
    * misses: a clip embedded in a longer video shares most of its
    * FRAMES while the whole-document fingerprint drifts arbitrarily
    * far. Candidates stay banded PER FRAME (the shared
    * [[graft.ops.Dedup.hammingPairs]] core over the packed frame-id
    * table — never all-pairs, hub-star over hot buckets); the doc-pair
    * rollup is one map-side-combinable count over the frame-pair set.
    * Reports (doc_a, doc_b, shared_frames). */
  def frameNearDup(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.hammingPairsUnordered(
        frameFps(s, dir), "fph", PhashBits, PhashHammingK)
      .select(expr(s"doc_a div $FrameIdBase").as("da"),
        expr(s"doc_b div $FrameIdBase").as("db"))
      .filter(col("da") =!= col("db")) // fid_a < fid_b across docs ⇒ da < db
      .groupBy("da", "db").agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= MinSharedFrames)
      .select(col("da").as("doc_a"), col("db").as("doc_b"), col("shared_frames"))
      .orderBy("doc_a", "doc_b")

  def frameNearDupSql: String = {
    import graft.ops.Prims.hash60Sql
    val cells = (0 until PhashGrid * PhashGrid).map(i =>
      s"${hash60Sql(s"substr(frame, ${1 + i}, 1)")} % 256 AS g$i")
      .mkString(",\n    ")
    s"""WITH fr AS (SELECT doc_id, i,
       |    substr(text, (i - 1) * $FrameStride + 1, $FrameStride) AS frame
       |  FROM documents,
       |    unnest(range(1, least((len(text) + ${FrameStride - 1}) // $FrameStride,
       |                          $MaxFrames) + 1)) AS t(i)),
       |g AS (SELECT doc_id * $FrameIdBase + i AS doc_id,
       |    $cells
       |  FROM fr),
       |fps AS (SELECT doc_id, CAST($dhashFpSql AS BIGINT) AS fph FROM g),
       |${bandedPairsCtesSql("fph")}
       |SELECT doc_a // $FrameIdBase AS doc_a, doc_b // $FrameIdBase AS doc_b,
       |  count(*) AS shared_frames
       |FROM pairs
       |WHERE doc_a // $FrameIdBase <> doc_b // $FrameIdBase
       |GROUP BY 1, 2
       |HAVING count(*) >= $MinSharedFrames
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "multimodal_features" -> multimodalFeaturesSql,
    "frame_sample" -> frameSampleSql,
    "phash_near_dup" -> phashNearDupSql,
    "phash_clusters" -> phashClustersSql,
    "phash_calibration" -> phashCalibrationSql,
    "frame_near_dup" -> frameNearDupSql,
  )
}
