package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Prims._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Vectors are quantized to int64 (floor(v * 1000)) before any arithmetic —
  * the standard int-quantization trick from production ANN systems, and
  * here it also makes every score exact and order-independent, so the
  * DuckDB oracle matches bit-for-bit (float summation order never matters).
  *
  * Scale posture:
  *   - `ann_topk` is the brute-force BASELINE: the query set is tiny and
  *     broadcast; candidates stream through one narrow scan (no shuffle of
  *     the big side), then a per-query top-k. Linear in candidates —
  *     the right baseline shape, and the recall yardstick for the
  *     bucketed variant.
  *   - `ann_lsh_pairs` is the SCALE path: 16 random-hyperplane sign bits
  *     bucket the vectors; candidate pairs only form inside a bucket.
  *     Hyperplanes are derived from Prims.hash60 so both engines build
  *     identical planes.
  */
object Similarity {

  private val Dim = 64
  private val NumQueries = 10
  private val TopK = 5
  private val NumPlanes = 16

  /** Max vectors sharing one hyperplane-signature bucket before the
    * bucket DEGRADES from all-pairs to representative pairs — the same
    * policy as `Dedup.MaxBandBucket`: a bucket with m ≤ cap members
    * self-joins into full pairs; over the cap it emits the m-1 star
    * pairs (bucket-min vec, member) instead, still O(m). Degenerate
    * vectors (e.g. all-zero embeddings, which land on every hyperplane's
    * positive side) pile into one bucket and would otherwise go O(m²)
    * in the self-join — the skew killer at 100 TB — yet a mass-duplicated
    * embedding group is exactly what near-dup removal must catch, so the
    * star keeps every member reachable from one hub (connected
    * components still collapses the group); only non-hub pairwise scores
    * are forgone. */
  private[graft] val MaxLshBucket = 100

  /** embedding → int64-quantized array (floor(v*1000)). */
  private[graft] val quantExpr =
    "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))"
  private val quantSql =
    "list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000) AS BIGINT))"

  /** Brute-force top-k by quantized dot product: queries = vec_id < 10,
    * neighbors ranked by (dot DESC, vec_id ASC), self excluded. */
  def annTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), expr(quantExpr).as("qv"))
    val c = emb.select(col("vec_id").as("neighbor_id"), expr(quantExpr).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.QDot(col("qv"), col("cv")).as("dot"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dot").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= TopK)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank")
  }

  def annTopKSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, $quantSql AS qv
       |  FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS neighbor_id, $quantSql AS cv FROM embeddings),
       |s AS (SELECT query_id, neighbor_id,
       |    CAST(list_sum(list_transform(range(1, $Dim + 1), i -> qv[i] * cv[i])) AS BIGINT) AS dot
       |  FROM q, c WHERE neighbor_id <> query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank FROM s)
       |SELECT query_id, neighbor_id, dot, rank FROM r WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** Deterministic "random" hyperplanes, computed DRIVER-SIDE with the
    * same md5 arithmetic as Prims.hash60: plane j, dim i has integer
    * coefficient hash60('p<j>_<i>') % 2001 - 1000 ∈ [-1000, 1000]. The
    * planes are NumPlanes×Dim int64 ≈ 8 KB of plan literals, so the
    * sign-bit signature becomes one narrow codegen'd projection (16
    * qdot calls per row) instead of a 64×16 explode-join-aggregate —
    * at corpus scale that stage was pure row churn. */
  private lazy val planeCoefs: IndexedSeq[Seq[Long]] = {
    def hash60Jvm(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    (0 until NumPlanes).map { j =>
      (0 until Dim).map(i => hash60Jvm(s"p${j}_$i") % 2001L - 1000L)
    }
  }

  /** bucket = 16 hyperplane sign bits of qv, as a single long column. */
  private def bucketCol: org.apache.spark.sql.Column =
    (0 until NumPlanes).map { j =>
      when(graft.functions.QDot(col("qv"), typedLit(planeCoefs(j))) >= 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed near-neighbor pairs: 16-bit signature of hyperplane
    * sign bits; pairs only within a bucket, scored by quantized dot.
    * Signature assignment is a narrow map stage (literal planes, codegen
    * qdot) — the only shuffle is the bucket self-join. */
  def annLshPairs(s: SparkSession, dir: String): DataFrame = {
    val sigs0 = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(quantExpr).as("qv"))
      .select(col("vec_id"), col("qv"), bucketCol.as("bucket"))
    // hot-bucket guard: size each bucket first. sigs0 is one narrow
    // codegen projection over the scan, so recomputing it for the stats
    // pass beats checkpointing a corpus-sized signature table; the
    // aggregation is map-side combinable. min_by carries the hub vector's
    // quantized coordinates so the star pairs need no extra corpus join.
    val bstats = sigs0.groupBy("bucket")
      .agg(count(lit(1)).as("bn"), min("vec_id").as("bmin"),
        min_by(col("qv"), col("vec_id")).as("qmin"))
    val kept = sigs0.join(
      bstats.filter(col("bn") <= MaxLshBucket).select("bucket"), "bucket")
    val wa = kept.select(col("vec_id").as("vec_a"), col("bucket"), col("qv").as("qa"))
    val wb = kept.select(col("vec_id").as("vec_b"), col("bucket").as("bucket_b"), col("qv").as("qb"))
    val full = wa.join(wb, col("bucket") === col("bucket_b") && col("vec_a") < col("vec_b"))
      .select(col("bucket"), col("vec_a"), col("vec_b"),
        graft.functions.QDot(col("qa"), col("qb")).as("dot"))
    val star = sigs0.join(
        bstats.filter(col("bn") > MaxLshBucket).select("bucket", "bmin", "qmin"), "bucket")
      .filter(col("vec_id") =!= col("bmin")) // bmin is the min, so vec_a < vec_b holds
      .select(col("bucket"), col("bmin").as("vec_a"), col("vec_id").as("vec_b"),
        graft.functions.QDot(col("qmin"), col("qv")).as("dot"))
    full.unionByName(star).orderBy("vec_a", "vec_b")
  }

  /** Shared hyperplane-bucketing CTE block (e/pl/proj/sigs0/bstats/cand)
    * used by both LSH oracle queries — single source of truth for the
    * bucketing SQL, including the hot-bucket star degradation (`cand` =
    * full pairs within kept buckets ∪ star pairs of hot ones, the SQL
    * twin of annLshPairs' candidate generation). */
  private def lshCtes: String =
    s"""WITH e AS (SELECT vec_id, $quantSql AS qv FROM embeddings),
       |pl AS (SELECT pj, pi,
       |    ${hash60Sql("'p' || CAST(pj AS VARCHAR) || '_' || CAST(pi AS VARCHAR)")} % 2001 - 1000 AS coef
       |  FROM (SELECT unnest(range(0, $NumPlanes)) AS pj),
       |       (SELECT unnest(range(0, $Dim)) AS pi)),
       |proj AS (SELECT vec_id, pj, sum(qv[pi + 1] * coef) AS proj
       |  FROM e, pl GROUP BY vec_id, pj),
       |sigs0 AS (SELECT vec_id,
       |    CAST(sum(CASE WHEN proj >= 0 THEN (CAST(1 AS BIGINT) << pj) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM proj GROUP BY vec_id),
       |bstats AS (SELECT bucket, count(*) AS bn, min(vec_id) AS bmin
       |  FROM sigs0 GROUP BY bucket),
       |keptv AS (SELECT sigs0.vec_id, sigs0.bucket
       |  FROM sigs0 JOIN bstats USING (bucket) WHERE bn <= $MaxLshBucket),
       |cand AS (
       |  SELECT a.bucket, a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM keptv a JOIN keptv b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  UNION ALL
       |  SELECT sigs0.bucket, bstats.bmin AS vec_a, sigs0.vec_id AS vec_b
       |  FROM sigs0 JOIN bstats USING (bucket)
       |  WHERE bn > $MaxLshBucket AND sigs0.vec_id <> bstats.bmin)""".stripMargin

  def annLshPairsSql: String =
    s"""${lshCtes}
       |SELECT cand.bucket AS bucket, vec_a, vec_b,
       |  CAST(list_sum(list_transform(range(1, $Dim + 1), i -> ea.qv[i] * eb.qv[i])) AS BIGINT) AS dot
       |FROM cand JOIN e ea ON vec_a = ea.vec_id JOIN e eb ON vec_b = eb.vec_id
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Embedding-cosine scoring of LSH-bucketed candidate pairs — the
    * near-dup decision is `cosine >= t` applied by the caller (this
    * fixture contains no true embedding near-dups, so the operator
    * emits the score for every candidate so the oracle value-checks
    * the computation). Cosine = dot / sqrt(na)·sqrt(nb): numerator and
    * norms are exact int64 from the quantized vectors; the final
    * division is one deterministic double expression shared with the
    * oracle. Same no-all-pairs shape as annLshPairs. */

  def cosineNearDup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(quantExpr).as("qv"))
    val normSq = graft.functions.QDot(col("qv"), col("qv"))
    val pairs = annLshPairs(s, dir) // bucket, vec_a, vec_b, dot
    val na = emb.select(col("vec_id").as("vec_a"), normSq.as("na"))
    val nb = emb.select(col("vec_id").as("vec_b"), normSq.as("nb"))
    pairs.join(na, "vec_a").join(nb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        (col("dot").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  def cosineNearDupSql: String =
    s"""${lshCtes},
       |norms AS (SELECT vec_id,
       |    CAST(list_sum(list_transform(range(1, $Dim + 1), i -> qv[i] * qv[i])) AS BIGINT) AS n2
       |  FROM e),
       |pairs AS (
       |  SELECT vec_a, vec_b,
       |    CAST(list_sum(list_transform(range(1, $Dim + 1), i -> ea.qv[i] * eb.qv[i])) AS BIGINT) AS dot
       |  FROM cand JOIN e ea ON vec_a = ea.vec_id JOIN e eb ON vec_b = eb.vec_id)
       |SELECT vec_a, vec_b,
       |  CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
       |FROM pairs JOIN norms na ON vec_a = na.vec_id JOIN norms nb ON vec_b = nb.vec_id
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Held-out prefix for semantic decontamination (mirrors
    * PipelineOps.HeldoutMax for the verbatim path: vec_id < 10 stands
    * in for the benchmark suite's embeddings). */
  private val HeldVecMax = 10L

  /** Max-cosine threshold above which a corpus vector counts as a
    * semantic duplicate of a held-out item. On the fixture the max
    * cosine vs the held set spans ~0.00–0.49 (p99 ≈ 0.39), so 0.35
    * flags a real tail without emptying the corpus — discriminative in
    * both directions. */
  private val SemContamTau = 0.35

  /** decontaminate_semantic: drop every corpus embedding whose cosine
    * against ANY held-out embedding reaches [[SemContamTau]] — the
    * EMBEDDING-level companion of `decontaminate`'s verbatim n-gram
    * overlap (a paraphrased benchmark item shares no 8-gram but sits
    * at high cosine; production suites scrub both). Emits surviving
    * vec_ids.
    *
    * Scale shape: the held side is a benchmark suite — thousands of
    * vectors against a corpus of billions — so it BROADCASTS and the
    * corpus streams through one narrow scan (|held| qdot products per
    * row, linear like the `ann_topk` baseline, no corpus shuffle; the
    * only exchanges are the results-sized distinct and the final
    * anti-join). A held set too large to broadcast takes the IVF route
    * instead: assign both sides to the sample-trained codebook and
    * compare within probed cells ([[annIvfTopK]]'s machinery).
    * Cosine = int64-exact quantized dot over one deterministic double
    * division, the same expression shape as [[cosineNearDup]] — the
    * threshold compare is therefore bit-identical on both engines. */
  def decontaminateSemantic(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(quantExpr).as("qv"))
    val held = emb.filter(col("vec_id") < HeldVecMax)
      .select(col("vec_id").as("h_id"), col("qv").as("hv"))
    val corpus = emb.filter(col("vec_id") >= HeldVecMax)
    val cos = graft.functions.QDot(col("qv"), col("hv")).cast("double") /
      (sqrt(graft.functions.QDot(col("qv"), col("qv")).cast("double")) *
        sqrt(graft.functions.QDot(col("hv"), col("hv")).cast("double")))
    val contaminated = corpus.crossJoin(broadcast(held))
      .filter(cos >= SemContamTau)
      .select("vec_id").distinct()
    corpus.select("vec_id")
      .join(contaminated, Seq("vec_id"), "left_anti")
      .orderBy("vec_id")
  }

  def decontaminateSemanticSql: String = {
    def dot(x: String, y: String) =
      s"CAST(list_sum(list_transform(range(1, $Dim + 1), i -> $x[i] * $y[i])) AS BIGINT)"
    val cos = s"CAST(${dot("c.qv", "h.hv")} AS DOUBLE) / " +
      s"(sqrt(CAST(${dot("c.qv", "c.qv")} AS DOUBLE)) * sqrt(CAST(${dot("h.hv", "h.hv")} AS DOUBLE)))"
    s"""WITH e AS (SELECT vec_id, $quantSql AS qv FROM embeddings),
       |held AS (SELECT vec_id AS h_id, qv AS hv FROM e WHERE vec_id < $HeldVecMax),
       |c AS (SELECT vec_id, qv FROM e WHERE vec_id >= $HeldVecMax),
       |contaminated AS (SELECT DISTINCT c.vec_id FROM c, held h
       |  WHERE $cos >= $SemContamTau)
       |SELECT vec_id FROM c
       |WHERE vec_id NOT IN (SELECT vec_id FROM contaminated)
       |ORDER BY vec_id""".stripMargin
  }

  // ---- IVF (inverted-file) ANN — the production scale path -----------

  private val NumCentroids = 16
  private val NProbe = 4
  private val IvfTopK = 3
  private val LloydIters = 3

  /** Lloyd-trained codebook: `LloydIters` deterministic k-means passes
    * over the quantized vectors.
    *
    *   - Init: the `NumCentroids` vectors ranked first by
    *     hash60('seed_'||vec_id) — a deterministic pseudo-random sample
    *     (k-means++-style seeding would need sequential dependent draws;
    *     a hash-ranked sample is order-free so both engines agree).
    *   - Update: element-wise floor(mean) in exact int64. Floor division
    *     is spelled `(sm - pmod(sm, cnt)) div cnt` so the numerator is
    *     exactly divisible — truncating and flooring division coincide
    *     and Spark/DuckDB agree bit-for-bit, negatives included.
    *   - Empty clusters keep their previous coordinates.
    *
    * The codebook is metadata-sized (NumCentroids×Dim int64 ≈ 8 KB), so
    * each pass collects it to the driver and re-broadcasts — the same
    * discipline as MLlib's distributed k-means; the per-pass assignment
    * over the corpus stays fully distributed (broadcast cross of 16
    * centroids, map-side-combinable aggregation). The 100 TB path trains
    * on the fixed-size [[trainSample]] instead of the full corpus — same
    * pass structure, see [[annIvfSampledRecall]].
    */
  private[graft] def trainedCentroids(s: SparkSession, emb: DataFrame): Seq[(Long, Seq[Long])] = {
    import s.implicits._
    import graft.functions.QDot
    val seeds = emb
      .select(col("vec_id"), col("qv"),
        hash60(concat(lit("seed_"), col("vec_id"))).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(NumCentroids)
      .collect() // TakeOrderedAndProject: distributed top-k, NumCentroids rows
    var cents: Seq[(Long, Seq[Long])] =
      seeds.zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Long](1).toSeq) }.toSeq
    for (_ <- 1 to LloydIters) {
      // narrow in-row argmin against the iteration's centroid literals
      // (same (d2, cent_id) tie-break as the former crossJoin+min_by, so
      // the trained codebook is bit-identical) — no per-vector exchange
      // per Lloyd pass, which matters for the UNSAMPLED training variant
      // where `emb` is the whole corpus
      val cands = cents.map { case (cid, cv) =>
        struct(
          (col("qq") - lit(2) * QDot(col("qv"), typedLit(cv))
            + lit(cv.map(x => x * x).sum)).as("d2"),
          lit(cid).as("cid"))
      }
      val assigned = emb
        .withColumn("qq", QDot(col("qv"), col("qv")))
        .withColumn("best", array_min(array(cands: _*)))
        .select(col("best.cid").as("list_id"), col("qv"))
      val stats = assigned
        .select(col("list_id"), posexplode(col("qv")).as(Seq("pi", "v")))
        .groupBy("list_id", "pi")
        .agg(sum("v").as("sm"), count(lit(1)).as("cnt"))
        .select(col("list_id"), col("pi"),
          expr("(sm - pmod(sm, cnt)) div cnt").as("cf"))
        .collect() // ≤ NumCentroids×Dim rows — codebook-sized metadata
      val byList = stats.groupBy(_.getLong(0))
      cents = cents.map { case (cid, prev) =>
        byList.get(cid) match {
          case Some(rows) => (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
          case None       => (cid, prev)
        }
      }
    }
    cents
  }

  /** Deterministic fixed-size training sample: the `TrainSampleN`
    * vectors ranked first by hash60('ivfs_'||vec_id) — a distributed
    * top-N (per-partition top-N, tiny gather), so picking it costs one
    * narrow pass and TRAINING COST IS INDEPENDENT OF CORPUS SIZE: at
    * 10× (or 100 TB) the Lloyd passes still touch exactly
    * [[TrainSampleN]] rows; only the single post-training assignment
    * pass scales with the corpus. A fixed-RATE sample (hash % k = 0)
    * would stay corpus-proportional, which is why the sample is
    * rank-bounded instead. The (hash, vec_id) order is unique, so both
    * engines pick the identical sample. */
  private[graft] val TrainSampleN = 256

  private[graft] def trainSample(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("qv"),
        hash60(concat(lit("ivfs_"), col("vec_id"))).as("h"))
      .orderBy(col("h"), col("vec_id"))
      .limit(TrainSampleN)
      .select("vec_id", "qv")

  /** Trained-codebook memo: a weak per-session map (sessions don't
    * override equality, so keys are identity refs that vanish with the
    * session — a dead session's entry can never be resurrected by a
    * recycled identity hash) of (canonical input path, sampled?) →
    * codebook. `ann_ivf_topk` and both recall gates share one Lloyd
    * training per (session, dataset, variant) instead of re-running the
    * 3-pass training on every DataFrame construction. Training is
    * deterministic — a pure function of the input — so memoizing cannot
    * change any result; the codebook is NumCentroids×Dim int64 ≈ 8 KB
    * per entry. Input files are immutable fixtures here; a caller
    * mutating a dataset in place mid-session would need a fresh session
    * (or path) to retrain. */
  private val codebookMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, Boolean), Seq[(Long, Seq[Long])]]]())

  private[graft] def codebookFor(s: SparkSession, dir: String,
                                 sampled: Boolean): Seq[(Long, Seq[Long])] =
    codebookMemo
      .computeIfAbsent(s, _ =>
        new java.util.concurrent.ConcurrentHashMap[(String, Boolean), Seq[(Long, Seq[Long])]]())
      .computeIfAbsent(
        (new java.io.File(dir).getCanonicalPath, sampled),
        _ => {
          val embT = Tables.embeddings(s, dir)
            .select(col("vec_id"), expr(quantExpr).as("qv")).persist()
          try trainedCentroids(s, if (sampled) trainSample(embT) else embT)
          finally embT.unpersist(false) // training collects are done; no cache outlives the call
        })

  /** IVF top-k: vectors are partitioned into inverted lists by nearest
    * centroid; a query probes only the `NProbe` closest lists, so the
    * scan touches ~NProbe/NumCentroids of the corpus instead of all of
    * it. The codebook is Lloyd-trained (see [[trainedCentroids]]) with
    * deterministic seeding and exact-int64 updates so the DuckDB oracle
    * reproduces it bit-for-bit. All distance arithmetic is exact int64
    * (L2² = |v|² - 2·v·c + |c|² via qdot), so ties break
    * deterministically on centroid/vec id.
    *
    * NOTE: the codebook must be a LITERAL in the returned plan, so the
    * Lloyd training jobs run eagerly at the FIRST construction for a
    * (session, dataset) — building this DataFrame (even just to
    * explain() it) executes the training passes; subsequent
    * constructions hit [[codebookMemo]]. Inherent to
    * collect-and-broadcast k-means. */
  def annIvfTopK(s: SparkSession, dir: String): DataFrame =
    ivfTopKFrom(s, dir, sampled = false)

  private def ivfTopKFrom(s: SparkSession, dir: String, sampled: Boolean): DataFrame = {
    import s.implicits._
    import graft.functions.QDot
    val centRows = codebookFor(s, dir, sampled)
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(quantExpr).as("qv"))
    val cents = broadcast(centRows.toDF("cent_id", "cv")
      .select(col("cent_id"), col("cv")))
    // corpus-side assignment: the narrow in-row argmin (no crossJoin, no
    // per-vector groupBy — see assignedNarrow); only the tiny query side
    // below keeps the crossJoin form, which it needs for top-NProbe
    val assigned = assignedNarrow(s, dir, centRows)
      .select("vec_id", "list_id", "qv")
    // probe: each query visits its NProbe nearest centroid lists
    val queries = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("query_v"))
    val probes = queries.crossJoin(broadcast(cents))
      .select(col("query_id"), col("query_v"), col("cent_id"),
        (QDot(col("query_v"), col("query_v")) - lit(2) * QDot(col("query_v"), col("cv"))
          + QDot(col("cv"), col("cv"))).as("d2"))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d2"), col("cent_id"))))
      .filter(col("pr") <= NProbe)
      .select(col("query_id"), col("query_v"), col("cent_id").as("list_id"))
    // search only the probed lists. The probe table is queries×NProbe
    // rows — broadcast it so the corpus-sized `assigned` side never
    // shuffles (without the hint this planned as a sort-merge join
    // exchanging the full corpus on list_id: the 100 TB killer here)
    val scored = assigned.join(broadcast(probes), "list_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        QDot(col("query_v"), col("qv")).as("dot"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("dot").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= IvfTopK)
      .select("query_id", "neighbor_id", "dot", "rank")
      .orderBy("query_id", "rank")
  }

  /** recall@[[IvfTopK]] of the IVF index against brute-force ground
    * truth — codebook quality as a one-row, oracle-gated number (not just
    * a test-only property): a training regression that degrades the
    * codebook shows up as a hash mismatch on this row. Both inputs are
    * deterministic (exact int64 scoring, id tie-breaks), and the final
    * division is one double op over the same two integers on both
    * engines, so the value is bit-stable. */
  def annIvfRecall(s: SparkSession, dir: String): DataFrame =
    ivfRecallFrom(s, dir, sampled = false)

  /** recall@[[IvfTopK]] of the SAMPLE-trained IVF index (codebook from
    * the fixed-size [[trainSample]]; full corpus still assigned and
    * searched) against brute-force ground truth — pins the quality of
    * the corpus-size-independent training path with the same oracle gate
    * as [[annIvfRecall]], so a sampling regression shows up as a hash
    * mismatch, not a silent recall drop. */
  def annIvfSampledRecall(s: SparkSession, dir: String): DataFrame =
    ivfRecallFrom(s, dir, sampled = true)

  private def ivfRecallFrom(s: SparkSession, dir: String, sampled: Boolean): DataFrame = {
    val truth = annTopK(s, dir).filter(col("rank") <= IvfTopK)
      .select("query_id", "neighbor_id")
    val ivf = ivfTopKFrom(s, dir, sampled)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    truth.join(ivf, Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_hits"))
      .select(lit(IvfTopK.toLong).as("k"), col("n_truth"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_truth").cast("double")).as("recall"))
  }

  /** The full IVF pipeline as a WITH-chain (e … r), shared by the top-k
    * query and both recall gates — single source of truth for the
    * oracle's training unroll. `sampled` swaps the training set CTE `te`
    * between the full corpus and the rank-bounded [[trainSample]]; the
    * post-training assignment/probe/score always runs over full `e`. */
  /** Exact-int64 L2² between two list columns, as DuckDB SQL — the twin
    * of the Spark side's `QDot(a,a) - 2·QDot(a,b) + QDot(b,b)`. */
  private def d2Sql(a: String, b: String): String = {
    val dotQ = s"CAST(list_sum(list_transform(range(1, $Dim + 1), i -> a[i] * b[i])) AS BIGINT)"
    dotQ.replace("a[i] * b[i]", s"$a[i] * $a[i]") +
      s" - 2 * ${dotQ.replace("a[i] * b[i]", s"$a[i] * $b[i]")}" +
      s" + ${dotQ.replace("a[i] * b[i]", s"$b[i] * $b[i]")}"
  }

  /** Shared base CTE of every embedding oracle (quantized corpus). */
  private def eCte: String = s"e AS (SELECT vec_id, $quantSql AS qv FROM embeddings)"

  private def ivfCtes(sampled: Boolean): String = {
    def d2(a: String, b: String) = d2Sql(a, b)
    // Lloyd training unrolled: c0 = hash-ranked seed sample; each pass k
    // assigns (a_k), sums per (list, dim) (s_k), and rebuilds the codebook
    // (c_k) with exact-int64 floor-division means and empty-cluster
    // carryover — the SQL twin of trainedCentroids above.
    val seedH = graft.ops.Prims.hash60Sql("'seed_' || CAST(vec_id AS VARCHAR)")
    val ivfsH = graft.ops.Prims.hash60Sql("'ivfs_' || CAST(vec_id AS VARCHAR)")
    val teBody =
      if (sampled)
        s"""SELECT vec_id, qv FROM (
           |    SELECT vec_id, qv, row_number() OVER (ORDER BY $ivfsH, vec_id) AS srn
           |    FROM e) WHERE srn <= $TrainSampleN"""
      else "SELECT vec_id, qv FROM e"
    val lloyd = (1 to LloydIters).map { k =>
      s"""a$k AS (
         |  SELECT vec_id, cent_id AS list_id FROM (
         |    SELECT te.vec_id, c.cent_id,
         |      row_number() OVER (PARTITION BY te.vec_id
         |        ORDER BY ${d2("te.qv", "c.cv")}, c.cent_id) AS rn
         |    FROM te, c${k - 1} c) WHERE rn = 1),
         |s$k AS (
         |  SELECT a$k.list_id, p.pi, sum(te.qv[p.pi]) AS sm, count(*) AS cnt
         |  FROM a$k, te, (SELECT unnest(range(1, ${Dim + 1})) AS pi) p
         |  WHERE a$k.vec_id = te.vec_id
         |  GROUP BY a$k.list_id, p.pi),
         |c$k AS (
         |  SELECT p.cent_id, coalesce(n.cv, p.cv) AS cv
         |  FROM c${k - 1} p LEFT JOIN (
         |    SELECT list_id AS cent_id,
         |      list((sm - ((sm % cnt) + cnt) % cnt) // cnt ORDER BY pi) AS cv
         |    FROM s$k GROUP BY list_id) n USING (cent_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH $eCte,
       |te AS ($teBody),
       |c0 AS (
       |  SELECT CAST(rn - 1 AS BIGINT) AS cent_id, qv AS cv FROM (
       |    SELECT qv, row_number() OVER (ORDER BY $seedH, vec_id) AS rn FROM te)
       |  WHERE rn <= $NumCentroids),
       |$lloyd,
       |cents AS (SELECT cent_id, cv FROM c$LloydIters),
       |assigned AS (
       |  SELECT vec_id, cent_id AS list_id FROM (
       |    SELECT e.vec_id, cent_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${d2("qv", "cv")}, cent_id) AS rn
       |    FROM e, cents) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, qv AS query_v FROM e WHERE vec_id < $NumQueries),
       |probes AS (
       |  SELECT query_id, query_v, cent_id AS list_id FROM (
       |    SELECT query_id, query_v, cent_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY ${d2("query_v", "cv")}, cent_id) AS pr
       |    FROM q, cents) WHERE pr <= $NProbe),
       |scored AS (
       |  SELECT query_id,
       |    e.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, $Dim + 1), i -> query_v[i] * e.qv[i])) AS BIGINT) AS dot
       |  FROM probes JOIN assigned ON probes.list_id = assigned.list_id
       |  JOIN e ON assigned.vec_id = e.vec_id
       |  WHERE e.vec_id <> query_id),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM scored)""".stripMargin
  }

  def annIvfTopKSql: String =
    s"""${ivfCtes(sampled = false)}
       |SELECT query_id, neighbor_id, dot, rank FROM r WHERE rank <= $IvfTopK
       |ORDER BY query_id, rank""".stripMargin

  /** Oracle twin of [[annIvfRecall]] / [[annIvfSampledRecall]]: the same
    * IVF chain plus a brute-force truth block (bs/br — the annTopKSql
    * computation reusing the chain's `e` and `q` CTEs), left-joined for
    * the hit count. */
  private def ivfRecallSqlFrom(sampled: Boolean): String =
    s"""${ivfCtes(sampled)},
       |ivf_top AS (SELECT query_id, neighbor_id FROM r WHERE rank <= $IvfTopK),
       |bs AS (SELECT query_id, e.vec_id AS neighbor_id,
       |    CAST(list_sum(list_transform(range(1, $Dim + 1), i -> query_v[i] * e.qv[i])) AS BIGINT) AS dot
       |  FROM q, e WHERE e.vec_id <> query_id),
       |br AS (SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dot DESC, neighbor_id) AS rank
       |  FROM bs),
       |truth AS (SELECT query_id, neighbor_id FROM br WHERE rank <= $IvfTopK)
       |SELECT CAST($IvfTopK AS BIGINT) AS k, count(*) AS n_truth,
       |  count(i.neighbor_id) AS n_hits,
       |  CAST(count(i.neighbor_id) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
       |FROM truth t LEFT JOIN ivf_top i USING (query_id, neighbor_id)""".stripMargin

  def annIvfRecallSql: String = ivfRecallSqlFrom(sampled = false)
  def annIvfSampledRecallSql: String = ivfRecallSqlFrom(sampled = true)

  /** embed_cluster_profile: the k-means partition of the embedding space
    * as a first-class corpus-analysis surface — per-cluster member count
    * and exact-int64 inertia (sum of L2² to the assigned centroid), the
    * numbers a diversity/stratification decision reads (which regions of
    * embedding space dominate the corpus, which clusters are tight
    * near-dup pockets vs diffuse background). Uses the SAMPLE-trained
    * codebook ([[trainSample]]) — the corpus-size-independent training
    * path — then one distributed assignment pass: broadcast of 16
    * centroids, narrow scoring, map-side-combinable aggregation; no
    * shuffle touches the corpus beyond the 16-row final groupBy. The
    * whole profile is oracle-gated (DuckDB re-runs Lloyd bit-for-bit),
    * so a codebook or assignment regression is a hash mismatch. */
  def embedClusterProfile(s: SparkSession, dir: String): DataFrame = {
    val centRows = codebookFor(s, dir, sampled = true)
    // narrow argmin assignment + one k-row map-side-combinable agg: the
    // whole profile is scan → projection → 16-row aggregation
    assignedNarrow(s, dir, centRows)
      .select(col("list_id").as("cluster_id"), col("d2"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_vecs"), sum("d2").as("inertia"))
      .orderBy("cluster_id")
  }

  def embedClusterProfileSql: String =
    s"""${ivfCtes(sampled = true)},
       |ad AS (
       |  SELECT vec_id, cent_id AS cluster_id, d2 FROM (
       |    SELECT e.vec_id, cent_id, ${d2Sql("qv", "cv")} AS d2,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${d2Sql("qv", "cv")}, cent_id) AS rn
       |    FROM e, cents) WHERE rn = 1)
       |SELECT cluster_id, count(*) AS n_vecs, CAST(sum(d2) AS BIGINT) AS inertia
       |FROM ad GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  /** Fraction of each cluster's most-prototypical members dropped by
    * [[densityPrune]] (the D4 operating point is 20–30%). */
  val PruneFrac = 0.25

  /** density_prune: prototypicality pruning — the density-based data
    * curation step (D4 / SSL-prototypes): within each embedding
    * cluster, the members CLOSEST to the centroid are the most
    * redundant (the dense prototype core contributes near-duplicate
    * gradient signal), so drop the closest [[PruneFrac]] per cluster
    * and keep the diverse tail. Complements [[semanticDedup]]: that
    * removes pairwise near-duplicates, this thins whole dense regions
    * no single pair of which crosses the duplicate threshold.
    *
    * Plan: the narrow argmin assignment ([[assignedNarrow]] — one
    * projection, the corpus never exchanges for the assignment), then
    * ONE exchange on cluster_id for the per-cluster
    * (d2, vec_id)-ordered rank + size, and the final sort. Rank, not a
    * d2-quantile cut, because exactness matters to the gate: the
    * deterministic tie-break makes the kept set bit-stable
    * cross-engine. At corpus scale k grows with the corpus (IVF-style
    * √n sizing), so per-cluster partitions stay ~√n rows — the same
    * posture as every per-list IVF job here; the within-cluster sort
    * is the operator's honest cost and is the published algorithm's
    * cost too. */
  def densityPrune(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val centRows = codebookFor(s, dir, sampled = true)
    val byCluster = Window.partitionBy("cluster_id")
    val w = byCluster.orderBy(col("d2"), col("vec_id"))
    assignedNarrow(s, dir, centRows)
      .select(col("vec_id"), col("list_id").as("cluster_id"), col("d2"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cn", count(lit(1)).over(byCluster))
      .filter(col("rnk") > ceil(lit(PruneFrac) * col("cn")))
      .orderBy("vec_id")
  }

  def densityPruneSql: String =
    s"""${ivfCtes(sampled = true)},
       |ad AS (
       |  SELECT vec_id, cent_id AS cluster_id, d2 FROM (
       |    SELECT e.vec_id, cent_id, ${d2Sql("qv", "cv")} AS d2,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${d2Sql("qv", "cv")}, cent_id) AS rn
       |    FROM e, cents) WHERE rn = 1),
       |dpr AS (
       |  SELECT vec_id, cluster_id, d2,
       |    row_number() OVER (PARTITION BY cluster_id ORDER BY d2, vec_id) AS rnk,
       |    count(*) OVER (PARTITION BY cluster_id) AS cn
       |  FROM ad)
       |SELECT vec_id, cluster_id, d2, rnk, cn FROM dpr
       |WHERE rnk > ceil($PruneFrac * cn) ORDER BY vec_id""".stripMargin

  /** NARROW per-row cluster assignment — `(vec_id, list_id, qv, d2)` by
    * `array_min` over literal centroid candidate structs, the batch twin
    * of `StreamingSemanticDedup.assigned` (same argmin, same (d2, cid)
    * tie-break, bit-identical results): ONE projection, no crossJoin and
    * no per-vector groupBy, so the corpus's vectors never exchange for
    * the assignment (the former crossJoin+min_by form shuffled ~512-byte
    * qv rows per vector into the argmin aggregation — the dominant
    * exchange of every semantic query at corpus scale). */
  private def assignedNarrow(s: SparkSession, dir: String,
                             centRows: Seq[(Long, Seq[Long])]): DataFrame =
    assignedOf(Tables.embeddings(s, dir), centRows)

  /** Quantize + cluster-assign an arbitrary embeddings frame
    * `(vec_id, embedding)` against a literal QUANTIZED codebook — the
    * narrow argmin projection every IVF-family member shares (no
    * exchange: the codebook rides as literals). Exposed package-wide so
    * a feed-driven index refresh ([[graft.storage.ServingFollower]])
    * can assign incoming day slices with the index's own shipped
    * codebook. */
  private[graft] def assignedOf(vectors: DataFrame,
                                centRows: Seq[(Long, Seq[Long])]): DataFrame = {
    import graft.functions.QDot
    val cands = centRows.map { case (cid, cv) =>
      struct(
        (col("qq") - lit(2) * QDot(col("qv"), typedLit(cv))
          + lit(cv.map(x => x * x).sum)).as("d2"),
        lit(cid).as("cid"))
    }
    vectors
      .select(col("vec_id"), expr(quantExpr).as("qv"))
      .withColumn("qq", QDot(col("qv"), col("qv")))
      .withColumn("best", array_min(array(cands: _*)))
      .select(col("vec_id"), col("best.cid").as("list_id"), col("qv"),
        col("best.d2").as("d2"))
  }

  /** Cosine threshold above which two same-cluster vectors are semantic
    * duplicates. Real paraphrase-dup embeddings sit near ~0.95; the
    * synthetic fixture's vectors are near-orthogonal (max pairwise
    * cosine ≈ 0.6 at sf0.1, measured), so the shipped constant is tuned
    * to the fixture's similarity scale to keep the collapse path
    * exercised end-to-end — the machinery is threshold-agnostic. */
  private val SemTau = 0.4
  /** Max members per cluster before the within-cluster comparison
    * degrades from all-pairs to hub-star — same policy and rationale as
    * [[MaxLshBucket]] / `Dedup.MaxBandBucket`. Shared with the streaming
    * twin ([[graft.streaming.StreamingSemanticDedup.MaxClusterMembers]])
    * so the batch and online defaults cannot drift apart. */
  private[graft] val MaxSemCluster = 100

  /** semantic_dedup: SemDeDup-style embedding-space deduplication
    * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication" — public paper; design
    * re-derived here, no code): cluster the corpus's embeddings with
    * the sample-trained k-means codebook, then compare vectors ONLY
    * within their cluster — the clustering is what makes semantic dedup
    * tractable at corpus scale, turning O(n²) cosine comparisons into
    * O(Σ m_c²) bucket-local work, with cluster granularity (k) the
    * scale knob (k grows with the corpus; here the fixture's 16). A
    * vector is a DUPLICATE iff a SMALLER-id vector in its cluster has
    * cosine ≥ [[SemTau]] (deterministic first-wins collapse — the
    * paper's keep-one-per-group rule with an id tie-break both engines
    * agree on). Emitted per vector: cluster id and the keep flag.
    *
    * Scale shape: one broadcast-cross assignment pass (16 literal
    * centroids, codegen qdot, map-side-combinable argmin) + a
    * cluster-keyed self-join; clusters over [[MaxSemCluster]] degrade
    * to hub-star comparisons (members compared against the cluster's
    * minimum id only — O(m), a mass-duplicated embedding pocket cannot
    * go quadratic, at the price of missing non-hub pairs in hot
    * clusters). The corpus never exchanges except on the int64 cluster
    * key. Quantized-int64 dots; the cosine is the same double
    * expression shape as `cosine_near_dup`, so the oracle matches
    * bit-for-bit. */
  def semanticDedup(s: SparkSession, dir: String): DataFrame =
    semanticDedup(s, dir, SemTau, MaxSemCluster)

  /** Parameterized form: `tau` is the duplicate-cosine threshold (the
    * harness default [[SemTau]] is tuned to the near-orthogonal synthetic
    * fixture; real paraphrase embeddings want ~0.95), `maxCluster` the
    * hub-star degradation cap — mirroring `StreamingSemanticDedup.apply`,
    * which already takes tau/cap, so the batch operator is usable on real
    * data without a code edit. */
  def semanticDedup(s: SparkSession, dir: String,
                    tau: Double, maxCluster: Int): DataFrame = {
    import graft.functions.QDot
    val centRows = codebookFor(s, dir, sampled = true)
    // referenced four times (stats, both pair sides, hub vectors): pin
    // once, blocks freed with the RDD; the assignment itself is the
    // narrow argmin projection — no exchange before this checkpoint
    val assigned = assignedNarrow(s, dir, centRows)
      .select("vec_id", "list_id", "qv")
      .materialized
    def cosine(aq: org.apache.spark.sql.Column, bq: org.apache.spark.sql.Column) =
      QDot(aq, bq).cast("double") /
        (sqrt(QDot(aq, aq).cast("double")) * sqrt(QDot(bq, bq).cast("double")))
    // cluster stats are k rows — metadata-sized, broadcast at every use
    val cstats = assigned.groupBy("list_id")
      .agg(count(lit(1)).as("cn"), min("vec_id").as("hub"))
    val small = assigned.join(
      broadcast(cstats.filter(col("cn") <= maxCluster).select("list_id")),
      Seq("list_id"))
    val dupSmall = small.as("a").join(small.as("b"),
        col("a.list_id") === col("b.list_id") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosine(col("a.qv"), col("b.qv")) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
    val hot = cstats.filter(col("cn") > maxCluster).select("list_id", "hub")
    val hubVecs = assigned.join(
        broadcast(hot.select(col("hub").as("vec_id")).distinct()), Seq("vec_id"))
      .select(col("vec_id").as("hub"), col("qv").as("hubqv"))
    val dupHot = assigned.join(broadcast(hot), Seq("list_id"))
      .filter(col("vec_id") =!= col("hub"))
      .join(broadcast(hubVecs), Seq("hub"))
      .filter(cosine(col("hubqv"), col("qv")) >= tau)
      .select("vec_id").distinct()
    assigned.select("vec_id", "list_id")
      .join(dupSmall.unionByName(dupHot).distinct()
        .select(col("vec_id"), lit(1).as("isdup")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id").cast("long").as("cluster_id"),
        col("isdup").isNull.as("kept"))
      .orderBy("vec_id")
  }

  def semanticDedupSql: String = {
    def cosSql(a: String, b: String): String = {
      def dot(x: String, y: String) =
        s"CAST(list_sum(list_transform(range(1, $Dim + 1), i -> $x[i] * $y[i])) AS BIGINT)"
      s"CAST(${dot(a, b)} AS DOUBLE) / (sqrt(CAST(${dot(a, a)} AS DOUBLE)) * sqrt(CAST(${dot(b, b)} AS DOUBLE)))"
    }
    s"""${ivfCtes(sampled = true)},
       |av AS (SELECT a.vec_id, a.list_id, e.qv
       |  FROM assigned a JOIN e USING (vec_id)),
       |cs AS (SELECT list_id, count(*) AS cn, min(vec_id) AS hub
       |  FROM av GROUP BY list_id),
       |dup_small AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM av a JOIN av b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
       |  JOIN cs ON cs.list_id = a.list_id
       |  WHERE cn <= $MaxSemCluster AND ${cosSql("a.qv", "b.qv")} >= $SemTau),
       |hubs AS (SELECT cs.list_id, cs.hub, av.qv AS hubqv
       |  FROM cs JOIN av ON av.vec_id = cs.hub WHERE cn > $MaxSemCluster),
       |dup_hot AS (
       |  SELECT DISTINCT av.vec_id
       |  FROM av JOIN hubs USING (list_id)
       |  WHERE av.vec_id <> hubs.hub AND ${cosSql("hubs.hubqv", "av.qv")} >= $SemTau),
       |dups AS (SELECT vec_id FROM dup_small UNION SELECT vec_id FROM dup_hot)
       |SELECT av.vec_id, CAST(av.list_id AS BIGINT) AS cluster_id,
       |  d.vec_id IS NULL AS kept
       |FROM av LEFT JOIN dups d USING (vec_id)
       |ORDER BY av.vec_id""".stripMargin
  }

  /** Split point standing in for "the historical corpus index": vectors
    * below are the INDEX, at/above are the NEW BATCH being ingested. */
  private val SemIngestSplit = 400L

  /** semantic_incremental: the INGEST-TIME form of semantic dedup — a
    * new batch of embeddings checked against the EXISTING corpus index,
    * the semantic twin of [[graft.ops.Dedup.dedupIncremental]] (and the
    * batch complement of `StreamingSemanticDedup.withIndex`-style
    * serving): each new vector is assigned to its cluster and compared
    * against the INDEX members of that cluster only — within-batch and
    * within-index pairs are never generated. Disposition per new
    * vector: 'dup' (an index member sits at cosine ≥ [[SemTau]]) or
    * 'fresh'.
    *
    * Scale shape: the batch side is small relative to the corpus; the
    * index side is touched once, partitioned by the int64 cluster key,
    * and NEVER self-joined. Clusters whose index occupancy exceeds
    * [[MaxSemCluster]] degrade to a hub comparison (index minimum only)
    * — O(batch) work in hot clusters, the family's standard star guard.
    * At 100 TB the per-cluster index (vector + cluster key) is what you
    * PERSIST between ingests; here it derives inline from the same
    * fixture for oracle parity, and the codebook is the index's own
    * sample-trained one (what a shipped index carries). */
  def semanticIncremental(s: SparkSession, dir: String): DataFrame =
    semanticIncremental(s, dir, SemTau, SemIngestSplit, MaxSemCluster)

  /** Parameterized form: `tau` the duplicate-cosine threshold,
    * `ingestSplit` the index/batch id boundary (the harness default
    * [[SemIngestSplit]] is a fixture stand-in — a real deployment feeds
    * its persisted index's id horizon), `maxCluster` the hub-star cap —
    * so the ingest operator is usable on real data without a code edit
    * (mirrors `StreamingSemanticDedup.apply`'s tau/cap parameters). */
  def semanticIncremental(s: SparkSession, dir: String, tau: Double,
                          ingestSplit: Long, maxCluster: Int): DataFrame = {
    val centRows = codebookFor(s, dir, sampled = true)
    val assigned = assignedNarrow(s, dir, centRows)
      .select("vec_id", "list_id", "qv")
      .materialized
    semanticDispositions(
      assigned.filter(col("vec_id") < ingestSplit),
      assigned.filter(col("vec_id") >= ingestSplit), tau, maxCluster)
  }

  /** The COMPOSABLE form of [[semanticIncremental]]'s ingest-vs-index
    * core — the semantic twin of
    * [[graft.ops.Dedup.incrementalDispositions]]: disposition of each
    * `batch` vector against an arbitrary `index`, both as ASSIGNED
    * frames `(vec_id, list_id, qv)` (exactly what a deployment persists
    * between ingests — build either side with [[assignedOf]] and the
    * index's shipped codebook). The oracle query specializes this to
    * the fixture's vec_id split; a feed-driven refresh
    * ([[graft.storage.ServingFollower]]) calls this per manifest
    * publish. Same shapes and guards: batch compared against same-
    * cluster index members only, hot clusters degrade to hub-star,
    * index never self-joined. */
  def semanticDispositions(index: DataFrame, batch: DataFrame,
      tau: Double = SemTau, maxCluster: Int = MaxSemCluster): DataFrame = {
    import graft.functions.QDot
    def cosine(aq: org.apache.spark.sql.Column, bq: org.apache.spark.sql.Column) =
      QDot(aq, bq).cast("double") /
        (sqrt(QDot(aq, aq).cast("double")) * sqrt(QDot(bq, bq).cast("double")))
    // per-cluster index occupancy — k rows, broadcast at every use
    val istats = index.groupBy("list_id")
      .agg(count(lit(1)).as("cn"), min("vec_id").as("hub"))
    val smallIdx = index.join(
      broadcast(istats.filter(col("cn") <= maxCluster).select("list_id")),
      Seq("list_id"))
    val dupSmall = batch.as("b").join(smallIdx.as("i"),
        col("b.list_id") === col("i.list_id"))
      .filter(cosine(col("i.qv"), col("b.qv")) >= tau)
      .select(col("b.vec_id").as("vec_id")).distinct()
    val hot = istats.filter(col("cn") > maxCluster).select("list_id", "hub")
    val hubVecs = index.join(
        broadcast(hot.select(col("hub").as("vec_id")).distinct()), Seq("vec_id"))
      .select(col("vec_id").as("hub"), col("qv").as("hubqv"))
    val dupHot = batch.join(broadcast(hot), Seq("list_id"))
      .join(broadcast(hubVecs), Seq("hub"))
      .filter(cosine(col("hubqv"), col("qv")) >= tau)
      .select("vec_id").distinct()
    batch.select("vec_id", "list_id")
      .join(dupSmall.unionByName(dupHot).distinct()
        .select(col("vec_id"), lit(1).as("isdup")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id").cast("long").as("cluster_id"),
        when(col("isdup") === 1, "dup").otherwise("fresh").as("disposition"))
      .orderBy("vec_id")
  }

  def semanticIncrementalSql: String = {
    def cosSql(a: String, b: String): String = {
      def dot(x: String, y: String) =
        s"CAST(list_sum(list_transform(range(1, $Dim + 1), i -> $x[i] * $y[i])) AS BIGINT)"
      s"CAST(${dot(a, b)} AS DOUBLE) / (sqrt(CAST(${dot(a, a)} AS DOUBLE)) * sqrt(CAST(${dot(b, b)} AS DOUBLE)))"
    }
    s"""${ivfCtes(sampled = true)},
       |av AS (SELECT a.vec_id, a.list_id, e.qv
       |  FROM assigned a JOIN e USING (vec_id)),
       |idx AS (SELECT * FROM av WHERE vec_id < $SemIngestSplit),
       |nb AS (SELECT * FROM av WHERE vec_id >= $SemIngestSplit),
       |ist AS (SELECT list_id, count(*) AS cn, min(vec_id) AS hub
       |  FROM idx GROUP BY list_id),
       |dup_small AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM nb b JOIN idx i ON b.list_id = i.list_id
       |  JOIN ist ON ist.list_id = b.list_id
       |  WHERE cn <= $MaxSemCluster AND ${cosSql("i.qv", "b.qv")} >= $SemTau),
       |hubs AS (SELECT ist.list_id, ist.hub, av.qv AS hubqv
       |  FROM ist JOIN av ON av.vec_id = ist.hub WHERE cn > $MaxSemCluster),
       |dup_hot AS (
       |  SELECT DISTINCT nb.vec_id
       |  FROM nb JOIN hubs USING (list_id)
       |  WHERE ${cosSql("hubs.hubqv", "nb.qv")} >= $SemTau),
       |dups AS (SELECT vec_id FROM dup_small UNION SELECT vec_id FROM dup_hot)
       |SELECT nb.vec_id, CAST(nb.list_id AS BIGINT) AS cluster_id,
       |  CASE WHEN d.vec_id IS NOT NULL THEN 'dup' ELSE 'fresh' END AS disposition
       |FROM nb LEFT JOIN dups d USING (vec_id)
       |ORDER BY nb.vec_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Product quantization (PQ + asymmetric distance computation)
  // ------------------------------------------------------------------
  // IVF prunes WHICH vectors a query scans; PQ compresses WHAT each
  // scanned vector costs: the corpus is re-encoded as PqM small
  // centroid ids (here 4 bytes/vector vs 64×4-byte floats — the ~64×
  // memory ratio that decides whether a 100 TB embedding corpus fits
  // in cluster RAM at all), and a query scores a vector by summing
  // PqM lookups into its precomputed per-subspace distance table
  // instead of touching the raw floats.

  private val PqM = 8            // subspaces; PqM × PqSubDim == Dim
  private val PqSubDim = 8
  private val PqK = 64           // centroids per subspace
  private val PqIters = 3        // Lloyd passes per subspace
  private val PqTopK = 5

  /** Per-subspace Lloyd training, driver-side over the rank-bounded
    * sample. The sample is the ONLY corpus-sized decision and it is a
    * distributed top-[[TrainSampleN]] (hash-ranked, so both engines pick
    * the identical rows); everything after is arithmetic over ≤256×64
    * int64s — constant in corpus size, which is exactly why PQ training
    * is sample-based in production systems. Same exact-integer update
    * rule as [[trainedCentroids]] (floor-division means, empty-cluster
    * carryover, (d2, cid) assignment tie-break) so the DuckDB unroll
    * reproduces the codebook bit-for-bit. Seeds: the first [[PqK]]
    * sample vectors under (hash60("pqseed_"+id), id) order; all
    * subspaces share the seed VECTORS (their m-th slices), the standard
    * PQ initialization. Result: books(m)(k) = the 16-dim centroid. */
  private[graft] def trainPq(
      sample: IndexedSeq[(Long, IndexedSeq[Long])]): Vector[Vector[IndexedSeq[Long]]] = {
    import org.apache.spark.unsafe.types.UTF8String
    def sub(v: IndexedSeq[Long], m: Int): IndexedSeq[Long] =
      v.slice(m * PqSubDim, (m + 1) * PqSubDim)
    def d2(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val seeds = sample.sortBy { case (id, _) =>
      (graft.functions.Hash60Impl.compute(
        UTF8String.fromString(s"pqseed_$id")), id)
    }.take(PqK)
    var books: Vector[Vector[IndexedSeq[Long]]] =
      Vector.tabulate(PqM)(m => seeds.map(sv => sub(sv._2, m)).toVector)
    for (_ <- 1 to PqIters) {
      books = books.zipWithIndex.map { case (cents, m) =>
        val assigned = sample.map { case (_, v) =>
          val sv = sub(v, m)
          val cid = cents.zipWithIndex
            .map { case (cv, k) => (d2(sv, cv), k) }.min._2
          (cid, sv)
        }
        val byCid = assigned.groupBy(_._1)
        cents.zipWithIndex.map { case (prev, cid) =>
          byCid.get(cid) match {
            case Some(rows) =>
              val cnt = rows.length
              IndexedSeq.tabulate(PqSubDim) { pi =>
                Math.floorDiv(rows.iterator.map(_._2(pi)).sum, cnt)
              }
            case None => prev
          }
        }.toVector
      }
    }
    books
  }

  /** PQ codebook memo — same lifecycle discipline as [[codebookMemo]]. */
  private val pqMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Vector[Vector[IndexedSeq[Long]]]]]())

  private[graft] def pqCodebookFor(s: SparkSession, dir: String): Vector[Vector[IndexedSeq[Long]]] =
    pqMemo
      .computeIfAbsent(s, _ =>
        new java.util.concurrent.ConcurrentHashMap[String, Vector[Vector[IndexedSeq[Long]]]]())
      .computeIfAbsent(new java.io.File(dir).getCanonicalPath, _ => {
        val sample = Tables.embeddings(s, dir)
          .select(col("vec_id"), expr(quantExpr).as("qv"),
            hash60(concat(lit("pqs_"), col("vec_id"))).as("h"))
          .orderBy(col("h"), col("vec_id"))
          .limit(TrainSampleN)
          .select("vec_id", "qv")
          .collect() // TakeOrdered: TrainSampleN rows of metadata
          .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq)).toIndexedSeq
        trainPq(sample)
      })

  /** Corpus → (vec_id, codes): the PQ index build, ONE narrow codegen
    * projection — the whole PqM×PqK argmin runs inside the native
    * [[graft.functions.PqEncode]] expression (three tight loops over
    * the codebook reference object). No exchange: at 100 TB the encode
    * is a single scan that writes back PqM-byte codes. The earlier
    * compositional form (per subspace: array_min over PqK struct(d2,
    * cid) candidates, each a qdot expansion) computed the same codes
    * but generated ~PqM·PqK fused fragments in one whole-stage method —
    * past Janino's 64 KB limit, so the stage silently ran INTERPRETED;
    * PqEncodeSpec pins both the equivalence and the compiling plan. */
  private def pqEncoded(s: SparkSession, dir: String,
                        books: Vector[Vector[IndexedSeq[Long]]]): DataFrame = {
    val booksLit = typedLit(books.map(_.map(_.toSeq)))
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        graft.functions.PqEncode(expr(quantExpr), booksLit).as("codes"))
  }

  /** ann_pq_topk: top-[[PqTopK]] neighbors per query by ADC — each query
    * precomputes its PqM×PqK subspace distance table (driver-side: 10
    * queries × 64 cells of int64), and scoring a corpus vector is PqM
    * integer table lookups over its codes, unrolled as element_at chains
    * inside one codegen projection. The corpus side never shuffles and
    * never re-touches raw vectors — the PQ contract. Exact int64 end to
    * end, (adc, neighbor_id) tie-break. */
  def annPqTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val books = pqCodebookFor(s, dir)
    def d2(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long = {
      var acc = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val qrows = Tables.embeddings(s, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), expr(quantExpr).as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
    // distance tables pre-split into ONE array column per subquantizer
    // (dt0..dt7), so each ADC term is a single element_at — a fused
    // nested dtab[m][code] chain plus the 8-subspace encode used to
    // blow the fused stage past Janino's 64 KB method limit, silently
    // dropping the whole scoring stage to interpreted execution
    val dtabs = qrows.toSeq.map { case (qid, qv) =>
      val perM = (0 until PqM).map { m =>
        val sv = qv.slice(m * PqSubDim, (m + 1) * PqSubDim)
        books(m).map(cv => d2(sv, cv))
      }
      (qid, perM(0), perM(1), perM(2), perM(3), perM(4), perM(5), perM(6), perM(7))
    }
    val queries = broadcast(dtabs.toDF(
      "query_id" +: (0 until PqM).map(m => s"dt$m"): _*))
    // the codes table is materialized (eager localCheckpoint) before the
    // query fan-out: without the barrier Catalyst inlines the 8-subspace
    // encode into the post-crossJoin projection — every corpus vector
    // re-encoded once PER QUERY — and the inlined monolith is what broke
    // codegen. The barrier costs one narrow (vec_id, 8 codes) frame,
    // ~1/Dim of the corpus' width: the PQ index an ANN system persists.
    pqEncoded(s, dir, books).materialized
      .crossJoin(queries)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (0 until PqM).map(m =>
          element_at(col(s"dt$m"),
            (element_at(col("codes"), m + 1) + 1).cast("int")))
          .reduce(_ + _).as("adc"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("adc"), col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= PqTopK)
      .select("query_id", "neighbor_id", "adc", "rank")
      .orderBy("query_id", "rank")
  }

  /** ann_pq_recall: recall@[[PqTopK]] of the ADC ranking against exact
    * L2² ground truth — compression quality as a one-row, oracle-gated
    * number (the same contract as [[annIvfRecall]]: a training or
    * encoding regression becomes a hash mismatch, not a silent drop). */
  def annPqRecall(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.QDot
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(quantExpr).as("qv"))
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("query_v"))
    val truth = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (QDot(col("query_v"), col("query_v"))
          - lit(2) * QDot(col("query_v"), col("qv"))
          + QDot(col("qv"), col("qv"))).as("d2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d2"), col("neighbor_id"))))
      .filter(col("rn") <= PqTopK)
      .select("query_id", "neighbor_id")
    val pq = annPqTopK(s, dir)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    truth.join(pq, Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_truth"), count(col("hit")).as("n_hits"))
      .select(lit(PqTopK.toLong).as("k"), col("n_truth"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_truth").cast("double")).as("recall"))
  }

  /** Negatives mined per anchor for contrastive training. */
  private val HardNegK = 5

  /** hard_negatives: for each anchor (the query set), the [[HardNegK]]
    * most-similar vectors carrying a DIFFERENT label — the "hard
    * negative" mining pass a contrastive-training pipeline runs over its
    * embedding corpus (easy negatives are useless; the informative ones
    * are the near-misses that cross a label boundary). Same scale
    * skeleton as [[annTopK]]: anchors broadcast, corpus streams through
    * one narrow scan (label filter applied in the same codegen stage as
    * the dot product), per-anchor top-k — the corpus never shuffles.
    * Exact int64 scoring, (dot desc, vec_id) tie-break. */
  def hardNegatives(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.QDot
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(quantExpr).as("qv"), col("label"))
    val anchors = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("anchor_id"), col("qv").as("av"),
        col("label").as("anchor_label"))
    emb.crossJoin(broadcast(anchors))
      .filter(col("label") =!= col("anchor_label"))
      .select(col("anchor_id"), col("anchor_label").cast("long").as("anchor_label"),
        col("vec_id").as("neighbor_id"), col("label").cast("long").as("neighbor_label"),
        QDot(col("av"), col("qv")).as("dot"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("anchor_id")
          .orderBy(col("dot").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= HardNegK)
      .select("anchor_id", "anchor_label", "neighbor_id", "neighbor_label",
        "dot", "rank")
      .orderBy("anchor_id", "rank")
  }

  def hardNegativesSql: String =
    s"""WITH a AS (SELECT vec_id AS anchor_id, CAST(label AS BIGINT) AS anchor_label,
       |    $quantSql AS av FROM embeddings WHERE vec_id < $NumQueries),
       |c AS (SELECT vec_id AS neighbor_id, CAST(label AS BIGINT) AS neighbor_label,
       |    $quantSql AS cv FROM embeddings),
       |sc AS (SELECT anchor_id, anchor_label, neighbor_id, neighbor_label,
       |    CAST(list_sum(list_transform(range(1, $Dim + 1), i -> av[i] * cv[i])) AS BIGINT) AS dot
       |  FROM a, c WHERE neighbor_label <> anchor_label),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
       |    ORDER BY dot DESC, neighbor_id) AS BIGINT) AS rank FROM sc)
       |SELECT anchor_id, anchor_label, neighbor_id, neighbor_label, dot, rank
       |FROM r WHERE rank <= $HardNegK ORDER BY anchor_id, rank""".stripMargin

  /** Exact-int64 L2² over one PQ subspace, as DuckDB SQL. */
  private def pqD2Sql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, $PqSubDim + 1), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"

  /** The PQ pipeline as a WITH-chain: sample → seeds → per-subspace
    * Lloyd unroll (subspace is a DATA column `m`, so one unroll trains
    * all subspaces) → corpus encode → query distance tables → ADC rank.
    * Shared by the top-k query and the recall gate. */
  private def pqCtes: String = {
    val sampleH = Prims.hash60Sql("'pqs_' || CAST(vec_id AS VARCHAR)")
    val seedH = Prims.hash60Sql("'pqseed_' || CAST(vec_id AS VARCHAR)")
    val lloyd = (1 to PqIters).map { k =>
      s"""pa$k AS (SELECT m, vec_id, cent_id FROM (
         |    SELECT t.m, t.vec_id, c.cent_id,
         |      row_number() OVER (PARTITION BY t.m, t.vec_id
         |        ORDER BY ${pqD2Sql("t.sv", "c.cv")}, c.cent_id) AS rn
         |    FROM tsub t JOIN pc${k - 1} c ON c.m = t.m) WHERE rn = 1),
         |ps$k AS (SELECT a.m, a.cent_id, p.pi, sum(t.sv[p.pi]) AS sm, count(*) AS cnt
         |  FROM pa$k a JOIN tsub t ON t.m = a.m AND t.vec_id = a.vec_id,
         |    (SELECT unnest(range(1, $PqSubDim + 1)) AS pi) p
         |  GROUP BY a.m, a.cent_id, p.pi),
         |pc$k AS (SELECT p.m, p.cent_id, coalesce(n.cv, p.cv) AS cv
         |  FROM pc${k - 1} p LEFT JOIN (
         |    SELECT m, cent_id,
         |      list((sm - ((sm % cnt) + cnt) % cnt) // cnt ORDER BY pi) AS cv
         |    FROM ps$k GROUP BY m, cent_id) n USING (m, cent_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH $eCte,
       |ts AS (SELECT vec_id, qv FROM (
       |    SELECT vec_id, qv, row_number() OVER (ORDER BY $sampleH, vec_id) AS srn
       |    FROM e) WHERE srn <= $TrainSampleN),
       |sd AS (SELECT qv, row_number() OVER (ORDER BY $seedH, vec_id) AS rn FROM ts),
       |pc0 AS (SELECT m, CAST(rn - 1 AS BIGINT) AS cent_id,
       |    qv[m * $PqSubDim + 1 : (m + 1) * $PqSubDim] AS cv
       |  FROM sd, unnest(range(0, $PqM)) AS t(m) WHERE rn <= $PqK),
       |tsub AS (SELECT m, vec_id, qv[m * $PqSubDim + 1 : (m + 1) * $PqSubDim] AS sv
       |  FROM ts, unnest(range(0, $PqM)) AS t(m)),
       |$lloyd,
       |cb AS (SELECT m, cent_id, cv FROM pc$PqIters),
       |esub AS (SELECT m, vec_id, qv[m * $PqSubDim + 1 : (m + 1) * $PqSubDim] AS sv
       |  FROM e, unnest(range(0, $PqM)) AS t(m)),
       |cods AS (SELECT m, vec_id, cent_id AS code FROM (
       |    SELECT s.m, s.vec_id, c.cent_id,
       |      row_number() OVER (PARTITION BY s.m, s.vec_id
       |        ORDER BY ${pqD2Sql("s.sv", "c.cv")}, c.cent_id) AS rn
       |    FROM esub s JOIN cb c ON c.m = s.m) WHERE rn = 1),
       |qsub AS (SELECT vec_id AS query_id, m, sv FROM esub WHERE vec_id < $NumQueries),
       |dt AS (SELECT q.query_id, q.m, c.cent_id, ${pqD2Sql("q.sv", "c.cv")} AS d
       |  FROM qsub q JOIN cb c ON c.m = q.m),
       |adcs AS (SELECT d.query_id, k.vec_id AS neighbor_id, CAST(sum(d.d) AS BIGINT) AS adc
       |  FROM cods k JOIN dt d ON d.m = k.m AND d.cent_id = k.code
       |  WHERE k.vec_id <> d.query_id
       |  GROUP BY d.query_id, k.vec_id),
       |pqr AS (SELECT query_id, neighbor_id, adc,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc, neighbor_id) AS BIGINT) AS rank
       |  FROM adcs)""".stripMargin
  }

  def annPqTopKSql: String =
    s"""$pqCtes
       |SELECT query_id, neighbor_id, adc, rank FROM pqr
       |WHERE rank <= $PqTopK ORDER BY query_id, rank""".stripMargin

  def annPqRecallSql: String =
    s"""$pqCtes,
       |ex AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${d2Sql("q.qv", "c.qv")} AS d2
       |  FROM e q, e c WHERE q.vec_id < $NumQueries AND c.vec_id <> q.vec_id),
       |er AS (SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rn
       |  FROM ex),
       |gt AS (SELECT query_id, neighbor_id FROM er WHERE rn <= $PqTopK),
       |hits AS (SELECT count(*) AS n_truth,
       |    count(*) FILTER (WHERE p.rank IS NOT NULL) AS n_hits
       |  FROM gt LEFT JOIN (SELECT query_id, neighbor_id, rank FROM pqr
       |    WHERE rank <= $PqTopK) p USING (query_id, neighbor_id))
       |SELECT CAST($PqTopK AS BIGINT) AS k,
       |  CAST(n_truth AS BIGINT) AS n_truth, CAST(n_hits AS BIGINT) AS n_hits,
       |  CAST(n_hits AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall
       |FROM hits""".stripMargin

  val oracles: Map[String, String] = Map(
    "ann_pq_topk" -> annPqTopKSql,
    "ann_pq_recall" -> annPqRecallSql,
    "hard_negatives" -> hardNegativesSql,
    "semantic_incremental" -> semanticIncrementalSql,
    "semantic_dedup" -> semanticDedupSql,
    "embed_cluster_profile" -> embedClusterProfileSql,
    "density_prune" -> densityPruneSql,
    "ann_topk" -> annTopKSql,
    "ann_lsh_pairs" -> annLshPairsSql,
    "cosine_near_dup" -> cosineNearDupSql,
    "decontaminate_semantic" -> decontaminateSemanticSql,
    "ann_ivf_topk" -> annIvfTopKSql,
    "ann_ivf_recall" -> annIvfRecallSql,
    "ann_ivf_sampled_recall" -> annIvfSampledRecallSql,
  )
}
