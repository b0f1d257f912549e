package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-assembly operators: invariants complementing the DuckDB oracle
  * (which pins exact values). */
class PipelineOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("train_val_split is exhaustive, stable, and ~90/10") {
    val s = spark
    import s.implicits._
    val split = PipelineOps.trainValSplit(s, dir)
      .as[(String, Long, Long)].collect().map { case (k, n, _) => k -> n }.toMap
    val total = graft.Tables.documents(s, dir).count()
    assert(split.values.sum == total) // every doc lands in exactly one split
    assert(split.keySet == Set("train", "val"))
    val valFrac = split("val").toDouble / total
    assert(valFrac > 0.02 && valFrac < 0.25, s"val fraction $valFrac far from 10%")
    // stability: same assignment on every run (pure hash of doc_id)
    assert(PipelineOps.trainValSplit(s, dir).collect().toSeq ==
      PipelineOps.trainValSplit(s, dir).collect().toSeq)
  }

  test("decontaminate removes exact duplicates of held-out docs") {
    val s = spark
    import s.implicits._
    val docs = graft.Tables.documents(s, dir)
    val survivors = PipelineOps.decontaminate(s, dir).as[Long].collect().toSet
    // any corpus doc whose text is verbatim-identical to a held-out doc
    // shares all its 8-grams with it — it must never survive
    val heldTexts = docs.filter(col("doc_id") < 10).select("text")
    val verbatimDups = docs.filter(col("doc_id") >= 10)
      .join(heldTexts, "text").select("doc_id").as[Long].collect()
    assert(verbatimDups.forall(d => !survivors.contains(d)),
      s"verbatim duplicates of held-out docs survived: ${verbatimDups.filter(survivors.contains).toSeq}")
    // and survivors ∪ removed = the full non-heldout corpus
    val nonHeld = docs.filter(col("doc_id") >= 10).count()
    assert(survivors.size <= nonHeld && survivors.nonEmpty)
  }

  test("decontaminate_bloom: bloom prefilter + exact confirm is bit-identical to the exact path") {
    val s = spark
    val exact = PipelineOps.decontaminate(s, dir).collect().toSeq
    val bloom = PipelineOps.decontaminateBloom(s, dir).collect().toSeq
    assert(exact.nonEmpty)
    // the bloom filter only PRUNES the gram stream; the exact membership
    // join behind it kills every false positive, so any divergence means
    // the prefilter dropped a true hit (a broken filter), not fpp noise
    assert(bloom == exact)
  }

  test("source_cardinality: HLL estimate stays inside the gate tolerance") {
    val s = spark
    import s.implicits._
    val rows = PipelineOps.sourceCardinality(s, dir)
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nDistinct, hllOk) =>
      assert(nDistinct <= nDocs, s"$src: distinct exceeds doc count")
      assert(nDistinct > 0)
      assert(hllOk, s"$src: HLL estimate left the ±15% tolerance band")
    }
  }

  test("curate_manifest: composed pipeline respects every stage's invariant") {
    val s = spark
    import s.implicits._
    val rows = PipelineOps.curateManifest(s, dir)
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val ids = rows.map(_._1)
    // no held-out docs, no duplicates in the manifest
    assert(ids.forall(_ >= 10L))
    assert(ids.distinct.length == ids.length)
    val texts = graft.Tables.documents(s, dir)
      .filter(col("doc_id").isin(ids: _*)).select("text")
      .as[String].collect()
    assert(texts.distinct.length == texts.length, "manifest contains duplicate content")
    // quota respected per source
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.length <= 40, s"$src exceeds quota")
      assert(rs.map(_._4).max <= 40)
    }
    // packing is gapless: each doc starts where the previous ended
    var cum = 0L
    rows.foreach { case (_, _, nTok, _, bin, off) =>
      assert(bin == cum / 1024 && off == cum % 1024, "packing gap")
      cum += nTok
    }
  }

  test("curate_manifest: a near-dup pair surviving exact dedup collapses to its minimum") {
    val s = spark
    import s.implicits._
    // synthetic corpus: docs 100/101 are NEAR-duplicates (one word changed,
    // so exact content-hash dedup keeps BOTH), everything else is disjoint
    // vocabulary (no cross-doc shingles). All ids >= 10 (no held-out set).
    val vocab = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy",
      "dog", "and", "of", "to", "in", "is", "a", "river", "bank", "code",
      "data", "model", "train")
    val base = (0 until 150).map(i => vocab(i * 13 % vocab.size))
    val docA = base.mkString(" ")
    val docB = (base.init :+ "changed").mkString(" ") // near-dup, not exact
    val others = (102L to 105L).map(id =>
      (id, "src1", (0 until 150).map(i => s"w${id}x$i").mkString(" ")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_curate_nd").toString
    (Seq((100L, "src1", docA), (101L, "src1", docB)) ++ others)
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val ids = PipelineOps.curateManifest(s, tmp)
      .select("doc_id").as[Long].collect().toSet
    // exact dedup alone keeps both (different content hashes)...
    assert(docA != docB)
    assert(Dedup.dedupExact(s, tmp).count() == 6)
    // ...but the manifest's near-dup stage collapses the cluster to its
    // minimum member, and leaves the disjoint docs untouched
    assert(ids.contains(100L), "cluster minimum must survive")
    assert(!ids.contains(101L), "non-canonical near-dup must be collapsed")
    assert((102L to 105L).forall(ids.contains), "disjoint docs must be untouched")
    graft.HarnessUtil.releaseAll(s)
  }

  test("corpus_health: report columns reconcile with the standalone operators") {
    val s = spark
    import s.implicits._
    val rows = PipelineOps.corpusHealth(s, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(s, dir)
    // volume: every doc in exactly one source row
    assert(rows.map(_._2).sum == docs.count())
    rows.foreach { case (src, nDocs, nToks, nDups, nOk, nCont, nNear) =>
      assert(nDups >= 0 && nDups < nDocs, s"$src dup count out of range")
      assert(nOk <= nDocs && nCont <= nDocs && nNear <= nDocs, s"$src counts exceed docs")
      assert(nToks > 0)
    }
    // contamination total = non-held docs minus decontaminate's survivors
    val nonHeld = docs.filter(col("doc_id") >= 10).count()
    val survivors = PipelineOps.decontaminate(s, dir).count()
    assert(rows.map(_._6).sum == nonHeld - survivors,
      "contamination totals must match the decontaminate operator")
    // near-dup losses total = docs minus the survivor keep-list
    val keep = Dedup.dedupSurvivors(s, dir).count()
    assert(rows.map(_._7).sum == docs.count() - keep,
      "near-dup loss totals must match dedup_survivors")
    graft.HarnessUtil.releaseAll(s)
  }

  test("quantile_sketch_gate: percentile_approx stays inside the tolerance band") {
    val s = spark
    import s.implicits._
    val rows = PipelineOps.quantileSketchGate(s, dir)
      .as[(String, Long, Long, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, p50, p95, ok50, ok95) =>
      assert(p50 > 0 && p95 >= p50, s"$lang: quantiles out of order")
      assert(ok50 && ok95, s"$lang: sketch left the ±25% band")
    }
  }

  test("domain_mix keeps min(quota, source size) per source, deterministically") {
    val s = spark
    import s.implicits._
    val mix = PipelineOps.domainMix(s, dir)
    val kept = mix.groupBy("source").count().as[(String, Long)].collect().toMap
    val sizes = graft.Tables.documents(s, dir)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept.keySet == sizes.keySet) // every domain represented
    kept.foreach { case (src, n) => assert(n == math.min(10L, sizes(src))) }
    assert(mix.collect().toSeq == PipelineOps.domainMix(s, dir).collect().toSeq)
  }

  test("domain_mix_weighted: achieved tokens fill each source's budget within one doc") {
    val s = spark
    import s.implicits._
    val rows = PipelineOps.domainMixWeighted(s, dir)
      .as[(String, Long, Long, Long, Long)].collect() // source, doc_id, n_tokens, cum_before, budget
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_._1)
    val sizes = graft.Tables.documents(s, dir)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc.keySet == sizes.keySet, "every source must be represented")
    val srcTokens = graft.Tables.documents(s, dir)
      .select(col("source"), expr(s"size(${Prims.wordsExpr})").cast("long").as("t"))
      .groupBy("source").agg(org.apache.spark.sql.functions.sum("t").as("t"))
      .as[(String, Long)].collect().toMap
    bySrc.foreach { case (src, docs) =>
      val budget = docs.head._5
      val achieved = docs.map(_._3).sum
      val maxDoc = docs.map(_._3).max
      // filled: at least min(budget, the source's total tokens) — a source
      // smaller than its budget can only contribute everything it has —
      // and overshot by strictly less than the largest selected doc (the
      // straddling doc is the only overshoot)
      val fillTarget = math.min(budget, srcTokens(src))
      assert(achieved >= fillTarget, s"$src underfilled: $achieved < $fillTarget")
      assert(achieved < budget + maxDoc, s"$src overshot by a full doc")
      // selection = exactly the hash-order prefix: every selected doc's
      // exclusive cumulative is below budget, densely from 0
      assert(docs.map(_._4).min == 0L)
      assert(docs.forall(d => d._4 < budget))
    }
    // proportions follow the 1:2:3:4 weight cycle: a weight-4 source gets
    // ~4x the tokens of a weight-1 source (within one-doc granularity)
    val tok = bySrc.map { case (src, docs) => src -> docs.map(_._3).sum }
    val w1 = tok.filter { case (s0, _) => s0.drop(3).toLong % 4 == 0 }.values // wt 1
    val w4 = tok.filter { case (s0, _) => s0.drop(3).toLong % 4 == 3 }.values // wt 4
    assert(w1.nonEmpty && w4.nonEmpty)
    val ratio = w4.sum.toDouble / w4.size / (w1.sum.toDouble / w1.size)
    assert(ratio > 2.5 && ratio < 5.5, s"weight-4/weight-1 token ratio $ratio far from 4")
    // deterministic
    assert(PipelineOps.domainMixWeighted(s, dir).collect().toSeq ==
      PipelineOps.domainMixWeighted(s, dir).collect().toSeq)
  }

  test("globalPrefixSum matches the single-partition window form, straddles partitions") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // enough rows to span several range partitions at 32 shuffle partitions
    val df = s.range(0, 5000).select(col("id"), (col("id") % 7 + 1).as("v"))
    val fast = Prims.globalPrefixSum(df, "v", "cum", col("id"))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val slow = df.withColumn("cum",
        coalesce(sum(col("v")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(fast == slow)
    assert(fast(0L) == 0L) // exclusive: first row sees an empty prefix
    // empty input analyzes and returns empty (the map() edge case)
    assert(Prims.globalPrefixSum(df.filter(col("id") < 0), "v", "cum", col("id")).count() == 0)
  }

  test("corpus_stats: exact discrete quantiles under one dominant language") {
    val s = spark
    import s.implicits._
    // 9000 of 10000 rows in one language — the skew shape the two-phase
    // grouped rank must handle without a per-language single-task sort
    val t = s.range(0, 10000).select(
        when(col("id") % 10 === 0, concat(lit("xx"), col("id") % 3))
          .otherwise(lit("en")).as("lang"),
        (col("id") * 31 % 977 + 1).as("toks"))
      .repartition(8).localCheckpoint(true) // pin the fixture
    val got = PipelineOps.corpusStatsFrom(t)
      .select($"lang", $"n_docs", $"p50_toks", $"p95_toks")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // independent oracle: sort each language's toks in plain Scala and
    // read the value at rank ceil(p*n) (1-based)
    val byLang = t.as[(String, Long)].collect().groupBy(_._1)
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length
      def q(p: Int) = sorted((p * n + 99) / 100 - 1)
      val (_, nd, p50, p95) = got(lang)
      assert(nd == n)
      assert(p50 == q(50), s"$lang p50: got $p50 want ${q(50)}")
      assert(p95 == q(95), s"$lang p95: got $p95 want ${q(95)}")
    }
    assert(got("en")._2 == 9000L) // the dominant language really dominates
  }

  test("corpus_pack: bins are gapless and offsets stay inside capacity") {
    val s = spark
    import s.implicits._
    val packed = PipelineOps.corpusPack(s, dir)
      .as[(Long, Long, Long, Long)].collect().toVector // doc_id, n_tokens, start_bin, start_offset
    assert(packed.forall { case (_, _, _, off) => off >= 0 && off < 1024 })
    assert(packed.forall { case (_, _, bin, _) => bin >= 0 })
    // consecutive docs tile the token stream: next start = prev start + prev tokens
    packed.sliding(2).foreach {
      case Vector((_, n1, b1, o1), (_, _, b2, o2)) =>
        val abs1 = b1 * 1024 + o1
        assert(b2 * 1024 + o2 == abs1 + n1)
      case _ =>
    }
  }

  test("pack_bins: every bin but the last is exactly full; bins tile the token stream") {
    val s = spark
    import s.implicits._
    val bins = PipelineOps.packBins(s, dir)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(bins.nonEmpty)
    // gapless ascending bin ids
    assert(bins.map(_._1).toSeq == (0L until bins.length).toSeq)
    // the no-padding invariant: every bin except the last holds exactly
    // PackCapacity tokens; the last holds the remainder
    bins.init.foreach { case (b, _, toks, _) =>
      assert(toks == 1024L, s"bin $b underfilled: $toks")
    }
    assert(bins.last._3 >= 1 && bins.last._3 <= 1024L)
    // totals reconcile with corpus_pack's placement view
    val placed = PipelineOps.corpusPack(s, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(bins.map(_._3).sum == placed.map(_._2).sum,
      "bin contents must tile exactly the packed token stream")
    // every doc appears in every bin its span touches, and no other
    val byDoc = bins.flatMap { case (b, _, _, ids) =>
      ids.split(",").map(_.toLong -> b) }.groupBy(_._1)
    placed.filter(_._2 >= 1).foreach { case (doc, n, bin, off) =>
      val expect = (bin to (bin * 1024 + off + n - 1) / 1024).toSet
      assert(byDoc(doc).map(_._2).toSet == expect, s"doc $doc bin set wrong")
    }
    graft.HarnessUtil.releaseAll(s)
  }

  test("stratified_sample: kept counts reproduce the hash rule exactly") {
    val s = spark
    import s.implicits._
    def hash60Jvm(x: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    val docs = graft.Tables.documents(s, dir)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val expected = docs.groupBy(_._2).map { case (lang, rows) =>
      val rate = (hash60Jvm(s"rate_$lang") % 5 + 1) * 10
      lang -> (rate, rows.length.toLong,
        rows.count { case (id, _) => hash60Jvm(s"strat_$id") % 100 < rate }.toLong)
    }
    val got = PipelineOps.stratifiedSample(s, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == expected)
    got.values.foreach { case (rate, total, kept) =>
      assert(rate >= 10 && rate <= 50 && kept <= total)
    }
  }

  test("doc_len_histogram: buckets partition the corpus by bit length") {
    val s = spark
    import s.implicits._
    val rows = PipelineOps.docLenHistogram(s, dir)
      .as[(Long, Long, Long)].collect() // bucket, n_docs, sum_toks
    assert(rows.map(_._2).sum == graft.Tables.documents(s, dir).count())
    rows.foreach { case (bucket, n, sumToks) =>
      assert(bucket >= 1 && n > 0)
      // a bucket-b doc has toks in [2^(b-1), 2^b): the sum must too
      val (lo, hi) = (1L << (bucket - 1), 1L << bucket)
      assert(sumToks >= lo * n && sumToks < hi * n,
        s"bucket $bucket sum $sumToks outside [$lo,$hi) x $n")
    }
  }

  test("redactPii: each PII class redacts, clean text passes untouched") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "reach me at jane.doe+spam@sub.example.co thanks",
      "ssn is 123-45-6789 ok",
      "call +1-555-867-5309 now",
      "two mails a@b.io c@d.org",
      "plain clean text stays put",
      "almost-an-email @ not-one; short 12-34 id")
    val out = cases.toDF("text")
      .select(PipelineOps.redactPii(col("text")).as("clean")).as[String].collect()
    assert(out(0) == "reach me at <EMAIL> thanks")
    assert(out(1) == "ssn is <ID> ok")
    assert(out(2) == "call <PHONE> now")
    assert(out(3) == "two mails <EMAIL> <EMAIL>")
    assert(out(4) == cases(4)) // no false positives
    assert(out(5) == cases(5)) // near-misses survive
  }

  test("redactPii: dates, timestamps, versions, and id ranges survive") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "released on 2026-08-12 at noon",          // ISO date: 4-digit lead
      "build 2026-08-12-0317 retried",           // timestamped build id
      "version 1.2.3 and range 100-200 ok",      // dots / 2-group range
      "ticket ABC-123-4567 unchanged",           // only two digit groups
      "call 555-123-4567 though")                // a real phone still goes
    val out = cases.toDF("text")
      .select(PipelineOps.redactPii(col("text")).as("clean")).as[String].collect()
    assert(out(0) == cases(0), s"date was redacted: ${out(0)}")
    assert(out(1) == cases(1), s"timestamp was redacted: ${out(1)}")
    assert(out(2) == cases(2), s"version/range was redacted: ${out(2)}")
    assert(out(3) == cases(3), s"prefixed id was redacted: ${out(3)}")
    assert(out(4) == "call <PHONE> though")
  }

  test("redactPii: undashed digit-run phones redact; 16+-digit runs survive") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      "call 5551234567 now",                 // 10 contiguous digits
      "intl +15550042 ok",                   // +-prefixed 8-digit run
      "card 1234567890123456 kept",          // 16 digits: not phone-shaped
      "short 123456 id stays")               // 6 digits: under the floor
    val out = cases.toDF("text")
      .select(PipelineOps.redactPii(col("text")).as("clean")).as[String].collect()
    assert(out(0) == "call <PHONE> now", s"undashed phone survived: ${out(0)}")
    assert(out(1) == "intl <PHONE> ok", s"+digit run survived: ${out(1)}")
    assert(out(2) == cases(2), s"16-digit run was redacted: ${out(2)}")
    assert(out(3) == cases(3), s"6-digit id was redacted: ${out(3)}")
  }
}
