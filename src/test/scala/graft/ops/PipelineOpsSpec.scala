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
}
