package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization invariants: codebook shape/determinism, encode
  * optimality (each code IS the argmin centroid), and ADC consistency
  * (the table-lookup distance equals the directly-computed distance to
  * the reconstructed vector). */
class PqSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def d2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("codebook: deterministic across constructions, full shape, sub-dim centroids") {
    val s = spark
    val b1 = Similarity.pqCodebookFor(s, dir)
    val b2 = Similarity.pqCodebookFor(s, dir) // memo hit — identical ref or value
    assert(b1 == b2)
    assert(b1.nonEmpty && b1.forall(_.nonEmpty))
    val subDim = b1.head.head.length
    assert(b1.map(_.length).distinct.size == 1, "every subspace has the same K")
    assert(b1.forall(_.forall(_.length == subDim)))
    assert(b1.length * subDim == 64, "subspaces tile the full dimension")
  }

  test("ADC distance equals sum of per-subspace distances to the coded centroids") {
    val s = spark
    import s.implicits._
    val books = Similarity.pqCodebookFor(s, dir)
    val m = books.length
    val subDim = books.head.head.length
    // take the operator's own output and re-derive each adc value from
    // raw vectors: encode by brute-force argmin, sum subspace distances
    val emb = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(Similarity.quantExpr).as("qv"))
      .as[(Long, Seq[Long])].collect().toMap
    val rows = Similarity.annPqTopK(s, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, nid, adc, _) =>
      val qv = emb(qid); val nv = emb(nid)
      val expect = (0 until m).map { mm =>
        val nSub = nv.slice(mm * subDim, (mm + 1) * subDim).toIndexedSeq
        val qSub = qv.slice(mm * subDim, (mm + 1) * subDim).toIndexedSeq
        // encode: argmin centroid for the NEIGHBOR, (d2, cid) tie-break
        val code = books(mm).zipWithIndex
          .map { case (cv, k) => (d2(nSub, cv), k) }.min._2
        d2(qSub, books(mm)(code))
      }.sum
      assert(adc == expect, s"adc mismatch for ($qid, $nid)")
    }
  }

  test("recall gate emits one row with recall in (0, 1]") {
    val s = spark
    import s.implicits._
    val r = Similarity.annPqRecall(s, dir)
      .select("recall").as[Double].collect()
    assert(r.length == 1 && r.head > 0.0 && r.head <= 1.0)
  }
}
