package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import scala.util.Random

/** corpus_pack ↔ pack_bins RECONCILIATION property (r8 verdict #7): the
  * doc-side view (where each doc's tokens START) and the bin-side view
  * (what each bin CONTAINS) describe the SAME packing, so on any corpus:
  *
  *   1. a doc with start (bin b0, offset o) and n tokens intersects
  *      exactly bins b0 .. (cum+n-1) div C, appears in each of those
  *      bins' doc lists and NO others, and its per-bin contributions sum
  *      to n;
  *   2. every bin except the last holds exactly C tokens (no padding);
  *   3. 0-token docs appear in corpus_pack but in no bin.
  *
  * The two operators' separate DuckDB oracles imply this only
  * indirectly; this pins it directly, on generated corpora chosen to
  * exercise the edges (empty docs, docs longer than a whole bin,
  * bin-boundary-exact lengths, unsorted sparse ids). Deterministic seeds
  * — a failure reproduces. */
class PackReconcileSpec extends SparkSpec {

  private val C = PipelineOps.PackCapacity

  /** Generated corpora: (seed, nDocs). Lengths mix 0s, short docs,
    * exact-capacity docs, and multi-bin straddlers; ids are sparse and
    * inserted out of order (globalPrefixSum must order by id itself). */
  private def corpus(seed: Long, nDocs: Int): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    val ids = rnd.shuffle((0 until nDocs * 3).map(_.toLong).toVector).take(nDocs)
    ids.map { id =>
      val len = rnd.nextInt(6) match {
        case 0 => 0L                              // empty doc
        case 1 => C                               // exactly one bin
        case 2 => C * (1 + rnd.nextInt(3)) + rnd.nextInt(50) // straddler
        case _ => 1L + rnd.nextInt(200)           // typical short doc
      }
      (id, len)
    }
  }

  test("property: doc-side and bin-side packing views reconcile exactly") {
    val s = spark
    import s.implicits._
    for (seed <- 1L to 8L) {
      val docs = corpus(seed, 120)
      val df = docs.toDF("doc_id", "n_tokens")
      val packed = PipelineOps.corpusPackFrom(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val bins = PipelineOps.packBinsFrom(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

      // doc-side: reconstruct each doc's expected bin span + contributions
      val total = docs.map(_._2).sum
      assert(packed.length == docs.length, s"seed=$seed: corpus_pack row count")
      val expectedByBin = scala.collection.mutable.Map
        .empty[Long, List[(Long, Long)]].withDefaultValue(Nil) // bin -> (doc, toks)
      packed.foreach { case (id, n, b0, off) =>
        val cum = b0 * C + off // invert (start_bin, start_offset)
        if (n > 0) {
          val b1 = (cum + n - 1) / C
          var contrib = 0L
          (b0 to b1).foreach { b =>
            val t = math.min(cum + n, (b + 1) * C) - math.max(cum, b * C)
            assert(t > 0, s"seed=$seed doc=$id bin=$b: empty intersection in span")
            expectedByBin(b) = (id, t) :: expectedByBin(b)
            contrib += t
          }
          assert(contrib == n,
            s"seed=$seed doc=$id: per-bin contributions $contrib != n_tokens $n") // (1)
        }
      }

      // bin-side must equal the doc-side reconstruction bin for bin
      val gotBins = bins.map(b => b._1 -> b).toMap
      assert(gotBins.keySet == expectedByBin.keySet.toSet,
        s"seed=$seed: bin id sets differ")
      expectedByBin.foreach { case (b, contribs) =>
        val (_, nDocs, nToks, docIds) = gotBins(b)
        assert(nDocs == contribs.length, s"seed=$seed bin=$b: n_docs")
        assert(nToks == contribs.map(_._2).sum, s"seed=$seed bin=$b: n_tokens")
        assert(docIds == contribs.map(_._1).sorted.mkString(","),
          s"seed=$seed bin=$b: doc list") // (1): exactly b0..b1, no others
      }

      // no-padding invariant: every bin but the last is exactly full
      val lastBin = if (total == 0) -1L else (total - 1) / C
      bins.foreach { case (b, _, nToks, _) =>
        if (b != lastBin)
          assert(nToks == C, s"seed=$seed bin=$b: holds $nToks != capacity $C") // (2)
        else
          assert(nToks == total - lastBin * C,
            s"seed=$seed last bin token remainder") // (2)
      }

      // 0-token docs: present doc-side, absent bin-side
      val empties = docs.filter(_._2 == 0).map(_._1).toSet
      assert(empties.subsetOf(packed.map(_._1).toSet), s"seed=$seed: (3) doc-side")
      val allBinDocs = bins.flatMap(_._4.split(",").filter(_.nonEmpty).map(_.toLong)).toSet
      assert(empties.intersect(allBinDocs).isEmpty, s"seed=$seed: (3) bin-side")
      graft.HarnessUtil.releaseAll(s)
    }
  }
}
