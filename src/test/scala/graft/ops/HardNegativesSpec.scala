package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** hard_negatives: every mined pair crosses a label boundary, ranks are
  * dense per anchor, and each anchor's negatives are its TRUE most
  * similar cross-label vectors (checked against a brute-force Scala
  * recompute). */
class HardNegativesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("label boundary, dense ranks, and brute-force agreement") {
    val s = spark
    import s.implicits._
    val rows = Similarity.hardNegatives(s, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toVector
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, al, _, nl, _, _) => al != nl },
      "every negative crosses a label boundary")
    rows.groupBy(_._1).foreach { case (a, rs) =>
      assert(rs.map(_._6).sorted == (1L to rs.length).toVector,
        s"anchor $a: ranks not dense")
    }

    // brute force: quantized dot against all different-label vectors
    val emb = graft.Tables.embeddings(s, dir)
      .select(col("vec_id"), expr(Similarity.quantExpr).as("qv"),
        col("label").cast("long").as("label"))
      .as[(Long, Seq[Long], Long)].collect()
    val anchors = emb.filter(_._1 < 10)
    anchors.foreach { case (aid, av, al) =>
      val want = emb.filter(_._3 != al)
        .map { case (nid, nv, _) =>
          (av.zip(nv).map { case (x, y) => x * y }.sum, nid) }
        .sortBy { case (dot, nid) => (-dot, nid) }
        .take(5).map(_._2).toVector
      val got = rows.filter(_._1 == aid).sortBy(_._6).map(_._3).toVector
      assert(got == want, s"anchor $aid")
    }
  }
}
