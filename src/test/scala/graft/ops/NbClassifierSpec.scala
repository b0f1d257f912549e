package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** nb_classifier: the confusion matrix must cover exactly the held-out
  * fold, and the map-literal argmax must agree with a from-scratch
  * Naive Bayes recompute in plain Scala. */
class NbClassifierSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def h60(s: String): Long =
    graft.functions.Hash60Impl.compute(UTF8String.fromString(s))

  test("matrix covers the held-out fold; argmax equals a scratch recompute") {
    val s = spark
    import s.implicits._
    val matrix = TextAnalysis.nbClassifier(s, dir)
      .as[(String, String, Long)].collect().toVector
    assert(matrix.nonEmpty)

    val docs = graft.Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), expr(Prims.wordsExpr).as("ws"))
      .as[(Long, String, Seq[String])].collect()
    val (test, train) = docs.partition(d => h60(s"nbsplit_${d._1}") % 5 == 0)
    val testScored = test.filter(_._3.nonEmpty)
    assert(matrix.map(_._3).sum == testScored.length,
      "confusion matrix must count every scored held-out doc exactly once")

    // scratch NB with the operator's formulas
    val trainToks = train.flatMap(d => d._3.map(w => (d._2, w)))
    val vocab = trainToks.groupBy(_._2).view.mapValues(_.size).toVector
      .sortBy { case (w, c) => (-c, w) }.take(20).map(_._1)
    val classes = train.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tokc = trainToks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cw = trainToks.filter(t => vocab.contains(t._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def mnats(x: Double) = math.round(math.log(x) * 1e6)
    val nTrain = classes.values.sum
    val langs = classes.keys.toVector.sorted
    def predict(ws: Seq[String]): String =
      langs.map { c =>
        val denom = (tokc.getOrElse(c, 0L) + 21).toDouble
        val score = mnats(classes(c).toDouble / nTrain) + ws.map { w =>
          if (vocab.contains(w)) mnats((cw.getOrElse((c, w), 0L) + 1).toDouble / denom)
          else mnats(1.0 / denom)
        }.sum
        (-score, c)
      }.min._2
    val wantMatrix = testScored.groupBy(d => (d._2, predict(d._3)))
      .view.mapValues(_.size.toLong).toVector
      .map { case ((t, p), n) => (t, p, n) }.sortBy(x => (x._1, x._2))
    assert(matrix == wantMatrix)
  }
}
