package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** K5/J5 replacement demo — the reference's TestSink keeps non-keyed
  * operator ListState inside the SINK and prints each value with the
  * running sum of everything its subtask has seen ("cur is:%d,sum is:%d",
  * reference: main/func/sink/TestSink.java:11-33). Spark sinks hold no
  * operator state (SURVEY §7.4(2)): the equivalent DAG moves the
  * accumulation one operator upstream — a stateful map on a constant key
  * emits (cur, sum) pairs and the sink stays stateless. This spec runs
  * that replacement and asserts it reproduces TestSink's printed trace,
  * including state surviving across micro-batches the way ListState
  * survives across invoke() calls. */
class OperatorStateDemoSpec extends SparkSpec {

  test("upstream running-sum aggregation reproduces TestSink's operator-state output") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Int)] // (arrival seq, value)
    def handle(key: Int, it: Iterator[(Long, Int)],
               st: GroupState[Long]): Iterator[(Int, Long)] = {
      var sum = st.getOption.getOrElse(0L)
      val out = it.toSeq.sortBy(_._1).map { case (_, v) => sum += v; (v, sum) }
      st.update(sum)
      out.iterator
    }
    // constant key = the reference's parallelism-1 sink subtask
    val ds = input.toDS().groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(handle)
    val q = ds.toDF("cur", "sum").writeStream.format("memory")
      .queryName("opstate").outputMode("append").start()
    try {
      input.addData((1L, 1), (2L, 2), (3L, 3))
      q.processAllAvailable()
      input.addData((4L, 4), (5L, 5))
      q.processAllAvailable()
      val got = s.table("opstate").as[(Int, Long)].collect().sortBy(_._2)
      assert(got.toSeq == Seq((1, 1L), (2, 3L), (3, 6L), (4, 10L), (5, 15L)))
    } finally q.stop()
  }
}
