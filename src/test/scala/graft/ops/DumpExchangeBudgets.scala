package graft.ops

import graft.SparkEntry

/** Regenerates PlanGuardSpec's frozen exchange-count budget map:
  *
  *   sbt "Test/runMain graft.ops.DumpExchangeBudgets"
  *
  * Prints one `"query" -> n,` line per SparkEntry query (shuffle
  * Exchange nodes in the initial executed plan at sf0.001, the same
  * counting rule the spec enforces). Run after adding a query or
  * deliberately changing a plan shape, and paste the output into
  * PlanGuardSpec.exchangeBudget with a justification in the commit. */
object DumpExchangeBudgets {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkSpec.session
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(s, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      val n = PlanGuardSpec.shuffleExchanges(plan)
      println(s"""    "$name" -> $n,""")
      graft.HarnessUtil.releaseAll(s)
    }
    s.stop()
  }
}
