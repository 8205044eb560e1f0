package graft

/** One-off: print the physical join strategy of a named contract query at
  * an arbitrary data scale (`tools/run_main.sh graft.PlanPeek <query> <sfDir>`).
  * Complements PlanAudit (fixed sf) when diagnosing scale regime changes. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = args(1)
    val spark = Engine.session("local[8]")
    val df = SparkEntry.queries(name)(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    println(plan.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("TakeOrdered"))
      .mkString("\n"))
    spark.stop()
  }
}
