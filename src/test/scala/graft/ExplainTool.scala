package graft

/** Dev aid: print the executed plan of one or more registered queries at
  * sf0.001 (`Test/runMain graft.ExplainTool q01_pricing_summary …`).
  * Used when iterating on plan shape; the pinned assertions live in
  * PlanShapeSpec. */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = GraftSpark.spark
    val sf = GraftSpark.sf
    for (q <- args) {
      println(s"===== $q =====")
      println(graft.queries.Registry.all(q)(spark, sf)
        .queryExecution.executedPlan.toString)
    }
  }
}
