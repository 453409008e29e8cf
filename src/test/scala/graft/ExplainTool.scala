package graft

/** Dev aid: print the executed plan of one or more registered queries
  * (`Test/runMain graft.ExplainTool [sfDir] q01_pricing_summary …` — an
  * absolute-path first arg selects the fixture, default sf0.001; plans
  * are statistics-driven, so a red reproduced at sf0.01 must be
  * explained at sf0.01 or the captured join strategy can differ from
  * the failing run's). Used when iterating on plan shape; the pinned
  * assertions live in PlanShapeSpec. */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val spark = GraftSpark.spark
    val (sf, names) =
      if (args.headOption.exists(_.startsWith("/"))) (args.head, args.tail)
      else (GraftSpark.sf, args)
    for (q <- names) {
      println(s"===== $q =====")
      println(graft.queries.Registry.all(q)(spark, sf)
        .queryExecution.executedPlan.toString)
    }
  }
}
