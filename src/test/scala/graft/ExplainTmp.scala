package graft

object ExplainTmp {
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
