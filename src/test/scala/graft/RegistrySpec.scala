package graft

import graft.queries._

import org.scalatest.funsuite.AnyFunSuite

/** Contract guard for the driver surface. */
class RegistrySpec extends AnyFunSuite {

  test("no query-name collisions across families") {
    val families = Seq(
      RelationalQueries.queries, TextQueries.queries,
      SimilarityQueries.queries, TwinsQueries.queries,
      RecQueries.queries, MediaQueries.queries,
      StreamingQueries.queries)
    assert(Registry.all.size == families.map(_.size).sum,
      "a family key collided and silently dropped a query")
  }

  test("every oracle key has a query; names are the oracle contract") {
    val missing = Registry.oracles.keySet.diff(Registry.all.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry is a registered query with rows at sf0.001") {
    assert(SparkEntry.entry(GraftSpark.spark).count() > 0)
  }
}
