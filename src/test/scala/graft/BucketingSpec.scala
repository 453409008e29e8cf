package graft



import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located-join scale strategy (SURVEY §2.10 / prompt
  * "bucketing for co-located joins"). Writing both fact tables bucketed by
  * the join key lets the sort-merge join read pre-partitioned data with NO
  * exchange on either side — at 100 TB this removes the dominant shuffle
  * of repeated fact⋈fact joins.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("bucketed fact-fact join plans without a shuffle exchange") {
    // warehouse.dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) and are dropped at the end.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    graft.io.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.io.Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    // Both sides bucketed on the join key → no Exchange anywhere.
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join plan:\n$plan")

    // And the result matches the unbucketed join.
    val expected = graft.io.Tables.lineitem(spark, sf)
      .join(graft.io.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.count() == expected)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
