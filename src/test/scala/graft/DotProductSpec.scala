package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd DotProduct expression must be operation-for-operation
  * value-identical to the `aggregate(zip_with(...))` HOF form it
  * replaced (same float→double widening, same left-to-right IEEE
  * accumulation) — bit-equality, not approximate — and mirror its null
  * semantics exactly. */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def hofDot(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the HOF fold on float arrays (incl. negatives, " +
      "denormal-ish magnitudes)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2e3f - 1e3f),
        Array.fill(64)((rnd.nextFloat() - 0.5f) * 1e-3f))
    }
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      graft.sim.VectorOps.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof"))
    assert(cmp.filter(col("native") =!= col("hof") ||
      col("native").isNull =!= col("hof").isNull).count() == 0)
  }

  test("bit-identical on double arrays and float x double mixes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 100)
      .map(_ => (Array.fill(16)(rnd.nextDouble() * 100 - 50),
        Array.fill(16)(rnd.nextFloat())))
      .toDF("d", "f")
    val cmp = df.select(
      graft.sim.VectorOps.dot(col("d"), col("f")).as("native"),
      hofDot(col("d"), col("f")).as("hof"))
    // null-safe inequality: a plain =!= is NULL (row dropped) when one
    // side regresses to NULL, which would pass the test silently
    assert(cmp.filter(!(col("native") <=> col("hof"))).count() == 0)
  }

  test("null semantics mirror zip_with/aggregate: null array, null " +
      "element, and length mismatch all yield NULL") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq[Option[Float]](Some(1f), Some(2f))),
        Some(Seq[Option[Float]](Some(3f), Some(4f)))),   // clean → 11.0
      (None, Some(Seq[Option[Float]](Some(1f)))),        // null array
      (Some(Seq[Option[Float]](Some(1f), None)),
        Some(Seq[Option[Float]](Some(1f), Some(1f)))),   // null element
      (Some(Seq[Option[Float]](Some(1f))),
        Some(Seq[Option[Float]](Some(1f), Some(2f))))    // length mismatch
    ).toDF("a", "b")
    val got = df.select(
      graft.sim.VectorOps.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    assert(!got(0).isNullAt(0) && got(0).getDouble(0) == 11.0)
    (0 until 4).foreach { i =>
      assert(got(i).isNullAt(0) == got(i).isNullAt(1),
        s"row $i null-mismatch vs HOF")
    }
  }

  test("the expression stays inside whole-stage codegen (the HOF form " +
      "was CodegenFallback)") {
    // real columnar input (a literal Seq constant-folds to a
    // LocalTableScan; a transform()-built input is itself a fallback HOF
    // and would break the span around the expression under test)
    val df = graft.io.Tables.embeddings(spark, GraftSpark.sf)
      .select(graft.sim.VectorOps.dot(col("embedding"), col("embedding"))
        .as("d"))
      .filter(col("d") > 0)
    val p = df.queryExecution.executedPlan.toString
    // executedPlan.toString marks codegen'd operators with "*(n) " — the
    // operator evaluating graft_dot must carry it (the HOF form ran in a
    // plain interpreted Project)
    assert(p.linesIterator.exists(l =>
      l.contains("graft_dot") && l.contains("*(")), p)
  }
}
