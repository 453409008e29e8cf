package graft

import graft.functions.HashUtil

import org.apache.spark.sql.graft.GraftExtensions
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the custom expressions (SURVEY §2.11):
  * the same Catalyst nodes the Column API uses must be callable from
  * `spark.sql`, both via runtime registration and via the
  * `spark.sql.extensions` injector class. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("graft functions register into a live session and match the Column API") {
    GraftExtensions.register(spark)
    val md5 = spark.sql("SELECT graft_md5_63('hello')").head().getLong(0)
    assert(md5 == HashUtil.md5Lower63("hello"))
    val ic = spark.sql(
      "SELECT graft_sorted_intersect_count(array(1, 3, 5, 7), array(3, 4, 5))")
      .head().getLong(0)
    assert(ic == 2L)
    val sic = spark.sql(
      "SELECT graft_sorted_intersect_count(array('a', 'c'), array('b', 'c'))")
      .head().getLong(0)
    assert(sic == 1L)
    // aggregate: one-pass MinHash over a grouped token column
    import spark.implicits._
    Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("id", "token")
      .createOrReplaceTempView("ext_tokens")
    val sigs = spark.sql(
      "SELECT id, graft_minhash_agg(token, 4) AS sig FROM ext_tokens GROUP BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).size == 4 && sigs(2L).size == 4)
    // group 2's tokens ⊂ group 1's ⇒ element-wise min can only decrease
    sigs(1L).zip(sigs(2L)).foreach { case (a, b) => assert(a <= b) }
    spark.catalog.dropTempView("ext_tokens")
  }

  test("the SparkSessionExtensions injector exposes the same builders") {
    // The injector and runtime registration share GraftExtensions.functions;
    // assert the injector class instantiates and lists all four.
    val names = GraftExtensions.functions.map(_._1).toSet
    assert(names == Set("graft_md5_63", "graft_sorted_intersect_count",
      "graft_minhash_agg", "graft_minhash_sig", "graft_jaro_winkler"))
    new org.apache.spark.sql.graft.GraftExtensions() // constructible for spark.sql.extensions
  }

  test("jaro_winkler matches DuckDB's jaro_winkler_similarity semantics") {
    // Expected values captured from DuckDB (the oracle engine) — the
    // textbook pairs plus the edge cases that pin the variant: integer
    // floor half-transpositions, window-0 behavior, boost threshold,
    // both-empty = 0.
    val cases = Seq(
      ("MARTHA", "MARHTA") -> 0.9611111111111111,
      ("DIXON", "DICKSONX") -> 0.8133333333333332,
      ("JELLYFISH", "SMELLYFISH") -> 0.8962962962962964,
      ("abc", "abc") -> 1.0,
      ("", "abc") -> 0.0,
      ("", "") -> 0.0,
      ("ab", "ba") -> 0.0,
      ("CRATE", "TRACE") -> 0.7333333333333334,
      ("DwAyNE", "DuANE") -> 0.8400000000000001,
      ("apple inc", "apple incorporated") -> 0.9,
      ("abcdef", "bcadef") -> 0.9444444444444445, // 3 mismatches, t = 1
      ("abxxxx", "abyyyy") -> 0.5555555555555555) // prefix but no boost <= 0.7
    cases.foreach { case ((a, b), want) =>
      val got = graft.functions.StringSim.jaroWinkler(a, b)
      assert(math.abs(got - want) < 1e-12, s"($a, $b): $got != $want")
    }
    // SQL surface runs the same codegen'd expression
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA')").head().getDouble(0)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-12)
  }
}
