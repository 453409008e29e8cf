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
      "graft_minhash_agg", "graft_minhash_sig", "graft_jaro_winkler",
      "graft_topk_agg", "graft_kmv_agg", "graft_hll_agg", "graft_dot"))
    // the SQL surface of the newest expression
    val d = spark.sql(
      "SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F))")
      .head().getDouble(0)
    assert(d == 11.0)
    new org.apache.spark.sql.graft.GraftExtensions() // constructible for spark.sql.extensions
  }

  test("topk_agg equals the row_number-window top-k and partial-aggregates") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 8 input partitions force map-side partials + heap merges + the
    // serialize/deserialize path across the shuffle.
    val df = (1 to 5000)
      .map(i => (i % 37, (i * 2654435761L) % 1000, i))
      .toDF("key", "score", "id").repartition(8)
    val w = Window.partitionBy("key").orderBy(col("score"), col("id"))
    val expect = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("key", "score", "id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    val agg = df.groupBy("key").agg(graft.functions.GraftFunctions
      .topk_agg(struct(col("score"), col("id")), 3).as("t"))
    val got = agg.select(col("key"), explode(col("t")).as("s"))
      .select(col("key"), col("s.score"), col("s.id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expect)
    // the aggregate plans as a (partial-capable) ObjectHashAggregate,
    // not a Window sort
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && !plan.contains("Window"))
    // string elements via the SQL surface
    GraftExtensions.register(spark)
    Seq(("a", "zz"), ("a", "mm"), ("a", "aa"), ("b", "q"))
      .toDF("g", "s").createOrReplaceTempView("topk_strings")
    val rows = spark.sql(
      "SELECT g, graft_topk_agg(s, 2) FROM topk_strings GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
    assert(rows.toSeq == Seq("a" -> Seq("aa", "mm"), "b" -> Seq("q")))
    spark.catalog.dropTempView("topk_strings")
  }

  test("kmv_agg keeps the k smallest DISTINCT values across partitions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Heavy duplication (every value appears ~50×) across 8 partitions:
    // set semantics must dedupe inside partials AND across merges — a
    // multiset heap would fill its k slots with copies of the minimum.
    val df = (1 to 5000).map(i => ("g", (i % 100) * 7919L)).toDF("g", "h")
      .repartition(8)
    val got = df.groupBy("g")
      .agg(graft.functions.GraftFunctions.kmv_agg(col("h"), 16).as("mins"))
      .select(explode(col("mins"))).collect().map(_.getLong(0)).toSeq
    val expect = (0 until 100).map(_ * 7919L).sorted.take(16)
    assert(got == expect, s"kmv mins $got != $expect")
    // Fewer distincts than k → the sketch IS the distinct set.
    val small = Seq(5L, 5L, 3L, 3L, 9L).toDF("h").agg(
      graft.functions.GraftFunctions.kmv_agg(col("h"), 16).as("m"))
      .select(explode(col("m"))).collect().map(_.getLong(0)).toSeq
    assert(small == Seq(3L, 5L, 9L))
    // SQL surface.
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_kmv_agg(id * 13L, 4) FROM range(1000)")
      .collect().head.getSeq[Long](0)
    assert(viaSql == Seq(0L, 13L, 26L, 39L))
  }

  test("hll_agg: register semantics, merge across partitions, SQL surface") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // hand values: h = 3·2^55 + 4 → bucket 3, rest 4 (bin len 3, ρ 53);
    // h = 3·2^55 → bucket 3, rest 0 → ρ 56 wins the max.
    val b3a = 3L * (1L << 55) + 4L
    val b3b = 3L * (1L << 55)
    val regs = Seq(b3a, b3b, 5L).toDF("h")
      .agg(graft.functions.GraftFunctions.hll_agg(col("h")).as("r"))
      .collect().head.getSeq[Int](0)
    assert(regs.length == 256)
    assert(regs(3) == 56) // max(53, 56)
    assert(regs(0) == 56 - java.lang.Long.toBinaryString(5L).length)
    assert(regs.zipWithIndex.filter(_._1 != 0).map(_._2) == Seq(0, 3))
    // partition-split merge equals the single-pass build
    val ids = (1L to 4000L).map(i => i * 2654435761L & Long.MaxValue)
    val one = ids.toDF("h").coalesce(1)
      .agg(graft.functions.GraftFunctions.hll_agg(col("h"))).collect()
      .head.getSeq[Int](0)
    val eight = ids.toDF("h").repartition(8)
      .agg(graft.functions.GraftFunctions.hll_agg(col("h"))).collect()
      .head.getSeq[Int](0)
    assert(one == eight)
    // SQL surface — md5-spread hashes hit most buckets, and the SQL
    // path must equal the DataFrame-API build on the same input
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_hll_agg(graft_md5_63(CAST(id AS STRING))) " +
        "FROM range(4000)").collect().head.getSeq[Int](0)
    val viaDf = spark.range(4000)
      .agg(graft.functions.GraftFunctions.hll_agg(
        graft.functions.GraftFunctions.md5_63(col("id").cast("string"))))
      .collect().head.getSeq[Int](0)
    assert(viaSql == viaDf && viaSql.count(_ != 0) > 200)
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
