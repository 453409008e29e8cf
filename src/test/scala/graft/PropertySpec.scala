package graft

import graft.ops.Relational._
import graft.text.TextAnalysis._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Property-style invariants over seeded random fixtures (SURVEY §5.2):
  * the statistical / structural guarantees each operator must satisfy for
  * any input, not just the hand-computed micro-fixtures. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("minhash estimate is an unbiased Jaccard estimator (binomial CI)") {
    // Two sets with known J, 64 perms: estimate within 4 sigma of truth.
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val common = (1 to 40).map(i => s"c$i")
      val aOnly = (1 to 20).map(i => s"a$trial$i")
      val bOnly = (1 to 20).map(i => s"b$trial$i")
      val trueJ = 40.0 / 80.0
      val df = (common ++ aOnly).map(("A", _)) ++ (common ++ bOnly).map(("B", _))
      val sets = df.toDF("id", "token")
      val numPerm = 64
      val sigs = minhashSignatures(sets, "id", numPerm)
      val est = estimatedJaccard(
        Seq(("A", "B")).toDF("id_a", "id_b"), sigs, "id", numPerm)
        .head().getAs[Double]("est_jaccard")
      val sigma = math.sqrt(trueJ * (1 - trueJ) / numPerm)
      assert(math.abs(est - trueJ) < 4 * sigma,
        s"trial $trial: est $est vs true $trueJ")
    }
  }

  test("chronoSplit partitions every row, labels in [0,5), ~60/20/20") {
    val rnd = new Random(11)
    val rows = for (u <- 1 to 50; i <- 1 to (5 + rnd.nextInt(40)))
      yield (u, rnd.nextLong(1000000), (u * 1000 + i).toLong)
    val df = rows.toDF("user_id", "ts", "event_id")
    val s = chronoSplit(df, "user_id", "ts", "event_id")
    assert(s.count() == rows.size)
    assert(s.filter(col("split") < 0 || col("split") > 4).count() == 0)
    // every user with >= 5 rows hits all five splits
    val nSplits = s.groupBy("user_id").agg(countDistinct("split").as("k"))
    assert(nSplits.filter(col("k") =!= 5).count() == 0)
    // per-user proportions: split<=2 rows = ceil-ish 60% (within 1 row of 3n/5)
    val prop = s.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      sum(when(col("split") <= 2, 1).otherwise(0)).as("tr"))
    assert(prop.filter(abs(col("tr") - col("n") * 3 / 5) > 1).count() == 0)
  }

  test("removeSeen output never intersects seen (random fixtures)") {
    val rnd = new Random(13)
    val cand = (1 to 500).map(_ => (rnd.nextInt(20), rnd.nextInt(30))).distinct
    val seen = (1 to 300).map(_ => (rnd.nextInt(20), rnd.nextInt(30))).distinct
    val out = removeSeen(cand.toDF("u", "i"), seen.toDF("u", "i"), Seq("u", "i"))
      .as[(Int, Int)].collect().toSet
    assert(out.intersect(seen.toSet).isEmpty)
    assert(out == cand.toSet.diff(seen.toSet))
  }

  test("biasedTopK == sorted prefix of full scoring") {
    val rnd = new Random(17)
    val rows = (1 to 2000).map(_ => (rnd.nextInt(50), rnd.nextInt(100) / 10.0))
    val df = rows.toDF("k", "v")
    val top = biasedTopK(df, "k", "v", bias = 10.0, k = 5)
      .select("k").as[Int].collect().toSeq
    val full = rows.groupBy(_._1).map { case (k, vs) =>
      val dec = vs.map(v => BigDecimal(v._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
      (k, dec.toDouble / (vs.size + 10.0))
    }.toSeq.sortBy { case (k, s) => (-s, k) }.map(_._1).take(5)
    assert(top == full)
  }

  test("SortedIntersectCount == Set intersection size (random arrays)") {
    val rnd = new Random(19)
    val fixtures = (1 to 200).map { _ =>
      val a = (1 to rnd.nextInt(50)).map(_ => rnd.nextInt(100)).distinct.sorted
      val b = (1 to rnd.nextInt(50)).map(_ => rnd.nextInt(100)).distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size.toLong)
    }
    val got = fixtures.toDF("a", "b", "want")
      .withColumn("got", graft.functions.GraftFunctions.sorted_intersect_count(col("a"), col("b")))
      .filter(col("got") =!= col("want")).count()
    assert(got == 0)
  }

  test("SortedIntersectCount: long and string element types (random arrays)") {
    val rnd = new Random(31)
    val longs = (1 to 100).map { _ =>
      val a = (1 to rnd.nextInt(40)).map(_ => rnd.nextLong() % 50L).distinct.sorted
      val b = (1 to rnd.nextInt(40)).map(_ => rnd.nextLong() % 50L).distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size.toLong)
    }
    assert(longs.toDF("a", "b", "want")
      .withColumn("got", graft.functions.GraftFunctions.sorted_intersect_count(col("a"), col("b")))
      .filter(col("got") =!= col("want")).count() == 0)
    val strings = (1 to 100).map { _ =>
      val a = (1 to rnd.nextInt(40)).map(_ => s"t${rnd.nextInt(60)}:${rnd.nextInt(4)}").distinct.sorted
      val b = (1 to rnd.nextInt(40)).map(_ => s"t${rnd.nextInt(60)}:${rnd.nextInt(4)}").distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size.toLong)
    }
    assert(strings.toDF("a", "b", "want")
      .withColumn("got", graft.functions.GraftFunctions.sorted_intersect_count(col("a"), col("b")))
      .filter(col("got") =!= col("want")).count() == 0)
  }

  test("simhash is token-order invariant") {
    val doc = "x y z w q r s t u v"
    val shuffled = new Random(23).shuffle(doc.split(" ").toSeq).mkString(" ")
    val df = Seq((1L, doc), (2L, shuffled)).toDF("doc_id", "text")
    val fp = simhash(df, "doc_id", "text").orderBy("doc_id")
      .select("simhash").as[Long].collect()
    assert(fp(0) == fp(1))
  }

  test("lsh candidates are a superset of high-jaccard pairs (planted)") {
    // J = 1.0 pairs always collide in every band.
    val docs = (1 to 20).map(i => (i.toLong, s"tok${i % 5} a b c d e f g"))
    val sets = docs.toDF("doc_id", "text")
    val tok = tokens(sets, "doc_id", "text", distinct = true)
    val sigs = minhashSignatures(tok, "doc_id", 16)
    val cands = lshCandidatePairs(sigs, "doc_id", 4)
      .as[(Long, Long)].collect().toSet
    // identical docs (same i%5) must all be candidates
    for (a <- 1 to 20; b <- (a + 1) to 20 if a % 5 == b % 5)
      assert(cands.contains((a.toLong, b.toLong)), s"missing ($a,$b)")
  }
}
