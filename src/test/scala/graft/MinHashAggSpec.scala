package graft

import graft.text.TextAnalysis._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class MinHashAggSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("fast signatures: deterministic, layout-independent, set-semantics") {
    val rnd = new Random(41)
    val rows = (1 to 2000).map(_ => (rnd.nextInt(20).toLong, s"t${rnd.nextInt(200)}"))
    val tok = rows.toDF("id", "token")
    val a = minhashSignaturesFast(tok, "id", 32)
      .orderBy("id", "p").as[(Long, Int, Long)].collect().toSeq
    val b = minhashSignaturesFast(tok.repartition(13), "id", 32)
      .orderBy("id", "p").as[(Long, Int, Long)].collect().toSeq
    assert(a == b)
    // duplicate tokens don't change the signature (min is idempotent)
    val c = minhashSignaturesFast(tok.union(tok), "id", 32)
      .orderBy("id", "p").as[(Long, Int, Long)].collect().toSeq
    assert(a == c)
    assert(a.forall(_._3 >= 0L))
  }

  test("fast estimator tracks true Jaccard within binomial CI") {
    val common = (1 to 40).map(i => s"c$i")
    val sets = (common ++ (1 to 20).map(i => s"a$i")).map(("A", _)) ++
      (common ++ (1 to 20).map(i => s"b$i")).map(("B", _))
    val numPerm = 64
    val sigs = minhashSignaturesFast(sets.toDF("id", "token"), "id", numPerm)
    val est = estimatedJaccard(Seq(("A", "B")).toDF("id_a", "id_b"),
      sigs, "id", numPerm).head().getAs[Double]("est_jaccard")
    val trueJ = 0.5
    val sigma = math.sqrt(trueJ * (1 - trueJ) / numPerm)
    assert(math.abs(est - trueJ) < 4 * sigma, s"est $est")
  }

  test("fast signatures drive the same LSH contract (identical sets collide)") {
    val docs = (1 to 10).map(i => (i.toLong, s"tok${i % 2} x y z w"))
    val tok = tokens(docs.toDF("doc_id", "text"), "doc_id", "text", distinct = true)
    val sigs = minhashSignaturesFast(tok, "doc_id", 16)
    val cands = lshCandidatePairs(sigs, "doc_id", 4)
      .as[(Long, Long)].collect().toSet
    for (a <- 1 to 10; b <- (a + 1) to 10 if a % 2 == b % 2)
      assert(cands.contains((a.toLong, b.toLong)))
  }
}
