package graft.sim

import graft.functions.HashUtil
import graft.functions.GraftFunctions.{qdec, qround}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Vector similarity operators over `array<float>` embedding columns.
  *
  * All dot products run as sequential left-folds over the array in
  * double precision — deterministic regardless of partitioning (unlike
  * summing exploded rows), which is what makes cosine scores
  * DuckDB-oracle-comparable bit-for-bit.
  */
object VectorOps {

  /** Sequential-fold dot product of two float/double array columns, in
    * double — the codegen'd [[org.apache.spark.sql.graft.DotProduct]]
    * expression (the `aggregate(zip_with(...))` HOF form it replaces is
    * CodegenFallback and allocates a products array per row; the native
    * loop is operation-for-operation value-identical). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      org.apache.spark.sql.graft.DotProduct(
        org.apache.spark.sql.GraftShim.expression(a),
        org.apache.spark.sql.GraftShim.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 decimals (rounding absorbs any
    * cross-engine summation-order residue; ranking ties then break on
    * id). NULL when either vector has zero norm: DuckDB's x/0 is NULL
    * where Spark ANSI throws (fuzz gate, zero_vectors class) — and the
    * oracles' DESC rankings put NULL similarities last, matching
    * Spark's desc default, so rankings stay aligned. */
  def cosine6(a: Column, b: Column, normA: Column, normB: Column): Column =
    when(normA * normB === 0.0, lit(null))
      .otherwise(qround(dot(a, b) / (normA * normB), 6))

  /** Deterministic pseudo-random hyperplane weights for LSH: plane p,
    * dimension d → ((md5_63("p:d") mod 2001) − 1000) / 1000 ∈ [−1, 1].
    * Matches the DuckDB expression
    * `(((md5_number_lower(p || ':' || d) & MAX) % 2001) - 1000) / 1000.0`. */
  def hyperplane(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map { d =>
      ((HashUtil.md5Lower63(s"$p:$d") % 2001L) - 1000L).toDouble / 1000.0
    }

  /** Exact cosine top-k of each query among the corpus — the O(|Q|·N)
    * brute-force baseline shape (small query side broadcast; each pair
    * costs one in-row fold). `corpus`: (n_id, n_emb); `queries`:
    * (q_id, q_emb). Output: (q_id, rank, n_id, cos) — shared by q30 and
    * the ScaleProbe ANN baseline so both measure the same pipeline. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.withColumn("n_norm", l2norm(col("n_emb")))
    val q = queries.withColumn("q_norm", l2norm(col("q_emb")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos",
        cosine6(col("q_emb"), col("n_emb"), col("q_norm"), col("n_norm")))
    graft.ops.Relational.perKeyTopK(
      scored, "q_id", Seq(col("cos").desc, col("n_id")), k)
      .select("q_id", "rank", "n_id", "cos")
  }

  /** Johnson–Lindenstrauss-style random projection of an `array<float>`
    * embedding column onto `outDim` deterministic pseudo-random
    * directions: y_p = Σ_d x_d · w(p,d), with the weight matrix derived
    * from the engine-standard keyed md5 (`md5_63("rp:p:d")`, mapped to
    * [−1, 1] like [[hyperplane]] — the "rp:" tag keeps the matrix
    * disjoint from the LSH planes). The JL lemma is distribution-free in
    * the data, so a hash-derived matrix serves: pairwise distances are
    * preserved to 1±ε at outDim = O(log n / ε²), which is what makes
    * 64→16 a usable pre-filter for ANN and a 4× storage cut.
    *
    * Shape at scale: each output coordinate is an in-row sequential fold
    * against a LITERAL weight row (broadcast by the plan, zero shuffle,
    * codegen'd) — a pure map over the scan, like [[withLshBucket]]. The
    * alternative explode-join-reaggregate shape shuffles |rows|·dim
    * intermediates; never do that for a fixed small matrix.
    *
    * Output is row-exploded (id, p, y·6dp) for oracle comparison; the
    * serving form would keep the projected array in-row. */
  def randomProject(df: DataFrame, id: String, emb: String,
                    outDim: Int, dim: Int): DataFrame = {
    val projected = array((0 until outDim).map { p =>
      val w = typedLit((0 until dim).map { d =>
        ((HashUtil.md5Lower63(s"rp:$p:$d") % 2001L) - 1000L).toDouble / 1000.0
      })
      qround(dot(col(emb), w), 6)
    }: _*)
    df.select(col(id), posexplode(projected).as(Seq("p", "y")))
  }

  /** Sign-of-projection LSH bucket id from `planes` hyperplanes: bit p set
    * iff round(dot(v, plane_p), 6) > 0. Each projection is an in-row array
    * fold — no shuffle, no per-dimension explosion; the bucket computation
    * is a pure map over the scan.
    *
    * The projection is rounded to 6 decimals BEFORE the sign test (engine
    * determinism rule #3, ARCHITECTURE.md): a near-zero projection summed
    * in a different association order by another engine could otherwise
    * flip a bucket bit and break the cross-engine hash compare. The oracle
    * SQL applies the same `round(s, 6) > 0`. */
  def withLshBucket(df: DataFrame, emb: String, planes: Int, dim: Int,
                    out: String = "bucket"): DataFrame = {
    val bucket = (0 until planes).map { p =>
      val w = typedLit(hyperplane(p, dim))
      when(qround(dot(col(emb), w), 6) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    df.withColumn(out, bucket)
  }
}
