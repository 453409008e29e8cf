package graft.sim

import graft.ops.Relational.perKeyTopK
import graft.sim.VectorOps._

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a seeded KMeans
  * coarse quantizer partitions the corpus into `cells`; each query probes
  * its `nprobe` nearest centroids and scores exact cosine ONLY inside
  * those cells — per query ~nprobe/cells of the corpus instead of all of
  * it. The data-adaptive counterpart of the sign-hyperplane LSH ANN
  * ([[VectorOps.withLshBucket]]).
  *
  * At 10⁹ vectors the cell id is a partitioning key: cluster the corpus
  * by cell and each probe prunes to its files; here the same shape runs
  * as an equi-join on cell with the (cells × dim)-double centroid table
  * broadcast. Seeded and deterministic; not SQL-expressible (KMeans), so
  * IVF queries are rows-only under the oracle gate with recall asserted
  * against the brute-force baseline in specs.
  */
object IvfAnn {

  /** Top-k cosine neighbors of each `queries` row among `corpus` rows.
    * Both frames: (`idCol`: numeric id, `embCol`: array<float>). `memoKey`
    * (e.g. the dataset dir) memoizes the fitted quantizer + featurized
    * corpus per session; empty = fit fresh. Output:
    * (q_id, rank, n_id, cell, cos). */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, embCol: String,
           k: Int, cells: Int, nprobe: Int, seed: Long,
           memoKey: String = ""): DataFrame = {
    val spark = corpus.sparkSession
    // The memo key must encode the full identity of the cached value
    // (SessionMemo contract): the caller's label alone would let two
    // different corpora over the same label share one quantizer, so the
    // corpus plan's semantic hash is folded in.
    def keyed(what: String): String =
      s"ivf-$what:$memoKey:${corpus.queryExecution.analyzed.semanticHash()}:$idCol:$embCol:k$cells:seed$seed"
    def featurized = corpus
      .select(col(idCol).as("n_id"), col(embCol).as("n_emb"))
      .withColumn("features", array_to_vector(col("n_emb")))
    val feats =
      if (memoKey.isEmpty) featurized
      else graft.util.SessionMemo.cached(spark, keyed("feats"))(featurized)
    // Degenerate corpora (ML fuzz arm): empty → no neighbors; a single
    // distinct vector → one trivial cell (spark.ml rejects both the
    // over-provisioned k AND k = 1, so SafeKMeans clamps and the
    // 0/1-distinct cases run model-free); otherwise cells clamps to the
    // distinct-vector count.
    def doFit = SafeKMeans.fit(feats, k = cells, seed = seed, maxIter = 10,
      featuresCol = "features", distinctCols = Seq("n_emb"))
    val (nDistinct, model) =
      if (memoKey.isEmpty) doFit
      else graft.util.SessionMemo(spark, keyed("model"))(doFit)
    if (nDistinct == 0L)
      return queries.select(col(idCol).as("q_id")).limit(0)
        .withColumn("rank", lit(1).cast("int"))
        .withColumn("n_id", lit(null).cast(
          corpus.schema(idCol).dataType))
        .withColumn("cell", lit(0))
        .withColumn("cos", lit(0.0))
    // The cell assignment + norms ARE the IVF index — memoized/persisted
    // so repeated query batches probe it instead of re-scanning the
    // corpus through model.transform every call.
    def assigned = (model match {
      case Some(m) => m.transform(feats)
        .select(col("n_id"), col("n_emb"), col("prediction").as("cell"))
      case None => // one distinct vector: everything is cell 0
        feats.select(col("n_id"), col("n_emb"), lit(0).as("cell"))
    }).withColumn("n_norm", l2norm(col("n_emb")))
    val corpusCells =
      if (memoKey.isEmpty) assigned
      else graft.util.SessionMemo.cached(spark, keyed("cells"))(assigned)
    // cells × dim doubles — broadcast by construction.
    val centroids = model match {
      case Some(m) =>
        import spark.implicits._
        m.clusterCenters.zipWithIndex.toSeq
          .map { case (v, i) => (i, v.toArray) }.toDF("cell", "centroid")
      case None => // the single distinct vector IS the centroid
        feats.select(col("n_emb")).distinct().limit(1)
          .select(lit(0).as("cell"),
            transform(col("n_emb"), x => x.cast("double")).as("centroid"))
    }
    // Rank centroids per query by the quantizer's own metric (euclidean).
    val dist2 = aggregate(
      zip_with(col("q_emb"), col("centroid"),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)
    val probes = queries
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2", dist2)
      .transform(df => perKeyTopK(df, "q_id", Seq(col("d2").asc, col("cell")), k = nprobe))
      .select(col("q_id"), col("q_emb"), col("cell"))
      .withColumn("q_norm", l2norm(col("q_emb")))
    val scored = probes.join(corpusCells, "cell")
      .withColumn("cos", cosine6(col("q_emb"), col("n_emb"), col("q_norm"), col("n_norm")))
    perKeyTopK(scored.select("q_id", "n_id", "cell", "cos"),
      "q_id", Seq(col("cos").desc, col("n_id")), k = k)
      .select("q_id", "rank", "n_id", "cell", "cos")
  }

  /** [[topK]] with a FIXED deterministic quantizer instead of KMeans —
    * the oracle-gateable IVF: cells are seeded by the `cells` corpus
    * vectors with the smallest keyed hash (`md5_63("ivfseed:" ++ id)`,
    * ties on id), i.e. exactly a seeded random-init round of KMeans
    * with zero Lloyd iterations. Everything downstream — nearest-cell
    * assignment, nprobe centroid ranking, in-cell exact cosine top-k —
    * is the SAME probe-join pipeline the KMeans variant (q37) runs, so
    * this puts the IVF *operator* under the exact hash gate while q37
    * keeps the data-adaptive centroids.
    *
    * Cross-engine determinism of the distance ranking: centroids rank
    * by `‖c‖² − 2·q·c` (the ‖q‖² term is constant per query), where
    * each dot product is the sequential left-fold both engines compute
    * bit-identically ([[VectorOps.dot]] / `list_dot_product`) and the
    * combining multiply/subtract are single IEEE ops — so the argmin
    * and nprobe sets match the oracle exactly, no rounding needed.
    * The seed-pick window runs over `cells` rows post-limit (driver-
    * bounded by construction); at 10⁹ vectors the seed scan is one
    * TakeOrdered over the hash. */
  def topKFixed(corpus: DataFrame, queries: DataFrame, idCol: String,
                embCol: String, k: Int, cells: Int, nprobe: Int): DataFrame = {
    val c0 = corpus.select(col(idCol).as("n_id"), col(embCol).as("n_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("h"), col("n_id"))
    val seeds = c0
      .withColumn("h", graft.functions.GraftFunctions.md5_63(
        concat(lit("ivfseed:"), col("n_id").cast("string"))))
      .orderBy(col("h"), col("n_id")).limit(cells)
      .withColumn("cell", (row_number().over(w) - 1).cast("int"))
      .select(col("cell"), col("n_emb").as("centroid"))
    def rel(emb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      dot(col("centroid"), col("centroid")) - lit(2.0) * dot(emb, col("centroid"))
    val assigned = c0.crossJoin(broadcast(seeds))
      .withColumn("rel", rel(col("n_emb")))
      .transform(df => perKeyTopK(df, "n_id",
        Seq(col("rel").asc, col("cell")), k = 1))
      .select(col("n_id"), col("n_emb"), col("cell"))
      .withColumn("n_norm", l2norm(col("n_emb")))
    val probes = queries
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .crossJoin(broadcast(seeds))
      .withColumn("rel", rel(col("q_emb")))
      .transform(df => perKeyTopK(df, "q_id",
        Seq(col("rel").asc, col("cell")), k = nprobe))
      .select(col("q_id"), col("q_emb"), col("cell"))
      .withColumn("q_norm", l2norm(col("q_emb")))
    val scored = probes.join(assigned, "cell")
      .withColumn("cos",
        cosine6(col("q_emb"), col("n_emb"), col("q_norm"), col("n_norm")))
    perKeyTopK(scored.select("q_id", "n_id", "cell", "cos"),
      "q_id", Seq(col("cos").desc, col("n_id")), k = k)
      .select("q_id", "rank", "n_id", "cell", "cos")
  }

  /** Incremental IVF index UPDATE (VERDICT r15 #5): a 100 TB corpus
    * APPENDS — it does not refit its quantizer per batch. The update
    * path assigns a delta batch to the EXISTING quantizer (the fixed
    * seeded centroids of [[topKFixed]], built from the BASE corpus
    * only — the index predates the append) and emits the per-cell
    * occupancy audit an index maintainer reads: base/delta/total
    * counts per cell (empty cells included — a cell the append never
    * touches is itself a signal), the delta-over-base growth, and each
    * cell's share of total load. `growth_pct` spiking on one cell, or
    * `load_share` drifting far from 1/cells, is exactly the
    * re-quantize trigger; until it fires, appends are one
    * broadcast-assign pass, no refit, no index rebuild.
    *
    * 100 TB posture: the quantizer is `cells` × dim doubles —
    * broadcast by construction; each side's assignment is the same
    * argmin-over-broadcast-centroids map [[topKFixed]] runs; the only
    * shuffles are the two per-cell count aggregates (map-side partial,
    * |cells| rows out) and the final dimension-sized joins. The
    * load-share window runs over |cells| rows, never the fact scan.
    * Cross-engine determinism: identical to [[topKFixed]] — the
    * centroid argmin ranks by the bit-identical sequential-fold dot
    * product, ties on cell id. */
  def incrementalUpdate(base: DataFrame, delta: DataFrame, idCol: String,
                        embCol: String, cells: Int): DataFrame = {
    val b0 = base.select(col(idCol).as("n_id"), col(embCol).as("n_emb"))
    val d0 = delta.select(col(idCol).as("n_id"), col(embCol).as("n_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("h"), col("n_id"))
    val seeds = b0
      .withColumn("h", graft.functions.GraftFunctions.md5_63(
        concat(lit("ivfseed:"), col("n_id").cast("string"))))
      .orderBy(col("h"), col("n_id")).limit(cells)
      .withColumn("cell", (row_number().over(w) - 1).cast("int"))
      .select(col("cell"), col("n_emb").as("centroid"))
    def assign(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(seeds))
      .withColumn("rel", dot(col("centroid"), col("centroid"))
        - lit(2.0) * dot(col("n_emb"), col("centroid")))
      .transform(d => perKeyTopK(d, "n_id",
        Seq(col("rel").asc, col("cell")), k = 1))
      .select(col("n_id"), col("cell"))
    val nb = assign(b0).groupBy("cell").agg(count(lit(1)).as("n_base"))
    val nd = assign(d0).groupBy("cell").agg(count(lit(1)).as("n_delta"))
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy() // |cells| rows — dimension-sized, never the scan
    seeds.select("cell")
      .join(nb, Seq("cell"), "left").join(nd, Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_delta"), lit(0L)).as("n_delta"))
      .withColumn("n_total", col("n_base") + col("n_delta"))
      .withColumn("growth_pct", graft.functions.GraftFunctions.qround(
        when(col("n_base") === 0L, lit(null))
          .otherwise(col("n_delta").cast("double") /
            col("n_base").cast("double")), 6))
      .withColumn("load_share", graft.functions.GraftFunctions.qround(
        when(sum(col("n_total")).over(tw) === 0L, lit(null))
          .otherwise(col("n_total").cast("double") /
            sum(col("n_total")).over(tw).cast("double")), 6))
  }
}
