package graft

import graft.segment.Twins

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe (dev tool, not part of the driver contract): inflates the
  * sf0.1 events table N× by user-id translation (same item universe,
  * N×1500 users, N×100k events) and times the twin-pair strategies, to
  * measure — not just assert — where the dense all-pairs path gives way
  * to LSH as user count grows. Results recorded in ARCHITECTURE.md.
  *
  * Usage: runMain graft.ScaleProbe [factor] [probes]
  * `probes` (default "lsh"): comma-list of lsh, dense, ann. The dense
  * all-pairs probe is opt-in because it is deliberately quadratic
  * (~10 min at 10×; its 240× growth is already recorded in
  * ARCHITECTURE.md); `ann` times brute-force vs IVF top-5 on a
  * factor×-replicated embedding corpus.
  */
object ScaleProbe {

  /** Shared shuffle-write-byte meter for the byte-measuring probes
    * (graph, alsgrid — one definition, so a fix to the quiesce logic
    * can't silently miss a copy). The listener bus is ASYNC:
    * stage-completed events can still be in flight when an action
    * returns, which would leak one phase's bytes into the next delta —
    * [[quiesce]] waits until the counter stops moving (bounded) before
    * reading it. */
  private final class ShuffleMeter(spark: SparkSession) {
    private val bytes = new java.util.concurrent.atomic.AtomicLong
    private val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        bytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    def quiesce(): Long = {
      var prev = -1L; var cur = bytes.get; var spins = 0
      while (cur != prev && spins < 50) {
        prev = cur; Thread.sleep(200); cur = bytes.get; spins += 1
      }
      cur
    }
    def phase(name: String)(f: => Long): Unit = {
      val b0 = quiesce()
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $name%-28s $wall%8.1f s" +
        f"   rows=$n   shuffleMB=${(quiesce() - b0) / 1e6}%9.1f")
    }
    def remove(): Unit = spark.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val probes = args.lift(1).getOrElse("lsh").split(",").toSet
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.io.Tables.ratings(spark, "/root/testdata/sf0.1")
    val nUsers = 1500L
    val inflated = (0 until factor).map { i =>
      base.withColumn("user_id", col("user_id") + lit(i * nUsers))
        .withColumn("event_id", col("event_id") + lit(i * 10000000L))
    }.reduce(_ unionByName _)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    println(s"PROBE inflated: ${inflated.count()} events, " +
      s"${factor * nUsers} users, factor $factor")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s   rows=$n")
    }

    if (probes("lsh"))
      time("lsh_top100")(
        Twins.topTwinsLsh(inflated, numPerm = 32, rowsPerBand = 4, k = 100,
          bucketWidth = 100.0).count())

    if (probes("cc")) {
      // Connected components at factor× the cluster count: 100k·factor
      // star-shaped 5-vertex clusters (the near-dup graph shape — many
      // small dense components). The claim under test: ROUNDS track
      // component diameter (constant here), so wall-clock grows linearly
      // with edge count, not with graph size × rounds.
      val k = factor * 100000L
      val edges = spark.range(k).select(
        (col("id") * 5).as("id_a"),
        explode(array((1 to 4).map(j => col("id") * 5 + j): _*)).as("id_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      edges.count()
      time(s"cc_${5 * k}_vertices")(
        graft.text.Dedup.connectedComponents(edges, "id_a", "id_b")
          .select("label").distinct().count())
      edges.unpersist(blocking = false)
    }
    if (probes("dense"))
      time("exact_dense_top100")(
        Twins.topTwinsExact(inflated, k = 100).count())

    if (probes("exactcap")) {
      // The df-capped exact token twins (q45's registered form,
      // maxDfPermille=333). At factor ≥ ~4 the strategy selector leaves
      // the dense broadcast (n > 2000, m ≪ 4s fails) for the sparse
      // co-occurrence join, whose pair volume is Σ_token df² — the
      // quadratic tail the cap bounds. Report the capped vs uncapped
      // pair volume analytically (one aggregate each, no quadratic job)
      // and time the capped query end-to-end.
      val toks = Twins.ratingBucketTokensLong(inflated, 100.0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val nUsersTot = toks.select("user_id").distinct().count()
      val cap = math.max(2L, nUsersTot * 333L / 1000L)
      val df = toks.groupBy("token").agg(count(lit(1)).as("df"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val volAll = df.agg(sum(col("df") * col("df"))).head().getLong(0)
      val volCap = df.filter(col("df") <= cap)
        .agg(coalesce(sum(col("df") * col("df")), lit(0L))).head().getLong(0)
      println(s"PROBE exactcap pair-volume: uncapped=$volAll capped=$volCap " +
        f"(cap=df<=$cap, ${100.0 * volCap / math.max(1L, volAll)}%.1f%% kept)")
      time(s"exact_tokens_capped_${factor}x")(
        Twins.topTwinsExactTokens(inflated, k = 100, bucketWidth = 100.0,
          maxDfPermille = 333).count())
      toks.unpersist(blocking = false)
      df.unpersist(blocking = false)
    }

    if (probes("kmv")) {
      // KMV sketch vs exact count-distinct at factor× the user universe
      // (inflated ratings: factor×1500 distinct users, factor×100k rows,
      // 5 event-type-ish groups via item_id % 5). The claim under test:
      // the sketch pass stays a plain hash aggregate whose STATE is 64
      // longs per group regardless of cardinality, while exact distinct
      // plans an extra expand/dedup exchange over the full key set —
      // the gap is the price of exactness, and it widens with scale.
      val keyed = inflated.select((col("item_id") % 5).as("g"),
        graft.functions.GraftFunctions.md5_63(
          concat(lit("kmv:"), col("user_id").cast("string"))).as("h"),
        col("user_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      keyed.count()
      time(s"kmv_sketch_${factor}x")(
        keyed.groupBy("g")
          .agg(graft.functions.GraftFunctions.kmv_agg(col("h"), 64))
          .count())
      time(s"exact_distinct_${factor}x")(
        keyed.groupBy("g")
          .agg(countDistinct(col("user_id"))).count())
      keyed.unpersist(blocking = false)
    }

    if (probes("triangles")) {
      // factor×100k disjoint K6 cliques (15 edges / 20 triangles each):
      // constant degree, so oriented wedge volume — and wall-clock —
      // must grow LINEARLY with edge count. Then the same graph plus one
      // 100k-degree hub: degree orientation points every hub edge INTO
      // the hub, so its out-degree stays 0 and the hub's ~250k extra
      // triangles (one per clique edge among its neighbours) are found
      // from the LOW-degree endpoints' wedges — the probe should cost
      // about the same, not explode. Unoriented, the hub alone emits
      // C(100k, 2) ≈ 5·10⁹ wedges: the straggler the orientation
      // exists to kill.
      val k = factor * 100000L
      val cliquePairs = for (a <- 0 until 6; b <- (a + 1) until 6)
        yield (a, b)
      val cliques = spark.range(k).select(explode(array(cliquePairs.map {
          case (a, b) => struct((col("id") * 6 + a).as("src"),
            (col("id") * 6 + b).as("dst"))
        }: _*)).as("e"))
        .select("e.src", "e.dst")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      cliques.count()
      time(s"triangles_${15 * k}_edges")(
        graft.graph.Triangles.triangleCounts(cliques)
          .agg(sum("n_triangles")).collect()(0).getLong(0) / 3)
      val hub = -1L
      val withHub = cliques.unionByName(
        spark.range(100000L).select(lit(hub).as("src"), col("id").as("dst")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      withHub.count()
      time(s"triangles_hub100k")(
        graft.graph.Triangles.triangleCounts(withHub)
          .agg(sum("n_triangles")).collect()(0).getLong(0) / 3)
      cliques.unpersist(blocking = false)
      withHub.unpersist(blocking = false)
    }

    if (probes("interval")) {
      // Point-in-interval join at factor× the interval count: one
      // overlapping 14-day window per distinct order week, replicated
      // factor× with a small phase shift. The claim under test: the
      // bucketed equi-join's cost tracks |points| + |matches| (output-
      // linear), while the naive BNLJ evaluates |points|·|intervals|
      // predicates — the gap should WIDEN by ~factor.
      val o = graft.io.Tables.orders(spark, "/root/testdata/sf0.1")
        .select(col("o_orderkey"),
          expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
            .as("day"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val nPts = o.count()
      val weeks = o.select(expr("day div 7").as("wk")).distinct()
      val ivl = (0 until factor).map { i =>
        weeks.select((col("wk") * lit(factor.toLong) + i).as("ivl_id"),
          (col("wk") * 7 - 3 + (i % 7)).as("d0"),
          (col("wk") * 7 + 10 + (i % 7)).as("d1"))
      }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val nIvl = ivl.count()
      println(s"PROBE interval: $nPts points x $nIvl intervals")
      time(s"interval_bucketed")(graft.ops.Intervals
        .pointInIntervalJoin(o, "day", ivl, "d0", "d1", bucketDays = 8)
        .count())
      time(s"interval_bnlj")(o.crossJoin(ivl)
        .filter(col("day") >= col("d0") && col("day") <= col("d1"))
        .count())
      o.unpersist(blocking = false)
      ivl.unpersist(blocking = false)
    }

    if (probes("tfidf")) {
      // TF-IDF cosine pairs at factor× the corpus. Each copy's tokens get
      // a copy-index prefix, so copy vocabularies are DISJOINT: the df
      // distribution per copy stays that of the base corpus (exact
      // replication would instead multiply every df by factor — a
      // different, near-dup-explosion experiment). The claim under test:
      // with a stable df profile the inverted-index join's work — pair
      // rows = Σ_shingle df·(df−1)/2 — grows linearly with corpus size,
      // because the maxDf cap keeps per-shingle fan-out constant.
      val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.1")
      val corpus = (0 until factor).map { i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text",
            regexp_replace(col("text"), "(^| )", "$1" + i + "_"))
      }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      println(s"PROBE tfidf corpus: ${corpus.count()} docs")
      time("tfidf_pairs_top100")(
        graft.text.TextAnalysis.tfidfCosinePairs(
          corpus, "doc_id", "text", n = 3, maxDf = 20, k = 100).count())
      corpus.unpersist(blocking = false)
    }

    if (probes("bloom")) {
      // Decontamination at factor× the training corpus against a FIXED
      // benchmark (the sf0.1 bench slice): the exact path feeds every
      // corpus 8-gram into the confirming join; the Bloom path's join
      // input stays ~(true hits + fpp·corpus). Replicated copies get
      // disjoint vocabularies (the tfidf probe's trick), so planted
      // contamination stays that of copy 0 and the added copies
      // contribute only Bloom-FP noise — the 100 TB shape, where the
      // corpus dwarfs the contaminated sliver.
      import graft.text.TextAnalysis
      val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.1")
      val bench = docs.filter(col("doc_id") % 17 === 0)
      val train0 = docs.filter(col("doc_id") % 17 =!= 0)
      val corpus = (0 until factor).map { i =>
        if (i == 0) train0
        else train0.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text", regexp_replace(col("text"), "(^| )", "$1" + i + "_"))
      }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      println(s"PROBE bloom corpus: ${corpus.count()} docs")
      time("contam_exact")(
        TextAnalysis.contaminationReport(corpus, bench, "doc_id", "text", n = 8)
          .count())
      time("contam_bloom")(
        TextAnalysis.contaminationReportBloom(corpus, bench, "doc_id", "text", n = 8)
          .count())
      // Prefilter selectivity: corpus 8-grams in total vs surviving the
      // Bloom band-pass (true hits + false positives).
      val t = TextAnalysis.shingles(corpus, "doc_id", "text", n = 8)
      val b = TextAnalysis.shingles(bench, "doc_id", "text", n = 8)
        .select("shingle").distinct()
      val total = t.count()
      val pass = t.filter(TextAnalysis.bloomMightContainShingle(b)).count()
      println(f"PROBE bloom selectivity: $pass%d / $total%d corpus 8-grams pass (${100.0 * pass / total}%.2f%%)")
      corpus.unpersist(blocking = false)
    }

    if (probes("ann")) {
      // ANN strategies at factor× the corpus: brute force scales O(N) per
      // query; IVF pays a one-time quantizer build then probes
      // ~nprobe/cells of N. Copies get a deterministic per-copy
      // perturbation so they are near- but not exact duplicates.
      import graft.sim.VectorOps._
      val dim = 64
      val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.1")
      val corpus = (0 until factor).map { i =>
        val pert = typedLit(hyperplane(i + 1, dim))
        emb.filter(col("vec_id") >= 10)
          .withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
          .withColumn("embedding",
            zip_with(col("embedding"), pert,
              (x, w) => x.cast("double") + w * lit(if (i == 0) 0.0 else 0.05)))
      }.reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"),
          transform(col("embedding"), x => x.cast("double")).as("q_emb"))
      println(s"PROBE ann corpus: ${corpus.count()} vectors")
      // Same pipeline as q30 (shared helper) so the recorded crossover
      // compares the shipped brute-force shape, not a probe-local clone.
      time("ann_bruteforce_top5")(
        graft.sim.VectorOps.bruteForceTopK(
          corpus.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
          queries, k = 5).count())
      // Grow the codebook with the corpus (k ~ N), capped: past ~256
      // cells the local quantizer fit dominates the probe.
      val cells = math.min(16 * factor, 256)
      time("ann_ivf_build+query")(
        graft.sim.IvfAnn.topK(corpus, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, cells = cells, nprobe = 2,
          seed = 7L, memoKey = "scaleprobe").count())
      time("ann_ivf_query_amortized")(
        graft.sim.IvfAnn.topK(corpus, emb.filter(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, cells = cells, nprobe = 2,
          seed = 7L, memoKey = "scaleprobe").count())
    }

    if (probes("snm")) {
      // Sorted-neighborhood blocking at factor×100k synthetic names: the
      // claim under test is candidate volume EXACTLY ≤ 2·w·|vocab| —
      // linear where the naive pair space is |vocab|²/2 — and wall-clock
      // tracking it. Names are md5-hex-derived (realistic high-entropy
      // sort keys, ~uniform first-char blocks → 16 balanced windows).
      val n = factor * 100000L
      val names = spark.range(n)
        .select(md5(concat(lit("snm:"), col("id"))).as("name"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      names.count()
      time(s"snm_${n}_names")(
        graft.text.Fuzzy.sortedNeighborhoodPairs(names, w = 3).count())
      names.unpersist(blocking = false)
    }

    if (probes("ewma")) {
      // Typed-iterator throughput: factor×10k keys × 100 days streamed
      // through groupByKey.flatMapGroups. Per-key work is constant, so
      // wall-clock should grow linearly with keys — the op's parallelism
      // unit — with no skew (uniform group sizes by construction).
      val keys = factor * 10000L
      val pts = spark.range(keys * 100).select(
        (col("id") % keys).cast("string").as("k"),
        (col("id") / keys).cast("long").as("d"),
        (col("id") % 97).cast("double").as("x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      pts.count()
      time(s"ewma_${keys}_keys")(
        graft.ops.TimeSeries.ewma(pts, "k", "d", "x", 0.2).count())
      pts.unpersist(blocking = false)
    }

    if (probes("topk")) {
      // Per-user top-20 unseen-style ranking at factor× users: the
      // row_number window (Spark 4 already inserts a Partial
      // WindowGroupLimit) vs the bounded-heap TopKAgg. The claim: both
      // shuffle O(users·k), the aggregate saves the two per-partition
      // sorts — measure, don't guess, since WindowGroupLimit closed
      // most of the historical gap.
      val cand = inflated.select("user_id", "item_id").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      cand.count()
      time(s"topk_window_${factor}x")(
        graft.ops.Relational.perKeyTopK(cand, "user_id",
          Seq(col("item_id")), 20).count())
      time(s"topk_agg_${factor}x")(
        graft.ops.Relational.perKeyTopKAggAsc(cand, Seq("user_id"),
          "item_id", 20).count())
      cand.unpersist(blocking = false)
    }
    if (probes("bfs")) {
      // Frontier BFS on the factor×-user bipartite rating graph from
      // 50 seed items: per-hop cost = one join + one anti-join; the
      // frontier saturates by hop 2 on this dense graph, so the claim
      // is rounds × linear-in-edges, not path-count growth.
      val pair = inflated.select(concat(lit("u"), col("user_id")).as("src"),
        concat(lit("i"), col("item_id")).as("dst")).distinct()
      val edges = pair.union(pair.select(col("dst").as("src"),
        col("src").as("dst")))
      val seeds = inflated.select(col("item_id")).distinct().limit(50)
        .select(concat(lit("i"), col("item_id")).as("node"))
      time(s"bfs3_${factor}x")(
        graft.graph.Bfs.hops(edges, seeds, maxHops = 3).count())
    }
    if (probes("knn")) {
      // q244's brute-force kNN scoring at factor× the embedding corpus:
      // pairs grow with factor², so wall-clock must too — that curve IS
      // the argument for the LSH swap, whose bucketed candidate volume
      // (also timed) tracks collisions, not |corpus|². Uses the q244
      // plan shape exactly: skinny projection before any exchange, dot
      // fold hoisted out of the rounding guard, corpus repartitioned.
      import graft.sim.VectorOps.{dot, l2norm}
      val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.1")
      val infE = (0 until factor).map(i =>
          emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      println(s"PROBE knn corpus: ${infE.count()} vectors")
      val a = infE.select(col("vec_id").as("a_id"),
          col("embedding").as("a_emb"))
        .withColumn("a_norm", l2norm(col("a_emb")))
      val c = infE.select(col("vec_id").as("n_id"),
          col("embedding").as("n_emb"))
        .withColumn("n_norm", l2norm(col("n_emb")))
      time(s"knn_brute_${factor}x")(
        c.repartition(32).crossJoin(broadcast(a))
          .filter(col("n_id") =!= col("a_id"))
          .withColumn("dotp", dot(col("a_emb"), col("n_emb")))
          .withColumn("cos", graft.functions.GraftFunctions.qround(
            col("dotp") / (col("a_norm") * col("n_norm")), 6))
          .select("a_id", "n_id", "cos")
          .groupBy("a_id").agg(max(col("cos"))).count())
      time(s"knn_lsh_cands_${factor}x") {
        val b = graft.sim.VectorOps.withLshBucket(infE, "embedding",
          planes = 8, dim = 64, out = "bucket")
        val l = b.select(col("vec_id").as("a_id"), col("bucket"))
        val r = b.select(col("vec_id").as("n_id"), col("bucket"))
        l.join(r, Seq("bucket")).filter(col("a_id") < col("n_id")).count()
      }
      infE.unpersist(blocking = false)
    }

    if (probes("wjac")) {
      // q267's weighted-Jaccard co-occurrence volume at factor× docs:
      // the pair stream is Σ_shingle df² — report capped vs uncapped
      // volume analytically (no quadratic job) and time the capped
      // query end-to-end. Same claim as exactcap: the df-cap bounds the
      // posting lists, so growth tracks the capped volume.
      val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.1")
      val infD = (0 until factor).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      println(s"PROBE wjac corpus: ${infD.count()} docs")
      val sh = graft.text.TextAnalysis
        .shinglesAll(infD, "doc_id", "text", 3)
        .groupBy("doc_id", "shingle").agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val volAll = df.agg(sum(col("df") * col("df"))).head().getLong(0)
      val volCap = df.filter(col("df") <= 100)
        .agg(coalesce(sum(col("df") * col("df")), lit(0L)))
        .head().getLong(0)
      println(s"PROBE wjac pair-volume: uncapped=$volAll capped=$volCap " +
        f"(df<=100, ${100.0 * volCap / math.max(1L, volAll)}%.1f%% kept)")
      val kept = sh.join(df.filter(col("df") <= 100).select("shingle"),
        Seq("shingle"))
      time(s"wjac_capped_${factor}x")(
        kept.select(col("doc_id").as("id_a"), col("shingle"),
            col("c").as("ca"))
          .join(kept.select(col("doc_id").as("id_b"), col("shingle"),
            col("c").as("cb")), Seq("shingle"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b")
          .agg(sum(least(col("ca"), col("cb")))).count())
      sh.unpersist(blocking = false)
      df.unpersist(blocking = false)
      infD.unpersist(blocking = false)
    }

    if (probes("boiler")) {
      // q26's df-cap justified by measurement (VERDICT r9 #2): a corpus
      // where EVERY document carries the same 20-token boilerplate
      // header (licence text, template chrome — the real-world shape
      // that breaks exact-Jaccard dedup). Each of the ~18 header
      // shingles has df = n, so the uncapped co-occurrence join's pair
      // volume gains 18·n² — quadratic in corpus size — while the
      // capped (df ≤ 100) volume stays that of the natural text. Report
      // both volumes analytically (one aggregate each, no quadratic
      // job), then time capped vs uncapped shingleJaccardPairs
      // end-to-end at factor× docs.
      val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.1")
      val boiler = "permission is hereby granted free of charge to any " +
        "person obtaining a copy of this software and associated " +
        "documentation files to deal without restriction"
      val infD = (0 until factor).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
        .withColumn("text", concat(lit(boiler + " "), col("text")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val nDocs = infD.count()
      println(s"PROBE boiler corpus: $nDocs docs, every one sharing a " +
        "20-token header")
      val sh = graft.text.TextAnalysis.shingles(infD, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val volAll = df.agg(sum(col("df") * col("df"))).head().getLong(0)
      val volCap = df.filter(col("df") <= 100)
        .agg(coalesce(sum(col("df") * col("df")), lit(0L))).head().getLong(0)
      println(s"PROBE boiler pair-volume: uncapped=$volAll capped=$volCap " +
        f"(df<=100, ${100.0 * volCap / math.max(1L, volAll)}%.3f%% kept)")
      time(s"boiler_capped_${factor}x")(
        graft.text.TextAnalysis.shingleJaccardPairs(sh, "doc_id",
          minJaccard = 0.4).count())
      if (probes("boileruncapped"))
        time(s"boiler_UNCAPPED_${factor}x")(
          graft.text.TextAnalysis.shingleJaccardPairs(sh, "doc_id",
            minJaccard = 0.4, maxDf = Long.MaxValue).count())
      sh.unpersist(blocking = false)
      df.unpersist(blocking = false)
      infD.unpersist(blocking = false)
    }

    if (probes("decon")) {
      // Decontamination trilogy at factor× corpus with the BENCHMARK
      // side fixed (VERDICT r9 #5) — the production shape: benchmarks
      // are small and static, the training corpus grows. Claims under
      // test, as curves rather than one-point assertions:
      // q82 (exact 8-gram) — the benchmark n-gram side broadcasts and
      // the corpus side never shuffles on content, so wall-clock tracks
      // corpus token volume linearly; q94 (Bloom band-pass) — the
      // prefilter is a pure map over corpus tokens (linear), with the
      // exact confirming join bounded by true-hit volume (fixed here);
      // fuzzy (q323's LSH leg, rebuilt un-memoized) — signature build is
      // linear partial aggregation and candidate volume tracks band
      // buckets, not corpus pairs. doc_id translation is a multiple of
      // 17 so replicas keep their corpus-side mod-17 class (the trilogy
      // splits train/bench on doc_id % 17).
      val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.1")
      val bench = docs.filter(col("doc_id") % 17 === 0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      println(s"PROBE decon benchmark: ${bench.count()} docs (fixed)")
      val corpus = (0 until factor).map(i =>
          docs.filter(col("doc_id") % 17 =!= 0)
            .withColumn("doc_id", col("doc_id") + lit(i * 170000L)))
        .reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      println(s"PROBE decon corpus: ${corpus.count()} docs at ${factor}x")
      time(s"decon_exact8_${factor}x")(
        graft.text.TextAnalysis.contaminationReport(
          corpus, bench, "doc_id", "text", n = 8).count())
      time(s"decon_bloom8_${factor}x")(
        graft.text.TextAnalysis.contaminationReportBloom(
          corpus, bench, "doc_id", "text", n = 8).count())
      time(s"decon_fuzzy_${factor}x") {
        val all = corpus.unionByName(bench)
        val sigs = graft.text.TextAnalysis.minhashSignatures(
          graft.text.TextAnalysis.shingles(all, "doc_id", "text", 3)
            .withColumnRenamed("shingle", "token"), "doc_id", numPerm = 16)
        val cands = graft.text.TextAnalysis.lshCandidatePairs(
          sigs, "doc_id", rowsPerBand = 4)
        graft.text.TextAnalysis.estimatedJaccard(cands, sigs, "doc_id",
            numPerm = 16)
          .filter(col("est_jaccard") >= 0.5)
          .filter((col("id_a") % 17 === 0) =!= (col("id_b") % 17 === 0))
          .count()
      }
      corpus.unpersist(blocking = false)
      bench.unpersist(blocking = false)
    }

    if (probes("xent")) {
      // The r10 corpus-LM family at factor× documents (doc_id
      // translation; every replica repeats the same text, so the token
      // vocabulary is FIXED while occurrences grow — the worst case for
      // the vocab join's hot keys). Claims under test: q331's unigram
      // cross-entropy is one token-keyed partial aggregation (vocab)
      // plus one occurrence⋈vocab shuffle — wall tracks token volume
      // linearly with a fixed-size build side; q332's duplicate-gram
      // mass hashes 8-grams to 63-bit keys BEFORE the shuffle, so bytes
      // shuffled track gram COUNT, not gram text width, and the
      // per-gram groups stay |sources|-bounded after the first
      // aggregate whatever the replication.
      val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.1")
      // Replica id offset derived from the data, not hardcoded (ADVICE
      // r10): a fixture with doc_ids ≥ the old fixed 1e6 stride would
      // silently collide replica ids and deflate the per-doc aggregate
      // this probe measures.
      val stride = docs.agg(max(col("doc_id"))).head.getLong(0) + 1L
      val corpus = (0 until factor).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i * stride)))
        .reduce(_ unionByName _)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      println(s"PROBE xent corpus: ${corpus.count()} docs at ${factor}x")
      time(s"xent_unigram_${factor}x") {
        val tok = corpus.select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("token"))
        val totalF = tok.agg(count(lit(1)).as("t_occ"))
        val vocab = tok.groupBy("token").agg(count(lit(1)).as("c_occ"))
          .crossJoin(broadcast(totalF))
          .select(col("token"), graft.functions.GraftFunctions.qdec(
            -log(col("c_occ").cast("double") / col("t_occ").cast("double")),
            28, 9).as("lnp_q"))
        tok.join(vocab, "token")
          .groupBy(col("doc_id"), col("source"))
          .agg(count(lit(1)).as("n_tok"), sum(col("lnp_q")).as("h_sum"))
          .groupBy("source").agg(count(lit(1)).as("n_docs"))
          .count()
      }
      time(s"dupmass8_${factor}x") {
        import graft.functions.GraftFunctions.md5_63
        val grams = corpus
          .withColumn("toks", split(col("text"), " "))
          .filter(size(col("toks")) >= 8)
          .select(col("source"), explode(expr(
            "transform(sequence(1, size(toks) - 7), i -> concat_ws(' ', slice(toks, i, 8)))"))
            .as("gram"))
          .select(col("source"), md5_63(col("gram")).as("g"))
        val perCell = grams.groupBy("g", "source")
          .agg(count(lit(1)).as("n_occ"))
        perCell.withColumn("corpus_occ", sum(col("n_occ")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("g")))
          .groupBy("source")
          .agg(sum(col("n_occ")).as("total_occ"),
            sum(when(col("corpus_occ") > 1, col("n_occ")).otherwise(0L))
              .as("dup_occ"))
          .count()
      }
      corpus.unpersist(blocking = false)
    }

    if (probes("mmr")) {
      // q152's rerank shape at factor× users (r9: lands the cents-long
      // poolCosines rewrite with a CURVE, not a one-point claim). The
      // similarity side's pair stream is |pool|²-bounded (pool = 50)
      // whatever the user count — its cost should track the pool-item
      // fact volume (linear in factor) with a flat pair stage; the
      // greedy rerank is per-user flatMapGroups and must scale linearly
      // in users.
      val pool = inflated.groupBy("item_id")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("item_id")).limit(50)
        .select("item_id")
      time(s"mmr_poolcosines_${factor}x")(
        graft.rec.Diversify.poolCosines(inflated, pool).count())
      val sims = graft.rec.Diversify.poolCosines(inflated, pool)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      sims.count()
      val cands = inflated.select("user_id").distinct()
        .crossJoin(broadcast(pool.withColumn("rel",
          lit(1.0) / (col("item_id").cast("double") + 1.0))))
        .select(col("user_id"), col("item_id"), col("rel"))
      time(s"mmr_rerank_${factor}x")(
        graft.rec.Diversify.mmrRerank(cands, sims,
          relWeight = 0.7, divWeight = 0.3, k = 10).count())
      sims.unpersist(blocking = false)
    }

    if (probes("sketchroll")) {
      // q287's rolling-HLL shape at factor× events: the register build
      // is a grouped max over (type, day, bucket) — map-side partial,
      // linear in events — while the 7-anchor window explode touches
      // ONLY the register table (≤ types × days × 256 rows, independent
      // of event volume). The claim: total wall tracks the scan, and
      // the explode+merge stage's input row count does not grow with
      // factor. Uses the ratings-shaped inflated frame's (user, ts)
      // stream re-keyed to 5 synthetic types.
      val two55 = 36028797018963968L
      val d = inflated
        .select((col("item_id") % 5).cast("string").as("event_type"),
          expr("ts div 86400000000000").as("day"), col("user_id"))
        .distinct()
      val reg = d
        .select(col("event_type"), col("day"),
          graft.functions.GraftFunctions.md5_63(
            concat(lit("hll:"), col("user_id").cast("string"))).as("h"))
        .withColumn("bucket", expr(s"h div $two55"))
        .withColumn("rest", expr(s"h % $two55"))
        .withColumn("rho", when(col("rest") === 0L, lit(56))
          .otherwise(lit(56) - length(bin(col("rest")))))
        .groupBy("event_type", "day", "bucket")
        .agg(max(col("rho")).as("m"))
      val regN = reg.count()
      time(s"hll_roll_${factor}x (registers=$regN)")(
        reg.select(col("event_type"), col("bucket"), col("m"),
            explode(sequence(col("day"), col("day") + 6)).as("day"))
          .groupBy("event_type", "day", "bucket")
          .agg(max(col("m")).as("m"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n_present")).count())
    }

    if (probes("layout")) {
      // q298's layout claim measured: the orders⋈lineitem roll-up on
      // plain parquet (shuffle sort-merge join) vs pre-bucketed warehouse
      // tables (zero join-key exchange), broadcast disabled so join
      // strategy is the only variable. The bucket WRITE is timed
      // separately — it IS the shuffle, paid once; the claim is
      // write ≈ one shuffle-join's exchange cost, and every subsequent
      // bucketed join saves that exchange in full.
      val sfDir = "/root/testdata/sf0.1"
      val li0 = graft.io.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_extendedprice")
      val or0 = graft.io.Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_orderpriority")
      val off = 100000000L
      val liI = (0 until factor).map(i =>
          li0.withColumn("l_orderkey", col("l_orderkey") + lit(i * off)))
        .reduce(_ unionByName _)
      val orI = (0 until factor).map(i =>
          or0.withColumn("o_orderkey", col("o_orderkey") + lit(i * off)))
        .reduce(_ unionByName _)
      // land both as plain parquet so BOTH joins read files, not lineage
      val d = java.nio.file.Files.createTempDirectory("graft-layout")
      sys.addShutdownHook(graft.util.TempDirs.deleteRecursively(d))
      liI.write.parquet(s"$d/li"); orI.write.parquet(s"$d/ord")
      val liP = spark.read.parquet(s"$d/li")
      val orP = spark.read.parquet(s"$d/ord")
      println(s"PROBE layout: ${liP.count()} lineitems x ${orP.count()} orders")
      val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        def rollup(l: org.apache.spark.sql.DataFrame,
                   o: org.apache.spark.sql.DataFrame): Long =
          l.join(o, col("l_orderkey") === col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5))))
            .count()
        time(s"layout_shuffle_join_${factor}x")(rollup(liP, orP))
        graft.io.Tables.scrubManagedTables(spark,
          Seq("li_probe", "ord_probe"))
        time(s"layout_bucket_write_${factor}x") {
          liP.write.bucketBy(32, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable("li_probe")
          orP.write.bucketBy(32, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable("ord_probe")
          2L
        }
        time(s"layout_bucketed_join_${factor}x")(
          rollup(spark.table("li_probe"), spark.table("ord_probe")))
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    }

    if (probes("kw")) {
      // q319's Kruskal–Wallis rank machinery at factor× rows with a
      // measure whose DISTINCT-value count grows with the data (each
      // user contributes distinct offsets): group counts and rank sums
      // are hash-partitioned exact-integer aggregates; the ONLY ordered
      // walk is the ECDF over distinct values. The claim under test:
      // wall tracks the distinct-value count. Honest caveat this probe
      // quantifies: at ~10⁹ distinct values the single ordered walk
      // needs the q125-style range-bucketed prefix-sum rewrite — same
      // output, two passes, no single-partition sort.
      import org.apache.spark.sql.expressions.Window
      val ev = inflated.select((col("item_id") % 5).cast("string").as("g"),
        (col("rating") + col("user_id").cast("double") / 1e7).as("v"))
      val vals = ev.groupBy("g", "v").agg(count(lit(1)).as("c_gv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val nDistinct = vals.select("v").distinct().count()
      time(s"kw_ranks_${factor}x (distinct=$nDistinct)") {
        val perVal = vals.groupBy("v").agg(sum("c_gv").as("c_v"))
          .withColumn("f_below",
            coalesce(sum("c_v").over(Window.orderBy("v")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        vals.join(perVal, Seq("v"))
          .withColumn("rank2", lit(2L) * col("f_below") + col("c_v") + 1L)
          .groupBy("g")
          .agg(sum(col("c_gv") * col("rank2")).as("r2_g")).count()
      }
      vals.unpersist(blocking = false)
    }

    if (probes("graph")) {
      // Iterative-graph family (VERDICT r10 #5): q49/q200/q215
      // (PageRank), q175 (k-core), q159 (BFS), q217 (LPA) all ride
      // SharedFrames.coPurchaseEdges. Inflate the sf0.1 edge list
      // factor× by node-id translation (disjoint copies: edge count
      // scales exactly, degree distribution and diameter unchanged) and
      // measure wall-clock AND shuffle-write bytes per phase via a
      // listener. Claims under test: each iteration's shuffle volume is
      // O(|E|) (degree-annotated edges ⋈ rank + contribution aggregate),
      // so bytes scale linearly with factor and iterations; the
      // checkpointEvery=5 cadence keeps the 10-iteration wall ≈
      // (10/3)× the 3-iteration wall — no lineage blow-up.
      val meter = new ShuffleMeter(spark)
      val baseE = graft.queries.SharedFrames
        .coPurchaseEdges(spark, "/root/testdata/sf0.1")
      val infl = (0 until factor).map(i =>
          baseE.select(concat(col("src"), lit("#"), lit(i)).as("src"),
            concat(col("dst"), lit("#"), lit(i)).as("dst")))
        .reduce(_ unionByName _).localCheckpoint()
      println(s"PROBE graph edges: ${infl.count()} at ${factor}x")
      def gphase(name: String)(f: => Long): Unit = meter.phase(name)(f)
      gphase(s"pagerank3_${factor}x")(
        graft.graph.PageRank.pageRank(infl, iters = 3, damping = 0.85).count())
      gphase(s"pagerank10_${factor}x")(
        graft.graph.PageRank.pageRank(infl, iters = 10, damping = 0.85).count())
      gphase(s"kcore_k3r4_${factor}x")(
        graft.graph.KCore.peelCounts(spark, infl, k = 3, rounds = 4).count())
      meter.remove()
    }

    if (probes("hubcap")) {
      // q208's HubDegreeCap on a hub-injected fixture (VERDICT r10 #2):
      // the sf0.1 customer→supplier bipartite edges plus ONE synthetic
      // hub customer wired to factor×1000 distinct suppliers. The claim
      // measured: the capped wedge's exploded pair volume (and its
      // wall-clock) is INVARIANT to hub size — the hub is excluded at
      // the size filter, while the arithmetic counterfactual (what the
      // uncapped plan would materialize inside the hub's single row) is
      // C(factor·1000, 2) structs, the single-task OOM the cap removes.
      val cap = graft.queries.AnalyticsQueries.HubDegreeCap
      val sfd = "/root/testdata/sf0.1"
      val li = graft.io.Tables.lineitem(spark, sfd)
        .select("l_orderkey", "l_suppkey")
      val o = graft.io.Tables.orders(spark, sfd)
        .select("o_orderkey", "o_custkey")
      val baseEdges = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("c"),
          concat(lit("s"), col("l_suppkey")).as("s")).distinct()
      val hubDeg = factor * 1000L
      val hub = spark.range(hubDeg)
        .select(lit(-1L).as("c"), concat(lit("hub_s"), col("id")).as("s"))
      val edges = baseEdges.unionByName(hub)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      println(s"PROBE hubcap edges: ${edges.count()} (hub degree $hubDeg)")
      val sets = edges.groupBy("c")
        .agg(sort_array(collect_set(col("s"))).as("ss"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val suppressed = sets.filter(size(col("ss")) > cap)
        .agg(coalesce(sum(expr(
          "cast(size(ss) as bigint) * (size(ss) - 1) div 2")), lit(0L)))
        .head.getLong(0)
      time(s"hubcap_wedge_${factor}x") {
        val vol = sets.filter(size(col("ss")).between(2, cap))
          .select(explode(expr(
            """flatten(transform(ss, (x, i) ->
              |  transform(slice(ss, i + 2, size(ss)),
              |            y -> struct(x AS s1, y AS s2))))""".stripMargin))
            .as("p")).count()
        println(s"PROBE hubcap: cap=$cap cappedPairs=$vol " +
          s"suppressedCounterfactualPairs=$suppressed")
        vol
      }
      sets.unpersist(); edges.unpersist()
    }

    if (probes("alsgrid")) {
      // q55's ALS-grid cost decomposition at factor× the rating volume
      // (VERDICT r11 #6; user-id translation — user count grows, item
      // universe fixed, the MovieLens growth shape). Claims under test:
      // (a) the shared memoized train prep is paid ONCE — the first fit
      //     carries it, every later fit and the whole 16-cell grid hit
      //     the memo, so grid wall ≈ Σ of 16 per-fit costs, not
      //     16×(prep + fit);
      // (b) per-fit shuffle bytes are linear in ratings (blocked ALS
      //     exchanges the rating blocks each half-iteration) — compare
      //     the printed fit shuffleMB across 3×/10× runs;
      // (c) per-fit cost grows with rank (the normal-equation solve is
      //     O(rank²·nnz + rank³·blocks)) — the r8/r40 single-cell
      //     readings band the grid's 16 mixed-rank cells.
      // Single-cell probes use (rank, reg) pairs OUTSIDE the 4×4 grid so
      // the grid timing below gets 16 FRESH fits (same dataset memo key
      // → shared prep, distinct combo memo keys → no fit reuse).
      val meter = new ShuffleMeter(spark)
      def aphase(name: String)(f: => Long): Unit = meter.phase(name)(f)
      val t = graft.rec.Popularity.withSplits(inflated)
      val train = graft.rec.Popularity.train(t)
      val valid = graft.rec.Popularity.validation(t)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      println(s"PROBE alsgrid: ${train.count()} train ratings at ${factor}x" +
        s", ${valid.count()} validation")
      val key = s"alsgrid-probe-$factor"
      def mapAt20(recs: org.apache.spark.sql.DataFrame,
                  v: org.apache.spark.sql.DataFrame): Double =
        graft.metrics.RankingRelational
          .metrics(spark, recs.select("user_id", "item_id", "rank"), v, k = 20)
          .select("map_at_k").head().getDouble(0)
      aphase(s"als_fit_r8_incl_prep_${factor}x")(
        graft.rec.AlsRec.fit(train, rank = 8, regParam = 0.2,
          cacheKey = key).userFactors.count())
      aphase(s"als_fit_r8_prepped_${factor}x")(
        graft.rec.AlsRec.fit(train, rank = 8, regParam = 0.3,
          cacheKey = key).userFactors.count())
      aphase(s"als_fit_r40_prepped_${factor}x")(
        graft.rec.AlsRec.fit(train, rank = 40, regParam = 0.2,
          cacheKey = key).userFactors.count())
      aphase(s"als_grid16_${factor}x")(
        graft.rec.AlsRec.gridSearch(train, valid,
          ranks = Seq(5, 10, 20, 50), regs = Seq(0.01, 0.05, 0.1, 1.0),
          topN = 20, maxIter = 10, evalFn = mapAt20, cacheKey = key).size)
      meter.remove()
      valid.unpersist(blocking = false)
    }

    if (probes("mmrceiling")) {
      // q152's DESIGNED broadcast ceiling, measured at the boundary
      // (VERDICT r11 #7): Diversify.MaxSimPairsDefault ≈ a 2000-item
      // pool's symmetric pair count. A synthetic exactly-boundary-sized
      // similarity frame (2000·1999 = 3,998,000 pairs) is collected and
      // broadcast by mmrRerank — the two readings split the cost into
      // (a) the driver collect that the guard's limit(max+1) bounds, and
      // (b) the full rerank including broadcast ship + per-user greedy.
      // The guard's loud failure ONE row past the cap is pinned in
      // DiversifySpec (no 4M-row job needed there; the mechanism is
      // cap-parameterized). factor is ignored: the ceiling is a design
      // constant, which is the point.
      val pool = 2000
      val items = spark.range(pool).select(col("id").cast("int").as("ia"))
      val sims = items
        .crossJoin(spark.range(pool).select(col("id").cast("int").as("ib")))
        .filter(col("ia") =!= col("ib"))
        .withColumn("sim",
          ((col("ia") * 31 + col("ib")) % 997).cast("double") / 997.0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val nPairs = sims.count()
      require(nPairs <= graft.rec.Diversify.MaxSimPairsDefault,
        s"probe must sit AT the boundary, not past it: $nPairs")
      println(s"PROBE mmrceiling: $nPairs sim pairs (cap " +
        s"${graft.rec.Diversify.MaxSimPairsDefault}), pool=$pool")
      time("mmr_simcollect_4M")(
        sims.select(col("ia"), col("ib"), col("sim")).collect().length.toLong)
      val cands = spark.range(2000).select(col("id").as("user_id"))
        .crossJoin(spark.range(50).select(col("id").cast("int").as("item_id")))
        .withColumn("rel",
          ((col("user_id") * 7 + col("item_id")) % 101).cast("double") / 101.0)
      time("mmr_rerank_pool2000")(
        graft.rec.Diversify.mmrRerank(cands, sims,
          relWeight = 0.7, divWeight = 0.3, k = 10).count())
      sims.unpersist(blocking = false)
    }

    if (probes("bootstrap")) {
      // Poisson bootstrap at factor× rows, B=200 replicas: the explode
      // feeds a map-side-combined groupBy(replica), so each task emits
      // ≤ B partial rows whatever the input size. The claim: wall-clock
      // grows linearly with rows (pure per-row hash+CDF compute), the
      // shuffle stays B rows — resampling with NO scale cliff.
      time(s"bootstrap_${factor}x")(
        graft.ops.Bootstrap.meanCI(inflated,
          col("event_id"), col("rating"), replicas = 200, seed = 1L)
          .count())
    }

    if (probes("streamstate")) {
      // Streaming state-scale probe (VERDICT r12 item 5): the stateful
      // family (q64 watermark dedup, q93 session windows) has
      // restart/exactly-once specs but no measured state-growth curve.
      // Claim under test: state-store rows/bytes are bounded by the
      // WATERMARK HORIZON's key population — NOT by total events ever
      // streamed — so an unbounded stream runs in bounded memory.
      //   session_window (keyed by user_id): state ∝ active users
      //     (keys 1×/3×/10× → ~linear growth; 10× events per key at
      //     fixed keys → flat);
      //   dropDuplicatesWithinWatermark (keyed by event_id): state ∝
      //     horizon × event RATE (rate 1×/3×/10× → ~linear), and FLAT
      //     in stream LENGTH (span 10× at fixed rate → same state).
      // Metrics come from the engine's own state-store instrumentation
      // (StreamingQueryProgress.stateOperators: numRowsTotal,
      // memoryUsedBytes), read at PEAK — after the final data batch,
      // with the watermark trailing 2 h behind max event time — because
      // the bound under test is the steady-state high-water mark, not
      // the post-expiry floor.
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.OutputMode
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val hourNs = 3600L * 1000000000L

      // Replay nKeys users × evPerKeyHour events/hour over spanH hours,
      // one micro-batch per hour ((event_id, ts, user_id, event_type,
      // value, props) rows), then read the state gauge.
      def replay(name: String, nKeys: Int, evPerKeyHour: Int, spanH: Int,
                 build: org.apache.spark.sql.DataFrame =>
                   org.apache.spark.sql.DataFrame): Unit = {
        val input = MemoryStream[(Long, Long, Long, String, Double, String)]
        val df = input.toDF()
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"graft-ss-$name").toString
        val q = build(df).writeStream
          .outputMode(OutputMode.Append)
          .format("noop")
          .option("checkpointLocation", ckpt)
          .start()
        try {
          var id = 0L
          val t0 = System.nanoTime()
          (0 until spanH).foreach { h =>
            val batch = (0 until nKeys).flatMap { u =>
              (0 until evPerKeyHour).map { j =>
                id += 1
                (id, h * hourNs + (j * 60L + u % 60) * 1000000000L,
                  u.toLong, "click", 1.0, "{}")
              }
            }
            input.addData(batch)
            q.processAllAvailable()
          }
          val wall = (System.nanoTime() - t0) / 1e9
          val so = q.lastProgress.stateOperators
          val rows = so.map(_.numRowsTotal).sum
          val mem = so.map(_.memoryUsedBytes).sum
          println(f"PROBE streamstate_$name%-22s keys=$nKeys%7d " +
            f"events=$id%9d spanH=$spanH%3d " +
            f"stateRows=$rows%8d stateMB=${mem / 1e6}%8.2f " +
            f"wall=$wall%6.1f s perBatch=${wall / spanH}%5.2f s")
        } finally {
          q.stop()
          try {
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
              .iterator().asScala.toSeq.sortBy(-_.getNameCount)
              .foreach(p => java.nio.file.Files.deleteIfExists(p))
          } catch { case _: Throwable => () }
        }
      }

      def dedup(df: org.apache.spark.sql.DataFrame) =
        graft.streaming.EventStreams.dedupEvents(df, Seq("event_id"))
      def sessions(df: org.apache.spark.sql.DataFrame) =
        graft.streaming.EventStreams.sessionWindowAgg(df)

      val k = 3000 * factor / 10 // 1× base = 3k keys at default factor 10
      // session state ∝ keys: 1×/3×/10× keys at fixed 5 ev/key/hour...
      replay("sess_keys1x", k, 5, 4, sessions)
      replay("sess_keys3x", k * 3, 5, 4, sessions)
      replay("sess_keys10x", k * 10, 5, 4, sessions)
      // ...and FLAT under 10× events per key at fixed keys
      replay("sess_events10x", k, 50, 4, sessions)
      // dedup state ∝ horizon × rate: 1×/3×/10× event rate...
      replay("dedup_rate1x", k, 5, 4, dedup)
      replay("dedup_rate3x", k * 3, 5, 4, dedup)
      replay("dedup_rate10x", k * 10, 5, 4, dedup)
      // ...and FLAT in stream LENGTH: 10× the span (10× total events)
      // at the same rate — the horizon keeps expiring what it admits
      replay("dedup_span10x", k, 5, 40, dedup)
    }
    spark.stop()
  }
}
