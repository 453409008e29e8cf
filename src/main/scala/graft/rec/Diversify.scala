package graft.rec

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998,
  * public) — trade relevance against redundancy when finalizing a
  * recommendation (or retrieval) list: greedily pick
  * argmax λ·rel(i) − μ·max_{j∈S} sim(i, j), so the second copy of a
  * near-identical item loses to a fresh one. The list-construction
  * step between scoring (q50/q136) and serving that plain top-k
  * cannot express.
  *
  * Scale: MMR is sequential PER LIST but embarrassingly parallel
  * across lists — exactly the EWMA shape ([[graft.ops.TimeSeries
  * .ewma]]): candidate rows hash to their user and the greedy fold
  * runs inside `flatMapGroups`. Work per group is k·|cands| over a
  * ≤ k_cand-row group; nothing global. The similarity side is
  * pool-bounded (≤ pool² rows — the rerank pool is the top-k_cand
  * catalog slice, hundreds of items at most), so it BROADCASTS as a
  * lookup map: the earlier pre-joined-adjacency form exchanged a
  * |users|·k_cand·pool struct stream through two shuffles and cost
  * 5.3 s of q152's 12 s at sf0.1; the broadcast form ships pool² sims
  * once per executor, and the candidate side's single groupByKey
  * exchange is all that remains.
  *
  * Determinism: scores are the literal expression λ·rel − μ·pen on
  * 6-dp-rounded inputs — the identical IEEE ops the unrolled-CTE
  * oracle runs — with the item id as the tie-break, shipped UNROUNDED
  * (see the output note below). λ and μ are SEPARATE parameters:
  * deriving μ = 1−λ in one engine and writing the literal in the other
  * would diverge (1−0.7 ≠ 0.3 in binary).
  */
object Diversify {

  /** The broadcast-lookup design ceiling: ~a 2000-item rerank pool's
    * symmetric pair count (2000·1999 ≈ 4M). Probed, not guessed — the
    * ScaleProbe `mmrceiling` run measures the collect+broadcast cost of
    * exactly this volume (VERDICT r11 #7), and DiversifySpec pins that
    * the guard fires loudly one row past it. */
  val MaxSimPairsDefault = 4000000

  /** Greedy MMR top-`k` per user. `cands`: (user_id, item_id, rel);
    * `sims`: symmetric (ia, ib, sim) — absent pairs count as 0.
    * Output: (user_id, item_id, mmr_rank, mmr_score).
    *
    * The broadcast-map design REQUIRES a pool-bounded `sims` — the
    * guard enforces `maxSimPairs` (default 4M ≈ a 2000-item pool) with
    * a loud failure instead of a driver OOM, because the signature
    * alone can't stop a caller handing it a corpus-scale pair frame.
    * The result is materialized (`localCheckpoint`) before returning so
    * the broadcast can be destroyed eagerly — repeated calls in a
    * long-lived session otherwise accumulate undestroyed broadcasts. */
  def mmrRerank(cands: DataFrame, sims: DataFrame, relWeight: Double,
                divWeight: Double, k: Int,
                maxSimPairs: Int = MaxSimPairsDefault): DataFrame = {
    val c = cands.select(col("user_id").cast("long"),
      col("item_id").cast("int"), col("rel").cast("double"))
    // Pool-bounded similarity side → one broadcast lookup map (see the
    // scale note above); absent pairs read as 0 exactly like the old
    // left-join's coalesce. limit(max+1) bounds what ever reaches the
    // driver even when the guard is about to fire.
    val simRows = sims.select(col("ia").cast("int"), col("ib").cast("int"),
      col("sim").cast("double")).limit(maxSimPairs + 1).collect()
    require(simRows.length <= maxSimPairs,
      s"mmrRerank sims exceeds maxSimPairs=$maxSimPairs — the broadcast " +
        "lookup design needs a rerank-pool-bounded similarity frame " +
        "(~pool^2 rows); pre-slice the pool or raise the cap explicitly")
    // Primitive lookup structure: each (ia, ib) pair packs into one Long
    // and the table ships as TWO SORTED PRIMITIVE ARRAYS searched by
    // java.util.Arrays.binarySearch — raw-array serialization, zero
    // boxing, 16 bytes/pair. At the designed 4M-pair ceiling the probe
    // measured the hash-map alternatives' build+broadcast at ~33 s
    // (boxed Map[(Int,Int), Double]) and ~83 s (LongMap: unboxed keys
    // but a boxed AnyRef value table that Java serialization walks);
    // the sorted-array form is ~2 s (ScaleProbe mmrceiling run,
    // VERDICT r11 #7), and the O(log n) probe is invisible next to the
    // greedy scan it serves.
    val nSim = simRows.length
    val packed = new Array[Long](nSim)
    var i0 = 0
    while (i0 < nSim) {
      packed(i0) = (simRows(i0).getInt(0).toLong << 32) |
        (simRows(i0).getInt(1) & 0xffffffffL)
      i0 += 1
    }
    val order = Array.range(0, nSim).sortBy(packed(_))
    val simKeys0 = new Array[Long](nSim)
    val simVals0 = new Array[Double](nSim)
    var p0 = 0
    while (p0 < nSim) {
      simKeys0(p0) = packed(order(p0))
      simVals0(p0) = simRows(order(p0)).getDouble(2)
      p0 += 1
    }
    // Duplicate packed keys would make binarySearch return an ARBITRARY
    // index among them (ADVICE r12 #3): the old Map build kept one value
    // deterministically, the sorted-array form must too. Single-pass
    // compaction — equal-value duplicates collapse, CONFLICTING
    // duplicates fail loudly (run-dependent MMR scores could never match
    // the unrolled-CTE oracle anyway).
    var w0 = 0
    var r0 = 0
    while (r0 < nSim) {
      if (w0 > 0 && simKeys0(r0) == simKeys0(w0 - 1)) {
        require(simVals0(r0) == simVals0(w0 - 1), {
          val k = simKeys0(r0)
          s"mmrRerank sims carries conflicting duplicate pair " +
            s"(ia=${(k >> 32).toInt}, ib=${k.toInt}): " +
            s"${simVals0(w0 - 1)} vs ${simVals0(r0)} — dedupe upstream"
        })
      } else {
        simKeys0(w0) = simKeys0(r0); simVals0(w0) = simVals0(r0); w0 += 1
      }
      r0 += 1
    }
    val simKeys = if (w0 == nSim) simKeys0
      else java.util.Arrays.copyOf(simKeys0, w0)
    val simVals = if (w0 == nSim) simVals0
      else java.util.Arrays.copyOf(simVals0, w0)
    val simsB = c.sparkSession.sparkContext.broadcast((simKeys, simVals))

    val reranked = c.groupByKey((r: Row) => r.getLong(0))(Encoders.scalaLong)
      .flatMapGroups { (u: Long, it: Iterator[Row]) =>
        val (ks, vs) = simsB.value
        val cs = it.map(r => (r.getInt(1), r.getDouble(2)))
          .toArray.sortBy(_._1)
        // ArrayBuffer for the (ordered) penalty scan, HashSet for the
        // membership test — contains() on the buffer made the argmax
        // loop O(k^2 * |cands|) per group.
        val picked = scala.collection.mutable.ArrayBuffer[Int]()
        val pickedSet = scala.collection.mutable.HashSet[Int]()
        val out = scala.collection.mutable.ArrayBuffer[MmrPick]()
        while (out.length < math.min(k, cs.length)) {
          var bestItem = -1
          var bestScore = Double.NegativeInfinity
          cs.foreach { case (i, rel) =>
            if (!pickedSet.contains(i)) {
              var pen = 0.0
              picked.foreach { j =>
                val pos = java.util.Arrays.binarySearch(ks,
                  (i.toLong << 32) | (j & 0xffffffffL))
                val s = if (pos >= 0) vs(pos) else 0.0
                if (s > pen) pen = s
              }
              val sc = relWeight * rel - divWeight * pen
              if (sc > bestScore) { bestScore = sc; bestItem = i }
            }
          }
          picked += bestItem
          pickedSet += bestItem
          out += MmrPick(u, bestItem, out.length + 1, bestScore)
        }
        out.iterator
      }(Encoders.product[MmrPick])
      .toDF()
      // mmr_score ships UNROUNDED: it is a per-row scalar of two 6-dp
      // inputs (λ·rel − μ·pen lands on 7-decimal half-boundaries, where
      // the engines' round() directions diverge) — the raw double is
      // the same IEEE expression both sides and bit-identical
      .select(col("user_id"), col("item_id"), col("mmr_rank"),
        col("mmr_score"))
      // Output-sized (≤ |users|·k rows): cheap to pin, and pinning is
      // what lets the broadcast die here instead of leaking per call.
      .localCheckpoint()
    simsB.destroy()
    reranked
  }

  /** All-pairs rating-vector cosines restricted to a bounded item set
    * (both directions, 6-dp-rounded) — the similarity side of
    * [[mmrRerank]] for catalog-bounded candidate pools.
    *
    * Arithmetic: ratings quantize to exact CENTS LONGS
    * (`floor(r·100+0.5)` — the same IEEE quantizer family as qdec) and
    * the dot/norm sufficient statistics are codegen'd integer sums —
    * exact and order-free like the earlier decimal form, but whole-
    * stage-codegen'd instead of interpreted BigDecimal (r8 measured
    * the decimal multiply/sum on this hot self-join at ~10× long
    * math). The cents scale cancels in the cosine ratio; the oracle
    * mirrors the same integers. */
  def poolCosines(ratings: DataFrame, poolItems: DataFrame): DataFrame = {
    // Pool filter BELOW the latest-rating dedup window: the broadcast
    // semi-join prunes the fact stream before the per-(user, item)
    // row_number runs, so the window's exchange carries only pool-item
    // ratings (latest-per-key is computed within each (user, item) group,
    // so pre-filtering by item cannot change the winner).
    val r = ItemCf.latestRatings(
        ratings.join(broadcast(poolItems.select(col("item_id"))),
          Seq("item_id")))
      .select(col("user_id"), col("item_id"),
        floor(col("rating") * 100.0 + lit(0.5)).as("rr"))
    val stats = r.groupBy("item_id")
      .agg(sum(col("rr") * col("rr")).as("norm2"))
    // spreadByKey (r16): pool²-per-user pair fan-out from a tiny input —
    // same AQE-coalescing fix as ItemCf.itemNeighbors; the dot is an
    // exact integer (cents-long) sum, so partitioning cannot move it.
    val a = graft.text.TextAnalysis.spreadByKey(
      r.select(col("user_id"), col("item_id").as("ia"),
        col("rr").as("ra")), "user_id")
    val b = graft.text.TextAnalysis.spreadByKey(
      r.select(col("user_id"), col("item_id").as("ib"),
        col("rr").as("rb")), "user_id")
    val pairs = a.join(b, a("user_id") === b("user_id") &&
        col("ia") < col("ib"))
      .groupBy("ia", "ib")
      .agg(sum(col("ra") * col("rb")).as("dot"))
    // r17: symmetrize by in-row explode — the self-union ran the whole
    // pair join + dot aggregate once per branch (exchange reuse dedupes
    // only the exchanges); ia < ib keeps the two directions disjoint,
    // so the row multiset is identical.
    val sym = pairs
      .select(explode(array(
        struct(col("ia"), col("ib"), col("dot")),
        struct(col("ib").as("ia"), col("ia").as("ib"), col("dot"))))
        .as("e"))
      .select("e.ia", "e.ib", "e.dot")
    sym
      .join(stats.select(col("item_id").as("ia"), col("norm2").as("na")),
        "ia")
      .join(stats.select(col("item_id").as("ib"), col("norm2").as("nb")),
        "ib")
      .select(col("ia"), col("ib"),
        qround(col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
          6).as("sim"))
  }
}

/** Output row of [[Diversify.mmrRerank]] (top-level for the product
  * Encoder). */
case class MmrPick(user_id: Long, item_id: Int, mmr_rank: Int,
                   mmr_score: Double)
