package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER resolution — the step every dedup pipeline
  * needs between "similar pairs" (q26/q27/q28/q36 emit edges) and "a
  * deduplicated corpus" (keep one canonical document per group of
  * transitively-connected near-dups).
  *
  * The reference stops at pair lists (`top_100_pairs.py` writes the
  * pairs CSV and part2 consumes it as-is); grouping them is left to the
  * reader. Here it is a first-class distributed operator.
  */
object Dedup {

  /** Connected components of an undirected edge list by iterative
    * min-label propagation: every vertex starts labeled with itself;
    * each round a vertex takes the minimum label among itself and its
    * neighbors; fixpoint = every vertex labeled with its component's
    * minimum id. Output: (id, label).
    *
    * Execution model — the driver runs the CONVERGENCE LOOP only (one
    * comparison of two scalar aggregates per round, exactly like
    * MLlib's iterative fits); per round the data-side work is one
    * shuffle join (labels onto edge endpoints) + one groupBy-min, all
    * distributed. `localCheckpoint` truncates the otherwise
    * linearly-growing lineage each round.
    *
    * Scale posture: rounds = component DIAMETER. Near-dup graphs are
    * piles of small dense clusters (LSH band collisions make them
    * clique-ish), so diameter stays in the single digits at any corpus
    * size — the iteration count does not grow with data volume, only
    * with graph pathology. For adversarial long-chain graphs the
    * log-diameter alternating large-star/small-star algorithm
    * (Kiveris et al., "Connected Components in MapReduce", SoCC'14) is
    * the upgrade path; `maxIter` caps the walk and failure is LOUD
    * (IllegalStateException), never a silently-wrong fixpoint.
    *
    * Labels only ever decrease, so convergence is detected by comparing
    * consecutive rounds' label SUMS (decimal — overflow-proof for any
    * id domain) instead of a per-row change join: one cheap aggregate
    * action per round.
    */
  def connectedComponents(edges: DataFrame, idA: String, idB: String,
                          maxIter: Int = 25): DataFrame = {
    // r17: symmetrize by in-row explode and materialize ONCE. The old
    // self-union re-ran the caller's edge lineage once per branch (union
    // branches share no work), and `sym` stayed LAZY — so every
    // iteration's neighborMin join re-ran it all again (for q181 that
    // lineage is the sorted-neighborhood windows + the Jaro-Winkler
    // scoring pass, re-executed per label round). One localCheckpoint
    // follows the PageRank/Bfs/KCore edge-list discipline (guide §2.4);
    // the edge MULTISET is identical, and min-label propagation is
    // order-free.
    val sym = edges
      .select(explode(array(
        struct(col(idA).as("src"), col(idB).as("dst")),
        struct(col(idB).as("src"), col(idA).as("dst")))).as("e"))
      .select("e.src", "e.dst")
      .localCheckpoint()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prev = labelSum(labels)
    if (prev == null) return labels // no edges → no clustered vertices
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("nl").as("nmin"))
      labels = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint()
      val cur = labelSum(labels)
      converged = cur.compareTo(prev) == 0
      prev = cur
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — " +
        "component diameter exceeds the cap; raise maxIter or switch to " +
        "large-star/small-star")
    labels
  }

  /** Resolve near-dup pair edges into clusters: every vertex of `pairs`
    * mapped to its component's canonical (minimum) id, with the
    * component size carried. Documents in no pair are untouched by
    * definition (singletons are the complement, see
    * [[survivors]]). Output: (doc_id, canonical_id, cluster_size). */
  def nearDupClusters(pairs: DataFrame, idA: String, idB: String): DataFrame = {
    val cc = connectedComponents(pairs, idA, idB)
    val sizes = cc.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("canonical_id"),
        col("cluster_size"))
  }

  /** The deduplicated corpus: all of `docs` minus non-canonical cluster
    * members (keep-first-by-id policy — deterministic and the industry
    * default). A broadcast-able anti-join: the victim list is bounded by
    * the number of near-dup documents, a vanishing fraction of any real
    * corpus. */
  def survivors(docs: DataFrame, clusters: DataFrame,
                idCol: String): DataFrame = {
    val victims = clusters
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id").as(idCol))
    docs.join(broadcast(victims), Seq(idCol), "left_anti")
  }

  /** Per-document dedup disposition ledger — the audit artifact a corpus
    * curation run ships alongside the deduplicated output: every document
    * mapped to (status, canonical_id) where status ∈ {exact_dup, near_dup,
    * kept}, with exact-hash identity taking precedence over near-dup
    * cluster membership (an exact copy is reported as exact even when the
    * near-dup graph also catches it).
    *
    * `nearClusters` is [[nearDupClusters]] output ((doc_id, canonical_id,
    * …)) — bounded by the number of near-dup documents, so the left join
    * broadcasts. The exact pass is one hash-groupBy over the corpus (the
    * q23 shape); no step holds driver-side state. */
  def dedupLedger(docs: DataFrame, idCol: String, textCol: String,
                  nearClusters: DataFrame): DataFrame = {
    val hashed = docs.select(col(idCol), md5(col(textCol)).as("__fp"))
    val exactCanon = hashed.groupBy("__fp")
      .agg(min(col(idCol)).as("__exact_canon"))
    val near = nearClusters
      .select(col("doc_id").as(idCol), col("canonical_id").as("__near_canon"))
    hashed.join(exactCanon, "__fp")
      .join(broadcast(near), Seq(idCol), "left")
      .select(col(idCol),
        when(col(idCol) =!= col("__exact_canon"), lit("exact_dup"))
          .when(col("__near_canon").isNotNull &&
            col(idCol) =!= col("__near_canon"), lit("near_dup"))
          .otherwise(lit("kept")).as("status"),
        when(col(idCol) =!= col("__exact_canon"), col("__exact_canon"))
          .when(col("__near_canon").isNotNull, col("__near_canon"))
          .otherwise(col(idCol)).as("canonical_id"))
  }

  /** Cross-snapshot dedup-ledger COMPACTION (VERDICT r15 #5): q97's
    * ledger is within-corpus; production dedup is corpus-vs-yesterday —
    * every crawl increment must be checked against the accumulated
    * fingerprint ledger, and the ledger itself compacted forward. Input:
    * `prev` (the documents behind yesterday's ledger) and `batch`
    * (today's increment). Output: ONE row per distinct fingerprint
    * across both snapshots — the compacted ledger — carrying
    *
    *  - `canonical_id`: the ledger's first-seen canonical (yesterday's
    *    canonical wins; a fingerprint new today canonicalizes to the
    *    batch's min id),
    *  - `first_seen`: 'prev' | 'curr' (provenance of the entry),
    *  - `n_prev` / `n_new` / `n_total`: occurrence counts per side,
    *  - `n_cross_dups`: today's occurrences of a fingerprint ALREADY in
    *    yesterday's ledger — the rows cross-snapshot dedup removes (and
    *    the token-savings numerator a mix report quotes).
    *
    * Tomorrow's `prev` is today's output — the compaction is closed
    * under iteration, which is what makes it a ledger and not a report.
    *
    * 100 TB posture: two map-side-partial hash aggregates on the
    * fingerprint plus ONE fp-keyed full-outer shuffle join at
    * |distinct fp| scale; no payload ever crosses the shuffle (only
    * 16-byte fingerprints and counts). NULL payloads hash to a NULL
    * fingerprint, which standard join semantics keep as separate
    * per-side ledger rows (NULL ≠ NULL) — both engines agree. */
  def ledgerCompact(prev: DataFrame, batch: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    def side(df: DataFrame, canon: String, n: String) =
      df.select(col(idCol).as("id"), md5(col(textCol)).as("fp"))
        .groupBy("fp")
        .agg(min(col("id")).as(canon), count(lit(1)).as(n))
    val pg = side(prev, "prev_canonical", "n_prev")
    val bg = side(batch, "new_min", "n_new")
    pg.join(bg, pg("fp") === bg("fp"), "full_outer")
      .select(
        coalesce(pg("fp"), bg("fp")).as("fp"),
        coalesce(col("prev_canonical"), col("new_min")).as("canonical_id"),
        when(col("n_prev").isNotNull, lit("prev")).otherwise(lit("curr"))
          .as("first_seen"),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("n_total", col("n_prev") + col("n_new"))
      .withColumn("n_cross_dups",
        when(col("first_seen") === "prev", col("n_new")).otherwise(lit(0L)))
  }
}
