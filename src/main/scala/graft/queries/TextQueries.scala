package graft.queries

import graft.io.Tables
import graft.text.TextAnalysis._
import graft.functions.GraftFunctions.{qdec, qround}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis / deduplication surface over the `documents` table
  * (training-data-pipeline extensions; SURVEY.md §7.2 step 4). Every query
  * except none here is DuckDB-oracle-checked — including MinHash and
  * SimHash, via the md5-derived 63-bit hash (see
  * [[graft.functions.HashUtil]]).
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  // Session-scoped memoized intermediates: the 3-gram shingle sets feed
  // q25/q26/q27, the MinHash signatures feed q25/q27, and the SimHash
  // fingerprints feed q24/q28 — materialize each once per (session, dir).
  // Tables.spreadScan (r16): the documents scan is a single row group
  // at bench scale, so the shingle explode — and the map side of every
  // consumer's first aggregation over the CACHED frame, which inherits
  // the build's partitioning — ran on one core. Downstream reductions
  // are integer counts (order-free). No-op on multi-split corpora.
  private def shinglesCached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"doc-shingles3:$dir")(
      shingles(Tables.spreadScan(Tables.documents(spark, dir)),
        "doc_id", "text", n = 3))

  private[queries] def sigsCached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"doc-minhash16:$dir")(
      minhashSignatures(
        shinglesCached(spark, dir).withColumnRenamed("shingle", "token"),
        "doc_id", numPerm = 16))

  private def simhashCached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"doc-simhash:$dir")(
      simhash(Tables.spreadScan(Tables.documents(spark, dir)),
        "doc_id", "text"))

  // r17 sweep-family shared passes (VERDICT r16 #5). The dedup-audit
  // queries (q27-family memo, q230, q249, q355's r=4 arm, q374) each
  // re-derived the SAME three intermediates from the memoized signature
  // frame: the packed per-doc signature arrays, the rowsPerBand=4 LSH
  // candidate pairs, and the estimated Jaccard over those candidates.
  // All three are deterministic functions of sigsCached (and tiny —
  // |docs| and |candidate-pair| sized), so they memoize like the frames
  // they derive from; each arm's VALUES are untouched (the fused pass
  // is the same expression tree, computed once per session).
  private def packedSigsCached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"doc-minhash16-packed:$dir")(
      packedSignatures(sigsCached(spark, dir), "doc_id"))

  private def cands4Cached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"doc-lsh-cands-r4:$dir")(
      lshCandidatePairs(sigsCached(spark, dir), "doc_id", rowsPerBand = 4))

  /** Estimated Jaccard for every rowsPerBand=4 candidate pair — the
    * [[graft.text.TextAnalysis.estimatedJaccard]] expression tree over
    * the memoized packed signatures (identical values; the in-row
    * agreement fold is deterministic). */
  private def est4Cached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"doc-lsh-est-r4:$dir") {
      val packed = packedSigsCached(spark, dir)
      cands4Cached(spark, dir)
        .join(packed.select(col("doc_id").as("id_a"), col("sig").as("sig_a")),
          Seq("id_a"))
        .join(packed.select(col("doc_id").as("id_b"), col("sig").as("sig_b")),
          Seq("id_b"))
        .withColumn("est_jaccard",
          expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (a, v) -> a + v)")
            .cast("double") / lit(16.0))
        .select("id_a", "id_b", "est_jaccard")
    }

  /** Exact 3-gram Jaccard pairs at the 0.4 bar — shared verbatim by q26
    * and q249's recall audit (same threshold, same df-cap). */
  private def exactPairs04Cached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"doc-exact-jaccard-04:$dir")(
      shingleJaccardPairs(shinglesCached(spark, dir), "doc_id",
        minJaccard = 0.4))

  /** q20 — per-document token statistics + md5 fingerprint. n_subtokens
    * is a BPE-ish proxy count (each word contributes ceil(len/4) units). */
  val q20: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        expr("aggregate(transform(toks, t -> cast(ceil(length(t) / 4.0) as bigint)), 0L, (a, x) -> a + x)")
          .as("n_subtokens"),
        col("n_chars"),
        md5(col("text")).as("fp"))
      .orderBy("doc_id")

  /** q21 — heuristic quality score: stopword ratio × length saturation
    * (punct-free synthetic corpus ⇒ the two signals that matter here). */
  val q21: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop",
        expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to')))"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("quality",
        (lit(1.0) - col("stop_ratio")) *
          least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)))
      .select("doc_id", "n_tokens", "n_stop", "stop_ratio", "quality")
      .orderBy("doc_id")

  /** Memoized per-doc language prediction joined to the stored label —
    * q22 serves it sorted; q292 (kappa) and q294 (filter funnel) reuse
    * the same classify pass instead of re-running the profile build. */
  private def langPredsCached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"doc-lang-preds:$dir") {
      val docs = Tables.documents(spark, dir)
      languageClassify(docs, "doc_id", "text", "lang")
        .join(docs.select(col("doc_id"), col("lang").as("actual")),
          "doc_id")
        .withColumn("correct",
          (col("predicted") === col("actual")).cast("int"))
        .select("doc_id", "predicted", "actual", "n_overlap", "correct")
    }

  /** q22 — corpus-trained n-gram-profile language ID (Cavnar–Trenkle
    * style): top-20 token profile per language, classify by max overlap. */
  val q22: Q = (spark, dir) =>
    langPredsCached(spark, dir).orderBy("doc_id")

  /** q23 — exact deduplication by content hash: canonical = min doc_id per
    * md5(text) group. */
  val q23: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy("fp")

  /** q24 — 63-bit SimHash fingerprints. */
  val q24: Q = (spark, dir) =>
    simhashCached(spark, dir).orderBy("doc_id")

  /** q25 — MinHash signatures (16 perms) over distinct 3-gram shingle
    * sets. Shingles, not unigrams: the corpus vocabulary is tiny, so
    * unigram token sets are near-identical across unrelated documents —
    * only n-gram sets carry discriminating structure. */
  val q25: Q = (spark, dir) =>
    sigsCached(spark, dir).orderBy("doc_id", "p")

  /** q26 — exact 3-gram Jaccard near-duplicate pairs (J ≥ 0.4; the corpus
    * has clean separation: planted near-dups sit at J ≥ 0.4, background
    * pairs below 0.2). The shingle universe is df-capped at 100 (VERDICT
    * r9 #2, mirrored in the oracle's `keptsh` CTE): a no-op on natural
    * text (this corpus's max 3-gram df is 25 at sf0.1) that bounds the
    * co-occurrence join's Σdf² tail when boilerplate puts a df≈n shingle
    * in every document — the ScaleProbe `boiler` row measures exactly
    * that corpus. */
  val q26: Q = (spark, dir) =>
    exactPairs04Cached(spark, dir)
      .orderBy("id_a", "id_b")

  /** Memoized near-dup pair list (tiny — |pairs| rows): q27 serves it
    * sorted, q73/q74 resolve it into clusters / the deduplicated corpus. */
  private[queries] def lshPairsCached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"doc-lsh-pairs:$dir") {
      est4Cached(spark, dir).filter(col("est_jaccard") >= 0.4)
    }

  /** q27 — full distributed MinHash + LSH near-dup pipeline (the
    * reference's M1+M2+M3, SURVEY §2.9, re-expressed as shuffle joins):
    * sign → band → bucket-join candidates → estimate → threshold. */
  val q27: Q = (spark, dir) =>
    lshPairsCached(spark, dir).orderBy("id_a", "id_b")

  /** q323 — FUZZY benchmark decontamination: the third leg of the
    * decontamination trilogy — q82 flags exact 8-gram overlap, q94 the
    * same behind a Bloom band-pass, and this catches NEAR-DUPLICATE
    * contamination (light paraphrase/edit of a benchmark doc) that
    * exact n-gram matching misses: MinHash-LSH candidates restricted to
    * cross-side (train × benchmark) pairs at est-Jaccard ≥ 0.5, rolled
    * up per training doc. Reuses q27's memoized signature/pair pipeline
    * (threshold 0.5 ⊂ the cached ≥ 0.4 frame), so the marginal cost of
    * the fuzzy pass is one filter + one grouped aggregate; at 100 TB
    * the benchmark side is tiny and its band buckets bound the join. */
  val q323: Q = (spark, dir) =>
    lshPairsCached(spark, dir)
      .filter(col("est_jaccard") >= 0.5)
      .filter((col("id_a") % 17 === 0) =!= (col("id_b") % 17 === 0))
      .select(when(col("id_a") % 17 =!= 0, col("id_a"))
        .otherwise(col("id_b")).as("doc_id"), col("est_jaccard"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bench_matches"),
        max("est_jaccard").as("max_est_jaccard"))
      .orderBy("doc_id")

  /** q73 — near-dup CLUSTER resolution: connected components over q27's
    * pair graph (iterative distributed min-label propagation — see
    * [[graft.text.Dedup.connectedComponents]]), canonical = component
    * minimum, component size carried. The step between "similar pairs"
    * and "a deduplicated corpus" that the reference leaves to the reader
    * (`top_100_pairs.py` stops at the pair CSV). */
  val q73: Q = (spark, dir) =>
    graft.text.Dedup.nearDupClusters(lshPairsCached(spark, dir), "id_a", "id_b")
      .orderBy("doc_id")

  /** q75 — seeded stratified per-(source, lang) cap: keep ≤ 5 documents
    * per group, selected by the keyed PRNG (domain/language balancing —
    * the curation step that stops one crawl domain from dominating a
    * training mix; see [[Tables.stratifiedCap]]). */
  val q75: Q = (spark, dir) =>
    Tables.stratifiedCap(Tables.documents(spark, dir),
      groups = Seq("source", "lang"), key = "doc_id", n = 5, seed = 7L)
      .select("doc_id", "source", "lang", "n_chars")
      .orderBy("doc_id")

  /** q74 — the deduplicated corpus: documents minus non-canonical
    * cluster members (keep-min-id policy), via a broadcast anti-join on
    * the bounded victim list. */
  val q74: Q = (spark, dir) =>
    graft.text.Dedup.survivors(
      Tables.documents(spark, dir),
      graft.text.Dedup.nearDupClusters(lshPairsCached(spark, dir), "id_a", "id_b"),
      "doc_id")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** q28 — SimHash near-duplicate pairs (Hamming ≤ 3) via pigeonhole
    * chunk blocking — the third dedup family (exact, MinHash/Jaccard,
    * SimHash/Hamming). */
  val q28: Q = (spark, dir) =>
    simhashNearDupPairs(simhashCached(spark, dir), "doc_id")
      .orderBy("id_a", "id_b")

  /** q18 — TF-IDF top terms per document: tf from the token multiset,
    * idf = ln(N/df) over the corpus, top-3 terms per doc by (tfidf desc,
    * term asc). Two aggregates + a join + a windowed top-k — the classic
    * text-feature pipeline, all shuffle-partial-aggregated. */
  val q18: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    // Corpus size as a broadcast 1-row aggregate (like the oracle's `n`
    // CTE) — keeps the query fully lazy instead of running an eager
    // count() job on every invocation.
    val n = docs.agg(count(lit(1)).cast("double").as("nd"))
    val tf = tokens(docs, "doc_id", "text")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("token").agg(count(lit(1)).as("df"))
    // Rank on the ROUNDED score: mathematically-equal tfidf reached via
    // different (tf, df) routes could 1-ulp-flip cross-engine order;
    // rounding collapses them into ties broken by token.
    val scored = tf.join(df_, "token").crossJoin(broadcast(n))
      .withColumn("tfidf",
        qround(col("tf") * log(col("nd") / col("df")), 6))
    import graft.ops.Relational.perKeyTopK
    perKeyTopK(scored, "doc_id", Seq(col("tfidf").desc, col("token")), k = 3)
      .select("doc_id", "rank", "token", "tfidf")
      .orderBy("doc_id", "rank")
  }

  /** q80 — top-100 most-similar document pairs by TF-IDF cosine over
    * 3-gram shingles ([[TextAnalysis.tfidfCosinePairs]]): the sparse
    * complement to the dense-embedding similarity family (q30/q32/q36/
    * q37) — an inverted-index join, so only pairs sharing a vocabulary
    * shingle materialize, with the df ≤ 20 vocabulary cap bounding the
    * per-shingle pair fan-out at any corpus size. At sf0.01 every shingle
    * df ≤ 7, so the cap is inert and the oracle checks the exact full
    * cosine. The weight frame is memoized: the pair join reads it three
    * times (both self-join sides + the norms), and without persistence
    * each consumer re-runs the shingle explode and both aggregations. */
  val q80: Q = (spark, dir) =>
    cosineTopPairs(
      graft.util.SessionMemo.cached(spark, s"doc-tfidf-w3:$dir")(
        tfidfWeights(Tables.spreadScan(Tables.documents(spark, dir)),
          "doc_id", "text", n = 3, maxDf = 20)),
      "doc_id", k = 100)

  /** q82 — benchmark decontamination ([[TextAnalysis.contaminationReport]]):
    * training docs sharing any 8-word-gram with the held-out benchmark
    * slice (doc_id ≡ 0 mod 17 — a deterministic stand-in for an eval
    * set). The benchmark n-gram set stays broadcast, so the corpus side
    * never shuffles — the posture that holds when the corpus is 100 TB
    * and the benchmark is megabytes. The planted near-dup pairs that
    * straddle the split are exactly what it catches. */
  val q82: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    contaminationReport(
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0),
      "doc_id", "text", n = 8)
      .orderBy("doc_id")
  }

  /** q94 — q82's decontamination via the two-phase Bloom band-pass
    * ([[TextAnalysis.contaminationReportBloom]]): benchmark n-grams →
    * distributed Bloom aggregate → native `might_contain` prefilter on
    * the corpus side → exact confirming join. Same output, same oracle as
    * q82 — the Bloom phase must be invisible in the result (false
    * positives die in the exact join), which makes this a cross-check of
    * the whole prefilter path. */
  val q94: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    contaminationReportBloom(
      docs.filter(col("doc_id") % 17 =!= 0),
      docs.filter(col("doc_id") % 17 === 0),
      "doc_id", "text", n = 8)
      .orderBy("doc_id")
  }

  /** q95 — vocabulary df-spectrum (the "how heavy is the tail" corpus
    * diagnostic behind vocab-size / min-df choices): for each document
    * frequency, how many distinct tokens have it and how many occurrences
    * they carry. Two partial-aggregated shuffles, output rows bounded by
    * max(df) ≤ |corpus|. */
  val q95: Q = (spark, dir) =>
    tokens(Tables.documents(spark, dir), "doc_id", "text")
      .groupBy("token")
      .agg(countDistinct("doc_id").as("df"), count(lit(1)).as("occ"))
      .groupBy("df")
      .agg(count(lit(1)).as("n_tokens"), sum("occ").as("n_occ"))
      .orderBy("df")

  /** q96 — JSONL source/sink roundtrip under the oracle gate
    * ([[Tables.documentsJsonl]]): documents → write JSONL → read back
    * (explicit schema, no inference) → per-(source, lang) counts, char
    * totals, and an order-independent content checksum
    * (`bit_xor(md5_63(text))`). The oracle reads the parquet directly, so
    * any drift introduced by the JSON round-trip breaks the hash. */
  val q96: Q = (spark, dir) =>
    Tables.documentsJsonl(spark, dir)
      .withColumn("h", graft.functions.GraftFunctions.md5_63(col("text")))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        expr("bit_xor(h)").as("checksum"))
      .orderBy("source", "lang")

  /** q57 — partition-pruned scan over the Hive-partitioned staging of
    * documents ([[Tables.documentsPartitioned]]): a `lang IN (en, zh)`
    * predicate on the PARTITION column, so the scan lists only those two
    * directories — driver-side pruning, zero I/O on the other languages
    * (PlanShapeSpec pins `PartitionFilters` + the pruned file count). The
    * oracle reads the unpartitioned parquet: identical results prove the
    * partitioned roundtrip (including the string→directory→string trip
    * of the partition values) is lossless. */
  val q57: Q = (spark, dir) =>
    Tables.documentsPartitioned(spark, dir)
      .filter(col("lang").isin("en", "zh"))
      .withColumn("h", graft.functions.GraftFunctions.md5_63(col("text")))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        expr("bit_xor(h)").as("checksum"))
      .orderBy("lang", "source")

  /** q58 — ORC source/sink roundtrip ([[Tables.documentsOrc]]): documents
    * → write ORC → schema-pinned read → per-lang doc counts, id ranges,
    * and the order-independent `bit_xor(md5_63(text))` checksum. The
    * oracle reads the parquet directly, so any type or encoding drift in
    * the ORC writer/reader round-trip breaks the hash. */
  val q58: Q = (spark, dir) =>
    Tables.documentsOrc(spark, dir)
      .withColumn("h", graft.functions.GraftFunctions.md5_63(col("text")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        min("doc_id").as("min_id"), max("doc_id").as("max_id"),
        expr("bit_xor(h)").as("checksum"))
      .orderBy("lang")

  /** q59 — PII redaction ([[TextAnalysis.redactPii]]): mask emails and
    * URLs before fingerprinting/training. The corpus is synthetic
    * word-salad with no real PII, so the query PLANTS a deterministic
    * email + URL per document (same construction in the oracle) — the
    * gate then actually exercises both replacement patterns rather than
    * hashing an identity map. Pure codegen'd regex map, shuffle-free;
    * patterns use only character classes so the Java-regex and RE2
    * dialects agree (same portability argument as q89). */
  val q59: Q = (spark, dir) => {
    val planted = concat(col("text"),
      lit(" contact_"), col("doc_id"), lit("@example.com via https://ex.org/d/"),
      col("doc_id"), lit(" end"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        redactPii(planted).as("redacted"))
      .withColumn("n_masked",
        (size(split(col("redacted"), "<EMAIL>", -1)) - 1 +
          size(split(col("redacted"), "<URL>", -1)) - 1).cast("long"))
      .orderBy("doc_id")
  }

  /** q97 — per-document dedup disposition ledger
    * ([[graft.text.Dedup.dedupLedger]]): every document classified
    * exact_dup / near_dup / kept with its canonical id — the audit
    * artifact between q23 (exact groups), q73 (near clusters) and q74
    * (survivors). Exact-hash identity outranks near-dup membership; the
    * corpus has no exact twins at any SF, so that branch is pinned by
    * DedupSpec's planted fixture instead of the oracle. */
  val q97: Q = (spark, dir) =>
    graft.text.Dedup.dedupLedger(
      Tables.documents(spark, dir), "doc_id", "text",
      graft.text.Dedup.nearDupClusters(lshPairsCached(spark, dir), "id_a", "id_b"))
      .orderBy("doc_id")

  /** q376 — cross-snapshot dedup-ledger compaction
    * ([[graft.text.Dedup.ledgerCompact]], VERDICT r15 #5): yesterday's
    * ledger (even doc_ids) merged with today's crawl increment (odd
    * doc_ids) into one row per distinct fingerprint — first-seen
    * provenance, carried canonical, per-side counts, and the
    * cross-snapshot duplicate count that is the whole point of keeping
    * a ledger (q97 answers "dedup this corpus"; this answers "dedup
    * today against every corpus before it"). Ordered by canonical then
    * fp — a total order: fp is unique per row apart from the two
    * per-side NULL-fingerprint rows, whose canonicals differ. */
  val q376: Q = (spark, dir) => {
    val d = Tables.documents(spark, dir)
    graft.text.Dedup.ledgerCompact(
      prev = d.filter(col("doc_id") % 2 === 0),
      batch = d.filter(col("doc_id") % 2 === 1),
      idCol = "doc_id", textCol = "text")
      .orderBy("canonical_id", "fp")
  }

  /** q84 — token chunking ([[TextAnalysis.chunkDocuments]], 32-token
    * chunks, stride 24 → 8 tokens of shared context between consecutive
    * chunks): the sequence-prep map that fans each document onto its
    * deterministic chunk grid. Shuffle-free — the only exchange in the
    * plan is the oracle's output ORDER BY. */
  val q84: Q = (spark, dir) =>
    chunkDocuments(Tables.documents(spark, dir), "doc_id", "text",
      chunkSize = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")

  /** q85 — sequence packing ([[TextAnalysis.packSequences]]): lay each
    * (source, lang) mixture component's documents end-to-end and assign
    * every document its 128-token-budget bin span. Docs with
    * `first_bin < last_bin` straddle a context boundary — the split the
    * chopper applies downstream. One shuffle (the group-keyed window);
    * parallel across components. */
  val q85: Q = (spark, dir) =>
    packSequences(Tables.documents(spark, dir), "doc_id", "text",
      Seq("source", "lang"), budget = 128)
      .orderBy("source", "lang", "doc_id")

  /** q86 — quality-weighted downsampling ([[Tables.weightedSample]]):
    * keep each document with probability proportional to its length,
    * p = clamp(n_chars/2000, 0.05, 0.9) — the mixture-weighting pass that
    * up-samples substantive documents and keeps a floor of everything.
    * Seeded keyed PRNG → layout-independent, reproducible, and exactly
    * mirrored by the oracle's md5 arithmetic. */
  val q86: Q = (spark, dir) => {
    val p = least(lit(0.9),
      greatest(lit(0.05), col("n_chars").cast("double") / 2000.0))
    Tables.weightedSample(Tables.documents(spark, dir), "doc_id", p,
      seed = 99L)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        qround(p, 6).as("p_keep"))
      .orderBy("doc_id")
  }

  /** q89 — text normalization (the canonicalization map that runs before
    * any dedup/fingerprint pass): lowercase, strip every character
    * outside [a-z0-9 ], collapse whitespace runs, trim. Pure per-row
    * scalar pipeline — codegen'd regexes, no shuffle except the output
    * sort. Spark's regexp_replace is replace-ALL by default; the DuckDB
    * mirror says so explicitly with the 'g' flag, and the character-class
    * patterns used here mean the same thing in Java regex and RE2. */
  val q89: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " ")).as("norm"))
      .withColumn("n_tokens",
        when(col("norm") === "", lit(0L))
          .otherwise(size(split(col("norm"), " ")).cast("long")))
      .orderBy("doc_id")

  /** q98 — MinHash signatures computed fully per-row
    * ([[TextAnalysis.minhashSignatureArray]]): the ZERO-shuffle signature
    * pass — shingle array → per-perm min fold inside one projection, then
    * posexploded only to match the oracle's (doc_id, p, mh) shape. Where
    * q25 partial-aggregates an exploded (doc, p, token) stream and q29
    * runs the one-pass custom aggregate, q98 never exchanges at all: the
    * map-side form a 100 TB corpus pass (or a streaming micro-batch, q99)
    * wants. Same hash family as q25 — one oracle pins all three
    * signature paths to identical values. */
  val q98: Q = (spark, dir) =>
    minhashSignatureArray(Tables.spreadScan(Tables.documents(spark, dir)),
      "doc_id", "text",
      n = 3, numPerm = 16)
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("p", "mh")))
      .orderBy("doc_id", "p")

  /** q29 — MinHash signatures via the custom one-pass
    * TypedImperativeAggregate ([[org.apache.spark.sql.graft.MinHashAgg]]):
    * the 100 TB-scale variant of q25 (no numPerm× explosion). The
    * affine-mixed family `h_p = (a_p·md5_63(tok) + b_p) mod 2⁶³` is
    * itself oracle-expressible (DuckDB HUGEINT products reduced mod 2⁶³
    * match Java's wrapping arithmetic exactly), so even the custom
    * aggregate is hash-checked cross-engine; buffer contract additionally
    * asserted in MinHashAggSpec. */
  val q29: Q = (spark, dir) =>
    minhashSignaturesFast(
      shinglesCached(spark, dir).withColumnRenamed("shingle", "token"),
      "doc_id", numPerm = 16)
      .orderBy("doc_id", "p")

  /** q107 — perplexity-proxy quality scoring: each document's average
    * bigram log-likelihood under the corpus-fitted MLE model (see
    * [[graft.text.LangModel.bigramLogLikelihood]]) — the
    * distribution-based sibling of the heuristic quality filters
    * (q21/q69). */
  val q107: Q = (spark, dir) =>
    graft.text.LangModel.bigramLogLikelihood(
      Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** q162 — supervised language classification: multinomial Naive Bayes
    * ([[graft.text.NaiveBayes]]) trained on the doc_id%5≠0 split,
    * confusion matrix on the held-out fifth — the learned counterpart of
    * q22's heuristic lang-id. 9dp-decimal log factors make the argmax
    * engine-exact. */
  val q162: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    graft.text.NaiveBayes.confusion(
      docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0),
      "doc_id", "text", "lang")
      .orderBy("truth", "predicted")
  }

  /** q181 — end-to-end entity resolution over the part vocabulary:
    * multi-pass sorted-neighborhood blocking
    * ([[graft.text.Fuzzy.sortedNeighborhoodPairs]], w=5 — the
    * cold/old-prefix family is only recoverable via the reversed-name
    * pass), Jaro–Winkler ≥ 0.94 on candidates (the codegen'd
    * expression, scored once per CANDIDATE), match edges into
    * connected components (md5-numeric ids for the distributed
    * min-label propagation), canonical = min name per cluster,
    * singletons self-canonical. The blocking→score→cluster→survivor
    * shape of every production dedup pipeline. */
  val q181: Q = (spark, dir) => {
    val names = Tables.part(spark, dir)
      .select(col("p_name").as("name")).distinct()
    val cands = graft.text.Fuzzy.sortedNeighborhoodPairs(names, w = 5)
    val edges = cands
      .filter(qround(graft.functions.GraftFunctions.jaro_winkler(
        col("name_a"), col("name_b")), 6) >= 0.94)
      .select(graft.functions.GraftFunctions.md5_63(col("name_a"))
          .as("id_a"),
        graft.functions.GraftFunctions.md5_63(col("name_b")).as("id_b"))
    val comp = graft.text.Dedup.connectedComponents(edges, "id_a", "id_b")
    val withId = names.withColumn("id",
      graft.functions.GraftFunctions.md5_63(col("name")))
    val labeled = withId.join(comp, Seq("id"), "left")
      .withColumn("label", coalesce(col("label"), col("id")))
    val canon = labeled.groupBy("label")
      .agg(min("name").as("canonical"),
        count(lit(1)).as("cluster_size"))
    labeled.join(canon, "label")
      .select(col("name"), col("canonical"), col("cluster_size"))
      .orderBy("name")
  }

  /** q170 — BM25 ranked retrieval ([[graft.text.Retrieval.bm25TopK]]):
    * doc 0's token set as the query, top-25 corpus docs by the
    * Lucene-variant BM25 (k1 = 1.2, b = 0.75) — term stats from one
    * grouped count, scoring touches only query-term postings, per-term
    * contributions 9dp-decimal before the sum. */
  val q170: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    val query = graft.text.Retrieval.termFreqs(
      docs.filter(col("doc_id") === 0), "doc_id", "text").select("w")
    graft.text.Retrieval.bm25TopK(docs, "doc_id", "text", query, k = 25)
  }

  /** q108 — one character-level BPE training round: corpus-weighted
    * adjacent-symbol-pair frequencies over the word VOCABULARY (see
    * [[graft.text.LangModel.bpePairCounts]] for why vocab-not-corpus is
    * the 100 TB shape), top-25 merge candidates. */
  val q108: Q = (spark, dir) =>
    graft.text.LangModel.bpePairCounts(Tables.documents(spark, dir), "text")
      .orderBy(desc("n"), col("pair"))
      .limit(25)

  /** q119 — fixed-k weighted sample without replacement
    * (Efraimidis–Spirakis, see [[graft.io.Tables.weightedTopK]]): the
    * 100 longest-biased documents — the exact-budget counterpart of
    * q86's Bernoulli rate sampling for training-mix construction. */
  val q119: Q = (spark, dir) =>
    graft.io.Tables.weightedTopK(Tables.documents(spark, dir), "doc_id",
        col("n_chars"), k = 100, seed = 7L)
      .select("rank", "doc_id", "n_chars", "es")
      .orderBy("rank")

  /** q199 — per-group weighted sample without replacement
    * ([[graft.io.Tables.weightedTopKPerGroup]]): exactly 30 documents
    * per (source, lang), inclusion biased by length — q75's stratified
    * quota and q119's Efraimidis–Spirakis weighting composed into the
    * training-mix primitive ("fixed docs per domain, longer docs
    * favored"). Same seeded-PRNG key family, so the sample is
    * layout-independent and the WindowGroupLimit partial top-n keeps
    * the per-stratum shuffle at ≤ k rows per map partition. */
  val q199: Q = (spark, dir) =>
    graft.io.Tables.weightedTopKPerGroup(Tables.documents(spark, dir),
        Seq("source", "lang"), "doc_id", col("n_chars"), k = 30, seed = 11L)
      .select("source", "lang", "rank", "doc_id", "n_chars", "es")
      .orderBy("source", "lang", "rank")

  /** q146 — per-source OLS of token count on char count
    * ([[graft.metrics.Ols.fitPerGroup]]): the chars-per-token line is a
    * cheap per-source tokenizer-cost model (and a drift alarm — a
    * slope change means a source's markup/encoding changed). Closed
    * form from decimal-exact sufficient statistics, one aggregate. */
  val q146: Q = (spark, dir) =>
    graft.metrics.Ols.fitPerGroup(
      Tables.documents(spark, dir).select(col("source"), col("n_chars"),
        size(filter(split(col("text"), " "),
          t => length(t) > 0)).as("n_toks")),
      col("source"), col("n_chars"), col("n_toks"))
      .orderBy("grp")

  /** q147 — quantile normalization of document length across sources
    * ([[graft.ops.QuantileNorm.normalize]]): maps every source's
    * n_chars distribution onto the pooled one via broadcast percentile
    * boundaries + piecewise-linear interpolation — per-source scores
    * become threshold-comparable with zero row shuffles (the two
    * global sorts of the textbook algorithm never happen). */
  val q147: Q = (spark, dir) =>
    graft.ops.QuantileNorm.normalize(Tables.documents(spark, dir),
      col("doc_id"), col("source"), col("n_chars"))
      .orderBy("rid")

  /** q154 — span-level exact-substring dedup coverage
    * ([[TextAnalysis.duplicateSpanCoverage]]): per document, the token
    * positions under at least one corpus-duplicated 10-gram — what a
    * span-masking pass (Lee et al. 2022) would remove. The
    * exact-substring complement of whole-doc (q23) and near-dup
    * (q27/q73) dedup. */
  val q154: Q = (spark, dir) =>
    duplicateSpanCoverage(Tables.documents(spark, dir),
      "doc_id", "text", n = 10)
      .orderBy("doc_id")

  /** q69 — Gopher-class repetition scoring: per-document duplicate
    * 3-gram ratio (see [[graft.text.TextAnalysis.repetitionScore]]) — the
    * repeated-n-gram quality filter of large-scale training pipelines. */
  val q69: Q = (spark, dir) =>
    repetitionScore(graft.io.Tables.documents(spark, dir), "doc_id", "text", n = 3)
      .orderBy("doc_id")

  /** q184 — temperature-balanced mixture resampling (τ = 2): per-source
    * corpus shares ∝ √n — the multilingual/multi-domain training-mix
    * rule (mT5/XLM-R style) that upsamples tail sources and downsamples
    * head sources — applied at a 50% total budget. The share arithmetic
    * is EXACT integer end-to-end: √n scales to a 1e9-fixed-point BIGINT
    * weight, weights sum exactly, and each quota is
    * `(budget · w) div Σw` — no cross-engine float-sum or decimal
    * division drift anywhere (ARCHITECTURE.md rule 6). Each source then
    * keeps exactly `quota` documents by seeded keyed-PRNG rank
    * (layout-independent, oracle-reproducible; the q75/q86 sampling
    * family). The budget·w product is widened to DECIMAL(38,0)
    * (HUGEINT in the oracle) before the integral divide: in BIGINT it
    * would overflow once n_total^1.5 exceeds ~1.8e19 (≈7M docs), and
    * Spark's non-ANSI wrap would silently zero every quota while
    * DuckDB raised — 38-digit exact arithmetic holds to ~1e25 docs.
    * Scale shape: the weight/quota frame is |sources|-sized
    * and broadcast; the corpus side is one window rank per source —
    * WindowGroupLimit-friendly, single shuffle on the group key. */
  val q184: Q = (spark, dir) => {
    val docs = graft.io.Tables.documents(spark, dir)
      .select("doc_id", "source")
    val weights = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w",
        expr("cast(floor((sqrt(cast(n_docs as double)) * 1e9) + 0.5) as bigint)"))
    val tot = weights.agg(sum(col("w")).as("w_sum"),
      sum(col("n_docs")).as("n_total"))
    val quotas = weights.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        expr("(cast(n_total div 2 as decimal(38,0)) * w) div w_sum")
          .as("quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(graft.functions.GraftFunctions.md5_63(
        concat(lit("184:"), col("doc_id").cast("string"))), col("doc_id"))
    docs.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), "source")
      .filter(col("rk") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rk"), col("quota"),
        col("n_docs"))
      .orderBy("source", "rk")
  }

  /** q223 — corpus word associations by EXACT fixed-point lift (the
    * PMI ranking without the engine-dependent log): per token pair
    * co-occurring in ≥ 20 documents, lift = P(a,b)/(P(a)·P(b)) =
    * n_ab·N / (df_a·df_b), emitted as half-up integer parts-per-million
    * via the q191 idiom `(2·num + den) div (2·den)` — PMI is log(lift),
    * so the integer ppm ranking IS the PMI ranking, bit-exact in both
    * engines (the log itself is 1-ulp engine lottery; never hash a
    * libm call). Products route through DECIMAL(38,0)/HUGEINT so
    * n_ab·N·10⁶ can't overflow BIGINT at web-corpus N. Pair stream =
    * per-doc distinct-token self-join — vocabulary-bounded aggregation
    * output, with the ≥ 20 support floor implying df ≥ 20 on both
    * tokens (the lossless prefilter at scale). */
  val q223: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    val dt = docs.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .filter(length(col("tok")) > 0)
    val dfs = dt.groupBy("tok").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val pairs = dt.as("a").join(dt.as("b"), Seq("doc_id"))
      .filter(col("a.tok") < col("b.tok"))
      .groupBy(col("a.tok").as("ta"), col("b.tok").as("tb"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 20)
    pairs
      .join(broadcast(dfs.select(col("tok").as("ta"), col("df").as("df_a"))),
        Seq("ta"))
      .join(broadcast(dfs.select(col("tok").as("tb"), col("df").as("df_b"))),
        Seq("tb"))
      .crossJoin(broadcast(nDocs))
      .withColumn("lift_ppm", expr(
        "CAST((2 * CAST(n_ab AS DECIMAL(38,0)) * n_docs * 1000000 + " +
          "CAST(df_a AS DECIMAL(38,0)) * df_b) div " +
          "(2 * CAST(df_a AS DECIMAL(38,0)) * df_b) AS BIGINT)"))
      .select(col("ta"), col("tb"), col("n_ab"), col("df_a"), col("df_b"),
        col("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("ta"), col("tb"))
      .limit(100)
  }

  /** q224 — Heaps-law vocabulary-growth curve: distinct-vocabulary size
    * vs cumulative token volume at 10 corpus prefixes (doc_id deciles)
    * — the corpus diagnostic behind tokenizer sizing and dedup-health
    * checks (a flattening curve means the corpus is repeating itself).
    * NOT computed per prefix: each token contributes its FIRST doc only
    * (one min aggregate), each doc its token count (one sum aggregate),
    * and 10 broadcast cutoffs turn both into decile counts — two
    * shuffles total, no prefix rescans. Cutoffs are exact doc_id
    * percentiles quantized 6dp before flooring so the interpolation's
    * last ulp can't move an integer boundary (q125's discipline); swap
    * `approx_percentile` in at 100 TB (mergeable, and any bracket works
    * — the curve is reported per cutoff). */
  val q224: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val ps = (1 to 10).map(_ / 10.0)
    val cuts = docs
      .select(posexplode(expr(
        s"percentile(doc_id, array(${ps.mkString(", ")}))")))
      .select((col("pos") + 1).as("decile"),
        floor(qround(col("col"), 6)).as("cut_doc_id"))
    val firstDoc = toks.groupBy("tok").agg(min(col("doc_id")).as("fd"))
    val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    val vocab = broadcast(cuts).join(firstDoc, col("fd") <= col("cut_doc_id"))
      .groupBy("decile", "cut_doc_id")
      .agg(count(lit(1)).as("vocabulary"))
    val volume = broadcast(cuts).join(perDoc, col("doc_id") <= col("cut_doc_id"))
      .groupBy("decile", "cut_doc_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    volume.join(vocab, Seq("decile", "cut_doc_id"))
      .select(col("decile"), col("cut_doc_id"), col("n_docs"),
        col("n_tokens"), col("vocabulary"))
      .orderBy("decile")
  }

  /** q230 — dedup threshold-sensitivity report: how many near-dup pairs
    * and affected documents each MinHash agreement threshold would
    * remove — the sweep a curation team reads before committing to a
    * cutoff (too low: false merges; too high: residual duplication).
    * Thresholds are INTEGER agreement counts (a16 ∈ {4,6,8,10,12} of 16
    * perms, i.e. Ĵ ≥ k/16) so the sweep never compares floats; the
    * candidate set is the q27 LSH bucket join (any candidate shares a
    * full 4-row band ⇒ a16 ≥ 4, so k=4 reads "all candidates"). One
    * agreement pass; the 5-row threshold frame fans it out. */
  val q230: Q = (spark, dir) => {
    val cands = cands4Cached(spark, dir)
    val packed = packedSigsCached(spark, dir)
    val agree = cands
      .join(packed.select(col("doc_id").as("id_a"), col("sig").as("sig_a")),
        Seq("id_a"))
      .join(packed.select(col("doc_id").as("id_b"), col("sig").as("sig_b")),
        Seq("id_b"))
      .withColumn("a16", expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), " +
          "0, (a, v) -> a + v)").cast("long"))
      .select("id_a", "id_b", "a16")
    val ths = spark.range(1).select(explode(
      array(Seq(4L, 6L, 8L, 10L, 12L).map(lit): _*)).as("min_agree"))
    val hit = broadcast(ths).join(agree, col("a16") >= col("min_agree"))
    val nP = hit.groupBy("min_agree").agg(count(lit(1)).as("n_pairs"))
    val nD = hit
      .select(col("min_agree"),
        explode(array(col("id_a"), col("id_b"))).as("d"))
      .groupBy("min_agree").agg(countDistinct(col("d")).as("n_docs_affected"))
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    nP.join(nD, Seq("min_agree")).crossJoin(broadcast(nDocs))
      .withColumn("pct_docs", qround(
        col("n_docs_affected").cast("double") / col("n_docs").cast("double"),
        6))
      .select(col("min_agree"), col("n_pairs"), col("n_docs_affected"),
        col("n_docs"), col("pct_docs"))
      .orderBy("min_agree")
  }

  /** q242 — asymmetric CONTAINMENT near-dup audit: ordered pairs where
    * ≥ 80 % of the smaller document's 3-gram shingles live inside the
    * other document — the subset-duplicate class (quote blocks,
    * truncated re-crawls, doc-inside-concatenation) that symmetric
    * Jaccard dedup (q26/q27/q73) structurally under-scores: J =
    * |A∩B|/|A∪B| ≤ |A|/|B| however complete the containment, so a short
    * doc swallowed by a long one sails under every Jaccard threshold.
    * `jaccard_blind` marks exactly those pairs (containment ≥ 0.8 but
    * J < 0.5) — the rows a Jaccard-only ledger misses. Same sparse
    * inverted-index co-occurrence join as q45, with the same
    * document-frequency cap as the quadratic-tail guard (shingles in
    * > 100 docs carry no discrimination and are dropped from join AND
    * denominators, so the ratio lives in one consistent space); all
    * ratios exact integer ppm. Scale path: the df-cap bounds each
    * posting list, so the pair stream is Σ df² over CAPPED lists —
    * never |docs|². */
  val q242: Q = (spark, dir) => {
    // r17: read the memoized shingle frame (identical construction) and
    // materialize the df-capped view once — `kept` feeds THREE subtrees
    // (sizes, both co-occurrence join sides), each of which re-ran the
    // explode + df aggregate + semi-join.
    val sh = shinglesCached(spark, dir)
    val kept = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100).select("shingle"),
      Seq("shingle"))
      .localCheckpoint()
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    // spreadByKey (r16): same quadratic-output join fix as q267.
    val pairs = graft.text.TextAnalysis.spreadByKey(
        kept.select(col("doc_id").as("id_a"), col("shingle")), "shingle")
      .join(graft.text.TextAnalysis.spreadByKey(
        kept.select(col("doc_id").as("id_b"), col("shingle")), "shingle"),
        Seq("shingle"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("doc_id").as("id_a"), col("n").as("na")),
        Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n").as("nb")),
        Seq("id_b"))
      .withColumn("containment_ppm",
        expr("cast((2 * inter * 1000000 + na) div (2 * na) as bigint)"))
      .withColumn("jaccard_ppm",
        expr("cast((2 * inter * 1000000 + (na + nb - inter)) div (2 * (na + nb - inter)) as bigint)"))
      .filter(col("containment_ppm") >= 800000L)
      .withColumn("jaccard_blind", col("jaccard_ppm") < 500000L)
      .select("id_a", "id_b", "na", "nb", "inter", "containment_ppm",
        "jaccard_ppm", "jaccard_blind")
      .orderBy("id_a", "id_b")
  }

  /** q249 — LSH dedup RECALL audit: the exact high-Jaccard pair set
    * (q26's ground truth) bucketed by Jaccard decile, scored by whether
    * q27's band-collision CANDIDATE generation surfaced each pair — the
    * measured answer to "what does the 16-perm/4-row banding actually
    * miss at each similarity level", which the S-curve 1−(1−J⁴)⁴ only
    * predicts in expectation. Candidate-set precision (what fraction of
    * collisions are ≥ 0.4 true pairs) rides along, so the
    * recall/precision trade of the banding config is one artifact — the
    * tuning readout a 100 TB dedup run wants BEFORE committing the full
    * corpus. Buckets come from the engine-identical double `floor(10·J)`
    * (J is the same rational in both engines); recalls are exact
    * integer ppm. Everything reuses the memoized shingle/signature
    * frames — no new scan. */
  val q249: Q = (spark, dir) => {
    val ex = exactPairs04Cached(spark, dir)
      .withColumn("bucket", least(lit(9L), floor(col("jaccard") * 10)))
    val cands = cands4Cached(spark, dir)
    val byBucket = ex
      .join(cands.withColumn("hit", lit(1L)), Seq("id_a", "id_b"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_true"), sum(col("hit")).as("n_hit"))
      .withColumn("recall_ppm",
        expr("cast((2 * n_hit * 1000000 + n_true) div (2 * n_true) as bigint)"))
    val candStats = cands
      .join(ex.select("id_a", "id_b").withColumn("t", lit(1L)),
        Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("n_cand"),
        sum(coalesce(col("t"), lit(0L))).as("n_cand_true"))
      .withColumn("precision_ppm",
        expr("cast((2 * n_cand_true * 1000000 + n_cand) div (2 * n_cand) as bigint)"))
    byBucket.crossJoin(broadcast(candStats))
      .select("bucket", "n_true", "n_hit", "recall_ppm", "n_cand",
        "n_cand_true", "precision_ppm")
      .orderBy("bucket")
  }

  /** q267 — WEIGHTED Jaccard near-dups: WJ = Σ_t min(c_a,c_b) /
    * Σ_t max(c_a,c_b) over shingle MULTIPLICITIES — the similarity the
    * set-Jaccard family (q26/q242) under-reads on repetitive text,
    * where a doc that repeats one paragraph five times set-collapses to
    * the single-copy doc (Ioffe's weighted-MinHash target, computed
    * exactly). Σmax needs no union join: max = a + b − min, so
    * Σmax = tot_a + tot_b − Σmin_shared with off-support mins zero.
    * Same inverted-index co-occurrence join and df-cap as q242 (the
    * cap counts DISTINCT docs per shingle); ratios exact integer ppm. */
  val q267: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    val sh = graft.text.TextAnalysis
      .shinglesAll(Tables.spreadScan(docs), "doc_id", "text", 3)
      .groupBy("doc_id", "shingle").agg(count(lit(1)).as("c"))
    // r17: materialize the df-capped multiset once — it feeds three
    // subtrees (tot, both join sides), each re-running the
    // multiplicity groupBy + df semi-join.
    val kept = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 100).select("shingle"),
      Seq("shingle"))
      .localCheckpoint()
    val tot = kept.groupBy("doc_id").agg(sum(col("c")).as("tot"))
    // spreadByKey (r16): the co-occurrence join's inputs are MBs but its
    // output is Σ df² — AQE's input-sized coalescing serialized the pair
    // scan (see TextAnalysis.spreadByKey).
    graft.text.TextAnalysis.spreadByKey(
        kept.select(col("doc_id").as("id_a"), col("shingle"),
          col("c").as("ca")), "shingle")
      .join(graft.text.TextAnalysis.spreadByKey(
        kept.select(col("doc_id").as("id_b"), col("shingle"),
          col("c").as("cb")), "shingle"),
        Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(least(col("ca"), col("cb"))).as("smin"))
      .join(tot.select(col("doc_id").as("id_a"), col("tot").as("ta")),
        Seq("id_a"))
      .join(tot.select(col("doc_id").as("id_b"), col("tot").as("tb")),
        Seq("id_b"))
      .withColumn("wjaccard_ppm",
        expr("cast((2 * smin * 1000000 + (ta + tb - smin)) div (2 * (ta + tb - smin)) as bigint)"))
      .filter(col("wjaccard_ppm") >= 400000L)
      .select("id_a", "id_b", "smin", "ta", "tb", "wjaccard_ppm")
      .orderBy("id_a", "id_b")
  }

  /** q274 — emerging-terms report (vocabulary drift top-k): tokens
    * whose document frequency grew most between the corpus's first and
    * second doc_id halves, ranked by exact integer ppm lift with a
    * Laplace-style +1 smoothing so new-in-half-2 terms rank finitely —
    * the "what is the crawl suddenly talking about" monitor that
    * complements q224's volume-growth curve (Heaps says HOW MANY new
    * terms; this says WHICH). Support floor df₂ ≥ 3 is the q223
    * prefilter (lossless for the ranking, kills the hapax tail at
    * scale). One token scan, two conditional df aggregates, a
    * TakeOrderedAndProject top-25. */
  val q274: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    // half boundary from min/max — exact in both engines, no
    // approximate-percentile algorithm to disagree about
    val cut = broadcast(docs.agg(
      expr("cast((min(doc_id) + max(doc_id)) div 2 as bigint)").as("cut")))
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) >= 3)
      .distinct()
    val df = tok.crossJoin(cut).groupBy("token")
      .agg(sum(when(col("doc_id") <= col("cut"), 1L).otherwise(0L))
          .as("df1"),
        sum(when(col("doc_id") > col("cut"), 1L).otherwise(0L))
          .as("df2"))
    val n = docs.crossJoin(cut).agg(
        sum(when(col("doc_id") <= col("cut"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("doc_id") > col("cut"), 1L).otherwise(0L)).as("n2"))
    df.filter(col("df2") >= 3L).crossJoin(broadcast(n))
      // lift of smoothed rates: ((df2+1)/(n2+1)) / ((df1+1)/(n1+1)),
      // exact half-up integer ppm via the cross-multiplied idiom
      .withColumn("lift_ppm",
        expr("cast((2 * cast((df2 + 1) as decimal(38,0)) * (n1 + 1) * 1000000 + cast((df1 + 1) as decimal(38,0)) * (n2 + 1)) div (2 * cast((df1 + 1) as decimal(38,0)) * (n2 + 1)) as bigint)"))
      .orderBy(col("lift_ppm").desc, col("token"))
      .limit(25)
      .select("token", "df1", "df2", "lift_ppm")
  }

  /** q286 — corpus PII scrub audit (per-source compliance rollup): the
    * report a data-governance pass emits BEFORE a corpus ships to
    * training — per source, how many documents contain emails / URLs /
    * long digit runs, total occurrences of each, and the clean-document
    * rate in exact ppm. Extends q59's per-document redaction to the
    * corpus level; `regexp_count` is codegen'd per row, so the whole
    * audit is one scan + one |sources|-row aggregate (100 TB shape:
    * map-side partial counts, no shuffle beyond the tiny group-by).
    * PII is PLANTED deterministically (the q59 trick — the synthetic
    * corpus is clean, so the audit would be all-zeros): doc_id % 3 → an
    * email, % 5 → an account-number digit run, % 7 → a URL; the
    * non-planted remainder verifies the zero side. Both engines count
    * non-overlapping leftmost regex matches over identical text. */
  val q286: Q = (spark, dir) => {
    val planted = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" reach_"), col("doc_id"), lit("@example.com")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" acct 9000"), col("doc_id"), lit("17")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" see https://ex.org/d/"), col("doc_id")))
        .otherwise(lit("")))
    val pats = Seq(
      "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+",
      "digitrun" -> "[0-9]{6,}",
      "url" -> "https?://[^ ]+")
    val counted = pats.foldLeft(
      Tables.documents(spark, dir).select(col("source"),
        planted.as("body"))) { case (df, (name, p)) =>
      df.withColumn(s"${name}_n",
        regexp_count(col("body"), lit(p)).cast("long"))
    }
    val aggs = pats.flatMap { case (name, _) => Seq(
      sum(when(col(s"${name}_n") > 0, 1L).otherwise(0L))
        .as(s"${name}_docs"),
      sum(col(s"${name}_n")).as(s"${name}_hits")) }
    counted
      .withColumn("is_clean",
        when(pats.map(p => col(s"${p._1}_n") > 0).reduce(_ || _), 0L)
          .otherwise(1L))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        (aggs :+ sum(col("is_clean")).as("clean_docs")): _*)
      .withColumn("clean_ppm",
        expr("cast((2 * clean_docs * 1000000 + n_docs) div (2 * n_docs) as bigint)"))
      .orderBy("source")
  }

  /** q289 — cross-source duplication matrix: q27's thresholded near-dup
    * pairs joined back to document metadata and rolled up per
    * (source_a, source_b) cell — the "which sources copy from which"
    * contamination readout that decides whether a source is additive or
    * a mirror (off-diagonal mass = cross-source duplication; diagonal =
    * internal redundancy). Share is exact half-up ppm of all near-dup
    * pairs. Scale shape: the pair frame is candidates-only (banded LSH,
    * never all-pairs), the metadata joins key on doc id, and the matrix
    * is |sources|²-bounded. */
  val q289: Q = (spark, dir) => {
    val meta = Tables.documents(spark, dir).select("doc_id", "source")
    val cells = lshPairsCached(spark, dir)
      .join(meta.select(col("doc_id").as("id_a"), col("source").as("sa")),
        "id_a")
      .join(meta.select(col("doc_id").as("id_b"), col("source").as("sb")),
        "id_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
    val tot = cells.agg(sum(col("n_pairs")).as("n_total"))
    cells.crossJoin(broadcast(tot))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        (col("source_a") === col("source_b")).cast("int")
          .as("within_source"),
        expr("cast((2 * n_pairs * 1000000 + n_total) div (2 * n_total) as bigint)")
          .as("share_ppm"))
      .orderBy(col("n_pairs").desc, col("source_a"), col("source_b"))
  }

  /** q292 — Cohen's kappa for the language classifier (q22) against the
    * stored labels: chance-corrected agreement κ = (pₒ − pₑ)/(1 − pₑ),
    * the standard report when raw accuracy flatters an imbalanced label
    * set (a majority-class guesser scores high pₒ but κ ≈ 0). pₑ comes
    * from the confusion matrix's row/column marginals — all EXACT
    * integer arithmetic (N·agree − Σrs·cs over N² − Σrs·cs, widened to
    * DECIMAL(38,0)/HUGEINT), one mirrored IEEE divide, 6 dp out. Matrix
    * is |langs|²-bounded; the only data-sized work is q22's classify
    * pass. */
  val q292: Q = (spark, dir) => {
    val pairs = langPredsCached(spark, dir).select("predicted", "actual")
    val cells = pairs.groupBy("predicted", "actual")
      .agg(count(lit(1)).as("c"))
    val pe = cells.groupBy("predicted").agg(sum(col("c")).as("rsum"))
      .join(cells.groupBy("actual").agg(sum(col("c")).as("csum")),
        col("predicted") === col("actual"))
      .agg(coalesce(sum((col("rsum").cast("decimal(38,0)") * col("csum"))
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)"))
        .as("pe_num"))
    val tot = pairs.agg(count(lit(1)).as("n_docs"),
      sum(when(col("predicted") === col("actual"), 1L).otherwise(0L))
        .as("n_agree"))
    tot.crossJoin(broadcast(pe))
      .select(col("n_docs"), col("n_agree"),
        qround(col("n_agree").cast("double") /
          col("n_docs").cast("double"), 6).as("po"),
        qround(expr("cast(pe_num as double)") /
          expr("cast(cast(n_docs as decimal(38,0)) * n_docs as double)"),
          6).as("pe"),
        qround(
          expr("cast(cast(n_docs as decimal(38,0)) * n_agree - pe_num as double)") /
          expr("cast(cast(n_docs as decimal(38,0)) * n_docs - pe_num as double)"),
          6).as("kappa"))
  }

  /** q294 — training-data quality-filter funnel: the curation waterfall
    * every corpus report publishes — how many documents survive each
    * successive filter (min length → low 3-gram repetition → language
    * agreement) and what each stage drops, in exact ppm. Composes the
    * existing per-doc signals (q20-style token counts, q69 repetition,
    * q22 language-ID) into the ONE sequential readout that decides
    * filter ordering and thresholds. One pass builds all flags (the
    * repetition and language frames join on doc_id); the funnel rows
    * are conditional sums of a single aggregate — no per-stage rescan.
    * Docs too short to shingle carry dup_ratio 0 (no repetition
    * evidence), mirrored by COALESCE in the oracle. */
  val q294: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"))
    val rep = repetitionScore(Tables.documents(spark, dir),
      "doc_id", "text", n = 3).select("doc_id", "dup_ratio")
    val lang = langPredsCached(spark, dir).select("doc_id", "correct")
    val flags = docs
      .join(rep, Seq("doc_id"), "left")
      .join(lang, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("n_tokens") >= 20).as("f1"),
        coalesce(col("dup_ratio"), lit(0.0)).as("dr"),
        coalesce(col("correct"), lit(0)).as("ok"))
      .withColumn("f2", col("f1") && col("dr") <= 0.2)
      .withColumn("f3", col("f2") && col("ok") === 1)
    val agg = flags.agg(count(lit(1)).as("n0"),
      sum(when(col("f1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("f2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("f3"), 1L).otherwise(0L)).as("n3"))
    def stage(name: String, in: String, out: String) =
      agg.select(lit(name).as("stage"), col(in).as("n_in"),
        col(out).as("n_out"), (col(in) - col(out)).as("n_dropped"),
        expr(s"cast((2 * ($in - $out) * 1000000 + $in) div (2 * $in) as bigint)")
          .as("drop_ppm"),
        expr(s"cast((2 * $out * 1000000 + n0) div (2 * n0) as bigint)")
          .as("retained_of_corpus_ppm"))
    stage("1_min_length", "n0", "n1")
      .unionByName(stage("2_low_repetition", "n1", "n2"))
      .unionByName(stage("3_lang_agreement", "n2", "n3"))
      .orderBy("stage")
  }

  /** q295 — dedup token savings: the headline "near-dup dedup saved X %
    * of training tokens" metric — per source, documents and whitespace
    * tokens before vs after q74's survivorship (canonical docs +
    * singletons survive, cluster victims drop), savings in exact ppm.
    * The pipeline's cost-benefit receipt: token counts are what the
    * trainer pays for. Victims frame is |clusters|-bounded; everything
    * else is one scan with map-side partial sums. */
  val q295: Q = (spark, dir) => {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val victims = graft.text.Dedup.nearDupClusters(
        lshPairsCached(spark, dir), "id_a", "id_b")
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"), lit(1).as("victim"))
    toks.join(broadcast(victims), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("docs_before"),
        sum(when(col("victim").isNull, 1L).otherwise(0L))
          .as("docs_after"),
        sum(col("n_tokens")).as("tokens_before"),
        sum(when(col("victim").isNull, col("n_tokens")).otherwise(0L))
          .as("tokens_after"))
      .withColumn("token_savings_ppm",
        expr("cast((2 * (tokens_before - tokens_after) * 1000000 + tokens_before) div (2 * tokens_before) as bigint)"))
      .orderBy("source")
  }

  /** q330 — temperature-scaled source-mixture weights: the multinomial
    * sampling distribution multilingual/multi-source LLM training uses to
    * up-weight small sources (w_s ∝ p_s^α, α < 1 flattens the mixture —
    * the XLM-R / mT5 recipe). Per source: exact token counts, the raw
    * share p, weights at α = 0.3 and 0.7, and the implied epochs each
    * source runs when the training budget equals one corpus pass
    * (epochs > 1 ⇐ the source is over-sampled and will repeat). The
    * p^α values ride one mirrored IEEE `pow` each, quantized to
    * DECIMAL(28,9) BEFORE the cross-source normalization sum so the
    * denominator is exact and order-free. Scale shape: one documents
    * scan with map-side partials to a |sources|-row frame; every window
    * below runs on that dimension-bounded frame. */
  val q330: Q = (spark, dir) => {
    val per = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val tot = Window.partitionBy()
    val withP = per
      .withColumn("total_tokens", sum(col("n_tokens")).over(tot))
      .withColumn("p", col("n_tokens").cast("double") /
        col("total_tokens").cast("double"))
      .withColumn("r03", qdec(pow(col("p"), lit(0.3)), 28, 9))
      .withColumn("r07", qdec(pow(col("p"), lit(0.7)), 28, 9))
      .withColumn("z03", sum(col("r03")).over(tot))
      .withColumn("z07", sum(col("r07")).over(tot))
    withP.select(col("source"), col("n_docs"), col("n_tokens"),
        qround(col("p"), 6).as("p"),
        qround(col("r03").cast("double") / col("z03").cast("double"), 6)
          .as("w_alpha03"),
        qround(col("r07").cast("double") / col("z07").cast("double"), 6)
          .as("w_alpha07"),
        qround(col("r03").cast("double") / col("z03").cast("double") *
          col("total_tokens").cast("double") /
          col("n_tokens").cast("double"), 6).as("epochs_alpha03"),
        qround(col("r07").cast("double") / col("z07").cast("double") *
          col("total_tokens").cast("double") /
          col("n_tokens").cast("double"), 6).as("epochs_alpha07"))
      .orderBy("source")
  }

  /** q331 — unigram cross-entropy quality score (the perplexity proxy
    * classic corpus filters rank documents by): per document,
    * H(d) = −Σ_occurrences ln p(tok) / n_d under the corpus unigram LM,
    * rolled up per source. A document of globally-rare tokens scores
    * high (surprising ≈ noisy or exotic); boilerplate scores low. The
    * per-TOKEN −ln p is computed once per distinct token and quantized
    * to DECIMAL(28,9), so each document's sum over occurrences is exact
    * and order-free; the per-doc divide and the per-source mean are the
    * only IEEE steps, both textually mirrored. Scale shape: vocab build
    * is one token-keyed partial aggregation; the occurrence⋈vocab join
    * shuffles on token (the inverted-index shape every TF-IDF path here
    * uses); per-doc and per-source rollups are grouped aggs. */
  val q331: Q = (spark, dir) => {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("token"))
    val totalF = tok.agg(count(lit(1)).as("t_occ"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("c_occ"))
      .crossJoin(broadcast(totalF))
      .select(col("token"), qdec(
        -log(col("c_occ").cast("double") / col("t_occ").cast("double")),
        28, 9).as("lnp_q"))
    val perDoc = tok.join(vocab, "token")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lnp_q")).as("h_sum"))
      .select(col("source"),
        qround(col("h_sum").cast("double") / col("n_tok").cast("double"),
          6).as("xent"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(qdec(col("xent"), 28, 9)).as("sx"),
        min(col("xent")).as("min_xent"),
        max(col("xent")).as("max_xent"))
      .select(col("source"), col("n_docs"),
        qround(col("sx").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_xent"),
        col("min_xent"), col("max_xent"))
      .orderBy("source")
  }

  /** q332 — duplicate 8-gram mass per source: the memorization-risk
    * readout (what share of a source's 8-gram OCCURRENCES belong to an
    * 8-gram seen more than once in the whole corpus — the mass exact
    * substring dedup would touch, and the text a model is most likely
    * to regurgitate verbatim). 8-grams are hashed to the md5-derived
    * 63-bit key before any shuffle, so the wide gram strings never
    * leave the scan stage; corpus totals come from a window over the
    * (gram, source) aggregate whose groups are |sources|-bounded. All
    * counts exact BIGINT; the share is the repo's half-up integer ppm. */
  val q332: Q = (spark, dir) => {
    import graft.functions.GraftFunctions.md5_63
    val grams = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 8)
      .select(col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 7), i -> concat_ws(' ', slice(toks, i, 8)))"))
        .as("gram"))
      .select(col("source"), md5_63(col("gram")).as("g"))
    val perCell = grams.groupBy("g", "source")
      .agg(count(lit(1)).as("n_occ"))
    val withCorpus = perCell.withColumn("corpus_occ",
      sum(col("n_occ")).over(Window.partitionBy("g")))
    withCorpus.groupBy("source")
      .agg(sum(col("n_occ")).as("total_occ"),
        count(lit(1)).as("distinct_grams"),
        sum(when(col("corpus_occ") > 1, col("n_occ")).otherwise(0L))
          .as("dup_occ"))
      .withColumn("dup_mass_ppm",
        expr("cast((2 * dup_occ * 1000000 + total_occ) div (2 * total_occ) as bigint)"))
      .orderBy("source")
  }

  /** q333 — log-normal fit of document lengths per source: μ and σ² of
    * ln(tokens) from exact decimal log-moments, with the implied median
    * e^μ and mean e^(μ+σ²/2) beside the actual mean — the
    * distributional summary that sizes q85's packing bins and flags a
    * source whose length distribution is NOT log-normal-ish (fit mean
    * far from actual mean ⇒ heavy tail or truncation). Per-doc ln and
    * ln² quantize to DECIMAL(28,9) before the order-free sums; the
    * moment formulas are one mirrored IEEE expression each. One scan to
    * a |sources|-row frame. */
  val q333: Q = (spark, dir) => {
    val d = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("l", qdec(log(col("n_tok").cast("double")), 28, 9))
      .withColumn("l2", qdec(
        log(col("n_tok").cast("double")) * log(col("n_tok").cast("double")),
        28, 9))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        sum(col("l")).as("sl"), sum(col("l2")).as("sl2"))
      .select(col("source"), col("n_docs"),
        qround(col("sl").cast("double") / col("n_docs").cast("double"), 6)
          .as("mu"),
        qround(col("sl2").cast("double") / col("n_docs").cast("double") -
          (col("sl").cast("double") / col("n_docs").cast("double")) *
          (col("sl").cast("double") / col("n_docs").cast("double")), 6)
          .as("sigma2"),
        qround(exp(col("sl").cast("double") /
          col("n_docs").cast("double")), 6).as("fit_median_tokens"),
        qround(exp(col("sl").cast("double") / col("n_docs").cast("double") +
          (col("sl2").cast("double") / col("n_docs").cast("double") -
            (col("sl").cast("double") / col("n_docs").cast("double")) *
            (col("sl").cast("double") / col("n_docs").cast("double"))) / 2),
          6).as("fit_mean_tokens"),
        qround(col("sum_tokens").cast("double") /
          col("n_docs").cast("double"), 6).as("actual_mean_tokens"))
      .orderBy("source")
  }

  /** q334 — near-dup cluster-size spectrum: the histogram of q73's
    * connected-component sizes plus the unclustered singletons — the
    * shape that decides dedup policy (a fat tail of giant clusters
    * means templated/mirrored content; all-pairs-of-2 means true
    * near-dups). Cluster frame is pairs-bounded (vanishing vs corpus);
    * the singleton row is corpus_count − clustered_count, exact. Docs
    * share per size-class in half-up ppm of the whole corpus. */
  val q334: Q = (spark, dir) => {
    val clusters = graft.text.Dedup.nearDupClusters(
      lshPairsCached(spark, dir), "id_a", "id_b")
    val perCluster = clusters.groupBy("canonical_id")
      .agg(max(col("cluster_size")).as("cluster_size"))
    val hist = perCluster.groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
    val totals = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("corpus_docs"))
    val clustered = hist.agg(
      coalesce(sum(col("n_docs")), lit(0L)).as("clustered_docs"))
    val singleton = totals.crossJoin(broadcast(clustered))
      .select(lit(1L).as("cluster_size"),
        (col("corpus_docs") - col("clustered_docs")).as("n_clusters"),
        (col("corpus_docs") - col("clustered_docs")).as("n_docs"))
    singleton.unionByName(
        hist.select(col("cluster_size").cast("long").as("cluster_size"),
          col("n_clusters"), col("n_docs").cast("long").as("n_docs")))
      .crossJoin(broadcast(totals))
      .select(col("cluster_size"), col("n_clusters"), col("n_docs"),
        expr("cast((2 * n_docs * 1000000 + corpus_docs) div (2 * corpus_docs) as bigint)")
          .as("docs_ppm"))
      .orderBy("cluster_size")
  }

  /** q343 — bigram cross-entropy (the conditional sibling of q331's
    * unigram score): per document H₂(d) = −Σ ln p(w|v) / n_bigrams with
    * add-½ smoothing over the corpus vocabulary — the perplexity proxy
    * that penalizes IMPROBABLE SEQUENCES (shuffled or templated text)
    * where the unigram score only sees rare words. p(w|v) =
    * (c(vw)+0.5) / (c(v·)+0.5·V), all counts exact: c(vw) from one
    * bigram aggregate, the prefix total c(v·) from a window over it
    * (groups are vocabulary-bounded), V from the unigram pass. The
    * per-bigram −ln p quantizes to DECIMAL(28,9) once per DISTINCT
    * bigram; per-doc sums are exact and order-free. Scale shape: two
    * token-keyed aggregations and one occurrence⋈bigram join — the same
    * inverted-index shuffle class as q331/q170. */
  val q343: Q = (spark, dir) => {
    val toks = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
    val occ = toks.select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(element_at(toks, i) as v, element_at(toks, i + 1) as w))"))
        .as("bg"))
      .select(col("doc_id"), col("source"),
        col("bg.v").as("v"), col("bg.w").as("w"))
    val vocabF = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .agg(countDistinct(col("token")).as("vsize"))
    val bg = occ.groupBy("v", "w").agg(count(lit(1)).as("c_vw"))
      .withColumn("c_v", sum(col("c_vw")).over(Window.partitionBy("v")))
      .crossJoin(broadcast(vocabF))
      .select(col("v"), col("w"), qdec(
        -log((col("c_vw").cast("double") + 0.5) /
          (col("c_v").cast("double") + col("vsize") * 0.5)), 28, 9)
        .as("lnp_q"))
    val perDoc = occ.join(bg, Seq("v", "w"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_bg"), sum(col("lnp_q")).as("h_sum"))
      .select(col("source"),
        qround(col("h_sum").cast("double") / col("n_bg").cast("double"),
          6).as("xent2"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(qdec(col("xent2"), 28, 9)).as("sx"),
        min(col("xent2")).as("min_xent2"),
        max(col("xent2")).as("max_xent2"))
      .select(col("source"), col("n_docs"),
        qround(col("sx").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_xent2"),
        col("min_xent2"), col("max_xent2"))
      .orderBy("source")
  }

  /** q344 — data-driven stopword discovery: rank tokens by DOCUMENT
    * frequency share (df/corpus docs, exact half-up ppm) with total
    * occurrences beside it — the list a new-domain curation pipeline
    * derives before q21's hand-picked stopword ratio makes sense.
    * Candidates flag at df > 50 %. One distinct-(doc, token) aggregate
    * (map-side partials), token-keyed — the Zipf head this surfaces is
    * exactly the high-df mass q45/q26's caps drop. Top-50 by df with
    * token tiebreak. */
  val q344: Q = (spark, dir) => {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val totals = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n_corpus_docs"))
    tok.groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("occurrences"))
      .crossJoin(broadcast(totals))
      .select(col("token"), col("df"), col("occurrences"),
        expr("cast((2 * df * 1000000 + n_corpus_docs) div (2 * n_corpus_docs) as bigint)")
          .as("df_ppm"))
      .withColumn("stopword_candidate",
        when(col("df_ppm") > 500000L, 1L).otherwise(0L))
      .orderBy(desc("df"), desc("occurrences"), col("token"))
      .limit(50)
  }

  /** q345 — sliding-window chunk overlap audit: the RAG-style chunker
    * (size 64, stride 48) starts a chunk at every multiple of the
    * stride below the document length, so consecutive chunks share
    * size − stride tokens; this measures what that overlap COSTS per
    * source — emitted chunk-token volume vs raw tokens, in exact ppm —
    * the number that decides stride before a 100 TB re-chunk. Chunk
    * lengths come from an in-row sequence explode (shuffle-free until
    * the |sources|-row rollup); all integer. */
  val q345: Q = (spark, dir) => {
    val size_ = 64
    val stride = 48
    val d = Tables.documents(spark, dir)
      .select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("chunk_len", explode(expr(
        s"transform(sequence(0, cast((n_tok - 1) div $stride as int)), " +
          s"i -> least(cast($size_ as bigint), n_tok - i * $stride))")))
    d.groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("chunk_tokens"),
        sum(when(col("chunk_len") === size_, 1L).otherwise(0L))
          .as("full_chunks"))
      .join(Tables.documents(spark, dir)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("raw_tokens")),
        Seq("source"))
      .select(col("source"), col("n_docs"), col("raw_tokens"),
        col("n_chunks"), col("chunk_tokens"), col("full_chunks"),
        expr("cast((2 * (chunk_tokens - raw_tokens) * 1000000 + chunk_tokens) div (2 * chunk_tokens) as bigint)")
          .as("overlap_ppm"))
      .orderBy("source")
  }

  /** q349 — decontamination n-gram-width sweep: the q82 exact
    * contamination pass at n = 4 / 8 / 12, reduced to the corpus-level
    * rates — contaminated training docs, total shared-gram hits, and
    * the contamination rate in exact ppm per width. THE sensitivity
    * report a team reads before burning a 100 TB decontamination run:
    * n too small over-flags (common phrases), n too large misses
    * paraphrase edits; the sweep shows where this corpus's curve bends.
    * Each arm reuses the q82 plan shape (benchmark side distinct +
    * broadcast; the corpus scan is the only data-sized work, once per
    * n); the report is a 3-row union of scalar aggregates. */
  val q349: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val trainTotal = train.agg(count(lit(1)).as("n_train_docs"))
    Seq(4, 8, 12).map { n =>
      val hits = contaminationReport(train, bench, "doc_id", "text", n = n)
      hits.agg(count(lit(1)).as("contaminated_docs"),
          coalesce(sum(col("n_shared")), lit(0L)).as("shared_gram_hits"))
        .crossJoin(broadcast(trainTotal))
        .select(lit(n.toLong).as("ngram_n"), col("n_train_docs"),
          col("contaminated_docs"), col("shared_gram_hits"),
          expr("cast((2 * contaminated_docs * 1000000 + n_train_docs) div (2 * n_train_docs) as bigint)")
            .as("contamination_ppm"))
    }.reduce(_ unionByName _)
      .orderBy("ngram_n")
  }

  /** q350 — per-source quality-score drift (PSI against the corpus):
    * q21's quality score binned into ten fixed deciles, each source's
    * bin distribution compared to the global one by the population
    * stability index Σ(p_s − p_g)·ln(p_s/p_g) with add-½ smoothing —
    * the standard "is this source distributionally weird" gate next to
    * q115's event-feature PSI, here pointed at the curation signal
    * itself. Counts are exact; per-bin terms quantize to DECIMAL(18,9)
    * before the order-free sum; verdict at the conventional 0.1/0.25
    * bands. One documents scan to a (source × 10)-cell frame. */
  val q350: Q = (spark, dir) => {
    val scored = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop",
        expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to')))"))
      .withColumn("quality",
        (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) *
          least(lit(1.0), col("n_tokens").cast("double") / 100.0))
      .select(col("source"),
        least(lit(9L), floor(col("quality") * 10.0)).as("bin"))
    val cells = scored.groupBy("source", "bin")
      .agg(count(lit(1)).as("c"))
    val grid = cells.select(col("source")).distinct()
      .crossJoin(cells.select(col("bin")).distinct())
      .join(cells, Seq("source", "bin"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val withTot = grid
      .withColumn("n_s", sum(col("c")).over(Window.partitionBy("source")))
      .withColumn("g", sum(col("c")).over(Window.partitionBy("bin")))
      .withColumn("nn", sum(col("c")).over(Window.partitionBy()))
      .withColumn("nbins",
        count(lit(1)).over(Window.partitionBy("source")))
    val terms = withTot
      .withColumn("ps", (col("c").cast("double") + 0.5) /
        (col("n_s").cast("double") + col("nbins") * 0.5))
      .withColumn("pg", (col("g").cast("double") + 0.5) /
        (col("nn").cast("double") + col("nbins") * 0.5))
      .withColumn("term", qdec(
        (col("ps") - col("pg")) * log(col("ps") / col("pg")), 18, 9))
    terms.groupBy("source")
      .agg(max(col("n_s")).as("n_docs"), sum(col("term")).as("psi0"))
      .select(col("source"), col("n_docs"),
        graft.functions.GraftFunctions.decOut(col("psi0"), 6).as("psi"))
      .withColumn("verdict",
        when(col("psi") > 0.25, "shifted")
          .when(col("psi") > 0.1, "moderate")
          .otherwise("stable"))
      .orderBy("source")
  }

  /** q355 — LSH banding (b, r) sweep: the 16-perm signatures regrouped
    * at rows-per-band 2 / 4 / 8 (b = 8 / 4 / 2 bands), per config the
    * candidate-pair volume, how many candidates clear the est-Jaccard
    * 0.5 bar, the precision that implies (exact ppm), and the analytic
    * S-curve threshold (1/b)^(1/r) — the knob chart that picks a
    * banding BEFORE a corpus-scale dedup run (more bands = lower
    * threshold = more candidates = more verification cost). Signatures
    * build once (the memoized q25 frame); each arm is one banded
    * self-join + the packed-signature agreement fold, reduced to a
    * 1-row scalar — the report is a 3-row union. */
  val q355: Q = (spark, dir) => {
    val sigs = sigsCached(spark, dir)
    Seq(2, 4, 8).map { r =>
      val b = 16 / r
      // r=4 is the pipeline's production banding — its candidate+estimate
      // pass is the session-shared one (q27/q230/q249/q374); the other
      // two arms are sweep-only configs computed here.
      val est =
        if (r == 4) est4Cached(spark, dir)
        else estimatedJaccard(lshCandidatePairs(sigs, "doc_id",
          rowsPerBand = r), sigs, "doc_id", numPerm = 16)
      est.agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(when(col("est_jaccard") >= 0.5, 1L).otherwise(0L)),
            lit(0L)).as("n_above_05"))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          qround(pow(lit(1.0) / b, lit(1.0) / r), 6).as("s_curve_threshold"),
          col("n_candidates"), col("n_above_05"),
          when(col("n_candidates") > 0,
            expr("cast((2 * n_above_05 * 1000000 + n_candidates) div (2 * n_candidates) as bigint)"))
            .otherwise(lit(0L)).as("precision_ppm"))
    }.reduce(_ unionByName _)
      .orderBy("rows_per_band")
  }

  /** q359 — language-ID confusion matrix: per (actual, predicted) cell
    * of q22's classifier, counts plus the row-conditional rate
    * P(predicted | actual) in exact ppm — the per-class detail behind
    * q292's single κ (WHICH languages leak into which decides whether
    * to fix profiles or drop a class). Reuses the memoized prediction
    * frame; the matrix is |langs|²-bounded, so the row-total window is
    * dimension-sized. */
  val q359: Q = (spark, dir) => {
    val cells = langPredsCached(spark, dir)
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
    cells
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy("actual")))
      .select(col("actual"), col("predicted"), col("n"),
        expr("cast((2 * n * 1000000 + row_total) div (2 * row_total) as bigint)")
          .as("rate_ppm"),
        (col("actual") === col("predicted")).cast("int").as("is_correct"))
      .orderBy("actual", "predicted")
  }

  /** q362 — lexical diversity by MATTR (moving-average type-token
    * ratio, window 25): the length-robust replacement for the raw
    * distinct/total ratio (q20), whose value collapses as documents
    * grow — MATTR averages the TTR of every 25-token window, so a
    * 40-token and a 4000-token document are comparable. Docs shorter
    * than the window fall back to whole-doc TTR (the standard
    * convention). Window distinct-counts are an IN-ROW transform over
    * the token array (no explode, no shuffle until the |sources|
    * rollup); per-doc values quantize to DECIMAL(28,9) before the
    * cross-doc sums. */
  val q362: Q = (spark, dir) => {
    val w = 25
    val perDoc = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok", size(col("toks")))
      .withColumn("mattr", qround(
        when(col("n_tok") < w,
          size(array_distinct(col("toks"))).cast("double") / col("n_tok"))
        .otherwise(expr(
          s"""aggregate(transform(sequence(1, n_tok - ${w - 1}),
             |  i -> size(array_distinct(slice(toks, i, $w)))),
             |0L, (a, x) -> a + x)""".stripMargin).cast("double") /
          ((col("n_tok") - (w - 1)) * w)), 6))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(qdec(col("mattr"), 28, 9)).as("sm"),
        min(col("mattr")).as("min_mattr"),
        max(col("mattr")).as("max_mattr"))
      .select(col("source"), col("n_docs"),
        qround(col("sm").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_mattr"),
        col("min_mattr"), col("max_mattr"))
      .orderBy("source")
  }

  /** q363 — Bloom-filter sizing sheet for the q94 decontamination
    * prefilter: the benchmark side's distinct 8-gram count n (the keys
    * the filter must hold) priced at 8 / 12 / 16 bits per key — optimal
    * hash count k = round(bpk·ln2), predicted false-positive rate
    * (1 − e^(−k/bpk))^k, and the filter's byte size. The sheet a
    * pipeline reads to pick the memory/selectivity point BEFORE
    * broadcasting a filter to a thousand executors; n is live data, the
    * curves one mirrored IEEE formula per row. */
  val q363: Q = (spark, dir) => {
    val bench = Tables.documents(spark, dir)
      .filter(col("doc_id") % 17 === 0)
    val nF = shingles(bench, "doc_id", "text", n = 8)
      .select(col("shingle")).distinct()
      .agg(count(lit(1)).as("n_keys"))
    Seq(8, 12, 16).map { bpk =>
      nF.select(lit(bpk.toLong).as("bits_per_key"), col("n_keys"),
        expr(s"cast(($bpk * n_keys + 7) div 8 as bigint)")
          .as("filter_bytes"),
        floor(lit(bpk.toDouble) * log(lit(2.0)) + lit(0.5)).as("k_hashes"))
    }.reduce(_ unionByName _)
      .withColumn("predicted_fpr", qround(
        pow(lit(1.0) - exp(-col("k_hashes").cast("double") /
          col("bits_per_key").cast("double")), col("k_hashes").cast("double")),
        9))
      .orderBy("bits_per_key")
  }

  /** q368 — Zipf rank-frequency fit: OLS of ln(frequency) on ln(rank)
    * over the full term vocabulary (rank by occurrence count, token
    * tiebreak) — slope ≈ −1 is Zipf's law; the deviation says how
    * head-heavy this corpus is, the third leg beside q95's df spectrum
    * and q224's Heaps growth. The regression runs on the VOCABULARY
    * frame (data-size-independent after the one token aggregate);
    * ln terms and their products quantize to DECIMAL(28,9) before the
    * exact sums; slope/intercept/r² are one mirrored IEEE formula
    * each. */
  val q368: Q = (spark, dir) => {
    val freq = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("occ"))
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("occ"), col("token"))))
    val t = freq
      .withColumn("x", qdec(log(col("rank").cast("double")), 28, 9))
      .withColumn("y", qdec(log(col("occ").cast("double")), 28, 9))
      .withColumn("xy", qdec(
        log(col("rank").cast("double")) * log(col("occ").cast("double")),
        28, 9))
      .withColumn("xx", qdec(
        log(col("rank").cast("double")) * log(col("rank").cast("double")),
        28, 9))
      .withColumn("yy", qdec(
        log(col("occ").cast("double")) * log(col("occ").cast("double")),
        28, 9))
    // degenerate vocabularies zero an OLS denominator (one term ⇒ zero
    // rank variance; every occ = 1 ⇒ zero frequency variance, r²'s
    // divisor): DuckDB's x/0 is NULL where Spark ANSI throws — guard to
    // the oracle's NULL (fuzz gate, disjoint_vocab class)
    t.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum("xy").as("sxy"), sum("xx").as("sxx"), sum("yy").as("syy"))
      .withColumn("sxx_n",
        col("n").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      .withColumn("syy_n",
        col("n").cast("double") * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double"))
      .withColumn("sxy_n",
        col("n").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double"))
      .withColumn("slope",
        when(col("sxx_n") === 0.0, lit(null))
          .otherwise(col("sxy_n") / col("sxx_n")))
      .select(col("n").as("n_terms"),
        qround(col("slope"), 6).as("zipf_slope"),
        qround((col("sy").cast("double") - col("slope") *
          col("sx").cast("double")) / col("n").cast("double"), 6)
          .as("intercept"),
        when(col("sxx_n") * col("syy_n") === 0.0, lit(null))
          .otherwise(qround(col("sxy_n") * col("sxy_n") /
            (col("sxx_n") * col("syy_n")), 6)).as("r2"))
  }

  /** q370 — dedup quality shift: does near-dup removal (q74's
    * survivorship) CHANGE each source's quality profile? Mean q21
    * quality over all docs vs over survivors, with the delta — positive
    * delta means duplicates were disproportionately LOW quality (dedup
    * helps twice), negative means the pipeline is deleting its best
    * content (boilerplate detection gone wrong). Reuses the memoized
    * LSH cluster frame; victims are pairs-bounded, so the survivor
    * filter is a broadcast anti-join; per-doc qualities quantize at
    * 6 dp (the q21 surface) then DECIMAL(28,9) for the cross-doc
    * sums. */
  val q370: Q = (spark, dir) => {
    val scored = Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_stop",
        expr("size(filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to')))"))
      .withColumn("quality", qround(
        (lit(1.0) - col("n_stop").cast("double") / col("n_tokens")) *
          least(lit(1.0), col("n_tokens").cast("double") / 100.0), 6))
      .select("doc_id", "source", "quality")
    val victims = graft.text.Dedup.nearDupClusters(
        lshPairsCached(spark, dir), "id_a", "id_b")
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"), lit(1).as("victim"))
    scored.join(broadcast(victims), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("victim").isNull, 1L).otherwise(0L))
          .as("n_survivors"),
        sum(qdec(col("quality"), 28, 9)).as("sq_all"),
        sum(when(col("victim").isNull, qdec(col("quality"), 28, 9))
          .otherwise(lit(0).cast("decimal(28,9)"))).as("sq_surv"))
      .select(col("source"), col("n_docs"), col("n_survivors"),
        qround(col("sq_all").cast("double") / col("n_docs").cast("double"),
          6).as("mean_quality_all"),
        qround(col("sq_surv").cast("double") /
          col("n_survivors").cast("double"), 6).as("mean_quality_survivors"),
        qround(col("sq_surv").cast("double") /
          col("n_survivors").cast("double") -
          col("sq_all").cast("double") / col("n_docs").cast("double"), 6)
          .as("quality_delta"))
      .orderBy("source")
  }

  /** q371 — weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    * exactly k = 100 documents drawn with probability proportional to
    * length, via the classic one-pass key kᵢ = ln(uᵢ)/wᵢ and a top-k —
    * the exact-size companion to q86's Bernoulli thinning (which only
    * controls the EXPECTED sample size). uᵢ comes from the keyed-md5
    * low-52-bit draw (the q307 convention — exact in double, strictly
    * inside (0,1)), so the sample is reproducible and layout-free; the
    * top-k is a bounded heap (TakeOrderedAndProject), never a global
    * sort. Keys are 9 dp-quantized BEFORE ordering with a doc_id
    * tiebreak, so the selected SET is pinned against ulp drift. */
  val q371: Q = (spark, dir) => {
    val u = (pmod(graft.functions.GraftFunctions.md5_63(
      concat(lit("wr:"), col("doc_id"))), lit(4503599627370496L))
      .cast("double") + 0.5) / lit(4503599627370496.0)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("weight"),
        qround(log(u) / col("n_chars").cast("double"), 9).as("es_key"))
      .orderBy(desc("es_key"), col("doc_id"))
      .limit(100)
  }

  /** q374 — MinHash estimation-error audit: for every LSH candidate
    * pair, the 16-perm estimate against the EXACT 3-gram Jaccard
    * (hashed-shingle sets intersected by the codegen'd merge-walk),
    * bucketed by estimate decile with the analytic binomial SE
    * √(J(1−J)/16) beside the measured error — the calibration sheet
    * that says whether 16 permutations are enough BEFORE trusting a
    * threshold (q230 sweeps the threshold, q355 the banding; this
    * audits the estimator itself). Exact sets build only for docs that
    * appear in candidate pairs (a left-semi first), so the packed
    * broadcast is candidates-bounded; pairs sharing nothing keep
    * exact = 0 via the left join. */
  val q374: Q = (spark, dir) => {
    val pairs = cands4Cached(spark, dir)
    val est = est4Cached(spark, dir)
    val candIds = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    val packed = shinglesCached(spark, dir)
      .join(broadcast(candIds), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.md5_63(col("shingle")).as("h"))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("h"))).as("items"))
      .select(col("doc_id"), col("items"), size(col("items")).as("n"))
    val withExact = est
      .join(broadcast(packed.select(col("doc_id").as("id_a"),
        col("items").as("ia"), col("n").as("na"))), Seq("id_a"), "left")
      .join(broadcast(packed.select(col("doc_id").as("id_b"),
        col("items").as("ib"), col("n").as("nb"))), Seq("id_b"), "left")
      .withColumn("shared", when(col("ia").isNotNull && col("ib").isNotNull,
        graft.functions.GraftFunctions.sorted_intersect_count(
          col("ia"), col("ib"))).otherwise(lit(0L)))
      .withColumn("exact", when(col("na") + col("nb") - col("shared") > 0,
        col("shared").cast("double") /
          (col("na") + col("nb") - col("shared"))).otherwise(lit(0.0)))
      .withColumn("err", qround(abs(col("est_jaccard") - col("exact")), 9))
      .withColumn("bucket", least(lit(9L), floor(col("est_jaccard") * 10.0)))
    withExact.groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        sum(qdec(col("err"), 28, 9)).as("se"),
        max(col("err")).as("max_abs_err"))
      .select(col("bucket"), col("n_pairs"),
        qround(col("se").cast("double") / col("n_pairs").cast("double"), 6)
          .as("mean_abs_err"),
        col("max_abs_err"),
        qround(sqrt((col("bucket").cast("double") / 10.0 + 0.05) *
          (lit(1.0) - (col("bucket").cast("double") / 10.0 + 0.05)) /
          16.0), 6).as("analytic_se"))
      .orderBy("bucket")
  }

  val queries: Map[String, Q] = Map(
    "q374_minhash_error_audit" -> q374,
    "q371_weighted_reservoir" -> q371,
    "q368_zipf_slope" -> q368,
    "q370_dedup_quality_shift" -> q370,
    "q362_mattr_diversity" -> q362,
    "q363_bloom_sizing" -> q363,
    "q359_lang_confusion" -> q359,
    "q355_lsh_band_sweep" -> q355,
    "q349_decontamination_sweep" -> q349,
    "q350_quality_psi" -> q350,
    "q343_bigram_perplexity" -> q343,
    "q344_stopword_discovery" -> q344,
    "q345_sliding_chunks" -> q345,
    "q330_source_mixture_weights" -> q330,
    "q331_unigram_xent" -> q331,
    "q332_duplicate_ngram_mass" -> q332,
    "q333_length_lognormal" -> q333,
    "q334_dedup_cluster_sizes" -> q334,
    "q294_quality_filter_funnel" -> q294,
    "q295_dedup_token_savings" -> q295,
    "q292_cohens_kappa" -> q292,
    "q286_pii_scrub_audit" -> q286,
    "q289_crosssource_dup_matrix" -> q289,
    "q274_emerging_terms" -> q274,
    "q267_weighted_jaccard" -> q267,
    "q249_lsh_recall_audit" -> q249,
    "q242_containment_dups" -> q242,
    "q230_dedup_threshold_sweep" -> q230,
    "q223_word_associations" -> q223,
    "q224_heaps_vocab_growth" -> q224,
    "q184_mixture_rebalance" -> q184,
    "q18_tfidf" -> q18,
    "q69_repetition" -> q69,
    "q20_token_stats" -> q20,
    "q28_simhash_neardup" -> q28,
    "q29_minhash_fast" -> q29,
    "q21_quality_score" -> q21,
    "q22_lang_id" -> q22,
    "q23_exact_dedup" -> q23,
    "q24_simhash" -> q24,
    "q25_minhash_sigs" -> q25,
    "q26_ngram_jaccard_dups" -> q26,
    "q27_minhash_lsh_dups" -> q27,
    "q323_fuzzy_decontaminate" -> q323,
    "q57_partitioned_prune" -> q57,
    "q58_orc_roundtrip" -> q58,
    "q59_redact" -> q59,
    "q73_neardup_clusters" -> q73,
    "q74_neardup_survivors" -> q74,
    "q75_stratified_cap" -> q75,
    "q80_tfidf_cosine_pairs" -> q80,
    "q82_decontaminate" -> q82,
    "q84_token_chunks" -> q84,
    "q85_sequence_packing" -> q85,
    "q86_weighted_sample" -> q86,
    "q89_normalize_text" -> q89,
    "q94_bloom_decontaminate" -> q94,
    "q95_vocab_spectrum" -> q95,
    "q96_jsonl_roundtrip" -> q96,
    "q97_dedup_ledger" -> q97,
    "q376_dedup_ledger_compact" -> q376,
    "q98_minhash_rowsig" -> q98,
    "q107_bigram_loglik" -> q107,
    "q108_bpe_pairs" -> q108,
    "q119_weighted_topk" -> q119,
    "q199_weighted_stratified" -> q199,
    "q146_ols_per_source" -> q146,
    "q147_quantile_norm" -> q147,
    "q154_span_dedup" -> q154,
    "q162_naive_bayes" -> q162,
    "q170_bm25" -> q170,
    "q181_entity_resolution" -> q181)

  private val H = "9223372036854775807"

  private val olsOracle =
    """WITH t AS (
      |  SELECT source AS g, CAST(n_chars AS DECIMAL(18,0)) AS x,
      |    CAST(len(list_filter(string_split(text, ' '),
      |      tok -> len(tok) > 0)) AS DECIMAL(18,0)) AS y
      |  FROM documents),
      |s AS (SELECT g, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |        SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
      |      FROM t GROUP BY g),
      |d AS (SELECT g, n,
      |        CAST(n * sxy - sx * sy AS DOUBLE) AS num,
      |        CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
      |        CAST(n * syy - sy * sy AS DOUBLE) AS dy,
      |        CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
      |      FROM s),
      |f AS (SELECT g, n, num, dx, dy, sxd, syd,
      |        CASE WHEN n >= 2 AND dx > 0 THEN floor((num / dx) * 1000000.0 + 0.5) / 1000000.0 END
      |          AS slope
      |      FROM d)
      |SELECT g AS grp, CAST(n AS BIGINT) AS n, slope,
      |  CASE WHEN slope IS NOT NULL THEN
      |    floor(((syd - slope * sxd) / n) * 1000000.0 + 0.5) / 1000000.0 END AS intercept,
      |  CASE WHEN slope IS NOT NULL AND dy > 0 THEN
      |    floor((num * num / (dx * dy)) * 1000000.0 + 0.5) / 1000000.0 END AS r2
      |FROM f ORDER BY grp""".stripMargin

  // Shared by q82 (exact path) and q94 (Bloom-prefiltered path): the
  // prefilter must be invisible in the result, so both gate against the
  // identical exact-semantics SQL.
  private lazy val contaminationOracle =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE len(string_split(text, ' ')) >= 8),
      |sh AS (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, len(toks) - 7),
      |      i -> list_aggregate(toks[i:i+7], 'string_agg', ' '))) AS shingle
      |  FROM t),
      |b AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0),
      |tr AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE doc_id % 17 != 0)
      |SELECT doc_id, COUNT(*) AS n_shared
      |FROM tr JOIN b USING (shingle)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // One signature oracle for both the aggregate path (q25) and the
  // per-row map path (q98) — they must produce identical values.
  private lazy val minhashSigOracle =
    s"""WITH t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |tok AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks) - 2),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS token
       |  FROM t)
       |SELECT doc_id, p,
       |  CAST(MIN(md5_number_lower(p::VARCHAR || ':' || token) & $H) AS BIGINT) AS mh
       |FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS p) g
       |GROUP BY doc_id, p ORDER BY doc_id, p""".stripMargin

  // The shared signature/band prefix (t → tok → sigs → bands): q27/q73/
  // q74 chain all-pairs candidates onto it; q99 chains the stream-vs-index
  // candidate split instead.
  private[queries] lazy val lshBandsCte =
    s"""t AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= 3),
       |tok AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(generate_series(1, len(toks) - 2),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS token
       |  FROM t),
       |sigs AS (
       |  SELECT doc_id, p,
       |    CAST(MIN(md5_number_lower(p::VARCHAR || ':' || token) & $H) AS BIGINT) AS mh
       |  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS p) g
       |  GROUP BY doc_id, p),
       |bands AS (
       |  SELECT doc_id, p // 4 AS band, string_agg(mh::VARCHAR, ':' ORDER BY p) AS band_sig
       |  FROM sigs GROUP BY doc_id, band)""".stripMargin

  // The q27 MinHash+LSH pair pipeline as a reusable CTE chain (ends in
  // `est`); q27 thresholds it, q73/q74 resolve it into components.
  private[queries] lazy val lshPairsCte =
    s"""$lshBandsCte,
       |cands AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b USING (band, band_sig)
       |  WHERE a.doc_id < b.doc_id),
       |est AS (
       |  SELECT id_a, id_b,
       |    CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS DOUBLE) / 16.0 AS est_jaccard
       |  FROM cands
       |  JOIN sigs sa ON sa.doc_id = id_a
       |  JOIN sigs sb ON sb.doc_id = id_b AND sb.p = sa.p
       |  GROUP BY id_a, id_b)""".stripMargin

  // Transitive closure of the thresholded pair graph (component label =
  // min reachable id) — the SQL mirror of Dedup.connectedComponents'
  // fixpoint, via a recursive CTE.
  private lazy val componentsCte =
    s"""$lshPairsCte,
       |prs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.4),
       |sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM prs
       |  UNION
       |  SELECT id_b AS src, id_a AS dst FROM prs),
       |reach AS (
       |  SELECT src AS id, src AS r FROM sym
       |  UNION
       |  SELECT s.src AS id, reach.r FROM sym s JOIN reach ON s.dst = reach.id),
       |comp AS (SELECT id, MIN(r) AS canonical_id FROM reach GROUP BY id)""".stripMargin

  // One sweep arm of the q349 oracle: the q82 contamination semantics at
  // n-gram width `n`, reduced to corpus-level counts.
  private def deconArmSql(n: Int): String =
    s"""arm_$n AS (
       |  SELECT CAST($n AS BIGINT) AS ngram_n,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
       |     WHERE doc_id % 17 != 0) AS n_train_docs,
       |    CAST(COUNT(*) AS BIGINT) AS contaminated_docs,
       |    CAST(COALESCE(SUM(n_shared), 0) AS BIGINT) AS shared_gram_hits
       |  FROM (
       |    SELECT tr.doc_id, COUNT(*) AS n_shared
       |    FROM (SELECT DISTINCT doc_id,
       |            unnest(list_transform(generate_series(1, len(toks) - ${n - 1}),
       |              i -> list_aggregate(toks[i:i+${n - 1}], 'string_agg', ' ')))
       |              AS shingle
       |          FROM t WHERE len(toks) >= $n AND doc_id % 17 != 0) tr
       |    JOIN (SELECT DISTINCT
       |            unnest(list_transform(generate_series(1, len(toks) - ${n - 1}),
       |              i -> list_aggregate(toks[i:i+${n - 1}], 'string_agg', ' ')))
       |              AS shingle
       |          FROM t WHERE len(toks) >= $n AND doc_id % 17 = 0) b
       |    USING (shingle)
       |    GROUP BY tr.doc_id))""".stripMargin

  // One (b, r) arm of the q355 oracle: the shared `sigs` CTE regrouped
  // at rows-per-band r, candidates → est-Jaccard → 1-row scalar.
  private def lshArmSql(r: Int): String = {
    val b = 16 / r
    s"""bnd_$r AS (
       |  SELECT doc_id, p // $r AS band,
       |    string_agg(mh::VARCHAR, ':' ORDER BY p) AS band_sig
       |  FROM sigs GROUP BY doc_id, band),
       |cand_$r AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bnd_$r a JOIN bnd_$r b USING (band, band_sig)
       |  WHERE a.doc_id < b.doc_id),
       |est_$r AS (
       |  SELECT c.id_a, c.id_b,
       |    SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 16.0 AS est
       |  FROM cand_$r c
       |  JOIN sigs sa ON sa.doc_id = c.id_a
       |  JOIN sigs sb ON sb.doc_id = c.id_b AND sb.p = sa.p
       |  GROUP BY 1, 2),
       |arm_$r AS (
       |  SELECT CAST($b AS BIGINT) AS bands,
       |    CAST($r AS BIGINT) AS rows_per_band,
       |    floor(pow(1.0 / $b, 1.0 / $r) * 1000000.0 + 0.5) / 1000000.0
       |      AS s_curve_threshold,
       |    (SELECT CAST(COUNT(*) AS BIGINT) FROM est_$r) AS n_candidates,
       |    (SELECT CAST(COALESCE(SUM(CASE WHEN est >= 0.5 THEN 1 ELSE 0
       |      END), 0) AS BIGINT) FROM est_$r) AS n_above_05)""".stripMargin
  }

  // The q22/q292 language-ID prediction pipeline as a reusable CTE chain
  // ending in p(predicted, actual) — q359 consumes it too.
  private val langPredsCte =
    """tok AS (
      |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      |  FROM documents),
      |profiles AS (
      |  SELECT lang AS cand_lang, token FROM (
      |    SELECT lang, token, count(*) AS cnt,
      |      row_number() OVER (PARTITION BY lang
      |        ORDER BY count(*) DESC, token) AS r
      |    FROM tok GROUP BY lang, token) WHERE r <= 20),
      |doctok AS (SELECT DISTINCT doc_id, token FROM tok),
      |scores AS (
      |  SELECT doc_id, cand_lang, count(*) AS n_overlap
      |  FROM doctok JOIN profiles USING (token)
      |  GROUP BY doc_id, cand_lang),
      |best AS (
      |  SELECT doc_id, cand_lang AS predicted,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY n_overlap DESC, cand_lang) AS r
      |  FROM scores),
      |p AS (
      |  SELECT b.predicted, d.lang AS actual
      |  FROM best b JOIN documents d ON b.doc_id = d.doc_id
      |  WHERE b.r = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q374_minhash_error_audit" ->
      s"""WITH $lshBandsCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b USING (band, band_sig)
         |  WHERE a.doc_id < b.doc_id),
         |est AS (
         |  SELECT c.id_a, c.id_b,
         |    SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 16.0 AS est
         |  FROM cand c
         |  JOIN sigs sa ON sa.doc_id = c.id_a
         |  JOIN sigs sb ON sb.doc_id = c.id_b AND sb.p = sa.p
         |  GROUP BY 1, 2),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    CAST(md5_number_lower(token) & $H AS BIGINT) AS h
         |  FROM tok),
         |sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
         |          FROM sh GROUP BY 1),
         |shared AS (
         |  SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS shared
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.id_a
         |  JOIN sh sb ON sb.doc_id = c.id_b AND sb.h = sa.h
         |  GROUP BY 1, 2),
         |w AS (
         |  SELECT e.est,
         |    COALESCE(s.shared, 0) AS shared, na.n AS na, nb.n AS nb
         |  FROM est e
         |  LEFT JOIN shared s ON s.id_a = e.id_a AND s.id_b = e.id_b
         |  JOIN sizes na ON na.doc_id = e.id_a
         |  JOIN sizes nb ON nb.doc_id = e.id_b),
         |x AS (
         |  SELECT est,
         |    CASE WHEN na + nb - shared > 0
         |      THEN CAST(shared AS DOUBLE) / (na + nb - shared)
         |      ELSE 0.0 END AS exact_j
         |  FROM w),
         |er AS (
         |  SELECT least(9, CAST(floor(est * 10.0) AS BIGINT)) AS bucket,
         |    floor(abs(est - exact_j) * 1000000000.0 + 0.5)
         |      / 1000000000.0 AS err
         |  FROM x)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  floor(CAST(SUM(CAST(floor(err * 1000000000.0 + 0.5)
         |      / 1000000000.0 AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*)
         |    * 1000000.0 + 0.5) / 1000000.0 AS mean_abs_err,
         |  MAX(err) AS max_abs_err,
         |  floor(sqrt((CAST(bucket AS DOUBLE) / 10.0 + 0.05)
         |      * (1.0 - (CAST(bucket AS DOUBLE) / 10.0 + 0.05)) / 16.0)
         |    * 1000000.0 + 0.5) / 1000000.0 AS analytic_se
         |FROM er GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q371_weighted_reservoir" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
         |    floor(ln((CAST((md5_number_lower('wr:' || doc_id::VARCHAR)
         |          & $H) % 4503599627370496 AS DOUBLE) + 0.5)
         |        / 4503599627370496.0)
         |      / CAST(n_chars AS DOUBLE) * 1000000000.0 + 0.5)
         |      / 1000000000.0 AS es_key
         |  FROM documents)
         |SELECT doc_id, source, weight, es_key FROM d
         |ORDER BY es_key DESC, doc_id LIMIT 100""".stripMargin,
    "q368_zipf_slope" ->
      """WITH freq AS (
        |  SELECT token, CAST(COUNT(*) AS BIGINT) AS occ,
        |    row_number() OVER (ORDER BY COUNT(*) DESC, token) AS rank
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY token),
        |t AS (
        |  SELECT
        |    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000000.0 + 0.5)
        |      / 1000000000.0 AS DECIMAL(28,9)) AS x,
        |    CAST(floor(ln(CAST(occ AS DOUBLE)) * 1000000000.0 + 0.5)
        |      / 1000000000.0 AS DECIMAL(28,9)) AS y,
        |    CAST(floor(ln(CAST(rank AS DOUBLE)) * ln(CAST(occ AS DOUBLE))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9)) AS xy,
        |    CAST(floor(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9)) AS xx,
        |    CAST(floor(ln(CAST(occ AS DOUBLE)) * ln(CAST(occ AS DOUBLE))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9)) AS yy
        |  FROM freq),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(xy) AS sxy, SUM(xx) AS sxx, SUM(yy) AS syy
        |  FROM t),
        |f AS (
        |  SELECT *,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
        |  FROM s)
        |SELECT n AS n_terms,
        |  floor(slope * 1000000.0 + 0.5) / 1000000.0 AS zipf_slope,
        |  floor((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS intercept,
        |  floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS r2
        |FROM f""".stripMargin,
    "q370_dedup_quality_shift" ->
      s"""WITH RECURSIVE $componentsCte,
         |victims AS (SELECT id FROM comp WHERE id <> canonical_id),
         |scored AS (
         |  SELECT doc_id, source,
         |    floor((1.0 - len(list_filter(string_split(text, ' '),
         |        tk -> tk IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
         |        / len(string_split(text, ' ')))
         |      * least(1.0, len(string_split(text, ' '))::DOUBLE / 100.0)
         |      * 1000000.0 + 0.5) / 1000000.0 AS quality,
         |    CASE WHEN doc_id IN (SELECT id FROM victims)
         |      THEN 0 ELSE 1 END AS surv
         |  FROM documents)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(surv) AS BIGINT) AS n_survivors,
         |  floor(CAST(SUM(CAST(floor(quality * 1000000000.0 + 0.5)
         |      / 1000000000.0 AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*)
         |    * 1000000.0 + 0.5) / 1000000.0 AS mean_quality_all,
         |  floor(CAST(SUM(CASE WHEN surv = 1
         |      THEN CAST(floor(quality * 1000000000.0 + 0.5)
         |        / 1000000000.0 AS DECIMAL(28,9))
         |      ELSE CAST(0 AS DECIMAL(28,9)) END) AS DOUBLE) / SUM(surv)
         |    * 1000000.0 + 0.5) / 1000000.0 AS mean_quality_survivors,
         |  floor((CAST(SUM(CASE WHEN surv = 1
         |      THEN CAST(floor(quality * 1000000000.0 + 0.5)
         |        / 1000000000.0 AS DECIMAL(28,9))
         |      ELSE CAST(0 AS DECIMAL(28,9)) END) AS DOUBLE) / SUM(surv)
         |    - CAST(SUM(CAST(floor(quality * 1000000000.0 + 0.5)
         |        / 1000000000.0 AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*))
         |    * 1000000.0 + 0.5) / 1000000.0 AS quality_delta
         |FROM scored GROUP BY source ORDER BY source""".stripMargin,
    "q362_mattr_diversity" ->
      """WITH d AS (
        |  SELECT source, string_split(text, ' ') AS toks,
        |    len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |pd AS (
        |  SELECT source,
        |    floor((CASE WHEN n_tok < 25 THEN
        |        CAST(len(list_distinct(toks)) AS DOUBLE) / n_tok
        |      ELSE
        |        CAST(list_sum(list_transform(
        |            generate_series(1, n_tok - 24),
        |            i -> len(list_distinct(toks[i:i+24])))) AS DOUBLE)
        |          / ((n_tok - 24) * 25)
        |      END) * 1000000.0 + 0.5) / 1000000.0 AS mattr
        |  FROM d)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  floor(CAST(SUM(CAST(floor(mattr * 1000000000.0 + 0.5)
        |      / 1000000000.0 AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*)
        |    * 1000000.0 + 0.5) / 1000000.0 AS mean_mattr,
        |  MIN(mattr) AS min_mattr, MAX(mattr) AS max_mattr
        |FROM pd GROUP BY source ORDER BY source""".stripMargin,
    "q363_bloom_sizing" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE doc_id % 17 = 0 AND len(string_split(text, ' ')) >= 8),
        |n AS (
        |  SELECT CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_keys FROM (
        |    SELECT unnest(list_transform(generate_series(1, len(toks) - 7),
        |      i -> list_aggregate(toks[i:i+7], 'string_agg', ' ')))
        |      AS shingle
        |    FROM t)),
        |cfg AS (SELECT CAST(unnest([8, 12, 16]) AS BIGINT) AS bits_per_key),
        |rows_ AS (
        |  SELECT bits_per_key, n_keys,
        |    CAST((bits_per_key * n_keys + 7) // 8 AS BIGINT) AS filter_bytes,
        |    CAST(floor(CAST(bits_per_key AS DOUBLE) * ln(2.0) + 0.5)
        |      AS BIGINT) AS k_hashes
        |  FROM cfg, n)
        |SELECT bits_per_key, n_keys, filter_bytes, k_hashes,
        |  floor(pow(1.0 - exp(-CAST(k_hashes AS DOUBLE)
        |        / CAST(bits_per_key AS DOUBLE)), CAST(k_hashes AS DOUBLE))
        |    * 1000000000.0 + 0.5) / 1000000000.0 AS predicted_fpr
        |FROM rows_ ORDER BY bits_per_key""".stripMargin,
    "q359_lang_confusion" ->
      s"""WITH $langPredsCte,
         |cells AS (
         |  SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2),
         |w AS (
         |  SELECT *, SUM(n) OVER (PARTITION BY actual) AS row_total
         |  FROM cells)
         |SELECT actual, predicted, n,
         |  CAST((2 * n * 1000000 + row_total) // (2 * row_total) AS BIGINT)
         |    AS rate_ppm,
         |  CAST(actual = predicted AS INT) AS is_correct
         |FROM w ORDER BY actual, predicted""".stripMargin,
    "q355_lsh_band_sweep" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |  WHERE len(string_split(text, ' ')) >= 3),
         |tok AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(generate_series(1, len(toks) - 2),
         |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS token
         |  FROM t),
         |sigs AS (
         |  SELECT doc_id, p,
         |    CAST(MIN(md5_number_lower(p::VARCHAR || ':' || token) & $H) AS BIGINT) AS mh
         |  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS p) g
         |  GROUP BY doc_id, p),
         |${lshArmSql(2)},
         |${lshArmSql(4)},
         |${lshArmSql(8)},
         |u AS (SELECT * FROM arm_2 UNION ALL SELECT * FROM arm_4
         |      UNION ALL SELECT * FROM arm_8)
         |SELECT bands, rows_per_band, s_curve_threshold, n_candidates,
         |  n_above_05,
         |  CASE WHEN n_candidates > 0 THEN
         |    CAST((2 * n_above_05 * 1000000 + n_candidates)
         |      // (2 * n_candidates) AS BIGINT)
         |  ELSE 0 END AS precision_ppm
         |FROM u ORDER BY rows_per_band""".stripMargin,
    "q349_decontamination_sweep" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |${deconArmSql(4)},
         |${deconArmSql(8)},
         |${deconArmSql(12)},
         |u AS (SELECT * FROM arm_4 UNION ALL SELECT * FROM arm_8
         |      UNION ALL SELECT * FROM arm_12)
         |SELECT ngram_n, n_train_docs, contaminated_docs, shared_gram_hits,
         |  CAST((2 * contaminated_docs * 1000000 + n_train_docs)
         |    // (2 * n_train_docs) AS BIGINT) AS contamination_ppm
         |FROM u ORDER BY ngram_n""".stripMargin,
    "q350_quality_psi" ->
      """WITH s AS (
        |  SELECT source,
        |    least(9, CAST(floor(
        |      (1.0 - len(list_filter(string_split(text, ' '),
        |         t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
        |        / len(string_split(text, ' ')))
        |      * least(1.0, len(string_split(text, ' '))::DOUBLE / 100.0)
        |      * 10.0) AS BIGINT)) AS bin
        |  FROM documents),
        |cells AS (
        |  SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM s GROUP BY 1, 2),
        |grid AS (
        |  SELECT src.source, b.bin, COALESCE(cells.c, 0) AS c
        |  FROM (SELECT DISTINCT source FROM cells) src
        |  CROSS JOIN (SELECT DISTINCT bin FROM cells) b
        |  LEFT JOIN cells ON cells.source = src.source
        |    AND cells.bin = b.bin),
        |w AS (
        |  SELECT *,
        |    SUM(c) OVER (PARTITION BY source) AS n_s,
        |    SUM(c) OVER (PARTITION BY bin) AS g,
        |    SUM(c) OVER () AS nn,
        |    COUNT(*) OVER (PARTITION BY source) AS nbins
        |  FROM grid),
        |terms AS (
        |  SELECT source, n_s,
        |    CAST(floor(
        |      ((CAST(c AS DOUBLE) + 0.5) / (CAST(n_s AS DOUBLE) + nbins * 0.5)
        |        - (CAST(g AS DOUBLE) + 0.5) / (CAST(nn AS DOUBLE) + nbins * 0.5))
        |      * ln(((CAST(c AS DOUBLE) + 0.5) / (CAST(n_s AS DOUBLE) + nbins * 0.5))
        |        / ((CAST(g AS DOUBLE) + 0.5) / (CAST(nn AS DOUBLE) + nbins * 0.5)))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(18,9)) AS term
        |  FROM w),
        |agg AS (
        |  SELECT source, CAST(MAX(n_s) AS BIGINT) AS n_docs,
        |    floor(CAST(SUM(term) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |      AS psi
        |  FROM terms GROUP BY 1)
        |SELECT source, n_docs, psi,
        |  CASE WHEN psi > 0.25 THEN 'shifted'
        |    WHEN psi > 0.1 THEN 'moderate' ELSE 'stable' END AS verdict
        |FROM agg ORDER BY source""".stripMargin,
    "q343_bigram_perplexity" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS toks
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |occ AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> struct_pack(v := toks[i], w := toks[i+1]))) AS bg
        |  FROM t),
        |o2 AS (SELECT doc_id, source, bg.v AS v, bg.w AS w FROM occ),
        |vocab AS (
        |  SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS vsize
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token
        |        FROM documents)),
        |bgc AS (
        |  SELECT v, w, CAST(COUNT(*) AS BIGINT) AS c_vw
        |  FROM o2 GROUP BY 1, 2),
        |bgp AS (
        |  SELECT v, w,
        |    CAST(floor(-ln((CAST(c_vw AS DOUBLE) + 0.5)
        |        / (CAST(SUM(c_vw) OVER (PARTITION BY v) AS DOUBLE)
        |          + 0.5 * vsize))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9))
        |      AS lnp_q
        |  FROM bgc, vocab),
        |per_doc AS (
        |  SELECT doc_id, source,
        |    floor(CAST(SUM(lnp_q) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5)
        |      / 1000000.0 AS xent2
        |  FROM o2 JOIN bgp USING (v, w)
        |  GROUP BY 1, 2)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  floor(CAST(SUM(CAST(floor(xent2 * 1000000000.0 + 0.5)
        |      / 1000000000.0 AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*)
        |    * 1000000.0 + 0.5) / 1000000.0 AS mean_xent2,
        |  MIN(xent2) AS min_xent2, MAX(xent2) AS max_xent2
        |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,
    "q344_stopword_discovery" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus_docs
        |        FROM documents),
        |g AS (
        |  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
        |    CAST(COUNT(*) AS BIGINT) AS occurrences
        |  FROM tok GROUP BY 1)
        |SELECT token, df, occurrences,
        |  CAST((2 * df * 1000000 + n_corpus_docs) // (2 * n_corpus_docs)
        |    AS BIGINT) AS df_ppm,
        |  CAST(CASE WHEN (2 * df * 1000000 + n_corpus_docs)
        |      // (2 * n_corpus_docs) > 500000 THEN 1 ELSE 0 END AS BIGINT)
        |    AS stopword_candidate
        |FROM g, tot
        |ORDER BY df DESC, occurrences DESC, token LIMIT 50""".stripMargin,
    "q345_sliding_chunks" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |ch AS (
        |  SELECT source, n_tok,
        |    unnest(list_transform(generate_series(0, (n_tok - 1) // 48),
        |      i -> least(64, n_tok - i * 48))) AS chunk_len
        |  FROM d),
        |agg AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
        |    CAST(SUM(chunk_len) AS BIGINT) AS chunk_tokens,
        |    CAST(SUM(CASE WHEN chunk_len = 64 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS full_chunks
        |  FROM ch GROUP BY 1),
        |raw AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS raw_tokens
        |  FROM d GROUP BY 1)
        |SELECT source, n_docs, raw_tokens, n_chunks, chunk_tokens,
        |  full_chunks,
        |  CAST((2 * (chunk_tokens - raw_tokens) * 1000000 + chunk_tokens)
        |    // (2 * chunk_tokens) AS BIGINT) AS overlap_ppm
        |FROM agg JOIN raw USING (source) ORDER BY source""".stripMargin,
    "q330_source_mixture_weights" ->
      """WITH per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |w AS (
        |  SELECT *, SUM(n_tokens) OVER () AS total_tokens,
        |    CAST(n_tokens AS DOUBLE) / SUM(n_tokens) OVER () AS p
        |  FROM per),
        |r AS (
        |  SELECT *,
        |    CAST(floor(pow(p, 0.3) * 1000000000.0 + 0.5) / 1000000000.0
        |      AS DECIMAL(28,9)) AS r03,
        |    CAST(floor(pow(p, 0.7) * 1000000000.0 + 0.5) / 1000000000.0
        |      AS DECIMAL(28,9)) AS r07
        |  FROM w),
        |z AS (SELECT *, SUM(r03) OVER () AS z03, SUM(r07) OVER () AS z07
        |      FROM r)
        |SELECT source, n_docs, n_tokens,
        |  floor(p * 1000000.0 + 0.5) / 1000000.0 AS p,
        |  floor(CAST(r03 AS DOUBLE) / CAST(z03 AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS w_alpha03,
        |  floor(CAST(r07 AS DOUBLE) / CAST(z07 AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS w_alpha07,
        |  floor(CAST(r03 AS DOUBLE) / CAST(z03 AS DOUBLE)
        |      * CAST(total_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 AS epochs_alpha03,
        |  floor(CAST(r07 AS DOUBLE) / CAST(z07 AS DOUBLE)
        |      * CAST(total_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
        |      * 1000000.0 + 0.5) / 1000000.0 AS epochs_alpha07
        |FROM z ORDER BY source""".stripMargin,
    "q331_unigram_xent" ->
      """WITH tok AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t_occ FROM tok),
        |vocab AS (
        |  SELECT token,
        |    CAST(floor(-ln(CAST(COUNT(*) AS DOUBLE) / t_occ)
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9)) AS lnp_q
        |  FROM tok, tot GROUP BY token, t_occ),
        |per_doc AS (
        |  SELECT doc_id, source,
        |    floor(CAST(SUM(lnp_q) AS DOUBLE) / COUNT(*) * 1000000.0 + 0.5)
        |      / 1000000.0 AS xent
        |  FROM tok JOIN vocab USING (token)
        |  GROUP BY doc_id, source)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  floor(CAST(SUM(CAST(floor(xent * 1000000000.0 + 0.5)
        |      / 1000000000.0 AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*)
        |    * 1000000.0 + 0.5) / 1000000.0 AS mean_xent,
        |  MIN(xent) AS min_xent, MAX(xent) AS max_xent
        |FROM per_doc GROUP BY source ORDER BY source""".stripMargin,
    "q332_duplicate_ngram_mass" ->
      s"""WITH t AS (
         |  SELECT source, string_split(text, ' ') AS toks FROM documents
         |  WHERE len(string_split(text, ' ')) >= 8),
         |grams AS (
         |  SELECT source,
         |    CAST(md5_number_lower(
         |      unnest(list_transform(generate_series(1, len(toks) - 7),
         |        i -> list_aggregate(toks[i:i+7], 'string_agg', ' ')))) & $H
         |      AS BIGINT) AS g
         |  FROM t),
         |cells AS (
         |  SELECT g, source, CAST(COUNT(*) AS BIGINT) AS n_occ
         |  FROM grams GROUP BY 1, 2),
         |wc AS (SELECT *, SUM(n_occ) OVER (PARTITION BY g) AS corpus_occ
         |       FROM cells)
         |SELECT source, CAST(SUM(n_occ) AS BIGINT) AS total_occ,
         |  CAST(COUNT(*) AS BIGINT) AS distinct_grams,
         |  CAST(SUM(CASE WHEN corpus_occ > 1 THEN n_occ ELSE 0 END)
         |    AS BIGINT) AS dup_occ,
         |  CAST((2 * SUM(CASE WHEN corpus_occ > 1 THEN n_occ ELSE 0 END)
         |      * 1000000 + SUM(n_occ)) // (2 * SUM(n_occ)) AS BIGINT)
         |    AS dup_mass_ppm
         |FROM wc GROUP BY source ORDER BY source""".stripMargin,
    "q333_length_lognormal" ->
      """WITH d AS (
        |  SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    CAST(floor(ln(CAST(len(string_split(text, ' ')) AS DOUBLE))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9)) AS l,
        |    CAST(floor(ln(CAST(len(string_split(text, ' ')) AS DOUBLE))
        |        * ln(CAST(len(string_split(text, ' ')) AS DOUBLE))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9)) AS l2
        |  FROM documents),
        |s AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
        |    SUM(l) AS sl, SUM(l2) AS sl2
        |  FROM d GROUP BY 1)
        |SELECT source, n_docs,
        |  floor(CAST(sl AS DOUBLE) / n_docs * 1000000.0 + 0.5)
        |    / 1000000.0 AS mu,
        |  floor((CAST(sl2 AS DOUBLE) / n_docs
        |      - (CAST(sl AS DOUBLE) / n_docs) * (CAST(sl AS DOUBLE) / n_docs))
        |    * 1000000.0 + 0.5) / 1000000.0 AS sigma2,
        |  floor(exp(CAST(sl AS DOUBLE) / n_docs) * 1000000.0 + 0.5)
        |    / 1000000.0 AS fit_median_tokens,
        |  floor(exp(CAST(sl AS DOUBLE) / n_docs
        |      + (CAST(sl2 AS DOUBLE) / n_docs
        |        - (CAST(sl AS DOUBLE) / n_docs) * (CAST(sl AS DOUBLE) / n_docs))
        |        / 2) * 1000000.0 + 0.5) / 1000000.0 AS fit_mean_tokens,
        |  floor(CAST(sum_tokens AS DOUBLE) / n_docs * 1000000.0 + 0.5)
        |    / 1000000.0 AS actual_mean_tokens
        |FROM s ORDER BY source""".stripMargin,
    "q334_dedup_cluster_sizes" ->
      s"""WITH RECURSIVE $componentsCte,
         |csz AS (SELECT canonical_id,
         |          CAST(COUNT(*) AS BIGINT) AS cluster_size
         |        FROM comp GROUP BY canonical_id),
         |hist AS (
         |  SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |    CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
         |  FROM csz GROUP BY cluster_size),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS corpus_docs
         |        FROM documents),
         |cl AS (SELECT COALESCE(CAST(SUM(n_docs) AS BIGINT), 0)
         |         AS clustered_docs FROM hist),
         |allrows AS (
         |  SELECT CAST(1 AS BIGINT) AS cluster_size,
         |    corpus_docs - clustered_docs AS n_clusters,
         |    corpus_docs - clustered_docs AS n_docs
         |  FROM tot, cl
         |  UNION ALL
         |  SELECT cluster_size, n_clusters, n_docs FROM hist)
        |SELECT cluster_size, n_clusters, n_docs,
        |  CAST((2 * n_docs * 1000000 + corpus_docs) // (2 * corpus_docs)
        |    AS BIGINT) AS docs_ppm
        |FROM allrows, tot ORDER BY cluster_size""".stripMargin,
    "q294_quality_filter_funnel" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |lens AS (SELECT doc_id, len(toks) AS n_tokens FROM t),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |      AS shingle
        |  FROM t WHERE len(toks) >= 3),
        |rep AS (
        |  SELECT doc_id,
        |    floor((1.0 - CAST(count(DISTINCT shingle) AS DOUBLE)
        |        / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS dup_ratio
        |  FROM sh GROUP BY 1),
        |tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |profiles AS (
        |  SELECT lang AS cand_lang, token FROM (
        |    SELECT lang, token, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY lang
        |        ORDER BY count(*) DESC, token) AS r
        |    FROM tok GROUP BY lang, token) WHERE r <= 20),
        |doctok AS (SELECT DISTINCT doc_id, token FROM tok),
        |scores AS (
        |  SELECT doc_id, cand_lang, count(*) AS n_overlap
        |  FROM doctok JOIN profiles USING (token)
        |  GROUP BY doc_id, cand_lang),
        |best AS (
        |  SELECT doc_id, cand_lang AS predicted,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY n_overlap DESC, cand_lang) AS r
        |  FROM scores),
        |pred AS (
        |  SELECT b.doc_id, CAST(b.predicted = d.lang AS INT) AS correct
        |  FROM best b JOIN documents d ON d.doc_id = b.doc_id
        |  WHERE b.r = 1),
        |flags AS (
        |  SELECT l.doc_id, l.n_tokens >= 20 AS f1,
        |    COALESCE(r.dup_ratio, 0.0) AS dr,
        |    COALESCE(p.correct, 0) AS ok
        |  FROM lens l
        |  LEFT JOIN rep r ON r.doc_id = l.doc_id
        |  LEFT JOIN pred p ON p.doc_id = l.doc_id),
        |f3f AS (
        |  SELECT *, f1 AND dr <= 0.2 AS f2,
        |    f1 AND dr <= 0.2 AND ok = 1 AS f3
        |  FROM flags),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(SUM(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
        |  FROM f3f)
        |SELECT stage, n_in, n_out, n_in - n_out AS n_dropped,
        |  CAST((2 * (n_in - n_out) * 1000000 + n_in) // (2 * n_in)
        |    AS BIGINT) AS drop_ppm,
        |  CAST((2 * n_out * 1000000 + n0) // (2 * n0) AS BIGINT)
        |    AS retained_of_corpus_ppm
        |FROM (
        |  SELECT n0, '1_min_length' AS stage, n0 AS n_in, n1 AS n_out
        |    FROM a
        |  UNION ALL
        |  SELECT n0, '2_low_repetition', n1, n2 FROM a
        |  UNION ALL
        |  SELECT n0, '3_lang_agreement', n2, n3 FROM a)
        |ORDER BY stage""".stripMargin,
    "q295_dedup_token_savings" ->
      s"""WITH RECURSIVE $componentsCte,
         |victims AS (SELECT id FROM comp WHERE id <> canonical_id),
         |tk AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |j AS (
         |  SELECT tk.source, tk.n_tokens, v.id AS vict
         |  FROM tk LEFT JOIN victims v ON v.id = tk.doc_id)
         |SELECT source, CAST(count(*) AS BIGINT) AS docs_before,
         |  CAST(SUM(CASE WHEN vict IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS docs_after,
         |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
         |  CAST(SUM(CASE WHEN vict IS NULL THEN n_tokens ELSE 0 END)
         |    AS BIGINT) AS tokens_after,
         |  CAST((2 * (SUM(n_tokens)
         |      - SUM(CASE WHEN vict IS NULL THEN n_tokens ELSE 0 END))
         |      * 1000000 + SUM(n_tokens)) // (2 * SUM(n_tokens))
         |    AS BIGINT) AS token_savings_ppm
         |FROM j GROUP BY source ORDER BY source""".stripMargin,
    "q292_cohens_kappa" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |profiles AS (
        |  SELECT lang AS cand_lang, token FROM (
        |    SELECT lang, token, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY lang
        |        ORDER BY count(*) DESC, token) AS r
        |    FROM tok GROUP BY lang, token) WHERE r <= 20),
        |doctok AS (SELECT DISTINCT doc_id, token FROM tok),
        |scores AS (
        |  SELECT doc_id, cand_lang, count(*) AS n_overlap
        |  FROM doctok JOIN profiles USING (token)
        |  GROUP BY doc_id, cand_lang),
        |best AS (
        |  SELECT doc_id, cand_lang AS predicted,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY n_overlap DESC, cand_lang) AS r
        |  FROM scores),
        |p AS (
        |  SELECT b.predicted, d.lang AS actual
        |  FROM best b JOIN documents d ON b.doc_id = d.doc_id
        |  WHERE b.r = 1),
        |cells AS (SELECT predicted, actual,
        |            CAST(count(*) AS BIGINT) AS c
        |          FROM p GROUP BY 1, 2),
        |mar AS (
        |  SELECT COALESCE(SUM(CAST(rs.rsum AS HUGEINT) * cs.csum), 0)
        |    AS pe_num
        |  FROM (SELECT predicted, SUM(c) AS rsum FROM cells GROUP BY 1) rs
        |  JOIN (SELECT actual, SUM(c) AS csum FROM cells GROUP BY 1) cs
        |    ON cs.actual = rs.predicted),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_agree
        |  FROM p)
        |SELECT n_docs, n_agree,
        |  floor((CAST(n_agree AS DOUBLE) / CAST(n_docs AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS po,
        |  floor((CAST(pe_num AS DOUBLE)
        |      / CAST(CAST(n_docs AS HUGEINT) * n_docs AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS pe,
        |  floor((CAST(CAST(n_docs AS HUGEINT) * n_agree - pe_num
        |        AS DOUBLE)
        |      / CAST(CAST(n_docs AS HUGEINT) * n_docs - pe_num
        |        AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS kappa
        |FROM tot CROSS JOIN mar""".stripMargin,
    "q286_pii_scrub_audit" ->
      """WITH d AS (
        |  SELECT source,
        |    text
        |    || CASE WHEN doc_id % 3 = 0
        |         THEN ' reach_' || doc_id || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0
        |         THEN ' acct 9000' || doc_id || '17' ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN ' see https://ex.org/d/' || doc_id ELSE '' END
        |    AS body
        |  FROM documents),
        |c AS (
        |  SELECT source,
        |    len(regexp_extract_all(body,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS email_n,
        |    len(regexp_extract_all(body, '[0-9]{6,}')) AS digitrun_n,
        |    len(regexp_extract_all(body, 'https?://[^ ]+')) AS url_n
        |  FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN email_n > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS email_docs,
        |  CAST(SUM(email_n) AS BIGINT) AS email_hits,
        |  CAST(SUM(CASE WHEN digitrun_n > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS digitrun_docs,
        |  CAST(SUM(digitrun_n) AS BIGINT) AS digitrun_hits,
        |  CAST(SUM(CASE WHEN url_n > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS url_docs,
        |  CAST(SUM(url_n) AS BIGINT) AS url_hits,
        |  CAST(SUM(CASE WHEN email_n = 0 AND digitrun_n = 0
        |    AND url_n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS clean_docs,
        |  CAST((2 * SUM(CASE WHEN email_n = 0 AND digitrun_n = 0
        |      AND url_n = 0 THEN 1 ELSE 0 END) * 1000000 + count(*))
        |    // (2 * count(*)) AS BIGINT) AS clean_ppm
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "q289_crosssource_dup_matrix" ->
      s"""WITH $lshPairsCte,
         |prs AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.4),
         |j AS (
         |  SELECT least(da.source, db.source) AS source_a,
         |         greatest(da.source, db.source) AS source_b
         |  FROM prs
         |  JOIN documents da ON da.doc_id = prs.id_a
         |  JOIN documents db ON db.doc_id = prs.id_b),
         |g AS (SELECT source_a, source_b,
         |        CAST(count(*) AS BIGINT) AS n_pairs
         |      FROM j GROUP BY 1, 2),
         |tp AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_total FROM g)
         |SELECT source_a, source_b, n_pairs,
         |  CAST(CASE WHEN source_a = source_b THEN 1 ELSE 0 END
         |    AS INTEGER) AS within_source,
         |  CAST((2 * n_pairs * 1000000 + n_total) // (2 * n_total)
         |    AS BIGINT) AS share_ppm
         |FROM g CROSS JOIN tp
         |ORDER BY n_pairs DESC, source_a, source_b""".stripMargin,
    "q274_emerging_terms" ->
      """WITH cut AS (
        |  SELECT (MIN(doc_id) + MAX(doc_id)) // 2 AS cut FROM documents),
        |tok AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' '))
        |    AS token
        |  FROM documents),
        |tk AS (SELECT doc_id, token FROM tok WHERE len(token) >= 3),
        |df AS (
        |  SELECT token,
        |    CAST(SUM(CASE WHEN doc_id <= cut.cut THEN 1 ELSE 0 END)
        |      AS BIGINT) AS df1,
        |    CAST(SUM(CASE WHEN doc_id > cut.cut THEN 1 ELSE 0 END)
        |      AS BIGINT) AS df2
        |  FROM tk CROSS JOIN cut GROUP BY 1),
        |n AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN doc_id <= cut.cut THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN doc_id > cut.cut THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n2
        |  FROM documents CROSS JOIN cut)
        |SELECT token, df1, df2,
        |  CAST((2 * CAST(df2 + 1 AS HUGEINT) * (n1 + 1) * 1000000
        |      + CAST(df1 + 1 AS HUGEINT) * (n2 + 1))
        |    // (2 * CAST(df1 + 1 AS HUGEINT) * (n2 + 1)) AS BIGINT)
        |    AS lift_ppm
        |FROM df CROSS JOIN n WHERE df2 >= 3
        |ORDER BY lift_ppm DESC, token LIMIT 25""".stripMargin,
    "q267_weighted_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |allsh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |      AS shingle
        |  FROM t),
        |sh AS (
        |  SELECT doc_id, shingle, CAST(count(*) AS BIGINT) AS c
        |  FROM allsh GROUP BY 1, 2),
        |keptsh AS (
        |  SELECT shingle FROM (
        |    SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
        |  WHERE df <= 100),
        |kept AS (SELECT doc_id, shingle, c FROM sh
        |         JOIN keptsh USING (shingle)),
        |tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tot
        |        FROM kept GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(SUM(least(a.c, b.c)) AS BIGINT) AS smin
        |  FROM kept a JOIN kept b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id_a, id_b, smin, ta.tot AS ta, tb.tot AS tb,
        |    CAST((2 * smin * 1000000 + (ta.tot + tb.tot - smin))
        |      // (2 * (ta.tot + tb.tot - smin)) AS BIGINT)
        |      AS wjaccard_ppm
        |  FROM p
        |  JOIN tot ta ON id_a = ta.doc_id
        |  JOIN tot tb ON id_b = tb.doc_id)
        |SELECT id_a, id_b, smin, ta, tb, wjaccard_ppm
        |FROM j WHERE wjaccard_ppm >= 400000
        |ORDER BY id_a, id_b""".stripMargin,
    "q249_lsh_recall_audit" ->
      s"""WITH $lshBandsCte,
         |cands AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b USING (band, band_sig)
         |  WHERE a.doc_id < b.doc_id),
         |kepttok AS (
         |  SELECT token FROM (
         |    SELECT token, count(*) AS df FROM tok GROUP BY 1)
         |  WHERE df <= 100),
         |ktok AS (SELECT doc_id, token FROM tok JOIN kepttok USING (token)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM ktok GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
         |  FROM ktok a JOIN ktok b USING (token) WHERE a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |ex AS (
         |  SELECT id_a, id_b,
         |    least(9, CAST(floor((shared::DOUBLE
         |      / (x.n + y.n - shared)) * 10) AS BIGINT)) AS bucket
         |  FROM inter
         |  JOIN sizes x ON id_a = x.doc_id
         |  JOIN sizes y ON id_b = y.doc_id
         |  WHERE shared::DOUBLE / (x.n + y.n - shared) >= 0.4),
         |bb AS (
         |  SELECT bucket, CAST(count(*) AS BIGINT) AS n_true,
         |    CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_hit
         |  FROM ex LEFT JOIN cands c USING (id_a, id_b)
         |  GROUP BY 1),
         |cs AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_cand,
         |    CAST(SUM(CASE WHEN e.id_a IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_cand_true
         |  FROM cands LEFT JOIN ex e USING (id_a, id_b))
         |SELECT bucket, n_true, n_hit,
         |  CAST((2 * n_hit * 1000000 + n_true) // (2 * n_true) AS BIGINT)
         |    AS recall_ppm,
         |  n_cand, n_cand_true,
         |  CAST((2 * n_cand_true * 1000000 + n_cand) // (2 * n_cand)
         |    AS BIGINT) AS precision_ppm
         |FROM bb CROSS JOIN cs ORDER BY bucket""".stripMargin,
    "q242_containment_dups" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        |      AS shingle
        |  FROM t),
        |keptsh AS (
        |  SELECT shingle FROM (
        |    SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
        |  WHERE df <= 100),
        |kept AS (SELECT doc_id, shingle FROM sh JOIN keptsh USING (shingle)),
        |sizes AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM kept GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(count(*) AS BIGINT) AS inter
        |  FROM kept a JOIN kept b
        |    ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT id_a, id_b, sa.n AS na, sb.n AS nb, inter,
        |    CAST((2 * inter * 1000000 + sa.n) // (2 * sa.n) AS BIGINT)
        |      AS containment_ppm,
        |    CAST((2 * inter * 1000000 + (sa.n + sb.n - inter))
        |      // (2 * (sa.n + sb.n - inter)) AS BIGINT) AS jaccard_ppm
        |  FROM p
        |  JOIN sizes sa ON id_a = sa.doc_id
        |  JOIN sizes sb ON id_b = sb.doc_id)
        |SELECT id_a, id_b, na, nb, inter, containment_ppm, jaccard_ppm,
        |  (jaccard_ppm < 500000) AS jaccard_blind
        |FROM j WHERE containment_ppm >= 800000
        |ORDER BY id_a, id_b""".stripMargin,
    "q230_dedup_threshold_sweep" ->
      s"""WITH $lshBandsCte,
         |cands AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands a JOIN bands b USING (band, band_sig)
         |  WHERE a.doc_id < b.doc_id),
         |ag AS (
         |  SELECT id_a, id_b,
         |    CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END)
         |      AS BIGINT) AS a16
         |  FROM cands
         |  JOIN sigs sa ON sa.doc_id = id_a
         |  JOIN sigs sb ON sb.doc_id = id_b AND sb.p = sa.p
         |  GROUP BY id_a, id_b),
         |th(min_agree) AS (VALUES (CAST(4 AS BIGINT)), (6), (8), (10), (12)),
         |pt AS (
         |  SELECT min_agree, id_a, id_b
         |  FROM th JOIN ag ON a16 >= min_agree),
         |np AS (SELECT min_agree, CAST(count(*) AS BIGINT) AS n_pairs
         |       FROM pt GROUP BY 1),
         |nd AS (
         |  SELECT min_agree, CAST(count(DISTINCT d) AS BIGINT)
         |    AS n_docs_affected
         |  FROM (SELECT min_agree, id_a AS d FROM pt
         |        UNION ALL SELECT min_agree, id_b FROM pt)
         |  GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
         |SELECT np.min_agree, np.n_pairs, nd.n_docs_affected, tot.n_docs,
         |  floor((CAST(nd.n_docs_affected AS DOUBLE) /
         |    CAST(tot.n_docs AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
         |    AS pct_docs
         |FROM np JOIN nd ON np.min_agree = nd.min_agree CROSS JOIN tot
         |ORDER BY np.min_agree""".stripMargin,
    "q223_word_associations" ->
      """WITH dt AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |dfv AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
        |        FROM dt GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |p AS (
        |  SELECT a.tok AS ta, b.tok AS tb, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY 1, 2 HAVING count(*) >= 20)
        |SELECT ta, tb, n_ab, fa.df AS df_a, fb.df AS df_b,
        |  CAST((2 * CAST(n_ab AS HUGEINT) * n_docs * 1000000 +
        |      CAST(fa.df AS HUGEINT) * fb.df) //
        |    (2 * CAST(fa.df AS HUGEINT) * fb.df) AS BIGINT) AS lift_ppm
        |FROM p JOIN dfv fa ON p.ta = fa.tok
        |JOIN dfv fb ON p.tb = fb.tok
        |CROSS JOIN nd
        |ORDER BY lift_ppm DESC, ta, tb LIMIT 100""".stripMargin,
    "q224_heaps_vocab_growth" ->
      // quantile params must be constants in DuckDB — one generated
      // stanza per decile, sharing the engine's exact formula
      ("""WITH toks AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  WHERE len(tok) > 0),
        |cuts AS (CUT_STANZAS),
        |fd AS (SELECT tok, min(doc_id) AS fd FROM toks GROUP BY 1),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks
        |       FROM toks GROUP BY 1),
        |vocab AS (
        |  SELECT decile, cut_doc_id, CAST(count(*) AS BIGINT)
        |    AS vocabulary
        |  FROM cuts JOIN fd ON fd.fd <= cuts.cut_doc_id
        |  GROUP BY 1, 2),
        |vol AS (
        |  SELECT decile, cut_doc_id, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        |  FROM cuts JOIN pd ON pd.doc_id <= cuts.cut_doc_id
        |  GROUP BY 1, 2)
        |SELECT v.decile, v.cut_doc_id, v.n_docs, v.n_tokens, vb.vocabulary
        |FROM vol v JOIN vocab vb ON v.decile = vb.decile
        |  AND v.cut_doc_id = vb.cut_doc_id
        |ORDER BY v.decile""".stripMargin)
        .replace("CUT_STANZAS", (1 to 10).map { d =>
          s"SELECT $d AS decile, CAST(floor(floor(quantile_cont(doc_id, " +
            s"${d / 10.0}) * 1000000.0 + 0.5) / 1000000.0) AS BIGINT) " +
            "AS cut_doc_id FROM documents"
        }.mkString("\n  UNION ALL\n  ")),
    "q184_mixture_rebalance" ->
      s"""WITH w AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(floor((sqrt(count(*)::DOUBLE) * 1e9) + 0.5) AS BIGINT) AS w
         |  FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(w) AS BIGINT) AS w_sum,
         |        CAST(sum(n_docs) AS BIGINT) AS n_total FROM w),
         |q AS (SELECT source, n_docs,
         |        (CAST(n_total // 2 AS HUGEINT) * w) // w_sum AS quota
         |      FROM w CROSS JOIN t),
         |r AS (SELECT doc_id, source,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY md5_number_lower('184:' || doc_id::VARCHAR)
         |            & $H, doc_id) AS rk
         |      FROM documents)
         |SELECT r.doc_id, r.source, CAST(rk AS BIGINT) AS rk,
         |  CAST(quota AS BIGINT) AS quota, n_docs
         |FROM r JOIN q USING (source) WHERE rk <= quota
         |ORDER BY source, rk""".stripMargin,
    "q181_entity_resolution" ->
      """WITH RECURSIVE n AS (SELECT DISTINCT p_name AS name FROM part),
        |p1 AS (
        |  SELECT name, unnest([lead(name, 1) OVER w, lead(name, 2) OVER w,
        |    lead(name, 3) OVER w, lead(name, 4) OVER w,
        |    lead(name, 5) OVER w]) AS nb
        |  FROM n WINDOW w AS (PARTITION BY substr(name, 1, 1)
        |                      ORDER BY name)),
        |p2 AS (
        |  SELECT name, unnest([lead(name, 1) OVER w2, lead(name, 2) OVER w2,
        |    lead(name, 3) OVER w2, lead(name, 4) OVER w2,
        |    lead(name, 5) OVER w2]) AS nb
        |  FROM n WINDOW w2 AS (PARTITION BY substr(reverse(name), 1, 1)
        |                       ORDER BY reverse(name))),
        |cand AS (SELECT DISTINCT least(name, nb) AS name_a,
        |           greatest(name, nb) AS name_b
        |         FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
        |         WHERE nb IS NOT NULL),
        |m AS (SELECT name_a, name_b FROM cand
        |      WHERE floor((jaro_winkler_similarity(name_a, name_b)) * 1000000.0 + 0.5) / 1000000.0
        |        >= 0.94),
        |sym AS (SELECT name_a AS src, name_b AS dst FROM m
        |        UNION SELECT name_b, name_a FROM m),
        |reach AS (
        |  SELECT src AS id, src AS r FROM sym
        |  UNION
        |  SELECT s.src AS id, reach.r FROM sym s
        |  JOIN reach ON s.dst = reach.id),
        |comp AS (SELECT id, MIN(r) AS canon FROM reach GROUP BY id),
        |lab AS (SELECT name, coalesce(comp.canon, name) AS canonical
        |        FROM n LEFT JOIN comp ON n.name = comp.id),
        |csz AS (SELECT canonical, CAST(count(*) AS BIGINT)
        |          AS cluster_size
        |        FROM lab GROUP BY 1)
        |SELECT name, lab.canonical, cluster_size
        |FROM lab JOIN csz ON lab.canonical = csz.canonical
        |ORDER BY name""".stripMargin,
    "q170_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    t -> len(t) > 0)) AS w FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf
        |       FROM toks GROUP BY 1, 2),
        |lens AS (SELECT doc_id, sum(tf) AS len FROM tf GROUP BY 1),
        |st AS (SELECT count(*) AS n_docs, sum(len) AS tot_len FROM lens),
        |av AS (SELECT n_docs,
        |         floor((CAST(tot_len AS DOUBLE) / n_docs) * 1000000.0 + 0.5) / 1000000.0 AS avglen
        |       FROM st),
        |dfs AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
        |q AS (SELECT DISTINCT w FROM tf WHERE doc_id = 0),
        |idf AS (SELECT dfs.w, avglen,
        |    CAST(floor((ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)) * 1000000000.0 + 0.5) / 1000000000.0
        |      AS DECIMAL(28,9)) AS idf
        |  FROM dfs JOIN q USING (w) CROSS JOIN av),
        |c AS (SELECT tf.doc_id,
        |    CAST(floor((CAST(idf AS DOUBLE)
        |        * (CAST(tf.tf AS DOUBLE) * 2.2)
        |        / (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75
        |            * (CAST(lens.len AS DOUBLE) / avglen)))) * 1000000000.0 + 0.5) / 1000000000.0
        |      AS DECIMAL(28,9)) AS ts
        |  FROM tf JOIN idf ON tf.w = idf.w
        |  JOIN lens ON tf.doc_id = lens.doc_id)
        |SELECT doc_id, floor((CAST(sum(ts) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS score,
        |  CAST(count(*) AS BIGINT) AS n_terms
        |FROM c GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 25""".stripMargin,
    "q162_naive_bayes" ->
      """WITH tr AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        |te AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
        |trt AS (SELECT lang AS c,
        |          unnest(list_filter(string_split(text, ' '),
        |            t -> len(t) > 0)) AS w FROM tr),
        |cnt AS (SELECT c, w, count(*) AS n FROM trt GROUP BY 1, 2),
        |tc AS (SELECT c, sum(n) AS tokens_c FROM cnt GROUP BY 1),
        |v AS (SELECT count(DISTINCT w) AS v FROM cnt),
        |dc AS (SELECT lang AS c, count(*) AS docs_c FROM tr GROUP BY 1),
        |dt AS (SELECT count(*) AS docs_tot FROM tr),
        |classes AS (SELECT tc.c,
        |    CAST(floor((ln(CAST(docs_c AS DOUBLE) / docs_tot)) * 1000000000.0 + 0.5) / 1000000000.0
        |      AS DECIMAL(28,9)) AS prior,
        |    CAST(floor((ln(1.0 / (tokens_c + v))) * 1000000000.0 + 0.5) / 1000000000.0
        |      AS DECIMAL(28,9)) AS logp0
        |  FROM tc JOIN dc ON tc.c = dc.c CROSS JOIN v CROSS JOIN dt),
        |model AS (SELECT cnt.c, w,
        |    CAST(floor((ln(CAST(n + 1 AS DOUBLE) / (tokens_c + v))) * 1000000000.0 + 0.5) / 1000000000.0
        |      AS DECIMAL(28,9)) AS logp
        |  FROM cnt JOIN tc ON cnt.c = tc.c CROSS JOIN v),
        |tet AS (SELECT doc_id, lang AS truth,
        |          unnest(list_filter(string_split(text, ' '),
        |            t -> len(t) > 0)) AS w FROM te),
        |sc AS (SELECT doc_id, truth, cl.c, cl.prior,
        |    sum(coalesce(m.logp, cl.logp0)) AS sumlogp
        |  FROM tet CROSS JOIN classes cl
        |  LEFT JOIN model m ON m.c = cl.c AND m.w = tet.w
        |  GROUP BY 1, 2, 3, 4),
        |p AS (SELECT doc_id, truth, c AS predicted,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY prior + sumlogp DESC, c) AS rn
        |  FROM sc)
        |SELECT truth, predicted, CAST(count(*) AS BIGINT) AS n_docs
        |FROM p WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // The oracle reads the UNPARTITIONED parquet — matching results prove
    // the partitioned staging + pruned read is lossless.
    "q57_partitioned_prune" ->
      s"""SELECT lang, source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  bit_xor(CAST(md5_number_lower(text) & $H AS BIGINT)) AS checksum
         |FROM documents WHERE lang IN ('en', 'zh')
         |GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q58_orc_roundtrip" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
         |  bit_xor(CAST(md5_number_lower(text) & $H AS BIGINT)) AS checksum
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // Plants the same synthetic email+URL per doc, then redacts — the
    // regex dialects agree because only character classes + bounded
    // quantifiers appear (see TextAnalysis.redactPii).
    "q59_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    text || ' contact_' || doc_id::VARCHAR ||
        |    '@example.com via https://ex.org/d/' || doc_id::VARCHAR ||
        |    ' end' AS planted
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    regexp_replace(
        |      regexp_replace(planted,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |        '<EMAIL>', 'g'),
        |      'https?://[^ ]+', '<URL>', 'g') AS redacted
        |  FROM p)
        |SELECT doc_id, redacted,
        |  CAST(len(string_split(redacted, '<EMAIL>')) - 1
        |     + len(string_split(redacted, '<URL>')) - 1 AS BIGINT) AS n_masked
        |FROM r ORDER BY doc_id""".stripMargin,
    "q89_normalize_text" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, norm,
        |  CASE WHEN norm = '' THEN 0
        |       ELSE CAST(len(string_split(norm, ' ')) AS BIGINT) END AS n_tokens
        |FROM n ORDER BY doc_id""".stripMargin,
    // seededUniform mirror: u = least((md5_63('seed:key'))/2^63, nextDown(1)).
    "q86_weighted_sample" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, lang, n_chars,
         |    least(0.9, greatest(0.05, n_chars / 2000.0)) AS p,
         |    least(CAST((md5_number_lower('99:' || doc_id::VARCHAR) & $H)
         |            AS BIGINT)::DOUBLE / 9.223372036854775808e18,
         |          0.9999999999999999) AS u
         |  FROM documents)
         |SELECT doc_id, source, lang, n_chars, floor((p) * 1000000.0 + 0.5) / 1000000.0 AS p_keep
         |FROM t WHERE u < p ORDER BY doc_id""".stripMargin,
    "q85_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id, source, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, SUM(n_tokens) OVER (
        |    PARTITION BY source, lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, source, lang, n_tokens,
        |  CAST(cum - n_tokens AS BIGINT) AS off_tokens,
        |  CAST((cum - n_tokens) // 128 AS BIGINT) AS first_bin,
        |  CAST((cum - 1) // 128 AS BIGINT) AS last_bin
        |FROM c ORDER BY source, lang, doc_id""".stripMargin,
    "q84_token_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, toks,
        |    unnest(generate_series(0,
        |      CAST(greatest(1, ceil((len(toks) - 32) / 24.0) + 1) AS BIGINT) - 1))
        |      AS chunk_id
        |  FROM t)
        |SELECT doc_id, chunk_id,
        |  len(toks[chunk_id*24 + 1 : chunk_id*24 + 32]) AS chunk_len,
        |  list_aggregate(toks[chunk_id*24 + 1 : chunk_id*24 + 32],
        |    'string_agg', ' ') AS chunk
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "q82_decontaminate" -> contaminationOracle,
    // q94 is the Bloom-prefiltered implementation of the same
    // contamination semantics — one oracle, two engines' worth of plan.
    "q94_bloom_decontaminate" -> contaminationOracle,
    "q95_vocab_spectrum" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |per AS (
        |  SELECT token, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS occ
        |  FROM tok GROUP BY token)
        |SELECT df, COUNT(*) AS n_tokens, CAST(SUM(occ) AS BIGINT) AS n_occ
        |FROM per GROUP BY df ORDER BY df""".stripMargin,
    "q96_jsonl_roundtrip" ->
      s"""SELECT source, lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  bit_xor(CAST(md5_number_lower(text) & $H AS BIGINT)) AS checksum
         |FROM documents GROUP BY source, lang
         |ORDER BY source, lang""".stripMargin,
    "q97_dedup_ledger" ->
      s"""WITH RECURSIVE $componentsCte,
         |ex AS (
         |  SELECT doc_id,
         |    min(doc_id) OVER (PARTITION BY md5(text)) AS exact_canon
         |  FROM documents)
         |SELECT ex.doc_id,
         |  CASE WHEN ex.doc_id <> ex.exact_canon THEN 'exact_dup'
         |       WHEN comp.id IS NOT NULL AND ex.doc_id <> comp.canonical_id
         |         THEN 'near_dup'
         |       ELSE 'kept' END AS status,
         |  CASE WHEN ex.doc_id <> ex.exact_canon THEN ex.exact_canon
         |       WHEN comp.id IS NOT NULL THEN comp.canonical_id
         |       ELSE ex.doc_id END AS canonical_id
         |FROM ex LEFT JOIN comp ON comp.id = ex.doc_id
         |ORDER BY ex.doc_id""".stripMargin,
    "q376_dedup_ledger_compact" ->
      """WITH pg AS (
        |  SELECT md5(text) AS fp, MIN(doc_id) AS prev_canonical,
        |    CAST(COUNT(*) AS BIGINT) AS n_prev
        |  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |bg AS (
        |  SELECT md5(text) AS fp, MIN(doc_id) AS new_min,
        |    CAST(COUNT(*) AS BIGINT) AS n_new
        |  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |m AS (
        |  SELECT COALESCE(pg.fp, bg.fp) AS fp,
        |    COALESCE(pg.prev_canonical, bg.new_min) AS canonical_id,
        |    CASE WHEN pg.n_prev IS NOT NULL THEN 'prev' ELSE 'curr' END
        |      AS first_seen,
        |    COALESCE(pg.n_prev, CAST(0 AS BIGINT)) AS n_prev,
        |    COALESCE(bg.n_new, CAST(0 AS BIGINT)) AS n_new
        |  FROM pg FULL OUTER JOIN bg ON pg.fp = bg.fp)
        |SELECT fp, canonical_id, first_seen, n_prev, n_new,
        |  n_prev + n_new AS n_total,
        |  CASE WHEN first_seen = 'prev' THEN n_new
        |       ELSE CAST(0 AS BIGINT) END AS n_cross_dups
        |FROM m ORDER BY canonical_id, fp NULLS FIRST""".stripMargin,
    "q80_tfidf_cosine_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        |  FROM t),
        |tf AS (SELECT doc_id, shingle, COUNT(*) AS tf FROM sh GROUP BY doc_id, shingle),
        |dfq AS (SELECT shingle, COUNT(*) AS df FROM tf GROUP BY shingle
        |        HAVING COUNT(*) <= 20),
        |n AS (SELECT COUNT(*)::DOUBLE AS nd FROM documents),
        |w AS (
        |  SELECT doc_id, shingle, df,
        |    CAST(floor((tf * ln(nd / df)) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS w
        |  FROM tf JOIN dfq USING (shingle) CROSS JOIN n),
        |norms AS (
        |  SELECT doc_id, sqrt(CAST(SUM(w * w) AS DOUBLE)) AS norm
        |  FROM w GROUP BY doc_id),
        |dots AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dot
        |  FROM w a JOIN w b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  WHERE a.df >= 2
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  floor((CAST(dot AS DOUBLE) / (na.norm * nb.norm)) * 1000000.0 + 0.5) / 1000000.0 AS cosine
        |FROM dots
        |JOIN norms na ON na.doc_id = id_a
        |JOIN norms nb ON nb.doc_id = id_b
        |ORDER BY cosine DESC, id_a, id_b LIMIT 100""".stripMargin,
    "q69_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        |  FROM t)
        |SELECT doc_id, COUNT(*) AS n_shingles,
        |  COUNT(DISTINCT shingle) AS n_distinct,
        |  floor((1.0 - COUNT(DISTINCT shingle)::DOUBLE / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS dup_ratio
        |FROM sh GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q18_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
        |dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
        |n AS (SELECT COUNT(*)::DOUBLE AS nd FROM documents),
        |scored AS (
        |  SELECT doc_id, token, floor((tf * ln(nd / df)) * 1000000.0 + 0.5) / 1000000.0 AS tfidf
        |  FROM tf JOIN dfq USING (token) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, token, tfidf,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INT) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, token, tfidf
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q20_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS n_subtokens,
        |  n_chars, md5(text) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q21_quality_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to'))) AS INT) AS n_stop,
        |  len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE / len(toks) AS stop_ratio,
        |  (1.0 - len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE / len(toks))
        |    * least(1.0, len(toks)::DOUBLE / 100.0) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "q22_lang_id" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents),
        |profiles AS (
        |  SELECT lang AS cand_lang, token FROM (
        |    SELECT lang, token, count(*) AS cnt,
        |      row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, token) AS r
        |    FROM tok GROUP BY lang, token) WHERE r <= 20),
        |doctok AS (SELECT DISTINCT doc_id, token FROM tok),
        |scores AS (
        |  SELECT doc_id, cand_lang, count(*) AS n_overlap
        |  FROM doctok JOIN profiles USING (token) GROUP BY doc_id, cand_lang),
        |best AS (
        |  SELECT doc_id, cand_lang AS predicted, n_overlap,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY n_overlap DESC, cand_lang) AS r
        |  FROM scores)
        |SELECT b.doc_id, b.predicted, d.lang AS actual, b.n_overlap,
        |  CAST(b.predicted = d.lang AS INT) AS correct
        |FROM best b JOIN documents d ON b.doc_id = d.doc_id
        |WHERE b.r = 1 ORDER BY b.doc_id""".stripMargin,
    "q28_simhash_neardup" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |h AS (
         |  SELECT doc_id, CAST(md5_number_lower(token) & $H AS BIGINT) AS h FROM tok),
         |bits AS (
         |  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS b) g
         |  GROUP BY doc_id, b),
         |sh AS (
         |  SELECT doc_id,
         |    CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id),
         |chunks AS (
         |  SELECT doc_id, simhash, i, (simhash >> (i * 16)) & 65535 AS cv
         |  FROM sh CROSS JOIN generate_series(0, 3) g(i)),
         |cands AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         |    a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM chunks a JOIN chunks b USING (i, cv)
         |  WHERE a.doc_id < b.doc_id)
         |SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
         |FROM cands WHERE bit_count(xor(sh_a, sh_b)) <= 3
         |ORDER BY id_a, id_b""".stripMargin,
    "q23_exact_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY fp ORDER BY fp""".stripMargin,
    "q24_simhash" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |h AS (
         |  SELECT doc_id, CAST(md5_number_lower(token) & $H AS BIGINT) AS h FROM tok),
         |bits AS (
         |  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 62)) AS b) g
         |  GROUP BY doc_id, b)
         |SELECT doc_id,
         |  CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // The fast aggregate's affine mixing (a·h + b wrapping in 64-bit,
    // masked to 63 bits) == (a·h + b) mod 2^63 in exact integer math —
    // HUGEINT holds the ≤2^126 product, % (2^63) reduces it identically.
    "q29_minhash_fast" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
         |  WHERE len(string_split(text, ' ')) >= 3),
         |tok AS (
         |  SELECT DISTINCT doc_id,
         |    unnest(list_transform(generate_series(1, len(toks) - 2),
         |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS token
         |  FROM t),
         |h AS (SELECT doc_id, CAST(md5_number_lower(token) & $H AS BIGINT) AS h FROM tok),
         |c AS (SELECT p,
         |        CAST((md5_number_lower('a:' || p::VARCHAR) & $H) | 1 AS BIGINT) AS a,
         |        CAST(md5_number_lower('b:' || p::VARCHAR) & $H AS BIGINT) AS b
         |      FROM (SELECT unnest(generate_series(0, 15)) AS p) g)
         |SELECT doc_id, p,
         |  CAST(MIN(CAST((a::HUGEINT * h::HUGEINT + b::HUGEINT) % ($H::HUGEINT + 1) AS BIGINT)) AS BIGINT) AS mh
         |FROM h CROSS JOIN c
         |GROUP BY doc_id, p ORDER BY doc_id, p""".stripMargin,
    "q25_minhash_sigs" -> minhashSigOracle,
    // q98 computes the same signatures per-row (no shuffle); one oracle
    // pins q25 (agg path) and q98 (map path) to identical values.
    "q98_minhash_rowsig" -> minhashSigOracle,
    "q107_bigram_loglik" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |n2 AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 2),
        |bg0 AS (SELECT doc_id, toks,
        |               unnest(generate_series(1, len(toks) - 1)) AS i FROM n2),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM bg0),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |m AS (SELECT c2.w1, c2.w2, ln(c2.c2::DOUBLE / c1.c1::DOUBLE) AS logp
        |      FROM c2 JOIN c1 USING (w1))
        |SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       floor((avg(m.logp)) * 1000000.0 + 0.5) / 1000000.0 AS avg_logp
        |FROM bg JOIN m ON bg.w1 = m.w1 AND bg.w2 = m.w2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q146_ols_per_source" -> olsOracle,
    "q154_span_dedup" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
        |  FROM documents),
        |base AS (SELECT doc_id, len(toks) AS n_tokens, toks FROM t),
        |sh0 AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(0, n_tokens - 10),
        |    i -> {'pos': i,
        |          'sh': list_aggregate(toks[i+1:i+10], 'string_agg', ' ')}))
        |    AS s
        |  FROM base WHERE n_tokens >= 10),
        |sh AS (SELECT doc_id, s.pos AS pos, s.sh AS sh FROM sh0),
        |dup AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) >= 2),
        |cov0 AS (
        |  SELECT doc_id, unnest(generate_series(pos, pos + 9)) AS p
        |  FROM sh JOIN dup USING (sh)),
        |cov AS (SELECT DISTINCT doc_id, p FROM cov0),
        |cv AS (SELECT doc_id, COUNT(*) AS covered FROM cov GROUP BY 1)
        |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(cv.covered, 0) AS BIGINT) AS covered_tokens,
        |  floor((CAST(b.n_tokens - COALESCE(cv.covered, 0) AS DOUBLE)
        |    / b.n_tokens) * 1000000.0 + 0.5) / 1000000.0 AS keep_ratio
        |FROM base b LEFT JOIN cv ON cv.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    "q147_quantile_norm" -> {
      val probs = (0 to 10).map(i => s"${i / 10.0}").mkString(", ")
      s"""WITH rows0 AS (
         |  SELECT doc_id AS rid, source AS grp, CAST(n_chars AS DOUBLE) AS v
         |  FROM documents),
         |gb AS (
         |  SELECT list_transform(quantile_cont(v, [$probs]),
         |    b -> floor((b) * 1000000.0 + 0.5) / 1000000.0) AS gb
         |  FROM rows0),
         |sb AS (
         |  SELECT grp, list_transform(quantile_cont(v, [$probs]),
         |    b -> floor((b) * 1000000.0 + 0.5) / 1000000.0) AS sb
         |  FROM rows0 GROUP BY grp),
         |j1 AS (
         |  SELECT rid, grp, v, sb, gb,
         |    greatest(1, least(10, len(list_filter(sb, b -> b < v)))) AS i
         |  FROM rows0 JOIN sb USING (grp) CROSS JOIN gb),
         |j2 AS (
         |  SELECT rid, grp, v, gb,
         |    floor(((CAST(i - 1 AS DOUBLE) + CASE WHEN sb[i+1] > sb[i]
         |      THEN (v - sb[i]) / (sb[i+1] - sb[i]) ELSE 0.0 END)
         |      / 10.0) * 1000000.0 + 0.5) / 1000000.0 AS p_src
         |  FROM j1),
         |j3 AS (
         |  SELECT rid, grp, v, p_src, gb,
         |    least(CAST(floor(p_src * 10) AS INT), 9) AS j
         |  FROM j2)
         |SELECT rid, grp, v, p_src,
         |  floor((gb[j+1] + (p_src * 10.0 - j) * (gb[j+2] - gb[j+1])) * 1000000.0 + 0.5) / 1000000.0
         |    AS v_norm
         |FROM j3 ORDER BY rid""".stripMargin
    },
    "q199_weighted_stratified" ->
      """WITH s AS (
        |  SELECT source, lang, doc_id, n_chars,
        |    ln(((md5_number_lower('11:' || doc_id) & 9223372036854775807)
        |        + 1) / 9223372036854775808.0) / n_chars AS es
        |  FROM documents),
        |r AS (SELECT source, lang, doc_id, n_chars, es,
        |        row_number() OVER (PARTITION BY source, lang
        |                           ORDER BY es DESC, doc_id) AS rank
        |      FROM s)
        |SELECT source, lang, CAST(rank AS INT) AS rank, doc_id, n_chars,
        |       floor((es) * 1000000.0 + 0.5) / 1000000.0 AS es
        |FROM r WHERE rank <= 30 ORDER BY source, lang, rank""".stripMargin,
    "q119_weighted_topk" ->
      """WITH s AS (
        |  SELECT doc_id, n_chars,
        |    ln(((md5_number_lower('7:' || doc_id) & 9223372036854775807) + 1)
        |       / 9223372036854775808.0) / n_chars AS es
        |  FROM documents),
        |r AS (SELECT doc_id, n_chars, es,
        |        row_number() OVER (ORDER BY es DESC, doc_id) AS rank
        |      FROM s)
        |SELECT CAST(rank AS BIGINT) AS rank, doc_id, n_chars,
        |       floor((es) * 1000000.0 + 0.5) / 1000000.0 AS es
        |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin,
    "q108_bpe_pairs" ->
      """WITH wd AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |v AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM wd
        |      WHERE len(w) >= 2 GROUP BY 1),
        |p0 AS (SELECT w, cnt,
        |              unnest(generate_series(1, len(w) - 1)) AS i FROM v),
        |p AS (SELECT substr(w, i, 2) AS pair, cnt FROM p0)
        |SELECT pair, CAST(sum(cnt) AS BIGINT) AS n FROM p GROUP BY 1
        |ORDER BY n DESC, pair LIMIT 25""".stripMargin,
    "q26_ngram_jaccard_dups" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
        |  FROM t),
        |keptsh AS (
        |  SELECT shingle FROM (
        |    SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
        |  WHERE df <= 100),
        |kept AS (SELECT doc_id, shingle FROM sh JOIN keptsh USING (shingle)),
        |sizes AS (SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM kept a JOIN kept b USING (shingle) WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, shared,
        |  shared::DOUBLE / (x.n + y.n - shared) AS jaccard
        |FROM inter JOIN sizes x ON id_a = x.doc_id JOIN sizes y ON id_b = y.doc_id
        |WHERE shared::DOUBLE / (x.n + y.n - shared) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "q27_minhash_lsh_dups" ->
      s"""WITH $lshPairsCte
         |SELECT id_a, id_b, est_jaccard FROM est
         |WHERE est_jaccard >= 0.4 ORDER BY id_a, id_b""".stripMargin,
    "q323_fuzzy_decontaminate" ->
      s"""WITH $lshPairsCte,
         |fz AS (
         |  SELECT CASE WHEN id_a % 17 <> 0 THEN id_a ELSE id_b END
         |      AS doc_id,
         |    est_jaccard
         |  FROM est
         |  WHERE est_jaccard >= 0.5
         |    AND ((id_a % 17 = 0) <> (id_b % 17 = 0)))
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bench_matches,
         |  MAX(est_jaccard) AS max_est_jaccard
         |FROM fz GROUP BY 1 ORDER BY 1""".stripMargin,
    "q73_neardup_clusters" ->
      s"""WITH RECURSIVE $componentsCte,
         |csz AS (SELECT canonical_id, COUNT(*) AS cluster_size
         |        FROM comp GROUP BY canonical_id)
         |SELECT comp.id AS doc_id, comp.canonical_id, csz.cluster_size
         |FROM comp JOIN csz USING (canonical_id)
         |ORDER BY doc_id""".stripMargin,
    "q74_neardup_survivors" ->
      s"""WITH RECURSIVE $componentsCte,
         |victims AS (SELECT id FROM comp WHERE id <> canonical_id)
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM victims)
         |ORDER BY doc_id""".stripMargin,
    "q75_stratified_cap" ->
      s"""WITH r AS (
         |  SELECT doc_id, source, lang, n_chars,
         |    row_number() OVER (PARTITION BY source, lang
         |      ORDER BY CAST(md5_number_lower('7:' || doc_id::VARCHAR) & $H AS BIGINT),
         |               doc_id) AS rn
         |  FROM documents)
         |SELECT doc_id, source, lang, n_chars FROM r WHERE rn <= 5
         |ORDER BY doc_id""".stripMargin)
}
