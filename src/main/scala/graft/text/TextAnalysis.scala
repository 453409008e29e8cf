package graft.text

import graft.functions.GraftFunctions.md5_63
import graft.functions.GraftFunctions.{qdec, qround}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed text-analysis and near-duplicate operators for the
  * training-data-pipeline surface: token statistics, quality scoring,
  * n-gram-profile language ID, exact dedup, SimHash, MinHash + LSH.
  *
  * None of this existed distributed in the reference — its MinHash/LSH ran
  * driver-side in datasketch (`top_100_pairs.py:54-94`); here the whole
  * pipeline is shuffle-based Spark built-ins plus the codegen'd
  * [[graft.functions.HashUtil.md5Lower63]] hash, so it scales horizontally
  * and stays DuckDB-oracle-checkable.
  */
object TextAnalysis {

  /** Explode a whitespace-tokenized text column into (id, token) rows.
    * `distinct = true` gives set semantics (required for MinHash/Jaccard). */
  def tokens(df: DataFrame, id: String, text: String,
             distinct: Boolean = false): DataFrame = {
    val t = df.select(col(id), explode(split(col(text), " ")).as("token"))
    if (distinct) t.distinct() else t
  }

  /** Mask emails then URLs in a text column — the PII-redaction map that
    * runs before fingerprinting or training-set export. Pure codegen'd
    * `regexp_replace` chain (replace-ALL), shuffle-free; both patterns use
    * only character classes and bounded quantifiers, which mean the same
    * thing in Java regex (Spark) and RE2 (DuckDB), so the operator stays
    * oracle-checkable (q59). Email first: an email inside a URL's query
    * string would otherwise be swallowed whole by the URL mask, which is
    * fine, but a URL-like tail in an email's domain must not split the
    * email mask. */
  def redactPii(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "https?://[^ ]+", "<URL>")

  /** SimHash over the token multiset: bit b of the 63-bit fingerprint is
    * set iff Σ_tokens (±1 by bit b of md5_63(token)) > 0.
    *
    * Two partial-aggregating shuffles ((id,b) then id); the 63× row blowup
    * happens map-side post-scan and is aggregated before the shuffle, so
    * network volume is O(docs × 63), not O(tokens × 63).
    */
  def simhash(df: DataFrame, id: String, text: String,
              bits: Int = 63): DataFrame =
    tokens(df, id, text)
      .withColumn("h", md5_63(col("token")))
      .select(col(id), col("h"), explode(sequence(lit(0), lit(bits - 1))).as("b"))
      .groupBy(col(id), col("b"))
      .agg(sum(when(expr("(shiftright(h, b) & 1) = 1"), 1).otherwise(-1)).as("s"))
      .groupBy(col(id))
      .agg(sum(when(col("s") > 0, expr("shiftleft(cast(1 as bigint), b)"))
        .otherwise(lit(0L))).as("simhash"))

  /** SimHash near-duplicate pairs by Hamming distance, via the pigeonhole
    * block technique: split the 63-bit fingerprint into 4 × 16-bit chunks;
    * any pair within distance ≤ 3 must agree exactly on ≥1 chunk, so
    * candidates come from an equi-join on (chunk index, chunk value) —
    * O(collisions), never all-pairs — and are then verified with
    * `bit_count(xor)`. maxDist must stay < #chunks for the guarantee. */
  def simhashNearDupPairs(sh: DataFrame, id: String,
                          maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "pigeonhole guarantee needs maxDist < #chunks (4)")
    val chunks = sh.select(col(id), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("i"))
      .withColumn("cv", expr("(simhash >> (i * 16)) & 65535"))
    val a = chunks.select(col(id).as("id_a"), col("simhash").as("sh_a"),
      col("i"), col("cv"))
    val b = chunks.select(col(id).as("id_b"), col("simhash").as("sh_b"),
      col("i"), col("cv"))
    a.join(b, Seq("i", "cv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

  /** MinHash signatures: numPerm rows per id, `mh(p) = min over tokens of
    * md5_63(p ++ ":" ++ token)`. Signature building is a single
    * partial-aggregated min — no `collect_set` of whole token sets ever
    * materializes (the reference's driver-side bottleneck, SURVEY §7.4.4).
    */
  def minhashSignatures(tok: DataFrame, id: String,
                        numPerm: Int): DataFrame =
    tok
      .select(col(id), explode(sequence(lit(0), lit(numPerm - 1))).as("p"),
        col("token"))
      .withColumn("h", md5_63(concat(col("p").cast("string"), lit(":"), col("token"))))
      .groupBy(col(id), col("p"))
      .agg(min(col("h")).as("mh"))

  /** Scale variant of [[minhashSignatures]]: one custom aggregate call
    * per entity instead of a numPerm× row explosion — shuffle volume is
    * one 8·numPerm-byte buffer per (entity, partition). Different (faster)
    * hash family — one md5 per token affine-mixed per perm — but still
    * oracle-checkable: the wrapping arithmetic is exactly (a·h + b) mod
    * 2⁶³, which q29's DuckDB oracle reproduces with HUGEINT products; the
    * estimator statistics and downstream LSH/estimate contract are
    * asserted in PropertySpec/MinHashAggSpec. Output schema matches:
    * (id, p, mh). */
  def minhashSignaturesFast(tok: DataFrame, id: String,
                            numPerm: Int): DataFrame =
    tok.groupBy(col(id))
      .agg(graft.functions.GraftFunctions.minhash_agg(col("token"), numPerm).as("sig"))
      .select(col(id), posexplode(col("sig")).as(Seq("p", "mh")))

  /** Fully per-row MinHash signature: one (id, sig: array<long>) row per
    * document with `sig[p] = min over distinct shingles of
    * md5_63(p ++ ":" ++ shingle)` — the whole signature computed inside a
    * single projection. No explode, no aggregate, NO exchange: at 100 TB
    * the signature pass is a pure map over the corpus, and because it is
    * stateless it also runs unchanged inside a streaming micro-batch
    * (the incremental-ingestion path, q99). Same hash family and values
    * as [[minhashSignatures]] (q25's oracle checks the exploded form).
    * Documents with < n tokens are dropped (no shingles — the
    * [[shingles]] contract). */
  def minhashSignatureArray(df: DataFrame, id: String, text: String,
                            n: Int, numPerm: Int): DataFrame =
    // One codegen'd expression for the whole signature
    // ([[org.apache.spark.sql.graft.MinHashSig]]): the per-perm
    // `array_min(transform(...))` composition evaluated its lambdas on
    // the interpreted path and re-walked the shingles numPerm times —
    // measured 4× slower than even the aggregate path. No array_distinct:
    // min is idempotent under duplicate shingles.
    df.select(col(id), split(col(text), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(id), expr(shingleArrayExpr(n)).as("sh"))
      .select(col(id),
        graft.functions.GraftFunctions.minhash_sig(col("sh"), numPerm).as("sig"))

  /** Per-id LSH band fingerprints from exploded (id, p, mh) signatures:
    * perms grouped into bands of `rowsPerBand`, each band fingerprinted
    * as its ':'-joined perm-ordered minhash string. */
  def lshBands(sigs: DataFrame, id: String, rowsPerBand: Int): DataFrame =
    sigs
      .withColumn("band", expr(s"p div $rowsPerBand"))
      .groupBy(col(id), col("band"))
      .agg(expr("array_join(transform(array_sort(collect_list(struct(p, mh))), x -> cast(x.mh as string)), ':')")
        .as("band_sig"))

  /** Band fingerprints straight from a per-row signature ARRAY
    * ([[minhashSignatureArray]] output): same strings as [[lshBands]],
    * but computed without any aggregate — (id, sig, band, band_sig) rows,
    * streamable. */
  def lshBandsFromArray(withSig: DataFrame, id: String, numPerm: Int,
                        rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until numPerm / rowsPerBand).map { b =>
      // long band id: matches lshBands' `p div rowsPerBand` (BIGINT), so
      // a stream-static join on (band, band_sig) needs no key cast.
      struct(lit(b.toLong).as("band"),
        concat_ws(":", (0 until rowsPerBand).map(i =>
          col("sig")(b * rowsPerBand + i).cast("string")): _*).as("band_sig"))
    }
    withSig.select(col(id), col("sig"), explode(array(bandCols: _*)).as("bd"))
      .select(col(id), col("sig"),
        col("bd.band").as("band"), col("bd.band_sig").as("band_sig"))
  }

  /** One perm-ordered `array<long>` signature row per id, packed from the
    * exploded (id, p, mh) form. */
  def packedSignatures(sigs: DataFrame, id: String): DataFrame =
    sigs.groupBy(col(id))
      .agg(expr("transform(array_sort(collect_list(struct(p, mh))), x -> x.mh)")
        .as("sig"))

  /** LSH banding: group a signature's perms into bands of `rowsPerBand`,
    * fingerprint each band, and emit candidate pairs that collide in at
    * least one band (canonicalized id_a < id_b, deduplicated).
    *
    * The band join shuffles on (band, band_sig) — collision buckets, not
    * all-pairs. This is the O(candidates) scale path that replaces the
    * reference's driver-side LSH index query loop.
    */
  def lshCandidatePairs(sigs: DataFrame, id: String,
                        rowsPerBand: Int): DataFrame = {
    val bands = lshBands(sigs, id, rowsPerBand)
    val a = bands.select(col(id).as("id_a"), col("band"), col("band_sig"))
    val b = bands.select(col(id).as("id_b"), col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Estimated Jaccard for candidate pairs: fraction of agreeing minhash
    * perms.
    *
    * Signatures are packed to ONE array row per entity before the join
    * (perm-ordered `array<long>`), so the candidate join carries
    * |pairs| rows with an in-row agreement fold — not |pairs| × numPerm
    * join rows with a per-pair aggregate. At 10× users (ScaleProbe) this
    * is the difference between a 112M-row and a 3.6B-row join. */
  def estimatedJaccard(pairs: DataFrame, sigs: DataFrame, id: String,
                       numPerm: Int): DataFrame = {
    val packed = packedSignatures(sigs, id)
    val sa = packed.select(col(id).as("id_a"), col("sig").as("sig_a"))
    val sb = packed.select(col(id).as("id_b"), col("sig").as("sig_b"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_jaccard",
        expr(s"aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (a, v) -> a + v)")
          .cast("double") / lit(numPerm.toDouble))
      .select("id_a", "id_b", "est_jaccard")
  }

  /** SQL fragment producing the n-gram array of a tokenized `toks`
    * column — the single source of truth for shingling ([[shingles]] and
    * [[shinglesAll]] differ only in dedup). */
  private def shingleArrayExpr(n: Int): String =
    s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat_ws(' ', slice(toks, i, $n)))"

  private def explodedShingles(df: DataFrame, id: String, text: String,
                               n: Int, distinct: Boolean): DataFrame = {
    val arr = if (distinct) s"array_distinct(${shingleArrayExpr(n)})"
              else shingleArrayExpr(n)
    df.select(col(id), split(col(text), " ").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col(id), explode(expr(arr)).as("shingle"))
  }

  /** Exact n-gram (shingle) sets: (id, shingle) rows, distinct. Documents
    * shorter than n tokens produce no shingles. */
  def shingles(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    explodedShingles(df, id, text, n, distinct = true)

  /** All shingles INCLUDING duplicate occurrences — repetition analysis
    * needs multiplicity ([[shingles]] dedups for set similarity). */
  def shinglesAll(df: DataFrame, id: String, text: String, n: Int): DataFrame =
    explodedShingles(df, id, text, n, distinct = false)

  /** Gopher-class repetition scoring (the duplicate-n-gram quality filter
    * of large-scale training-data pipelines): per document, the fraction
    * of n-gram occurrences that repeat an earlier occurrence —
    * `1 − distinct/total`, 0 for unique text, → 1 for loops. One
    * aggregate over the exploded shingles; at 100 TB both counts partial-
    * aggregate map-side on the doc key. */
  def repetitionScore(df: DataFrame, id: String, text: String,
                      n: Int = 3): DataFrame =
    shinglesAll(df, id, text, n)
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_shingles"),
        countDistinct(col("shingle")).as("n_distinct"))
      .withColumn("dup_ratio",
        qround(lit(1.0) - col("n_distinct").cast("double") / col("n_shingles"), 6))

  /** Top-k most-similar document pairs by TF-IDF cosine over n-gram
    * shingles — sparse vector similarity WITHOUT materializing vectors:
    * the (shingle → documents) inverted index IS the join key, so only
    * pairs sharing at least one vocabulary shingle ever exist as rows.
    *
    * Vocabulary = shingles with document frequency ≤ `maxDf`. That cap is
    * the scale valve: a shingle in d documents contributes d·(d−1)/2 pair
    * rows, so without it one ubiquitous n-gram quadratically floods the
    * shuffle (the same reason TF-IDF down-weights it to ≈0 anyway).
    * Within the capped vocabulary the cosine is EXACT: df=1 shingles are
    * excluded from the pair join (they cannot co-occur — zero dot
    * contribution) but still count toward the norms.
    *
    * Cross-engine determinism: weights are rounded then fixed to
    * DECIMAL(18,6), so dot products and squared norms are exact decimal
    * sums (associativity-free); the only floating steps — sqrt and the
    * final divide — are IEEE-deterministic on identical inputs, and the
    * result is rounded before the top-k ordering (ties broken by pair
    * id).
    */
  def tfidfCosinePairs(df: DataFrame, id: String, text: String, n: Int = 3,
                       maxDf: Long = 20, k: Int = 100): DataFrame =
    cosineTopPairs(tfidfWeights(df, id, text, n, maxDf), id, k)

  /** The (id, shingle, df, w) TF-IDF weight frame feeding
    * [[cosineTopPairs]], exposed separately so callers can persist it —
    * the pair join consumes it three times (both self-join sides + the
    * norms), and an unpersisted frame re-runs the shingle explode + two
    * aggregations per consumer. */
  def tfidfWeights(df: DataFrame, id: String, text: String, n: Int = 3,
                   maxDf: Long = 20): DataFrame = {
    val nd = df.agg(count(lit(1)).cast("double").as("nd"))
    val tf = shinglesAll(df, id, text, n)
      .groupBy(col(id), col("shingle")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    tf.join(dfq, "shingle").crossJoin(broadcast(nd))
      .select(col(id), col("shingle"), col("df"),
        qround(col("tf") * log(col("nd") / col("df")), 6)
          .cast(DecimalType(18, 6)).as("w"))
  }

  /** Inverted-index top-k cosine over a [[tfidfWeights]] frame. */
  def cosineTopPairs(w: DataFrame, id: String, k: Int): DataFrame = {
    val norms = w.groupBy(col(id))
      .agg(sqrt(sum(col("w") * col("w")).cast("double")).as("norm"))
    // spreadByKey: same tiny-input/quadratic-output shape as
    // setJaccardPairs — the inverted-index dot-product join otherwise
    // runs on the 1-2 partitions AQE coalesces the weight frame to.
    val wj = spreadByKey(
      w.filter(col("df") >= 2).select(col(id), col("shingle"), col("w")),
      "shingle")
    val dots = wj.as("a")
      .join(wj.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col(s"a.$id") < col(s"b.$id"))
      .groupBy(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .agg(sum(col("a.w") * col("b.w")).as("dot"))
    dots
      .join(norms.select(col(id).as("id_a"), col("norm").as("norm_a")), "id_a")
      .join(norms.select(col(id).as("id_b"), col("norm").as("norm_b")), "id_b")
      .withColumn("cosine",
        qround(col("dot").cast("double") / (col("norm_a") * col("norm_b")), 6))
      .select("id_a", "id_b", "cosine")
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Fixed-size token chunking with overlap — the sequence-prep step
    * between cleaning and tokenization in a training pipeline: each
    * document becomes ⌈(len − chunkSize)/stride⌉ + 1 (min 1) chunks on
    * the deterministic grid start = chunkId·stride, so consecutive
    * chunks share (chunkSize − stride) tokens of context and a document
    * shorter than one chunk still yields its single short chunk.
    *
    * Pure per-row map + explode: no shuffle anywhere, and the whole
    * sequence/slice/concat pipeline stays inside whole-stage codegen —
    * at corpus scale this runs at scan speed with output ≈ len/stride
    * rows per doc. */
  def chunkDocuments(df: DataFrame, id: String, text: String,
                     chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkSize > 0, "chunkSize and stride must be positive")
    df.select(col(id), split(col(text), " ").as("toks"))
      .withColumn("n_chunks", greatest(lit(1L),
        (ceil((size(col("toks")) - lit(chunkSize)).cast("double") / stride)
          + lit(1)).cast("long")))
      .select(col(id), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col(id), col("chunk_id"),
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkSize)).as("ctoks"))
      .select(col(id), col("chunk_id"),
        size(col("ctoks")).cast("long").as("chunk_len"),
        concat_ws(" ", col("ctoks")).as("chunk"))
  }

  /** Sequence packing — the concat-then-chop step that turns a cleaned
    * corpus into fixed-budget context windows: within each pack group the
    * documents are laid end-to-end in doc-id order into one virtual token
    * stream, and a document's bin span is just its [offset, offset+len)
    * interval divided by the budget (GPT-style pretraining packing, where
    * a document may straddle a window boundary — `first_bin < last_bin`
    * marks the straddlers). One window cumsum computes every offset.
    *
    * The pack group is the scale unit: packing is embarrassingly parallel
    * across groups (here the (source, lang) mixture components — which is
    * also what training mixtures want), and a global single-stream pack
    * would serialize the cumsum into one partition, the exact bottleneck
    * grouping avoids. A group too large for one task gets sharded by a
    * hash suffix in the group key; determinism survives because the
    * order-by stays (doc-id) within shards. */
  def packSequences(df: DataFrame, id: String, text: String,
                    groupCols: Seq[String], budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(id))
    df.select(col(id) +: groupCols.map(col) :+
        size(split(col(text), " ")).cast("long").as("n_tokens"): _*)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("off_tokens", col("cum") - col("n_tokens"))
      .withColumn("first_bin", floor(col("off_tokens") / budget))
      .withColumn("last_bin", floor((col("cum") - 1) / budget))
      .drop("cum")
  }

  /** Benchmark decontamination report — the train/eval hygiene pass every
    * training-data pipeline needs: a training document is contaminated if
    * it shares ANY n-gram with a benchmark (eval-set) document, the
    * standard n-gram-overlap definition (n≈8 word-grams). Returns one row
    * per contaminated training doc with its count of DISTINCT shared
    * n-grams; anti-joining the corpus against these ids yields the clean
    * training set (same survivor shape as the near-dup dedup, q74).
    *
    * Scale shape: eval benchmarks are tiny next to a 100 TB corpus —
    * MBs, bounded by what humans curate — so the benchmark n-gram set is
    * broadcast and the corpus side never shuffles; flagging is one
    * map-side semi-join-shaped pass plus a per-doc count. If the
    * benchmark side ever outgrew broadcast, drop the hint and the same
    * plan degrades to a shuffle on the shingle (and the string key can
    * shrink to its 63-bit hash); nothing else changes. */
  def contaminationReport(train: DataFrame, bench: DataFrame, id: String,
                          text: String, n: Int = 8): DataFrame = {
    val t = shingles(train, id, text, n) // distinct (id, shingle)
    val b = shingles(bench, id, text, n).select("shingle").distinct()
    // t is distinct per (id, shingle) and b per shingle, so the join has
    // one row per (doc, shared n-gram): count(*) IS the distinct count.
    t.join(broadcast(b), "shingle")
      .groupBy(col(id)).agg(count(lit(1)).as("n_shared"))
  }

  /** Span-level exact-substring dedup coverage (the measurement behind
    * Lee et al. 2022's "Deduplicating Training Data Makes Language
    * Models Better", public): an n-token span that occurs MORE THAN
    * ONCE anywhere in the corpus (across documents or within one) is a
    * duplicated span; per document, report how many token positions
    * fall under at least one such span — the quantity a span-masking
    * dedup pass would remove. The exact-substring complement of the
    * whole-document (q23) and near-dup (q27/q73) families: boilerplate
    * headers and license blocks repeat verbatim inside otherwise-unique
    * documents, and only a span-level pass sees them.
    *
    * Scale: positional shingles explode to one row per (doc, pos) —
    * same volume as every shingle pipeline here; the duplicate test is
    * one count on the shingle shuffle key; position-coverage unions
    * overlapping spans with an in-row `sequence` explode + distinct,
    * never a driver loop. All-integer output.
    */
  def duplicateSpanCoverage(docs: DataFrame, id: String, text: String,
                            n: Int): DataFrame = {
    val toks = docs.select(col(id),
      expr(s"filter(split($text, ' '), t -> length(t) > 0)").as("toks"))
    val base = toks.select(col(id), size(col("toks")).as("n_tokens"),
      col("toks"))
    val sh = base.filter(col("n_tokens") >= n)
      .select(col(id), explode(expr(
        s"transform(sequence(0, n_tokens - $n), i -> " +
          s"struct(i AS pos, concat_ws(' ', slice(toks, i + 1, $n)) AS sh))"))
        .as("s"))
      .select(col(id), col("s.pos").as("pos"), col("s.sh").as("sh"))
    val dup = sh.groupBy("sh").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select("sh")
    val covered = sh.join(dup, "sh")
      .select(col(id), explode(sequence(col("pos"),
        col("pos") + lit(n - 1))).as("p"))
      .distinct()
      .groupBy(col(id)).agg(count(lit(1)).as("covered_tokens"))
    base.select(col(id), col("n_tokens"))
      .join(covered, Seq(id), "left")
      .select(col(id), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        qround((col("n_tokens") - coalesce(col("covered_tokens"), lit(0L)))
          .cast("double") / col("n_tokens").cast("double"), 6)
          .as("keep_ratio"))
  }

  /** Two-phase benchmark decontamination — [[contaminationReport]]'s
    * exact semi-join preceded by a Bloom-filter band-pass on the corpus
    * side, the shape that matters when the corpus is 100 TB and the
    * benchmark is megabytes: without it every corpus n-gram flows into
    * the (broadcast) join's probe; with it the probe input drops to the
    * maybe-contaminated sliver (true hits + ~fpp of the rest) before any
    * join runs.
    *
    * The benchmark n-gram set is folded into a Bloom filter by the
    * distributed `stat.bloomFilter` aggregate over `xxhash64(shingle)`
    * (partial filters merged executor-side, ~1 MB result), embedded in
    * the plan as a binary literal, and probed with Spark's native
    * codegen'd `BloomFilterMightContain` — no Scala UDF in the hot path.
    * Bloom false positives are removed by the exact join that follows,
    * so the output is bit-identical to [[contaminationReport]] and the
    * two share one oracle (q82/q94). */
  def contaminationReportBloom(train: DataFrame, bench: DataFrame,
                               id: String, text: String, n: Int = 8,
                               expectedItems: Long = 1L << 20,
                               fpp: Double = 0.01): DataFrame = {
    val t = shingles(train, id, text, n)
    val b = shingles(bench, id, text, n).select("shingle").distinct()
    t.filter(bloomMightContainShingle(b, expectedItems, fpp))
      .join(broadcast(b), "shingle")
      .groupBy(col(id)).agg(count(lit(1)).as("n_shared"))
  }

  /** The Bloom band-pass predicate over a `shingle` column: folds
    * `benchShingles` (distinct single-column frame) into a Bloom filter
    * via the distributed aggregate, embeds it as a binary plan literal,
    * and probes with the native codegen'd `might_contain`. Exposed
    * package-private for the ScaleProbe selectivity measurement. */
  private[graft] def bloomMightContainShingle(
      benchShingles: DataFrame, expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): org.apache.spark.sql.Column = {
    val bf = benchShingles.select(xxhash64(col("shingle")).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    val bytes = {
      val baos = new java.io.ByteArrayOutputStream()
      bf.writeTo(baos)
      baos.toByteArray
    }
    import org.apache.spark.sql.GraftShim
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    GraftShim.column(BloomFilterMightContain(
      Literal(bytes),
      GraftShim.expression(xxhash64(col("shingle")))))
  }

  /** Drop items held by more than `cap` entities from a (id, item) set
    * frame — the document-frequency prefix filter that bounds the
    * co-occurrence join's quadratic tail: the join's pair volume is
    * Σ_item df², so a handful of corpus-wide hot items dominate the
    * cost while carrying ~no Jaccard-ranking signal (an item in nearly
    * every set shifts every pair's score near-uniformly — the IDF
    * intuition). Error bound: removing an item changes any pair's
    * Jaccard by at most 1/min(|A|,|B|); items at df ≈ n affect all
    * candidate pairs alike, so top-k ORDER is stable even where values
    * move. Implemented as a semi-join against the ≤-cap item list
    * (AQE broadcasts it when small; a 100 TB vocabulary stays a
    * shuffle semi-join on the item key). Assumes (id, item) rows are
    * distinct — the [[setJaccardPairs]] input contract. */
  /** Hash-repartition a join input by its join key to the session's
    * default parallelism — the tiny-input/quadratic-output join fix
    * (r16): AQE coalesces exchanges by INPUT size, so an inverted-index
    * self-join whose posting lists explode quadratically can end up on
    * one partition. A user-specified repartition is exempt from AQE
    * coalescing, keys the exchange exactly like the join (no extra
    * shuffle), and tracks cluster size instead of a local constant. */
  private[graft] def spreadByKey(df: DataFrame, key: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(key))

  private def capUniverseByDf(sets: DataFrame, item: String,
                              cap: Long): DataFrame = {
    val keep = sets.groupBy(col(item))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap)
      .select(col(item))
    sets.join(keep, Seq(item), "left_semi")
  }

  /** Exact Jaccard over item sets for all pairs sharing ≥1 item:
    * co-occurrence join on the item (shuffle key = item), then
    * |∩| / (|A|+|B|−|∩|). Pairs sharing nothing never materialize —
    * the distributed replacement for driver-side all-pairs set math
    * (reference `correlation_optimised.py:46,84`).
    *
    * `maxDf` (VERDICT r9 #2): items held by more than `maxDf` entities
    * are dropped from the universe BEFORE sizes are computed — the
    * [[capUniverseByDf]] prefix filter that bounds the join's Σ_item df²
    * pair volume. Without it one boilerplate item at df ≈ n (licence
    * header, template line) makes the join quadratic in corpus size.
    * Error bound at the cap site; capped items shift every pair's score
    * near-uniformly (the IDF intuition), so top-k ORDER is stable. Pass
    * `Long.MaxValue` only where the caller proves a bounded-df universe. */
  def setJaccardPairs(sets: DataFrame, id: String, item: String,
                      minJaccard: Double,
                      maxDf: Long = Long.MaxValue): DataFrame = {
    val universe =
      if (maxDf == Long.MaxValue) sets
      else capUniverseByDf(sets, item, maxDf)
    val sizes = universe.groupBy(col(id)).agg(count(lit(1)).as("n"))
    // spreadByKey (r16, guide §2.5/§8): the co-occurrence join's INPUTS
    // are a few MB here, so AQE coalesced the exchange to 1-2 partitions
    // — but its OUTPUT is Σ_item df² pair partials, quadratic in the
    // posting lists, and ran near-single-core. The optimizer sizes
    // partitions by input bytes; we know the output explodes, so the
    // explicit hash repartition (AQE-exempt) keeps the pair scan at the
    // cluster's parallelism at any scale.
    val a = spreadByKey(universe.select(col(id).as("id_a"), col(item)), item)
    val b = spreadByKey(universe.select(col(id).as("id_b"), col(item)), item)
    val shared = a.join(b, item)
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col(id).as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col(id).as("id_b"), col("n").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "shared", "jaccard")
  }

  /** Shingle-set specialization of [[setJaccardPairs]]. Default
    * `maxDf = 100` mirrors q267's weighted-Jaccard cap: natural-text
    * 3-gram dfs sit far below it (the sf0.1 corpus tops out well under
    * 100), so on clean corpora the cap is a no-op — it exists to bound
    * the df² tail when boilerplate shingles appear in every document
    * (measured in ScaleProbe `boiler`). */
  def shingleJaccardPairs(sh: DataFrame, id: String,
                          minJaccard: Double,
                          maxDf: Long = 100L): DataFrame =
    setJaccardPairs(sh, id, "shingle", minJaccard, maxDf)

  /** Dense variant of [[setJaccardPairs]] for SMALL universes: collect each
    * entity's item set into a sorted array, broadcast one side, evaluate
    * all canonical pairs with `array_intersect` — no shuffle at all beyond
    * the initial per-entity aggregate.
    *
    * Strategy selection: the co-occurrence join ([[setJaccardPairs]]) is
    * the general sparse path — cost O(Σ_item |owners|²), shuffle key =
    * item; it degrades when the item universe is tiny (few shuffle keys ⇒
    * skew-limited parallelism, e.g. 100 items × 1000 owners each = 50M
    * join partials through 100 keys). This dense path costs O(|entities|² ×
    * avg-set-size) with perfect parallelism and wins when |entities| is
    * bounded (≲10⁵) and sets are short; at 100 TB with huge universes and
    * entity counts, use the sparse path (or LSH). Same output contract.
    */
  def setJaccardPairsDense(sets: DataFrame, id: String, item: String,
                           minJaccard: Double): DataFrame = {
    // Materialized ONCE (r16, guide §2.4/§1): without the checkpoint the
    // stream side and the broadcast side each re-ran the whole set-build
    // lineage — for q71 that is the percent_rank window + df-cap
    // semi-join + collect_set chain, measured as the plan's dominant
    // duplicated subtree (plans/r16/q71_*_before.txt shows the identical
    // 50-operator chain under BOTH join sides; exchange reuse cannot
    // dedupe a ShuffleExchange against a BroadcastExchange).
    val packed = sets.groupBy(col(id))
      .agg(sort_array(collect_set(col(item))).as("items"))
      .select(col(id), col("items"), size(col("items")).as("n"))
      .localCheckpoint()
    // Spread the quadratic pair scan (r16, guide §2.5 idle-capacity):
    // the packed frame is a few hundred KB, so AQE coalesces its
    // exchange to ONE partition and the n²/2 merge-walk ran on a single
    // core (measured: q71's 1500×1500 scan was the whole 6.7 s). An
    // explicit round-robin repartition to the session's core count is
    // exempt from AQE coalescing and parallelizes the scan on any
    // cluster size; the shuffled frame is tiny by the dense-path
    // precondition (≤1e5 entities).
    val a = packed
      .repartition(sets.sparkSession.sparkContext.defaultParallelism)
      .select(col(id).as("id_a"), col("items").as("items_a"),
        col("n").as("n_a"))
    val b = packed.select(col(id).as("id_b"), col("items").as("items_b"),
      col("n").as("n_b"))
    // Codegen'd merge-walk (int/long/string elements); generic
    // array_intersect only for exotic element types — same semantics,
    // ~10–20× slower (per-pair hash set + boxing + materialized array).
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val itemType = sets.schema(sets.schema.fieldIndex(item)).dataType
    val intersectCount = itemType match {
      case IntegerType | LongType | StringType =>
        graft.functions.GraftFunctions.sorted_intersect_count(
          col("items_a"), col("items_b"))
      case _ => size(array_intersect(col("items_a"), col("items_b")))
    }
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .withColumn("shared", intersectCount)
      .filter(col("shared") > 0)
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "shared", "jaccard")
  }

  /** Stats-driven strategy selection between [[setJaccardPairs]] (sparse
    * co-occurrence join) and [[setJaccardPairsDense]] (broadcast
    * all-pairs). Same output contract as both.
    *
    * Cost model (one cheap aggregate job over `sets` decides):
    *  - dense  ≈ n² · s      comparisons, n = distinct entities,
    *    s = avg set size — plus an n·s-token broadcast;
    *  - sparse ≈ (n·s)² / m  join partials, m = item-universe size
    *    (each item co-locates its ~n·s/m owners; partials = Σ owners²).
    *
    * So sparse wins roughly when m > s (universe much wider than one
    * set — the MovieLens/document shape), dense when the universe is
    * tiny (the 100-item events shape, where the sparse join has only m
    * shuffle keys and degenerates). Dense is additionally hard-capped:
    * never broadcast above 10⁵ entities or ~5×10⁶ set elements — beyond
    * that an exact all-pairs answer is quadratic no matter the strategy
    * and the caller should move to LSH ([[lshCandidatePairs]]).
    *
    * EAGER: deciding needs the statistics, so building this DataFrame
    * runs one small aggregate job over `sets` immediately (an exception
    * to the engine's otherwise lazy plan construction). The stats job is
    * memoized per (session, plan), so registry enumeration or repeated
    * calls on the same input scan once, not per call. When NEITHER
    * strategy's preconditions hold — too many entities to broadcast AND
    * a universe so narrow the co-occurrence join degenerates to m
    * skew-limited shuffle keys — this logs a warning naming
    * [[lshCandidatePairs]] and takes the sparse path anyway: exact
    * all-pairs at that shape is quadratic no matter the strategy.
    *
    * `maxDfPermille` < 1000 additionally applies the hot-item
    * document-frequency cap ([[capUniverseByDf]]) BEFORE either
    * strategy: items held by more than `max(2, n·permille/1000)`
    * entities leave the universe, bounding the sparse join's Σ df²
    * tail (and shrinking the dense broadcast) at a documented
    * ≤ 1/min-set-size per-pair error. The cap derives from the
    * PRE-cap entity count in exact integer arithmetic, so an oracle
    * can reproduce it bit-for-bit (`GREATEST(2, n·permille // 1000)`).
    * 1000 = uncapped, the exact-semantics default. */
  def setJaccardPairsAuto(sets: DataFrame, id: String, item: String,
                          minJaccard: Double,
                          maxDfPermille: Int = 1000): DataFrame = {
    val (n, m, rows) = graft.util.SessionMemo(sets.sparkSession,
      s"jaccard-stats:${sets.queryExecution.analyzed.semanticHash()}:$id:$item") {
      val st = sets.agg(
        countDistinct(col(id)).as("n"),
        countDistinct(col(item)).as("m"),
        count(lit(1)).as("rows")).head()
      (st.getLong(0), st.getLong(1), st.getLong(2))
    }
    val capped =
      if (maxDfPermille >= 1000) sets
      else capUniverseByDf(sets, item,
        math.max(2L, n * maxDfPermille / 1000L))
    val s = if (n > 0) rows.toDouble / n else 0.0
    // Strategy stats stay the PRE-cap ones: capping only shrinks both
    // paths, so a dense choice that was safe uncapped stays safe.
    val denseOk = n <= 100000L && rows <= 5000000L
    val densePreferred = m <= 4 * s || n <= 2000L
    if (denseOk && densePreferred)
      setJaccardPairsDense(capped, id, item, minJaccard)
    else {
      if (!denseOk && densePreferred)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"setJaccardPairsAuto: n=$n entities exceed the dense-broadcast cap " +
            s"but the item universe (m=$m, avg set size ~${s.round}) is too " +
            "narrow for the sparse co-occurrence join to parallelize well; " +
            "falling back to sparse anyway. At this shape exact all-pairs is " +
            "quadratic — switch to lshCandidatePairs.")
      setJaccardPairs(capped, id, item, minJaccard)
    }
  }

  /** Cavnar–Trenkle-style profile language classifier, corpus-trained:
    * learn the top-`profileSize` tokens per label from `labeled`, then
    * classify each document by maximal profile overlap (ties → label
    * ascending). Both phases are joins + window ranks — no driver state. */
  def languageClassify(df: DataFrame, id: String, text: String,
                       label: String, profileSize: Int = 20): DataFrame = {
    val tok = tokens(df, id, text)
      .join(df.select(col(id), col(label)), Seq(id))
    val profiles = tok.groupBy(col(label), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("r", row_number().over(
        Window.partitionBy(label).orderBy(col("cnt").desc, col("token"))))
      .filter(col("r") <= profileSize)
      .select(col(label).as("cand_lang"), col("token"))
    val docTokens = tokens(df, id, text, distinct = true)
    val scores = docTokens.join(profiles, "token")
      .groupBy(col(id), col("cand_lang"))
      .agg(count(lit(1)).as("n_overlap"))
    scores.withColumn("r", row_number().over(
        Window.partitionBy(id).orderBy(col("n_overlap").desc, col("cand_lang"))))
      .filter(col("r") === 1)
      .select(col(id), col("cand_lang").as("predicted"), col("n_overlap"))
  }
}
