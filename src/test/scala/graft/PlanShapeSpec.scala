package graft

import graft.queries.Registry

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guard: the scale-critical plan shapes
  * (SURVEY §4.3 / ARCHITECTURE.md) must not silently degrade — a global
  * sort where TakeOrderedAndProject belongs, a shuffled join where a
  * broadcast belongs, or a scan that stops pruning would pass correctness
  * and still be wrong at 100 TB. Pinned to Spark 4.1.2 plan strings.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def plan(q: String): String =
    Registry.all(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02 top-k pool plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q02_top_parts_biased")
    assert(p.contains("TakeOrderedAndProject"))
    // scan pruned to the two referenced columns
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_extendedprice:double>"))
  }

  test("q05 anti-join broadcasts and per-key top-k uses WindowGroupLimit") {
    val p = plan("q05_user_topk_unseen")
    assert(p.contains("LeftAnti"))
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("BroadcastNestedLoopJoin")) // tiny pool cross join
  }

  test("q07 star join broadcasts every dimension and pushes filters") {
    val p = plan("q07_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4)
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("PushedFilters: [IsNotNull"))
  }

  test("q30 KNN pushes the id-range filters into the parquet scan") {
    val p = plan("q30_knn_bruteforce")
    assert(p.contains("GreaterThanOrEqual(vec_id,10)"))
    assert(p.contains("LessThan(vec_id,10)"))
    assert(p.contains("WindowGroupLimit"))
  }

  test("q01 aggregates partially before the exchange") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"))
    assert(p.contains("partial_count"))
  }

  test("q54 sweep runs as one bias-keyed pipeline (group-limit windows, broadcast pool)") {
    val p = plan("q54_bias_sweep")
    // per-(bias, user) top-k and per-bias pool rank both group-limit
    assert(p.contains("WindowGroupLimit"))
    // the bias list and the <=|biases|*poolK pool stay broadcast
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("q37 IVF broadcasts the centroid table into the probe join") {
    val p = plan("q37_ann_ivf")
    assert(p.contains("BroadcastNestedLoopJoin")) // 16-row centroid cross join
    assert(p.contains("WindowGroupLimit"))        // nprobe + top-5 ranks
  }

  test("q45 token twins pick the dense broadcast strategy and a top-k sink") {
    val p = plan("q45_twin_exact_tokens")
    // stats-driven selection must land on the packed-array broadcast
    // all-pairs at this shape (small entity count, tiny universe) ...
    assert(p.contains("BroadcastNestedLoopJoin"))
    // ... with the final top-100 as TakeOrderedAndProject, not a global sort
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q71 quantile twins keep the strategy selection and top-k sink") {
    val p = plan("q71_twin_exact_quantile")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q74 survivors anti-join broadcasts the bounded victim list") {
    val p = plan("q74_neardup_survivors")
    assert(p.contains("LeftAnti"))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q75 stratified cap group-limits below the shuffle and prunes the scan") {
    val p = plan("q75_stratified_cap")
    assert(p.contains("WindowGroupLimit"))
    // projection pruned — the text column never leaves the scan
    assert(!p.contains("text"))
  }

  test("q76 as-of join plans with NO join operator — one keyed window pass") {
    val p = plan("q76_asof_enrich")
    // the whole point of the union+window encoding: no per-key range
    // scan, no nested loop — the temporal match is a window aggregate
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"))
    assert(p.contains("Window ["))
    assert(p.contains("last(o_orderkey"))
  }

  test("q78 exact percentiles aggregate partially below the shuffle") {
    val p = plan("q78_group_percentiles")
    // percentile's ObjectHashAggregate must run map-side (one sorted
    // buffer per (partition, group) crosses the wire, not raw rows)
    assert(p.contains("partial_percentile"))
    assert(p.contains("ReadSchema: struct<event_type:string,value:double>"))
  }

  test("q79 cube consumers all read the one checkpointed level frame") {
    // the 4-set lattice still rides ONE Expand + aggregate over a single
    // 3-column scan, but that pass now materializes at a localCheckpoint
    // (r13 empty-input global-row rule) — the final plan must show both
    // union branches reading the checkpoint, never a fact re-scan
    val p = plan("q79_cube_totals")
    assert(!p.contains("FileScan parquet"), s"unexpected fact re-scan:\n$p")
    assert(p.contains("Union"))
    // ADVICE r13: the lattice's one Expand executed when the checkpoint
    // materialized, so the final plan shows NONE — a regression to
    // per-grouping-set re-expansion over the checkpointed level frame
    // would surface as Expand replicas here, and must not pass
    assert("Expand".r.findAllIn(p).size <= 1,
      s"per-grouping-set re-expansion over the checkpoint:\n$p")
  }

  test("q83 sliding windows plan as ONE Expand (w/h replicas) + aggregate") {
    val p = plan("q83_sliding_windows")
    assert("Expand".r.findAllIn(p).size == 1)
    assert("FileScan".r.findAllIn(p).size == 1)
    assert(p.contains("partial_count"))
  }

  test("q80 tfidf pairs reuse the persisted weight frame and sink to top-k") {
    val p = plan("q80_tfidf_cosine_pairs")
    // the memoized weights: all three consumers (norms + both join
    // sides) must read the cache, not re-run the shingle explode
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3)
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q84 chunking is shuffle-free up to the output sort") {
    val p = plan("q84_token_chunks")
    // pure map + explode: the ONLY exchange is the final ORDER BY's
    // range partitioning — a chunker that shuffles per-doc data is wrong
    assert("Exchange".r.findAllIn(p).size == 1)
    assert(p.contains("rangepartitioning"))
  }

  test("q82 decontamination broadcasts the benchmark n-gram set") {
    val p = plan("q82_decontaminate")
    // the corpus side must NOT shuffle for the flagging join — the
    // benchmark set rides a broadcast, the whole point at corpus scale
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q57 lang predicate prunes partitions at listing time") {
    val p = plan("q57_partitioned_prune")
    // the IN-list must land in PartitionFilters (driver-side directory
    // pruning — zero I/O for the other languages), NOT in PushedFilters
    // or a row-level Filter over a full scan
    val pf = "(?s).*PartitionFilters: \\[([^\\]]*)\\].*".r
    p match {
      case pf(filters) => assert(filters.contains("lang"),
        s"lang predicate missing from PartitionFilters:\n$p")
      case _ => fail(s"no PartitionFilters in q57 scan:\n$p")
    }
  }

  test("q77 range join plans as a HASH equi-join, never a nested loop") {
    val p = plan("q77_purchase_window")
    // the band predicate must ride a (key, bucket) hash join as its
    // residual condition — a BNLJ/cartesian here is the scale-killer
    // this operator exists to avoid
    assert(p.contains("HashJoin"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("q196 interval join plans as a HASH equi-join on the bucket, never a nested loop") {
    val p = plan("q196_interval_join")
    // per-row interval bounds must ride the bucket hash join as a
    // residual range check — BETWEEN alone would plan the BNLJ this
    // operator exists to avoid
    assert(p.contains("HashJoin"))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"))
  }

  test("q199 stratified weighted sample group-limits below the shuffle") {
    val p = plan("q199_weighted_stratified")
    assert(p.contains("WindowGroupLimit"))
    // projection pruned — the text column never leaves the scan
    assert(!p.contains("text"))
  }

  test("q46 cohort retention reads the event table exactly once") {
    val p = plan("q46_cohort_retention")
    // the window-min form's whole point: no aggregate-and-join-back
    // double scan of the fact table
    assert("FileScan parquet".r.findAllIn(p).size == 1, s"expected 1 scan:\n$p")
    assert(p.contains("partial_count(distinct")) // map-side distinct partials
  }

  test("q48 count-min estimate join broadcasts the fixed-size cells") {
    val p = plan("q48_heavy_hitters")
    // cells are depth×width rows regardless of data volume — the big
    // side must never shuffle for the estimate join
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject")) // top-25, no global sort
    // the corpus was scanned once into the checkpointed counts frame;
    // neither sketch consumer re-reads parquet
    assert(!p.contains("FileScan parquet"), s"unexpected corpus re-scan:\n$p")
  }

  test("q100 merge plans ONE full-outer join on the key") {
    val p = plan("q100_merge_upsert")
    assert("FullOuter".r.findAllIn(p).size == 1)
    assert(!p.contains("CartesianProduct"))
  }

  test("q101 profile is one Expand pass over one scan") {
    val p = plan("q101_column_profile")
    // k exact distincts rewrite to a single Expand — not k separate
    // aggregate subtrees, not k scans
    assert("Expand".r.findAllIn(p).size == 1, s"expected 1 Expand:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1, s"expected 1 scan:\n$p")
  }

  test("q103 MV merge aggregates partially on both branches") {
    val p = plan("q103_incremental_mv")
    // partials on base and delta, algebraic merge on top — and the
    // per-branch aggregates themselves map-side combine
    assert("partial_sum".r.findAllIn(p).size >= 2)
    assert(!p.contains("SortMergeJoin")) // merge is a union+agg, no join
  }

  test("q105 SCD2 runs every window + the run agg on ONE entity exchange") {
    val p = plan("q105_scd2_history")
    // change-flag lag, run-id cumsum, interval agg and the lead close all
    // partition by user_id — one hashpartitioning of the fact table (the
    // only other exchange is the output sort's range partitioning)
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"expected 1 user_id exchange:\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
  }

  test("q106 gap-fill joins agg-to-agg and fills on the grid partitioning") {
    val p = plan("q106_gap_fill")
    // the observed side is (nation, day)-aggregated BEFORE the grid
    // join: no fact-table rows reach the sequence()/explode side
    assert(p.contains("Generate explode(sequence"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q110 random projection is a pure map: no exchange before the sort") {
    val p = plan("q110_random_projection")
    // one scan, posexplode of 16 in-row folds, then only the output
    // range-sort — any hash exchange means the matrix got joined
    assert(!p.contains("hashpartitioning"), s"unexpected shuffle:\n$p")
    assert("FileScan parquet".r.findAllIn(p).size == 1)
  }

  test("q114 corr matrix rides ONE scan and one aggregate") {
    val p = plan("q114_corr_matrix")
    assert("FileScan parquet".r.findAllIn(p).size == 1, s"expected 1 scan:\n$p")
    // all six co-moment partials in one HashAggregate pair, no joins
    assert(!p.contains("Join"))
  }

  test("q116 negative sampling broadcasts the pool and group-limits") {
    val p = plan("q116_negative_samples")
    assert(p.contains("BroadcastNestedLoopJoin")) // users × broadcast items
    assert(p.contains("LeftAnti"))                // seen-set removal
    assert(p.contains("WindowGroupLimit"))        // per-user top-k
  }

  test("q118 skyline consumers all read the one checkpointed aggregate") {
    val p = plan("q118_pareto_customers")
    // bounds agg, group collapse and the survivor semi-join share the
    // localCheckpoint — the fact table is scanned once, at build
    assert(!p.contains("FileScan parquet"), s"unexpected fact re-scan:\n$p")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q107 bigram scoring shuffles the fact side once per phase, no resort") {
    val p = plan("q107_bigram_loglik")
    // the model join keys (w1, w2) — fact bigrams exchange once for the
    // join; the per-doc agg re-keys by doc_id. No nested-loop anywhere.
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q140 bootstrap combines replica sums map-side below the exchange") {
    val p = plan("q140_bootstrap_ci")
    // the 200× explode must reduce to ≤ B partial rows per task BEFORE
    // shuffling — partial aggregation on the replica key is the scale story
    assert(p.contains("Generate explode"))
    assert(p.contains("partial_sum"))
  }

  test("q141 target encoding is join-free — windows over one aggregate") {
    val p = plan("q141_target_encode")
    assert(p.contains("partial_count")) // (cat, fold) agg combines map-side
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
  }

  test("q142 AUC reduces to distinct scores before its one global window") {
    val p = plan("q142_popularity_auc")
    assert(p.contains("partial_count")) // per-score reduction is map-side
    assert(!p.contains("CartesianProduct"))
  }

  test("q147 quantile norm joins rows only against broadcast boundary tables") {
    val p = plan("q147_quantile_norm")
    assert(p.contains("BroadcastHashJoin"))        // per-group boundaries
    assert(p.contains("BroadcastNestedLoopJoin")) // one-row pooled table
    assert(!p.contains("SortMergeJoin")) // rows never shuffle for the join
  }

  test("q148 attribution never degenerates to a nested-loop pair join") {
    val p = plan("q148_decay_attribution")
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q184 mixture quotas broadcast; corpus side ranks in one grouped window") {
    val p = plan("q184_mixture_rebalance")
    // the |sources|-sized quota/total frames join broadcast — the corpus
    // never shuffles for them
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q187 KMV keeps per-group minima via WindowGroupLimit below the shuffle") {
    val p = plan("q187_kmv_distinct")
    // partial top-k: each partition keeps <= k hashes per group before
    // the exchange — the mergeable-sketch property in the physical plan
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("partial_count") || p.contains("partial_min"))
  }

  test("q221 run-length encoding runs on ONE user_id exchange") {
    val p = plan("q221_rle_runs")
    // lag, change-flag running sum, and the run aggregate all key on
    // user_id: exactly one shuffle (plus the output-sort exchange)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges\n$p")
  }

  test("q218 FIFO matching joins lots on a HASH (part, bucket) key, never a nested loop") {
    val p = plan("q218_fifo_matching")
    assert(!p.contains("NestedLoop"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"))
  }

  test("q234 HLL registers build by partial max below the exchange") {
    val p = plan("q234_hll_oracle")
    assert(p.contains("partial_max") || p.contains("partial_count"), p)
  }

  test("q212 table fingerprint is one map-side-combined aggregate per table") {
    val p = plan("q212_table_fingerprint")
    // commutative decimal sum of row hashes: partial sums below each
    // exchange — the mergeable-across-shards property, physically
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("q287 rolling HLL explodes only register rows, with partial maxes") {
    val p = plan("q287_hll_rolling_distinct")
    // register build and window-merge both partial-aggregate below
    // their exchanges (the mergeable-sketch property, physically)
    assert(p.contains("partial_max"), p)
    // exactly two generator stages exist: the register-side anchor
    // explode and the (test-scale) exact-audit explode — the estimate
    // path itself adds no per-row generator beyond them
    assert("Generate explode".r.findAllIn(p).size <= 2, p)
  }

  test("q295 token savings broadcasts the victim frame, never shuffles " +
      "the corpus for it") {
    val p = plan("q295_dedup_token_savings")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q296 lateness profile partitions its window by user (no global " +
      "row sort) and walks the histogram") {
    val p = plan("q296_watermark_lateness")
    // per-key running max: the window exchange hashes on user_id
    assert(p.contains("hashpartitioning(user_id"), p)
  }

  test("q286 PII audit is one scan with map-side partial counts") {
    val p = plan("q286_pii_scrub_audit")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    // one documents scan feeds every pattern counter
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q298 bucketed fact-fact join reads both bucket layouts and never " +
      "exchanges on the join key") {
    // At test scale the orders side is broadcast-eligible; disable
    // broadcast to pin the layout the buckets exist FOR — a sort-merge
    // join whose partitioning comes from the bucket files, not a shuffle.
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan("q298_bucketed_join")
      assert("Bucketed: true".r.findAllIn(p).size == 2, p)
      assert(p.contains("SortMergeJoin"), p)
      // the only exchanges are the final roll-up's (o_orderpriority);
      // neither join key is ever shuffled — the bucket files ARE the
      // shuffle, written once at layout time
      assert(!p.contains("hashpartitioning(l_orderkey"), p)
      assert(!p.contains("hashpartitioning(o_orderkey"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("q309 reorder table ends in TakeOrderedAndProject, never a global sort") {
    val p = plan("q309_safety_stock")
    assert(p.contains("TakeOrderedAndProject"), p)
    // demand roll-up combines map-side before the part exchange
    assert(p.contains("partial_sum"), p)
  }

  test("q310 interarrival windows all partition by event_type (no global " +
      "row sort) and the scan reads three columns") {
    val p = plan("q310_interarrival_ks")
    assert(p.contains("hashpartitioning(event_type"), p)
    assert(p.contains(
      "ReadSchema: struct<event_id:bigint,ts:"), p)
  }

  test("q314 packing sweep reads documents ONCE; the budget sweep is a " +
      "broadcast explode, not three scans") {
    val p = plan("q314_packing_sweep")
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q299 fact scan carries a dynamicpruning partition filter (plus the " +
      "inferred static day predicate)") {
    val p = plan("q299_dpp_prune")
    // runtime pruning: the broadcast dim doubles as the partition filter
    assert(p.contains("dynamicpruning"), p)
    // and Catalyst ALSO pushed the dim's day predicate through the join
    // onto the partition column — plan-time pruning stacked on DPP
    assert(p.contains("PartitionFilters: [(unix_date(d"), p)
  }
}
