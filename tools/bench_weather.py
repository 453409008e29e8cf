#!/usr/bin/env python3
"""Post-hoc contention alignment over a bench_full.json (VERDICT r10 #6:
the per-query start offsets exist so a damaged reading can be aligned
with host-load evidence AFTER the fact).

Usage: python3 tools/bench_weather.py [bench_full.json] [prior.json]

Prints, in first-pass execution order: each query's start offset, its
RAW first-pass reading (from the artifact's first_pass_s map — ADVICE
r11: the recorded min(first, rerun) hides the contaminated reading, so
the contention-facing column must come from the raw map; older
artifacts without it fall back to max(recorded, rerun)), taint flags
(S = sentinel, D = drift, U = unresolved drift — rerun still over
threshold, a sustained storm), the rerun value when one exists, and the
reading-vs-prior ratio when a prior file is given as the SECOND arg
(pass bench_prior.json or a previous round's BENCH_rN.json; without it
the ratio column is NaN and the >3x-prior adjudication lines are
skipped — always pass the prior in the close-run workflow). Contiguous
runs of
elevated ratios = a contention window; an isolated spike inside calm
neighbours = the intra-query burst the sentinel can't see (the r10 q208
signature) — exactly what the drift taint now reruns.

Builder-side dev aid only — not part of the shipped library. Run it
after every full Bench as part of the close-run discipline (VERDICT r11
#2): its verdict line plus the artifact's own unresolved_drift list is
the weather adjudication, no judge solo re-runs needed.
"""
import json
import sys


def unwrap(d):
    """Accept BOTH artifact shapes (VERDICT r12 "what's wrong" #1): the
    builder's bench_full.json carries the query maps at the top level;
    the driver's BENCH_r{N}.json wraps them under `parsed` and its
    queries map holds only the slowest-30. Returns (payload, note)."""
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    note = None
    nq = d.get("n_queries")
    if nq is not None and len(d.get("queries", {})) < nq:
        note = (f"PARTIAL query map: {len(d['queries'])} of {nq} "
                f"({d.get('queries_note', 'driver slowest-N artifact')}) "
                f"— offsets/taint forensics cover only these; run on "
                f"bench_full.json for the full table")
    return d, note


def main(argv=None):
    argv = sys.argv if argv is None else argv
    path = argv[1] if len(argv) > 1 else "bench_full.json"
    d, coverage_note = unwrap(json.load(open(path)))
    if coverage_note:
        print(coverage_note)
    prior = {}
    if len(argv) > 2:
        prior = json.load(open(argv[2]))
        prior, _ = unwrap(prior)
        prior = prior.get("queries", {})
    else:
        print("NOTE: no prior file given — 'vs prior' is NaN and the "
              ">3x-prior adjudication is skipped; pass bench_prior.json")
    # Keep only offsets whose query has a recorded value: a partial
    # (slowest-30) map would otherwise format None readings below.
    offs = {k: v for k, v in d.get("start_offset_s", {}).items()
            if k in d.get("queries", {}) or k in d.get("first_pass_s", {})}
    raw = d.get("first_pass_s", {})
    reruns = d.get("reruns", {})
    drift = set(d.get("drift_tainted", []))
    # sentinel_tainted ships separately since r12 (ADVICE r11: `tainted`
    # is the union, so deriving S from it mislabeled drift-only queries).
    sent = set(d.get("sentinel_tainted",
                     [q for q in d.get("tainted", []) if q not in drift]))
    unres = set(d.get("unresolved_drift", []))
    # r14 severity tier: ambient = ratio-gate-only sentinel exceedances
    # (logged, never rerun); hot (S) = ratio gate AND the measured
    # absolute-excess floor (sentinel_hot_threshold in the artifact).
    ambient = set(d.get("ambient_tainted", []))
    if "sentinel_hot_threshold" in d:
        print(f"sentinel tiers: hot > {d['sentinel_hot_threshold']} s "
              f"(median {d.get('sentinel_median', '?')} s) → "
              f"{len(sent)} hot-tainted (rerun), "
              f"{len(ambient)} ambient (logged only)")
    # No offsets in the artifact (driver `parsed` shape) → name order
    # with t0 = NaN, NOT the query's value masquerading as an offset.
    rows = sorted(offs.items(), key=lambda kv: kv[1]) if offs \
        else [(k, float("nan")) for k in sorted(d["queries"])]
    print(f"{'t0(s)':>8} {'first':>8} {'rerun':>8} {'vs prior':>9}  flags  query")
    hot = []
    for name, off in rows:
        rec = d["queries"].get(name)
        rr = reruns.get(name)
        # Contention-facing reading: the raw first-pass value when the
        # artifact carries it; else the worst observed = max(recorded,
        # rerun) (pre-r12 artifacts recorded only min(first, rerun)).
        first = raw.get(name)
        if first is None:
            first = rec if rr is None else max(rec, rr)
        ratio = (first / prior[name]) if prior.get(name) else None
        flags = ("S" if name in sent else
                 ("A" if name in ambient else "-")) + \
                ("D" if name in drift else "-") + \
                ("U" if name in unres else "-")
        if ratio and ratio > 3 and first > 2:
            hot.append(name)
        print(f"{off:8.1f} {first:8.2f} "
              f"{rr if rr is not None else float('nan'):8.2f} "
              f"{ratio if ratio else float('nan'):9.2f}  {flags:>5}  {name}")
    if unres:
        print(f"\nartifact self-labels {len(unres)} UNRESOLVED drift "
              f"(sustained storm, values are weather): {sorted(unres)}")
        if "value_clean" in d:
            print(f"value={d['value']}  value_clean={d['value_clean']} "
                  f"(unresolved readings substituted by priors)")
    if prior:
        print(f"\n{len(hot)} readings >3x prior and >2s: {hot}")
        untainted = [h for h in hot if h not in sent and h not in drift]
        if untainted:
            print(f"WARNING untainted hot readings (sentinel+drift both "
                  f"missed): {untainted}")


if __name__ == "__main__":
    main()
