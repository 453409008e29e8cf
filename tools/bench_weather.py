#!/usr/bin/env python3
"""Post-hoc contention alignment over a bench_full.json (VERDICT r10 #6:
the per-query start offsets exist so a damaged reading can be aligned
with host-load evidence AFTER the fact).

Usage: python3 tools/bench_weather.py [bench_full.json] [prior.json]
       python3 tools/bench_weather.py --lambda [bench_ledger.jsonl]

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


def lambda_refit(ledger_path="bench_ledger.jsonl", anchor=0.067):
    """Refit the sentinel-to-wall-time weather model (VERDICT r15 #3)
    from the accumulated per-run ledger instead of the three hand-picked
    windows it was born on.

    Model: total(s) = T0 * (1 + lambda * (s/anchor - 1)) — linear in the
    sentinel median s, so an ordinary least-squares line total = a + b*s
    recovers T0 = a + b*anchor (the clean-equivalent total AT the anchor
    weather) and lambda = b*anchor / T0. The anchor is the r13 close
    sentinel (0.067 s), keeping the fitted lambda comparable with the
    hand-derived ARCHITECTURE values (0.41 from the r13/r14 windows).
    Residuals are printed per point: weather explains what the line
    explains; a point far off the line at equal weather is a CODE speed
    change, which is exactly what the residual column is for."""
    pts = []
    for line in open(ledger_path):
        line = line.strip()
        if line:
            pts.append(json.loads(line))
    # Fit on value_clean (== total on storm-free runs; on a run with
    # unresolved storms it is the run's own weather-free estimate, so it
    # is the cleaner fit point). Runs with FAILED queries are excluded:
    # a time-to-exception total measures nothing.
    skipped = [p for p in pts if p.get("n_failed")]
    if skipped:
        print(f"NOTE: excluding {len(skipped)} ledger point(s) with "
              f"failed queries from the fit")
    pts = [p for p in pts if p.get("sf_run") == "sf0.1"
           and p.get("sentinel_median")
           and (p.get("value_clean") or p.get("total"))
           and not p.get("n_failed")]
    if len(pts) < 2:
        print(f"LAMBDA: only {len(pts)} usable sf0.1 points in "
              f"{ledger_path} — need >= 2 to fit")
        return None
    nq = sorted({p.get("n_queries") for p in pts})
    if len(nq) > 1:
        print(f"NOTE: ledger mixes query-surface sizes {nq} — totals are "
              f"only comparable within one surface; fitting anyway, read "
              f"residuals accordingly")
    xs = [p["sentinel_median"] for p in pts]
    ys = [p.get("value_clean") or p["total"] for p in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    if sxx == 0:
        print("LAMBDA: all points share one sentinel — cannot fit a slope")
        return None
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
    a = my - b * mx
    t0 = a + b * anchor
    lam = b * anchor / t0 if t0 else float("nan")
    print(f"LAMBDA fit over {n} ledger points (anchor sentinel "
          f"{anchor:.3f} s): lambda = {lam:.3f}, clean-equivalent total "
          f"at anchor = {t0:.1f} s  [total = {a:.1f} + {b:.1f} * sentinel]")
    print(f"{'sentinel':>9} {'total':>8} {'predicted':>10} {'resid':>8} "
          f"{'resid%':>7}  source")
    for p in sorted(pts, key=lambda p: p.get("run_epoch_ms", 0)):
        y = p.get("value_clean") or p["total"]
        pred = a + b * p["sentinel_median"]
        res = y - pred
        src = p.get("seeded") or p.get("head", "?")
        print(f"{p['sentinel_median']:9.3f} {y:8.1f} {pred:10.1f} "
              f"{res:+8.1f} {100 * res / pred:+6.1f}%  {src}")
    rms = (sum(((p.get("value_clean") or p["total"])
                - (a + b * p["sentinel_median"])) ** 2
               for p in pts) / n) ** 0.5
    print(f"RMS residual {rms:.1f} s over {n} points")
    return lam


def main(argv=None):
    argv = sys.argv if argv is None else argv
    if len(argv) > 1 and argv[1] == "--lambda":
        lambda_refit(*argv[2:3])
        return
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
