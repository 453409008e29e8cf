#!/usr/bin/env python3
"""Post-hoc contention alignment over a bench_full.json (VERDICT r10 #6:
the per-query start offsets exist so a damaged reading can be aligned
with host-load evidence AFTER the fact).

Usage: python3 tools/bench_weather.py [bench_full.json] [prior.json]

Prints, in first-pass execution order: each query's start offset, its
first-pass reading, taint flags (sentinel/drift), the rerun value when
one exists, and the reading-vs-prior ratio when a prior map is given
(default: compares the file against itself, ratio 1.0 — pass a previous
round's bench_full.json or BENCH_rN.json to see cross-round movement).
Contiguous runs of elevated ratios = a contention window; an isolated
spike inside calm neighbours = the intra-query burst the sentinel can't
see (the r10 q208 signature) — exactly what the drift taint now reruns.

Builder-side dev aid only — not part of the shipped library.
"""
import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
    d = json.load(open(path))
    prior = {}
    if len(sys.argv) > 2:
        prior = json.load(open(sys.argv[2])).get("queries", {})
    offs = d.get("start_offset_s", {})
    reruns = d.get("reruns", {})
    sent = set(d.get("tainted", []))
    drift = set(d.get("drift_tainted", []))
    rows = sorted(offs.items(), key=lambda kv: kv[1]) if offs \
        else sorted(d["queries"].items(), key=lambda kv: kv[0])
    print(f"{'t0(s)':>8} {'first':>8} {'rerun':>8} {'vs prior':>9}  flags  query")
    hot = []
    for name, off in rows:
        rec = d["queries"].get(name)
        rr = reruns.get(name)
        # recorded = min(first, rerun) → the WORST observed reading is
        # max(recorded, rerun); that is the contention-facing number.
        first = rec if rr is None else max(rec, rr)
        ratio = (first / prior[name]) if prior.get(name) else None
        flags = ("S" if name in sent else "-") + ("D" if name in drift else "-")
        if ratio and ratio > 3 and first > 2:
            hot.append(name)
        print(f"{off:8.1f} {first:8.2f} "
              f"{rr if rr is not None else float('nan'):8.2f} "
              f"{ratio if ratio else float('nan'):9.2f}  {flags:>5}  {name}")
    if prior:
        print(f"\n{len(hot)} readings >3x prior and >2s: {hot}")
        untainted = [h for h in hot if h not in sent and h not in drift]
        if untainted:
            print(f"WARNING untainted hot readings (sentinel+drift both "
                  f"missed): {untainted}")


if __name__ == "__main__":
    main()
