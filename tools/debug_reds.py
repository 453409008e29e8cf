#!/usr/bin/env python3
"""One-shot red-query debugger (VERDICT r10 #6): the prepared loop for
the day a CORRECTNESS red appears.

Usage: python3 tools/debug_reds.py [CORRECTNESS_rN.json] [sfDir]
       python3 tools/debug_reds.py --queries q01_pricing_summary,... [sfDir]

Reads the newest CORRECTNESS_r*.json (or the given one), collects every
query whose rows/schema/hash check is false (or err non-null), then for
each red:
  1. re-runs it through graft.Verify at the given sf (default sf0.01)
     into /tmp/red_debug, with the engine's explain(true) captured to
     /tmp/red_debug/<name>.explain.txt (via graft.ExplainTool);
  2. re-runs its DuckDB oracle and prints a VALUE-LEVEL diff: first
     mismatching rows side by side after the driver's column-name-sorted
     ordering — the exact compare the gate hashes.

Builder-side dev aid only — not part of the shipped library.
"""
import glob
import json
import os
import re
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = "/tmp/red_debug"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def newest_correctness():
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
                   key=lambda f: int(re.search(r"_r(\d+)", f).group(1)))
    if not files:
        sys.exit("no CORRECTNESS_r*.json in repo root")
    return files[-1]


def find_reds(path):
    d = json.load(open(path))
    reds = []
    for name, v in sorted(d.items()):
        # rows-only-by-design queries record err='no_oracle' with all
        # three matches null and spark_rows > 0 — green, not red.
        if v.get("err") == "no_oracle" and (v.get("spark_rows") or 0) > 0:
            continue
        if (v.get("err") is not None or
                v.get("rows_match") is not True or
                v.get("schema_match") is not True or
                v.get("hash_match") is not True):
            reds.append(name)
    return reds


def run(cmd, **kw):
    print("$ " + " ".join(cmd))
    return subprocess.run(cmd, cwd=REPO, **kw)


def main():
    args = sys.argv[1:]
    if args and args[0] == "--queries":
        reds = args[1].split(",")
        args = args[2:]
        src = "(explicit)"
    else:
        src = args[0] if args and args[0].endswith(".json") \
            else newest_correctness()
        if args and args[0].endswith(".json"):
            args = args[1:]
        reds = find_reds(src)
    sf = args[0] if args else "/root/testdata/sf0.01"
    print(f"[reds] source {src}: {len(reds)} red -> {reds}")
    if not reds:
        print("[reds] nothing to debug — gate is green")
        return

    subset = ",".join(reds)
    # 1. Engine re-run + explain capture.
    run(["sbt", "-batch", f"runMain graft.Verify {sf} {OUT} {subset}"])
    os.makedirs(OUT, exist_ok=True)
    # Pass the SAME sf the engine re-ran at: plans are statistics-driven
    # (broadcast-vs-shuffle, AQE), so an sf0.001 plan can differ from the
    # failing sf0.01 run's.
    expl = run(["sbt", "-batch",
                f"Test/runMain graft.ExplainTool {sf} " + " ".join(reds)],
               capture_output=True, text=True)
    for name in reds:
        m = re.search(rf"===== {re.escape(name)} =====\n(.*?)(?====== |\Z)",
                      expl.stdout, re.S)
        with open(f"{OUT}/{name}.explain.txt", "w") as f:
            f.write(m.group(1) if m else expl.stdout)
        print(f"[reds] explain -> {OUT}/{name}.explain.txt")

    # 2. Oracle re-run + value-level first-diff (the driver's compare:
    # column-name-sorted columns, row-sorted values).
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
        except Exception as e:
            print(f"[WARN] table {t} not bound: {e}")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    for name in reds:
        print(f"\n===== {name} =====")
        files = glob.glob(f"{OUT}/{name}/*.parquet")
        if not files:
            print("  engine produced NO output (see Verify stderr above)")
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracle:
            print(f"  rows-only query ({len(got)} engine rows) — no oracle")
            continue
        want = con.execute(oracle[name]).fetchdf()
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"  SCHEMA diff: engine {gcols} vs oracle {wcols}")
            continue
        g = got[gcols].sort_values(gcols).reset_index(drop=True)
        w = want[wcols].sort_values(wcols).reset_index(drop=True)
        print(f"  rows: engine {len(g)} vs oracle {len(w)}")
        n = min(len(g), len(w))
        shown = 0
        for i in range(n):
            if shown >= 5:
                print("  ... further diffs suppressed")
                break
            if not g.iloc[i].equals(w.iloc[i]):
                print(f"  row {i} engine: {g.iloc[i].to_dict()}")
                print(f"  row {i} oracle: {w.iloc[i].to_dict()}")
                shown += 1
        if shown == 0 and len(g) == len(w):
            print("  values identical under pandas equals — "
                  "suspect dtype/precision; compare parquet types")


if __name__ == "__main__":
    main()
