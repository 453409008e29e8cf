#!/usr/bin/env python3
"""Differential fuzz oracle (VERDICT r12 item 3): engine-vs-DuckDB over
SEEDED ADVERSARIAL fixtures, one DuckDB process for the whole sweep.

Usage: python3 tools/fuzz_check.py <fixturesRoot> <outRoot> [report.json]

Layout (written by FuzzDiffSpec):
  <fixturesRoot>/<fixture>/events.parquet/        Spark-written fixture
  <outRoot>/<fixture>/oracle_sql.json             that fixture's oracles
  <outRoot>/<fixture>/<query>/*.parquet           engine results

For each fixture: bind its tables, run each oracle SQL, compare against
the engine parquet with the SAME column-name-sorted value compare as the
sf-gate (tools/check.py compare_query — shared code, not a reimpl).
Prints one line per mismatch, a per-fixture roll-up, and a final
"FUZZ <n_fixtures> fixtures, <ok> ok, <fail> fail" line; exit 1 on any
failure. Builder/test-side dev aid only — not part of the shipped
library (the Scala spec shells out to it exactly like the close-run
workflow shells out to check.py).
"""
import glob
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check import bind_tables, compare_query  # noqa: E402


def main(fixtures_root, out_root, report_path=None):
    fixtures = sorted(
        d for d in os.listdir(out_root)
        if os.path.isfile(os.path.join(out_root, d, "oracle_sql.json")))
    if not fixtures:
        print("FUZZ FAIL: no fixtures with oracle_sql.json under "
              f"{out_root}")
        return 1
    ok = fail = 0
    report = {}
    for fx in fixtures:
        fx_dir = os.path.join(fixtures_root, fx)
        fx_out = os.path.join(out_root, fx)
        con = duckdb.connect()
        bind_tables(con, fx_dir)
        oracle = json.load(open(os.path.join(fx_out, "oracle_sql.json")))
        fx_fail = 0
        for name, sql in sorted(oracle.items()):
            files = glob.glob(os.path.join(fx_out, name, "*.parquet"))
            tag, detail, record = compare_query(con, name, files, sql)
            report[f"{fx}/{name}"] = record
            if tag == " OK ":
                ok += 1
            else:
                print(f"[{tag}] {fx}/{name}: {detail}")
                fail += 1
                fx_fail += 1
        if fx_fail:
            print(f"-- {fx}: {fx_fail} FAILED of {len(oracle)}")
        con.close()
    print(f"FUZZ {len(fixtures)} fixtures, {ok} ok, {fail} fail")
    if report_path:
        with open(report_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True, default=str)
    if ok == 0:
        print("FUZZ FAIL: zero comparisons ran")
        return 1
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
