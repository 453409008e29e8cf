#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each oracle SQL in DuckDB against the
sfDir parquet tables, and compares values column-name-sorted, like the
driver does. Purely a builder-side development aid — not part of the
shipped library.
"""
import json
import sys
import glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            fail += 1
            continue
        try:
            # Fetch through Arrow so the DECIMAL ban below can read the
            # declared column TYPE: value-sampling (the r9 head(3) probe)
            # misses all-NULL / zero-row decimal columns, which still
            # hash-red on the driver.
            got_at = con.execute(
                f"SELECT * FROM read_parquet({files!r})").arrow()
            want_at = con.execute(sql).arrow()
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            fail += 1
            continue
        # r9 rule: no DECIMAL may reach the hashed surface on EITHER
        # side — the driver's hasher canonicalizes decimal differently
        # per side, so a value-equal decimal column can still hash-red.
        import pyarrow as _pa
        deccols = sorted({f.name for t in (got_at, want_at)
                          for f in t.schema
                          if _pa.types.is_decimal(f.type)})
        if deccols:
            print(f"[DEC ] {name}: decimal-typed column(s) {deccols}")
            fail += 1
            continue
        got = got_at.to_pandas()
        want = want_at.to_pandas()
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: {list(got.columns)} vs {list(want.columns)}")
            fail += 1
            continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: {len(got)} vs {len(want)}")
            fail += 1
            continue
        def same(x, y):
            # SQL NULL doubles come back as NaN from fetchdf; NaN != NaN
            # would flag identical NULLs as mismatches.
            if x != x and y != y:
                return True
            return x == y

        mismatch = None
        for c in got.columns:
            a, b = got[c].tolist(), want[c].tolist()
            bad = next((i for i in range(len(a)) if not same(a[i], b[i])), None)
            if bad is not None:
                mismatch = (c, bad, a[bad], b[bad])
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"[VAL ] {name}: col={c} row={i} spark={a!r} duck={b!r}")
            fail += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
            ok += 1
    print(f"== {ok} ok, {fail} fail")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
