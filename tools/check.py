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
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def has_decimal(t):
    """Recursive decimal detector: the r9 ban must also catch decimals
    NESTED inside list/struct/map columns — pa.types.is_decimal on the
    outer type alone lets list<decimal> slip through to the driver's
    per-side canonicalization hash-red."""
    if pa.types.is_decimal(t):
        return True
    if (pa.types.is_list(t) or pa.types.is_large_list(t)
            or pa.types.is_fixed_size_list(t)):
        return has_decimal(t.value_type)
    if pa.types.is_struct(t):
        return any(has_decimal(f.type) for f in t)
    if pa.types.is_map(t):
        return has_decimal(t.key_type) or has_decimal(t.item_type)
    return False


def same(x, y):
    # SQL NULL doubles come back as NaN; NaN != NaN would flag identical
    # NULLs as mismatches. Array/list cells (collect_list outputs) come
    # back as numpy arrays whose != is elementwise — compare recursively
    # instead of letting bool(ndarray) raise and abort the whole gate.
    # Dicts (DuckDB MAP cells) must compare by sorted (key, value) ITEMS:
    # list(dict) yields keys only, so equal-keyed maps with different
    # values would false-green (ADVICE r12).
    if isinstance(x, dict) or isinstance(y, dict):
        if not (isinstance(x, dict) and isinstance(y, dict)):
            return False
        if len(x) != len(y):
            return False
        xs = sorted(x.items(), key=lambda kv: repr(kv[0]))
        ys = sorted(y.items(), key=lambda kv: repr(kv[0]))
        return all(same(a, c) and same(b, d) for (a, b), (c, d) in zip(xs, ys))
    xseq = hasattr(x, "__len__") and not isinstance(x, (str, bytes))
    yseq = hasattr(y, "__len__") and not isinstance(y, (str, bytes))
    if xseq or yseq:
        if x is None or y is None:
            return (x is None) == (y is None)
        # Sequence-vs-scalar type mismatch is a VALUE mismatch, not a
        # crash: list(scalar) would raise and abort the gate run instead
        # of recording a per-query [VAL] (ADVICE r12).
        if not (xseq and yseq):
            return False
        xs, ys = list(x), list(y)
        return len(xs) == len(ys) and all(same(a, b) for a, b in zip(xs, ys))
    if x != x and y != y:
        return True
    return x == y


def main(sf_dir, out_dir, json_out=None):
    results = {}

    def record(name, *, rows_match=False, schema_match=False,
               hash_match=False, spark_rows=None, oracle_rows=None,
               err=None):
        # Same row shape as the driver's CORRECTNESS_r{N}.json so the
        # sf0.1 gate artifact (CORRECTNESS_sf01.json, verdict r12 item 1)
        # is directly comparable to the driver's sf0.01 artifact.
        results[name] = {"rows_match": rows_match,
                         "schema_match": schema_match,
                         "hash_match": hash_match,
                         "spark_rows": spark_rows,
                         "oracle_rows": oracle_rows,
                         "err": err}

    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception as e:
            # Bind what exists: a dataset missing one table should fail
            # only that table's queries (per-query [ERR]), not abort the
            # whole run with a raw traceback before any check happened.
            print(f"[WARN] table {t} not bound: {e}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output")
            record(name, err="no spark output")
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
            record(name, err=str(e))
            fail += 1
            continue
        # r9 rule: no DECIMAL may reach the hashed surface on EITHER
        # side — the driver's hasher canonicalizes decimal differently
        # per side, so a value-equal decimal column can still hash-red.
        deccols = sorted({f.name for t in (got_at, want_at)
                          for f in t.schema
                          if has_decimal(f.type)})
        if deccols:
            print(f"[DEC ] {name}: decimal-typed column(s) {deccols}")
            record(name, err=f"decimal-typed column(s) {deccols}")
            fail += 1
            continue
        got = got_at.to_pandas()
        want = want_at.to_pandas()
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: {list(got.columns)} vs {list(want.columns)}")
            record(name, rows_match=len(got) == len(want),
                   spark_rows=len(got), oracle_rows=len(want),
                   err=f"columns {list(got.columns)} vs {list(want.columns)}")
            fail += 1
            continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: {len(got)} vs {len(want)}")
            record(name, schema_match=True,
                   spark_rows=len(got), oracle_rows=len(want))
            fail += 1
            continue
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
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(got), oracle_rows=len(want),
                   err=f"value mismatch col={c} row={i} "
                       f"spark={a!r} duck={b!r}")
            fail += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
            record(name, rows_match=True, schema_match=True,
                   hash_match=True, spark_rows=len(got),
                   oracle_rows=len(want))
            ok += 1
    print(f"== {ok} ok, {fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True, default=str)
        print(f"wrote {json_out} ({len(results)} queries)")
    if ok == 0:
        # An empty/truncated oracle_sql.json (typo'd subset, wrong
        # outDir) must not read as a clean pass: nothing was verified.
        print("FAIL: zero queries checked — empty oracle_sql.json or "
              "wrong outDir?")
        return 1
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
