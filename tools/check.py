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


def bind_tables(con, sf_dir):
    """Bind each existing table as a view. Handles BOTH layouts: the
    testdata single-file `<t>.parquet` and a Spark-written DIRECTORY
    `<t>.parquet/part-*.parquet` (the fuzz fixtures' shape)."""
    import os
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        except Exception as e:
            # Bind what exists: a dataset missing one table should fail
            # only that table's queries (per-query [ERR]), not abort the
            # whole run with a raw traceback before any check happened.
            print(f"[WARN] table {t} not bound: {e}")


def compare_query(con, name, files, sql):
    """Engine-parquet vs DuckDB-oracle compare for ONE query. Returns
    (tag, detail, record) where tag is the 4-char status, detail the
    human line, and record the CORRECTNESS_r{N}-shaped row. Shared by
    the sf-gate main() below and tools/fuzz_check.py."""
    def rec(*, rows_match=False, schema_match=False, hash_match=False,
            spark_rows=None, oracle_rows=None, err=None):
        return {"rows_match": rows_match, "schema_match": schema_match,
                "hash_match": hash_match, "spark_rows": spark_rows,
                "oracle_rows": oracle_rows, "err": err}

    if not files:
        return "MISS", "no spark output", rec(err="no spark output")
    try:
        # Fetch through Arrow so the DECIMAL ban below can read the
        # declared column TYPE: value-sampling (the r9 head(3) probe)
        # misses all-NULL / zero-row decimal columns, which still
        # hash-red on the driver.
        got_at = con.execute(
            f"SELECT * FROM read_parquet({files!r})").arrow()
        want_at = con.execute(sql).arrow()
    except Exception as e:
        return "ERR ", str(e), rec(err=str(e))
    # r9 rule: no DECIMAL may reach the hashed surface on EITHER
    # side — the driver's hasher canonicalizes decimal differently
    # per side, so a value-equal decimal column can still hash-red.
    deccols = sorted({f.name for t in (got_at, want_at)
                      for f in t.schema
                      if has_decimal(f.type)})
    if deccols:
        return ("DEC ", f"decimal-typed column(s) {deccols}",
                rec(err=f"decimal-typed column(s) {deccols}"))
    got = got_at.to_pandas()
    want = want_at.to_pandas()
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        d = f"{list(got.columns)} vs {list(want.columns)}"
        return "COLS", d, rec(rows_match=len(got) == len(want),
                              spark_rows=len(got), oracle_rows=len(want),
                              err=f"columns {d}")
    if len(got) != len(want):
        return ("ROWS", f"{len(got)} vs {len(want)}",
                rec(schema_match=True, spark_rows=len(got),
                    oracle_rows=len(want)))
    for c in got.columns:
        a, b = got[c].tolist(), want[c].tolist()
        bad = next((i for i in range(len(a)) if not same(a[i], b[i])), None)
        if bad is not None:
            d = f"col={c} row={bad} spark={a[bad]!r} duck={b[bad]!r}"
            return "VAL ", d, rec(rows_match=True, schema_match=True,
                                  spark_rows=len(got), oracle_rows=len(want),
                                  err=f"value mismatch {d}")
    return " OK ", f"{len(got)} rows", rec(
        rows_match=True, schema_match=True, hash_match=True,
        spark_rows=len(got), oracle_rows=len(want))


def main(sf_dir, out_dir, json_out=None):
    results = {}
    con = duckdb.connect()
    bind_tables(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        tag, detail, record = compare_query(con, name, files, sql)
        print(f"[{tag}] {name}: {detail}")
        results[name] = record
        if tag == " OK ":
            ok += 1
        else:
            fail += 1
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
