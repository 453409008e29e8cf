#!/usr/bin/env python3
"""Shape guard for bench_weather.py (VERDICT r12 item 4): the tool must
run on BOTH the builder's bench_full.json and the driver's wrapped
BENCH_r{N}.json (whose query map holds only the slowest-30).

pytest-style; also runnable directly: python3 tools/test_bench_weather.py
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import bench_weather  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(*argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_weather.main(["bench_weather.py", *argv])
    return buf.getvalue()


def test_bench_full_shape():
    out = run(os.path.join(ROOT, "bench_full.json"),
              os.path.join(ROOT, "bench_prior.json"))
    assert "query" in out and "vs prior" in out
    # full artifact: every query has a row
    assert out.count("\n") > 300


def test_driver_artifact_shape():
    out = run(os.path.join(ROOT, "BENCH_r12.json"),
              os.path.join(ROOT, "bench_prior.json"))
    # partial-map coverage note must be explicit, not a silent short table
    assert "PARTIAL query map" in out
    assert "slowest" in out


def test_driver_artifact_no_prior():
    out = run(os.path.join(ROOT, "BENCH_r12.json"))
    assert "no prior file given" in out


def test_lambda_refit_on_committed_ledger():
    out = run("--lambda", os.path.join(ROOT, "bench_ledger.jsonl"))
    assert "LAMBDA fit" in out and "RMS residual" in out
    lam = float(out.split("lambda = ")[1].split(",")[0])
    # The hand-derived model said 0.41-0.6; the 5-window fit lands ~0.35.
    # A fit far outside [0.1, 1.0] means the ledger or model broke.
    assert 0.1 < lam < 1.0, lam


def test_lambda_refit_needs_two_points():
    import json
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".jsonl",
                                     delete=False) as f:
        f.write(json.dumps({"sf_run": "sf0.1", "sentinel_median": 0.1,
                            "total": 100.0}) + "\n")
        path = f.name
    try:
        out = run("--lambda", path)
        assert "need >= 2" in out
    finally:
        os.unlink(path)


if __name__ == "__main__":
    test_bench_full_shape()
    test_driver_artifact_shape()
    test_driver_artifact_no_prior()
    test_lambda_refit_on_committed_ledger()
    test_lambda_refit_needs_two_points()
    print("bench_weather shape guards OK")
