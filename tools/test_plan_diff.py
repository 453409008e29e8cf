#!/usr/bin/env python3
"""Shape guard for plan_diff.py's artifact loader (ADVICE r14 #3): the
flat (envelope-less) legacy fallback must read back ONLY query-named
string fingerprints — any envelope key that leaks into a flat artifact
(`volatile` was the r13 failure; `sf_run`/future keys are the same
class) must never be diffed as an added/changed plan.

pytest-style; also runnable directly: python3 tools/test_plan_diff.py
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(__file__))
import plan_diff  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_tmp(obj):
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(obj, f)
        path = f.name
    try:
        return plan_diff.load(path)
    finally:
        os.unlink(path)


def test_flat_artifact_filters_every_envelope_key():
    plans, meta, vol = load_tmp({
        "q01_totals": "fp-a", "q186_als_audit": "fp-b",
        "volatile": {"q02_x": "AQE flip"},     # the ADVICE r13 failure
        "sf_run": "sf0.1",                     # string-valued meta
        "cpus": 32, "n_queries": 2,
        "some_future_key": [1, 2],             # the ADVICE r14 concern
        "note": "free text"})
    assert plans == {"q01_totals": "fp-a", "q186_als_audit": "fp-b"}
    assert vol == {"q02_x": "AQE flip"}
    assert meta.get("sf_run") == "sf0.1" and meta.get("cpus") == 32


def test_envelope_artifact_unchanged():
    plans, meta, vol = plan_diff.load(os.path.join(ROOT, "plans.json"))
    assert len(plans) >= 374 and all(isinstance(v, str)
                                     for v in plans.values())
    assert isinstance(vol, dict)
    assert meta.get("cpus") == 32


def test_pre_r14_list_volatile_still_loads():
    _, _, vol = load_tmp({"plans": {"q01_x": "fp"},
                          "volatile": ["q01_x"], "cpus": 32,
                          "sf_run": "sf0.1", "n_queries": 1})
    assert list(vol) == ["q01_x"]
    assert "pre-r14" in vol["q01_x"]


if __name__ == "__main__":
    test_flat_artifact_filters_every_envelope_key()
    test_envelope_artifact_unchanged()
    test_pre_r14_list_volatile_still_loads()
    print("OK: 3 plan_diff loader guards green")
