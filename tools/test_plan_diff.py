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


def test_flat_artifact_names_dropped_string_keys_on_stderr():
    # ADVICE r15: a string key the qNN_ filter drops must be NAMED, not
    # silently absent — it could be a legacy plan fingerprint.
    import contextlib
    import io
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        plans, _, _ = load_tmp({
            "q01_totals": "fp-a",
            "legacy_fingerprint": "== Physical Plan ==",  # non-qNN_ plan
            "note": "free text",
            "sf_run": "sf0.1", "cpus": 32})               # consumed meta
    assert plans == {"q01_totals": "fp-a"}
    text = err.getvalue()
    assert "legacy_fingerprint" in text and "note" in text
    assert "sf_run" not in text  # consumed as meta, not dropped


def test_envelope_artifact_loads():
    # Synthetic envelope fixture (ADVICE r15: don't couple the loader
    # test to the live round's query count / cpu config)...
    plans, meta, vol = load_tmp({
        "plans": {"q01_totals": "fp-a", "q02_x": "fp-b"},
        "volatile": {"q02_x": "AQE flip"},
        "sf_run": "sf0.1", "cpus": 32, "n_queries": 2})
    assert plans == {"q01_totals": "fp-a", "q02_x": "fp-b"}
    assert vol == {"q02_x": "AQE flip"}
    assert meta == {"sf_run": "sf0.1", "cpus": 32, "n_queries": 2}
    # ...and keep only SHAPE assertions against the live plans.json.
    plans, _, vol = plan_diff.load(os.path.join(ROOT, "plans.json"))
    assert plans and all(isinstance(k, str) and isinstance(v, str)
                         for k, v in plans.items())
    assert isinstance(vol, dict)


def test_pre_r14_list_volatile_still_loads():
    _, _, vol = load_tmp({"plans": {"q01_x": "fp"},
                          "volatile": ["q01_x"], "cpus": 32,
                          "sf_run": "sf0.1", "n_queries": 1})
    assert list(vol) == ["q01_x"]
    assert "pre-r14" in vol["q01_x"]


if __name__ == "__main__":
    test_flat_artifact_filters_every_envelope_key()
    test_flat_artifact_names_dropped_string_keys_on_stderr()
    test_envelope_artifact_loads()
    test_pre_r14_list_volatile_still_loads()
    print("OK: 4 plan_diff loader guards green")
