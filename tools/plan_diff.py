#!/usr/bin/env python3
"""Physical-plan fingerprint diff (VERDICT r12 item 2).

Usage: python3 tools/plan_diff.py <prior_plans.json> <current_plans.json>

Compares two graft.PlanDump artifacts and prints, per query whose
normalized operator tree changed, a unified diff of the fingerprint
lines — plus added/removed query lists and a one-line summary:

    PLANDIFF <n_same> same, <n_changed> changed, <n_added> added, <n_removed> removed

Exit code 0 when nothing changed, 2 when any plan differs (added or
removed queries alone also exit 2 — a silently vanishing query is a
regression too). Close-run contract: every name this tool prints must
be explained in COVERAGE.md for the round. Builder-side dev aid only —
not part of the shipped library.
"""
import difflib
import json
import sys


def load(path):
    d = json.load(open(path))
    plans = d.get("plans", d)  # tolerate both the envelope and a flat map
    meta = {k: d.get(k) for k in ("sf_run", "cpus", "n_queries")
            if isinstance(d, dict) and k in d}
    return plans, meta


def main(prior_path, cur_path):
    prior, pmeta = load(prior_path)
    cur, cmeta = load(cur_path)
    if pmeta.get("sf_run") and cmeta.get("sf_run") and \
            pmeta["sf_run"] != cmeta["sf_run"]:
        print(f"WARNING: sf_run differs ({pmeta['sf_run']} vs "
              f"{cmeta['sf_run']}) — AQE decisions are data-sized, so "
              f"cross-SF plan diffs are expected noise")
    added = sorted(set(cur) - set(prior))
    removed = sorted(set(prior) - set(cur))
    changed = []
    same = 0
    for name in sorted(set(prior) & set(cur)):
        if prior[name] == cur[name]:
            same += 1
            continue
        changed.append(name)
        a = prior[name].splitlines(keepends=True)
        b = cur[name].splitlines(keepends=True)
        print(f"--- CHANGED {name}")
        sys.stdout.writelines(
            difflib.unified_diff(a, b, fromfile=f"{name}@prior",
                                 tofile=f"{name}@current", lineterm=""))
        print()
    if added:
        print(f"ADDED ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")
    print(f"PLANDIFF {same} same, {len(changed)} changed, "
          f"{len(added)} added, {len(removed)} removed")
    return 2 if (changed or added or removed) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
