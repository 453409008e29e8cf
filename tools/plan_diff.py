#!/usr/bin/env python3
"""Physical-plan fingerprint diff (VERDICT r12 item 2).

Usage:
  python3 tools/plan_diff.py <prior_plans.json> <current_plans.json>
  python3 tools/plan_diff.py --merge <runA.json> <runB.json> <out.json>
  python3 tools/plan_diff.py --add-volatile <plans.json> <q1,q2,...> <reason>

Diff mode compares two graft.PlanDump artifacts and prints, per query
whose normalized operator tree changed, a unified diff of the
fingerprint lines — plus added/removed query lists and a one-line
summary:

    PLANDIFF <n_same> same, <n_changed> changed, <n_added> added, <n_removed> removed [, <n_volatile> volatile]

Exit code 0 when nothing gated changed, 2 when any plan differs (added
or removed queries alone also exit 2 — a silently vanishing query is a
regression too). Queries flagged `volatile` in EITHER artifact are
reported separately and do NOT fail the diff: those are the queries
whose AQE outcome was measured to flap between identical-config runs
(broadcast-side choice near a size threshold), so a cross-round change
there is weather, not a regression. Close-run contract: every
non-volatile name this tool prints must be explained in COVERAGE.md.

Merge mode builds the committed baseline from TWO identical-config
PlanDump runs: out.json carries runA's plans plus a `volatile` map
{query: reason} for the queries whose fingerprints differ between A
and B — the self-measured exclusion list the diff mode consumes. Both
runs must share sf_run and cpus. Merge REBUILDS the volatile set from
its own pair: prior-round flags are deliberately NOT carried forward
(VERDICT r13 item 2 — membership must be re-earned each round; a query
that stopped flapping leaves the list). Re-add still-flapping
cross-session queries afterwards with --add-volatile.

--add-volatile appends evidence-based flags for queries OBSERVED
flapping across sessions/rounds with zero code change (the two-run
merge only catches flaps inside its own pair). The reason argument is
REQUIRED and stored in the artifact next to the name (ADVICE r13 —
an exemption whose justification lives only in a commit message is one
CLI call away from silent gate erosion). Older artifacts carrying a
bare list of names still load (reason shown as "unrecorded").

Config guard: AQE decisions depend on data size AND parallelism, so a
cpus (shuffle-partition) mismatch between artifacts makes every diff
apples-to-oranges — diff mode FAILS on a cpus mismatch instead of
printing hundreds of spurious changes (sf_run mismatch stays a warning
for deliberate cross-SF comparisons). Builder-side dev aid only — not
part of the shipped library.
"""
import difflib
import json
import sys

def load(path):
    d = json.load(open(path))
    if "plans" in d and isinstance(d["plans"], dict):
        plans = d["plans"]
    else:
        # Flat (envelope-less) legacy artifact: plan fingerprints are the
        # STRING-valued entries whose name looks like a query (qNN_...).
        # The shape filter — not a hard-coded meta-key list — keeps any
        # future envelope key (the ADVICE-r13/r14 failure mode: `volatile`
        # was diffed as a plan, then `sf_run` would be next) from being
        # read back as a query, whatever its type.
        import re
        qname = re.compile(r"^q\d+_")
        plans = {k: v for k, v in d.items()
                 if isinstance(v, str) and qname.match(k)}
        # ADVICE r15: the shape filter silently DROPS any string-valued
        # key that doesn't look like a query — a legacy fingerprint under
        # a non-qNN_ name would vanish from both sides of the diff and
        # mask its change as absence. Name every such key on stderr so a
        # dropped plan is visible (known consumed meta keys excepted).
        dropped = [k for k, v in d.items()
                   if isinstance(v, str) and not qname.match(k)
                   and k not in ("sf_run", "cpus", "n_queries")]
        if dropped:
            print(f"NOTE: flat artifact {path}: ignored "
                  f"{len(dropped)} non-query string key(s): "
                  f"{', '.join(sorted(dropped))}", file=sys.stderr)
    meta = {k: d[k] for k in ("sf_run", "cpus", "n_queries") if k in d}
    raw_vol = d.get("volatile", [])
    # volatile is a {name: reason} map since r14; accept the r13 list form
    if isinstance(raw_vol, dict):
        volatile = dict(raw_vol)
    else:
        volatile = {n: "unrecorded (pre-r14 list-form artifact)"
                    for n in raw_vol}
    return plans, meta, volatile


def merge(a_path, b_path, out_path):
    a, ameta, _ = load(a_path)
    b, bmeta, _ = load(b_path)
    for k in ("sf_run", "cpus"):
        if ameta.get(k) != bmeta.get(k):
            print(f"MERGE FAIL: {k} differs ({ameta.get(k)} vs "
                  f"{bmeta.get(k)}) — volatility must be measured on "
                  f"identical-config runs")
            return 1
    if set(a) != set(b):
        only = sorted(set(a) ^ set(b))
        print(f"MERGE FAIL: query sets differ: {', '.join(only)}")
        return 1
    volatile = {n: "merge-measured: fingerprint differs between the two "
                   "identical-config close runs"
                for n in sorted(a) if a[n] != b[n]}
    envelope = dict(json.load(open(a_path)))
    envelope["volatile"] = volatile
    with open(out_path, "w") as f:
        json.dump(envelope, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"MERGED {len(a)} queries, {len(volatile)} volatile: "
          f"{', '.join(sorted(volatile)) if volatile else '(none)'}")
    print(f"wrote {out_path}")
    return 0


def add_volatile(path, names_csv, reason):
    """Append evidence-based volatile flags with their justification."""
    if not reason or not reason.strip():
        print("ADD-VOLATILE FAIL: a non-empty reason is required "
              "(what flap was observed, where)")
        return 1
    plans, _, volatile = load(path)
    d = json.load(open(path))
    names = [n.strip() for n in names_csv.split(",") if n.strip()]
    unknown = [n for n in names if n not in plans]
    if unknown:
        print(f"ADD-VOLATILE FAIL: unknown queries: {', '.join(unknown)}")
        return 1
    for n in names:
        volatile[n] = reason.strip()
    d["volatile"] = dict(sorted(volatile.items()))
    with open(path, "w") as f:
        json.dump(d, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"volatile now {len(volatile)}: {', '.join(sorted(volatile))}")
    return 0


def main(prior_path, cur_path):
    prior, pmeta, pvol = load(prior_path)
    cur, cmeta, cvol = load(cur_path)
    if pmeta.get("sf_run") and cmeta.get("sf_run") and \
            pmeta["sf_run"] != cmeta["sf_run"]:
        print(f"WARNING: sf_run differs ({pmeta['sf_run']} vs "
              f"{cmeta['sf_run']}) — AQE decisions are data-sized, so "
              f"cross-SF plan diffs are expected noise")
    if pmeta.get("cpus") and cmeta.get("cpus") and \
            pmeta["cpus"] != cmeta["cpus"]:
        print(f"PLANDIFF FAIL: cpus differs ({pmeta['cpus']} vs "
              f"{cmeta['cpus']}) — shuffle-partition count drives AQE "
              f"coalescing and broadcast choices; regenerate the current "
              f"artifact with SPARK_GRAFT_CPUS={pmeta['cpus']}")
        return 2
    volatile_set = set(pvol) | set(cvol)
    added = sorted(set(cur) - set(prior))
    removed = sorted(set(prior) - set(cur))
    changed = []
    volatile_changed = []
    same = 0
    for name in sorted(set(prior) & set(cur)):
        if prior[name] == cur[name]:
            same += 1
            continue
        if name in volatile_set:
            volatile_changed.append(name)
            continue
        changed.append(name)
        a = prior[name].splitlines(keepends=True)
        b = cur[name].splitlines(keepends=True)
        print(f"--- CHANGED {name}")
        sys.stdout.writelines(
            difflib.unified_diff(a, b, fromfile=f"{name}@prior",
                                 tofile=f"{name}@current", lineterm=""))
        print()
    if volatile_changed:
        print(f"VOLATILE, not gated ({len(volatile_changed)}): "
              f"{', '.join(volatile_changed)}")
    if added:
        print(f"ADDED ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")
    print(f"PLANDIFF {same} same, {len(changed)} changed, "
          f"{len(added)} added, {len(removed)} removed, "
          f"{len(volatile_changed)} volatile")
    return 2 if (changed or added or removed) else 0


USAGE = """usage:
  plan_diff.py <prior_plans.json> <current_plans.json>
  plan_diff.py --merge <runA.json> <runB.json> <out.json>
  plan_diff.py --add-volatile <plans.json> <q1,q2,...> <reason>
(see module docstring for semantics and exit codes)"""


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--merge":
        if len(args) != 4:
            print(USAGE)
            sys.exit(1)
        sys.exit(merge(args[1], args[2], args[3]))
    if args and args[0] == "--add-volatile":
        if len(args) != 4:
            print(USAGE)
            sys.exit(1)
        sys.exit(add_volatile(args[1], args[2], args[3]))
    if len(args) != 2:
        print(USAGE)
        sys.exit(1)
    sys.exit(main(args[0], args[1]))
