#!/usr/bin/env python3
"""Maintain QUIET_BASELINE.json — per-query best-known quiet timings.

Usage: python3 tools/quiet_baseline.py out.json artifact1.json [artifact2.json ...]

Takes the elementwise per-query MINIMUM over every given bench artifact
(plus out.json itself if it already exists), which is the estimator that
reconciled the r13 captures: this host's noise arrives in minutes-long
contention episodes that inflate a different query subset per capture,
so the per-query min across captures is the best available proxy for
the quiet value of each query. BENCH_PROTOCOL.md step 3 points
bench_compare.py at the result instead of the previous round's
(possibly episode-inflated) single capture.

Artifacts may be raw graft.Bench lines or driver BENCH_rN.json wrappers
(same loader as bench_compare.py). Queries flagged in an artifact's
episode_suspect list are EXCLUDED from that artifact's contribution —
an episode minimum is still an episode sample.

Because the merge is an elementwise minimum it only ever ratchets DOWN:
a deliberate algorithmic change that legitimately slows one query would
leave a permanently unattainable floor. Re-baseline such queries with

    python3 tools/quiet_baseline.py out.json --drop q1,q2 [artifacts...]

which deletes those entries (the next merged artifact repopulates them
at its measured value) and records the drop + reason in a provenance
row. Each provenance row also records the repo HEAD at merge time —
the closest available proxy for which code version produced the mins
(captures are normally merged in the same session they are taken).
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_compare import load  # noqa: E402


def git_head():
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return None


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    args = sys.argv[1:]
    drops = []
    if "--drop" in args:
        i = args.index("--drop")
        drops = [q for q in args[i + 1].split(",") if q]
        del args[i:i + 2]
    if not args:
        raise SystemExit(__doc__)
    out_path, srcs = args[0], args[1:]
    best = {}
    rounds = []
    if os.path.exists(out_path):
        prev = json.load(open(out_path))
        best = dict(prev.get("queries", {}))
        rounds = list(prev.get("sources", []))
    head = git_head()
    if drops:
        missing = [q for q in drops if q not in best]
        if missing:
            raise SystemExit(f"--drop names unknown queries: {missing}")
        for q in drops:
            del best[q]
        rounds.append({"drop": sorted(drops), "head": head})
        print(f"dropped {len(drops)} entries for re-baselining: "
              f"{', '.join(sorted(drops))}")
    for p in srcs:
        d = load(p)
        suspect = set(d.get("episode_suspect") or [])
        n_lowered = 0
        for q, v in d["queries"].items():
            if not v or v <= 0 or q in suspect:
                continue
            if q not in best or v < best[q]:
                best[q] = v
                n_lowered += 1
        entry = {"path": os.path.basename(p),
                 "total": round(d.get("value", 0.0), 3),
                 "queries_lowered": n_lowered,
                 "episode_suspect": sorted(suspect),
                 "head": head}
        # idempotent: re-merging an already-recorded artifact (same
        # name + total) must not duplicate its provenance row
        if not any(r.get("path") == entry["path"]
                   and r.get("total") == entry["total"] for r in rounds):
            rounds.append(entry)
    doc = {"metric": "quiet_baseline",
           "value": round(sum(best.values()), 3),
           "unit": "sec",
           "queries": {k: best[k] for k in sorted(best)},
           "sources": rounds}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{out_path}: {len(best)} queries, per-query-min total "
          f"{doc['value']:.1f}s (from {len(srcs)} new artifacts)")


if __name__ == "__main__":
    main()
