#!/usr/bin/env python3
"""Compare two graft.Bench JSON artifacts (BENCH_PROTOCOL.md step 3).

Usage: python3 tools/bench_compare.py baseline.json candidate.json [topN]

Prints totals, the per-query ratio (candidate/baseline) for the worst
inflations and best improvements over the SHARED query set, and the
max_inflation acceptance line. Queries present in only one artifact are
listed but excluded from ratios (suite growth is not noise).
"""
import json
import sys


def load(path):
    """Accept either a raw graft.Bench line/file or a driver BENCH_rN.json
    wrapper (whose 'parsed' field — or failing that its 'tail' log text —
    carries the bench line)."""
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
        if "queries" in d:
            return d
        if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
            return d["parsed"]
        text = d.get("tail", "")
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            d = json.loads(line)
            if "queries" in d:
                return d
    raise SystemExit(f"no bench JSON line found in {path}")


def main():
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    qa = {k: v for k, v in a["queries"].items() if v and v > 0}
    qb = {k: v for k, v in b["queries"].items() if v and v > 0}
    shared = sorted(set(qa) & set(qb))
    if not shared:
        raise SystemExit(
            "no shared queries between artifacts (disjoint suites or "
            "all-zero timings) — nothing to compare")
    only_a, only_b = sorted(set(qa) - set(qb)), sorted(set(qb) - set(qa))
    ratios = sorted(((qb[k] / qa[k], k) for k in shared), reverse=True)
    shared_a = sum(qa[k] for k in shared)
    shared_b = sum(qb[k] for k in shared)
    print(f"total: {a['value']:.1f}s/{len(qa)}q -> {b['value']:.1f}s/{len(qb)}q"
          f"  (shared set: {shared_a:.1f}s -> {shared_b:.1f}s,"
          f" ratio {shared_b / shared_a:.3f})")
    if only_a:
        print(f"only in baseline: {', '.join(only_a)}")
    if only_b:
        print(f"only in candidate: {', '.join(only_b)}")
    print(f"\nworst inflations (candidate/baseline):")
    for r, k in ratios[:top_n]:
        print(f"  {r:6.2f}x  {k}  ({qa[k]:.3f}s -> {qb[k]:.3f}s)")
    print(f"\nbest improvements:")
    for r, k in ratios[-top_n:][::-1]:
        print(f"  {r:6.2f}x  {k}  ({qa[k]:.3f}s -> {qb[k]:.3f}s)")
    # acceptance lines: BENCH_PROTOCOL step 3 (r14 revision) — aggregate
    # criteria vs the quiet baseline. Per-query ratios are printed for
    # the record but are NOT the acceptance bar: sub-second queries flip
    # 2x on a single page-cache miss, and every capture on this host has
    # SOME episode-inflated subset (the r13 three-capture reconciliation),
    # so a per-query <1.3x bar is structurally unattainable at 156
    # queries. The aggregate ratio against per-query minima IS attainable
    # and still catches both diffuse inflation and single-query
    # regressions (the dominant-query check).
    worst_r, worst_k = ratios[0]
    delta = shared_b - shared_a
    dominant = [k for k in shared
                if delta > 0 and (qb[k] - qa[k]) > 0.10 * delta
                and (qb[k] - qa[k]) > 0.5]
    # per-query regressions INDEPENDENT of the aggregate sign (r15): the
    # dominant-query clause above is delta-gated, so a single query
    # regressing badly (+8s) while unrelated queries improve more
    # (net delta <= 0) used to sail through. Any shared query that is
    # BOTH >2x its baseline AND >0.5s over it rejects on its own.
    # Calibration: the accepted r14 capture's max ratio vs the quiet
    # baseline was 1.48x, so the 2x bound sits above legitimate-capture
    # noise; episode captures (which this also catches) should reject
    # anyway per BENCH_PROTOCOL step 3 (re-measure, don't accept).
    regressed = [k for k in shared
                 if qb[k] / qa[k] > 2.0 and (qb[k] - qa[k]) > 0.5]
    agg = shared_b / shared_a
    print(f"\nmax_inflation: {worst_r:.2f}x ({worst_k})  [for the record]")
    print(f"aggregate_ratio: {agg:.3f}  [accept needs < 1.15 vs quiet baseline]")
    if delta > 0 and dominant:
        print("dominant_queries (>10% of delta and >0.5s): "
              + ", ".join(f"{k} (+{qb[k] - qa[k]:.1f}s)" for k in dominant))
    if regressed:
        print("regressed_queries (>2x baseline and >0.5s, aggregate-independent): "
              + ", ".join(f"{k} ({qa[k]:.2f}s -> {qb[k]:.2f}s)" for k in regressed))
    ok = agg < 1.15 and not dominant and not regressed
    print(f"acceptance: {'ACCEPT' if ok else 'REJECT'}")
    # machine-checkable: a scripted protocol step must not treat a
    # rejected capture as success
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
