#!/usr/bin/env python3
"""Round-over-round bench regression diff.

Usage: python3 tools/bench_diff.py <old_bench.json> <new_bench.json> [pct]

Compares the per-query medians of two graft.Bench JSON artifacts
(BENCH_r{N}.json with a `parsed` object, or a raw bench line such as
target/bench_latest.json) and prints queries whose time moved more than
`pct` percent (default 30) plus anything added, removed, or errored.
Exit code 1 if any regression exceeds the threshold, so CI can gate.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # driver artifacts wrap the bench line under "parsed" (may be null
    # if stdout was truncated — that's exactly what bench_latest.json
    # guards against)
    if "parsed" in d:
        d = d["parsed"]
        if d is None:
            sys.exit(f"{path}: parsed is null (truncated artifact) — "
                     "use the committed target/bench_latest.json for that round")
    return d


def main(old_path, new_path, pct):
    old, new = load(old_path), load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    regressions = []
    print(f"{'query':34} {'old':>8} {'new':>8} {'delta':>8}")
    for name in sorted(set(oq) | set(nq)):
        if name not in nq:
            print(f"{name:34} {oq[name]:8.2f} {'GONE':>8}")
            continue
        if name not in oq:
            print(f"{name:34} {'NEW':>8} {nq[name]:8.2f}")
            continue
        a, b = oq[name], nq[name]
        delta = (b - a) / a * 100 if a > 0 else 0.0
        if abs(delta) >= pct:
            print(f"{name:34} {a:8.2f} {b:8.2f} {delta:+7.0f}%")
            if delta >= pct:
                regressions.append((name, a, b))
    for name, msg in sorted(new.get("errors", {}).items()):
        print(f"{name:34} ERROR: {msg[:80]}")
        regressions.append((name, None, None))
    ot, nt = old.get("value"), new.get("value")
    if ot and nt:
        print(f"{'TOTAL':34} {ot:8.2f} {nt:8.2f} {(nt-ot)/ot*100:+7.0f}%")
    if regressions:
        print(f"\n{len(regressions)} regression(s) over {pct}% (or errors)")
        return 1
    print("\nno regressions over threshold")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 30.0))
