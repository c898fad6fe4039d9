#!/usr/bin/env python3
"""Round-over-round bench regression diff.

Usage: python3 tools/bench_diff.py <old_bench.json> <new_bench.json> [pct]
       python3 tools/bench_diff.py --warm <old_warm.jsonl> <new_warm.jsonl> [ratio]

Default mode compares the per-query medians of two graft.Bench JSON
artifacts (BENCH_r{N}.json with a `parsed` object, or a raw bench line
such as target/bench_latest.json) and prints queries whose time moved
more than `pct` percent (default 30) plus anything added, removed, or
errored. Exit code 1 if any regression exceeds the threshold, so CI can
gate.

--warm mode diffs whole-tier warm-sweep records (BIGBENCH_WARM_r{N}
.json: one JSON line per sweep, each with a "rows" count and a
"<tier>_end_to_end" object — the BigBenchLlm / BigBenchEvents output).
Lines are matched by (tier, rows); a query regresses when new > ratio ×
old (default 1.5) and the delta clears a 2 s jitter floor — these are
SINGLE-RUN whole-tier sweeps, and measured run-to-run spread on this
host is ±0.5–1.5 s on light rows (page cache / JIT / GC state), so a
sub-2 s move is noise, not a plan change. Re-run a flagged query
isolated (`runMain graft.tools.BigBenchLlm 1000000 <query>`) before
believing it. Exit 1 on any regression.
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


def load_warm(path):
    """JSONL of sweep lines → {(tier, rows): {query: seconds}}."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue
            d = json.loads(line)
            for k, v in d.items():
                if isinstance(v, dict):
                    out[(k, d.get("rows"))] = v
    return out


def main_warm(old_path, new_path, ratio, expect=()):
    # `expect`: queries whose SEMANTICS intentionally changed this round
    # (e.g. a raw-output row becoming a heavier verification gate) — a
    # ratio breach there is reported as EXPECTED-CHANGE, not a failure.
    # Pass them explicitly per run; the list is not persistent config.
    old, new = load_warm(old_path), load_warm(new_path)
    regressions = []
    for key in sorted(set(old) | set(new), key=str):
        tier, rows = key
        if key not in new:
            print(f"-- {tier} rows={rows}: GONE from new sweep")
            continue
        if key not in old:
            print(f"-- {tier} rows={rows}: NEW sweep "
                  f"({len(new[key])} queries, no baseline)")
            continue
        oq, nq = old[key], new[key]
        print(f"-- {tier} rows={rows} ({len(nq)} queries)")
        for name in sorted(set(oq) | set(nq)):
            if name not in nq:
                print(f"   {name:32} {oq[name]:8.2f} {'GONE':>8}")
            elif name not in oq:
                print(f"   {name:32} {'NEW':>8} {nq[name]:8.2f}")
            else:
                a, b = oq[name], nq[name]
                # ratio gate + absolute jitter floor: single-run
                # sweeps spread ±0.5–1.5 s with host state, so only a
                # ratio breach that also moves ≥2 s is a real signal
                if b > ratio * a and b - a > 2.0:
                    r = b / a if a > 0 else float("inf")
                    if name in expect:
                        print(f"   {name:32} {a:8.2f} {b:8.2f} {r:6.2f}x  EXPECTED-CHANGE")
                    else:
                        print(f"   {name:32} {a:8.2f} {b:8.2f} {r:6.2f}x  REGRESSION")
                        regressions.append((key, name, a, b))
                elif a > ratio * b and a - b > 2.0:
                    r = b / a if a > 0 else float("inf")
                    print(f"   {name:32} {a:8.2f} {b:8.2f} {r:6.2f}x  improved")
    if regressions:
        print(f"\n{len(regressions)} warm-sweep regression(s) over {ratio}x")
        return 1
    print("\nno warm-sweep regressions over threshold")
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--warm":
        if len(sys.argv) < 4:
            sys.exit(__doc__)
        expect = ()
        args = sys.argv[2:]
        if "--expect" in args:
            i = args.index("--expect")
            expect = tuple(args[i + 1].split(","))
            args = args[:i] + args[i + 2:]
        sys.exit(main_warm(args[0], args[1],
                           float(args[2]) if len(args) > 2 else 1.5, expect))
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sys.exit(main(sys.argv[1], sys.argv[2],
                  float(sys.argv[3]) if len(sys.argv) > 3 else 30.0))
