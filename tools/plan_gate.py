#!/usr/bin/env python3
"""Plan-SHAPE regression gate.

PLANS.md is the committed audit trail of each curated query's physical
plan. Seconds-based gates (bench_diff, warm_gate) only catch a shape
regression — a new shuffle, a broadcast degrading to sort-merge, a
lost WindowGroupLimit — once it costs enough to clear the jitter
floor; at sf0.1 most don't. This gate catches the shape change itself:
it dumps the CURRENT plans and diffs each query's normalized shape
signature against the committed PLANS.md.

The signature per query is the counted multiset of scale-relevant
nodes in the plan tree:
  - Exchange / BroadcastExchange / ReusedExchange (shuffle count is
    THE 100-TB cost driver)
  - join strategy + join type (BroadcastHashJoin Inner, SortMergeJoin
    LeftAnti, CartesianProduct, ...)
  - TakeOrderedAndProject / WindowGroupLimit (top-k and group-limit
    pruning — losing one silently globalizes a sort or un-prunes a
    window shuffle)
Everything else (projections, filters, ids, sizes, codegen spans) is
deliberately ignored: those churn without scale meaning.

Usage:
  python3 tools/plan_gate.py                  # dump current plans, diff
  python3 tools/plan_gate.py --current FILE   # diff a pre-dumped file
  python3 tools/plan_gate.py --baseline FILE  # default PLANS.md

Exit 1 on any per-query signature change, or on a query present in one
file but not the other (a new pick means: review the plan, then
regenerate PLANS.md via `sbt "runMain graft.tools.DumpPlans"` and
commit it WITH the change that added it).
"""
import argparse, collections, os, re, subprocess, sys

SHAPE_NODES = re.compile(
    r"^(ReusedExchange|BroadcastExchange|Exchange"
    r"|BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"
    r"|BroadcastNestedLoopJoin|CartesianProduct"
    r"|TakeOrderedAndProject|WindowGroupLimit)\b")
JOIN_TYPE = re.compile(
    r"\b(Inner|FullOuter|LeftOuter|RightOuter|LeftSemi|LeftAnti|Cross|ExistenceJoin)\b")


def parse(path):
    """-> {query: Counter(shape tokens)} from a PLANS.md-format file."""
    sigs, name, in_code, in_tree = {}, None, False, False
    for line in open(path):
        if line.startswith("## "):
            name = line[3:].strip()
            sigs[name] = collections.Counter()
            in_code = in_tree = False
            continue
        if line.startswith("```"):
            in_code = not in_code
            in_tree = in_code  # a fenced block starts with the tree
            continue
        if not (in_code and name):
            continue
        # formatted explain appends "===== Subqueries =====" sections;
        # each "Subquery:N Hosting operator ..." header starts another
        # tree (the scalar-subquery shapes Q11/Q22 exercise) — without
        # re-entering tree mode a shuffle or join-strategy regression
        # inside a subquery would be invisible to the gate
        if re.match(r"^Subquery:?\d*\s", line):
            in_tree = True
            continue
        if not in_tree:
            continue
        if re.match(r"^\(\d+\) ", line):  # node details begin; tree over
            in_tree = False
            continue
        node = re.sub(r"^[\s+\-:*]+", "", line.rstrip())
        m = SHAPE_NODES.match(node)
        if m:
            tok = m.group(1)
            jt = JOIN_TYPE.search(node)
            if jt and ("Join" in tok or tok == "CartesianProduct"):
                tok += " " + jt.group(1)
            sigs[name][tok] += 1
    return sigs


def fmt(counter):
    return ", ".join(f"{k}×{v}" for k, v in sorted(counter.items())) or "(none)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default="PLANS.md")
    ap.add_argument("--current", default=None,
                    help="pre-dumped plans file; omit to run DumpPlans")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    current = args.current
    if current is None:
        current = "target/plans_current.md"
        os.makedirs("target", exist_ok=True)
        r = subprocess.run(
            ["sbt", "-batch",
             f'runMain graft.tools.DumpPlans {args.sf} {current}'],
            capture_output=True, text=True)
        if r.returncode != 0 or not os.path.exists(current):
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            print("FAIL plan_gate: DumpPlans did not produce", current)
            return 1

    base, cur = parse(args.baseline), parse(current)
    failures = []
    for q in sorted(set(base) | set(cur)):
        if q not in cur:
            failures.append(f"{q}: in {args.baseline} but not dumped — "
                            "pick removed without regenerating PLANS.md")
        elif q not in base:
            failures.append(f"{q}: new pick not in {args.baseline} — "
                            "review its plan, regenerate PLANS.md, commit both")
        elif base[q] != cur[q]:
            failures.append(f"{q}: shape changed\n"
                            f"    committed: {fmt(base[q])}\n"
                            f"    current:   {fmt(cur[q])}")
    if failures:
        print(f"FAIL plan_gate: {len(failures)} quer"
              f"{'y' if len(failures) == 1 else 'ies'} diverged from {args.baseline}")
        for f in failures:
            print("  -", f)
        return 1
    print(f"PASS plan_gate: {len(cur)} queries, shapes match {args.baseline}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
