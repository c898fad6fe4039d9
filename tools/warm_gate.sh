#!/bin/sh
# Warm-sweep regression gate, one command: run both whole-tier sweeps
# (LLM tier at 1M docs, events at 10M — ~10 min total), save the two
# JSON lines as BIGBENCH_WARM_r<N>.json, and diff against the previous
# round's artifact at the calibrated 1.5x ratio / 2 s jitter floor.
# Exits non-zero on any breach, so regressions surface at build time.
#
# Usage: tools/warm_gate.sh <N> [expect-list]   # e.g. tools/warm_gate.sh 9
#        (expects BIGBENCH_WARM_r0<N-1>.json to exist; the optional
#        comma-separated expect-list names queries whose semantics
#        intentionally changed this round — breaches there report as
#        EXPECTED-CHANGE instead of failing)
set -e
N="$1"
[ -n "$N" ] || { echo "usage: tools/warm_gate.sh <round-number>"; exit 2; }
PREV=$(printf 'BIGBENCH_WARM_r%02d.json' $((N - 1)))
CUR=$(printf 'BIGBENCH_WARM_r%02d.json' "$N")
[ -f "$PREV" ] || { echo "missing previous artifact $PREV"; exit 2; }
sbt -batch "runMain graft.tools.BigBenchLlm 1000000" 2>/dev/null \
  | grep '"llm_end_to_end"' | sed 's/^\[info\] //' > "$CUR"
sbt -batch "runMain graft.tools.BigBenchEvents 10000000" 2>/dev/null \
  | grep '"events_end_to_end"' | sed 's/^\[info\] //' >> "$CUR"
if [ -n "$2" ]; then
  python3 tools/bench_diff.py --warm "$PREV" "$CUR" 1.5 --expect "$2"
else
  python3 tools/bench_diff.py --warm "$PREV" "$CUR" 1.5
fi
