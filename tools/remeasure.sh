#!/usr/bin/env bash
# Over-gate ADJUDICATION (BASELINE.md protocol, one command): median-of-5
# idle re-measure of the named queries via SPARK_GRAFT_BENCH_ONLY, compared
# against the frozen BASELINE.md gates, with a JSON adjudication record
# written beside the bench artifacts. Run this on an otherwise-idle box
# before believing ANY over-gate reading in a driver bench tail — driver-box
# contention has produced spurious 2-4x rows in three consecutive rounds
# (r5-r7), each costing a judge session to clear by hand.
#
# Usage: tools/remeasure.sh <q1,q2,...> [sfDir]
#   tools/remeasure.sh ext36_embed_pipeline,q62_windowed_dedup
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES="${1:?usage: tools/remeasure.sh <q1,q2,...> [sfDir]}"
SF_DIR="${2:-/root/testdata/sf0.1}"
OUT="bench/REMEASURE_$(date +%Y%m%d_%H%M%S).json"

# sbt prefixes stdout with "[info] " — extract the bare JSON line
LINE=$(SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_RUNS=5 SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  sbt -batch "runMain graft.Bench" 2>/dev/null | grep -o '{"metric".*}' | tail -1)
[ -n "$LINE" ] || { echo "remeasure: no bench JSON line captured" >&2; exit 1; }

python3 - "$LINE" "$OUT" <<'EOF'
import json, re, sys
line, out = sys.argv[1], sys.argv[2]
bench = json.loads(line)
gates = {}
row = re.compile(r"^\|\s*((?:q|ext|fw|st)[0-9]*[a-z0-9_]*)\s*\|\s*([0-9.]+)\s*(?:\([^|]*\))?\s*\|\s*$")
for l in open("BASELINE.md"):
    m = row.match(l.strip())
    if m:
        gates[m.group(1)] = float(m.group(2))
rec = {"protocol": "median-of-5 idle re-measure (BASELINE.md adjudication)",
       "sf": bench["sf"], "runs_per_query": bench.get("runs_per_query"),
       "queries": {}}
for name, sec in sorted(bench["queries"].items()):
    g = gates.get(name)
    ratio = (sec / g) if g else None
    verdict = None if g is None else ("over" if ratio > 2.0 else "clean")
    rec["queries"][name] = {"median_s": sec, "gate_s": g,
                           "ratio": round(ratio, 3) if ratio else None,
                           "verdict": verdict}
    tag = verdict or "ungated"
    extra = f" ({ratio:.2f}x)" if ratio else ""
    print(f"{name}: {sec:.2f}s vs gate {g if g is not None else '-'} -> {tag}{extra}")
json.dump(rec, open(out, "w"), indent=1)
print(f"adjudication written to {out}")
EOF
