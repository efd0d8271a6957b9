#!/usr/bin/env python3
"""Compare a graft.Bench full artifact against the frozen BASELINE.md gates.

Usage: python3 tools/gate_check.py [bench_json] [baseline_md]

Gates are parsed from every `| <query> | <seconds> |` table row in
BASELINE.md; the LAST occurrence of a query wins (later sections are
re-freezes). Prints per-query over-gate rows (ratio > 2x), the median /
p90 ratio over the gated set, and the queries with no gate yet (the
round's additions — candidates for a freeze section).

`parse_gates` is importable (tools/remeasure.sh uses it), so the drift
guards — malformed-row warnings and the parsed-gate floor — protect
every consumer, not just this script.
"""
import json, re, statistics, sys

# the seconds cell may carry an annotation: `| ext79_pagerank | 3.60 (post ... fix) |`
# The name group uses the SAME anchor as TWOCELL ((q|ext|st)<digits> or fw_):
# the looser (?:q|ext|fw|st)[0-9]* would ingest any word starting with
# q/st/ext/fw (e.g. 'steps') from a two-cell table as a gate (ADVICE r8).
ROW = re.compile(r"^\|\s*((?:(?:q|ext|st|tpch)[0-9]+|fw_)[a-z0-9_]*)\s*\|\s*([0-9.]+)\s*(?:\([^|]*\))?\s*\|\s*$")
# any TWO-cell row keyed by a query name is gate-shaped; one that then
# fails the seconds parse is format drift and must be LOUD, not silently
# ungated (ADVICE r7). Multi-cell rows (ScaleCheck tables) are exempt —
# they are not gate tables.
TWOCELL = re.compile(
    r"^\|\s*((?:(?:q|ext|st|tpch)[0-9]+|fw_)[a-z0-9_]*)\s*\|([^|]*)\|\s*$")
GATE_FLOOR = 100


def parse_gates(md_path="BASELINE.md"):
    """Parse the frozen gates; warn on gate-shaped rows that fail the
    seconds parse and exit(1) if the table parses (near-)empty — the
    catastrophic failure mode is reporting everything as happily
    ungated after a silent format change."""
    gates = {}
    for line in open(md_path):
        s = line.strip() if line.strip().endswith("|") else line
        m = ROW.match(s)
        if m:
            gates[m.group(1)] = float(m.group(2))
        else:
            t = TWOCELL.match(s)
            if t:
                print(f"WARNING: gate-shaped row for {t.group(1)!r} has "
                      f"unparseable seconds cell {t.group(2).strip()!r} — fix "
                      f"the BASELINE.md row or the parser", file=sys.stderr)
    if len(gates) < GATE_FLOOR:
        print(f"ERROR: parsed only {len(gates)} gates from {md_path} "
              f"(expected >= {GATE_FLOOR}) — BASELINE.md format drift?",
              file=sys.stderr)
        sys.exit(1)
    return gates


# A 1-minute loadavg at BENCH START above this means other work was
# running in the minute before the bench began — its early queries are
# not comparable to an idle-box gate. (End-of-run loadavg is dominated
# by the bench's own local[32] work and is printed for context only.)
CONTENDED_LOAD = 4.0
# max/min spread across a query's own runs beyond this means one run was
# an outlier — transient contention the median-of-3 only partly absorbs.
NOISY_SPREAD = 1.8


def annotate(bench, name):
    """Self-adjudication (r10 verdict #1): classify an over-gate row as
    'contended'/'noisy' (→ remeasure before believing it) using the load
    and per-query spread fields graft.Bench records in the artifact.
    Returns a suffix string ('' when the row has no innocent explanation
    and should be treated as a real regression)."""
    notes = []
    load = bench.get("loadavg_start")
    if load and load[0] > CONTENDED_LOAD:
        notes.append(f"contended run (loadavg_start={load[0]:.2f})")
    spread = (bench.get("spread") or {}).get(name)
    if spread is not None and float(spread) > NOISY_SPREAD:
        notes.append(f"noisy runs (max/min {float(spread):.2f}x)")
    return f"  [{'; '.join(notes)} — remeasure, not red]" if notes else ""


def check(bench, gates):
    """Core comparison, separated from I/O so tools/test_gate_check.py can
    drive it with a synthetic artifact. Returns (lines, n_over, n_red)
    where n_red counts over-gate rows with NO contention/noise excuse."""
    qs = {k: v for k, v in bench["queries"].items() if v >= 0}
    ratios, over, ungated = [], [], []
    for name, sec in sorted(qs.items()):
        if name in gates:
            r = sec / gates[name] if gates[name] > 0 else float("inf")
            ratios.append(r)
            if r > 2.0:
                over.append((name, sec, gates[name], r))
        else:
            ungated.append((name, sec))

    lines = []
    load_s, load_e = bench.get("loadavg_start"), bench.get("loadavg_end")
    if load_s or load_e:
        lines.append(f"loadavg: start={load_s} end={load_e}")
    lines.append(f"gated queries: {len(ratios)}; ungated (new this round): {len(ungated)}")
    if ratios:
        rs = sorted(ratios)
        lines.append(f"median ratio {statistics.median(rs):.2f}x  p90 {rs[int(len(rs)*0.9)]:.2f}x  max {rs[-1]:.2f}x")
    lines.append(f"over-gate rows (>2x): {len(over)}")
    n_red = 0
    for n, s, g, r in sorted(over, key=lambda x: -x[3]):
        note = annotate(bench, n)
        if not note:
            n_red += 1
        lines.append(f"  OVER {n}: {s:.2f}s vs gate {g:.2f}s ({r:.2f}x){note}")
    if ungated:
        lines.append("new-query medians (freeze these):")
        for n, s in ungated:
            lines.append(f"  | {n} | {s:.2f} |")
    return lines, len(over), n_red


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench/BENCH_full_sf0.1.json"
    md_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"
    gates = parse_gates(md_path)
    bench = json.load(open(bench_path))
    lines, _, _ = check(bench, gates)
    print("\n".join(lines))


if __name__ == "__main__":
    main()
