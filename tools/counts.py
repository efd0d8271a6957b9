#!/usr/bin/env python3
"""Derive the per-category query tallies from a Verify output directory
(the same names the driver's CORRECTNESS artifact keys) — the r7 verdict
fix for hand-maintained counts drifting from the artifact (89+93+31+33
was prose-published as 244).

Usage: python3 tools/counts.py <verifyOutDir>
Prints: `q N  ext N  fw N  st N  total N` plus the BASELINE.md-ready
sentence fragment.

The dir argument is REQUIRED (r10 verdict #8): a stale default dir once
printed 353 vs the true 376 — the tally must be byte-derived from the
round's actual final verify dir, named explicitly.
"""
import json, os, re, sys

if len(sys.argv) < 2:
    sys.exit("usage: tools/counts.py <verifyOutDir>  (the round's FINAL "
             "full-sweep dir — no default, a stale dir understates the tally)")
out_dir = sys.argv[1]
sql = os.path.join(out_dir, "oracle_sql.json")
if os.path.exists(sql):
    with open(sql) as f:
        oracled = set(json.load(f).keys())
else:
    oracled = set()
# Verify writes one parquet DIRECTORY per query, named by the query.
# Anchor to the REAL naming scheme (q/ext/st + digits, or fw_): a loose
# prefix match would count a helper dir like "state" or "query_logs" as
# a query — exactly the tally drift this tool exists to stop.
names = sorted(
    n for n in os.listdir(out_dir)
    if os.path.isdir(os.path.join(out_dir, n))
    and re.match(r"^(?:(?:q|ext|st|tpch)[0-9]+[a-z0-9_]*|fw_[a-z0-9_]+)$", n))
if not names:
    sys.exit(f"no per-query output dirs under {out_dir} — run graft.Verify first")

cats = {}
for n in names:
    for p in ("tpch", "ext", "fw", "st", "q"):  # longest prefixes first
        if n.startswith(p):
            cats[p] = cats.get(p, 0) + 1
            break
rows_only = [n for n in names if n not in oracled]
print("  ".join(f"{p} {cats.get(p, 0)}" for p in ("q", "ext", "fw", "st", "tpch"))
      + f"  total {len(names)}")
print(f"value-oracled {len(names) - len(rows_only)}, "
      f"rows-only {len(rows_only)}: {', '.join(rows_only)}")
print(f"prose: \"{len(names)}-query surface: {cats.get('q',0)} relational, "
      f"{cats.get('ext',0)} ext, {cats.get('fw',0)} fw, {cats.get('st',0)} streaming, "
      f"{cats.get('tpch',0)} tpch\"")
