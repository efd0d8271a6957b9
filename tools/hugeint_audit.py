#!/usr/bin/env python3
"""Driver-hasher defense: flag oracle SQL whose FINAL output contains a
DuckDB type the driver's hasher may canonicalize differently than Spark's
(HUGEINT from integer sum()/products, DECIMAL from un-rounded arithmetic).

The ext24 flake (round 5): rows/schema matched but hash_match=false because
a windowed sum() widened to HUGEINT while Spark emitted BIGINT. Every
emitted column must land on a type both engines render identically:
BIGINT/INT, DOUBLE, VARCHAR, BOOLEAN, DATE, TIMESTAMP, or arrays/structs
thereof.

Usage: python3 tools/hugeint_audit.py <sfDir> <verifyOutDir>
(reads <verifyOutDir>/oracle_sql.json written by graft.Verify)
"""
import json, os, re, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

RISKY = re.compile(r"HUGEINT|INT128|DECIMAL|UHUGEINT")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_flag = 0
    for name in sorted(oracles):
        try:
            rel = con.sql(f"SELECT * FROM ({oracles[name]}) q LIMIT 0")
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {str(e).splitlines()[0]}")
            n_flag += 1
            continue
        bad = [(c, t) for c, t in cols if RISKY.search(t)]
        if bad:
            print(f"FLAG {name}: {bad}")
            n_flag += 1
    print(f"audited {len(oracles)} oracles, flagged {n_flag}")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
