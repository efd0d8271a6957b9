#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet result,
run the matching oracle SQL (from oracle_sql.json) in DuckDB against the
raw tables in <sfDir>, canonicalize both (columns sorted by name, rows
sorted), and compare row counts, schemas and values.
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_skip = 0
    for name in names:
        res_glob = os.path.join(out_dir, name, "*.parquet")
        try:
            sdf = con.execute(f"SELECT * FROM '{res_glob}'")
            s_cols = [c[0] for c in sdf.description]
            s_rows = sdf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "SKIP(rows-only)" if len(s_rows) > 0 else "FAIL(rows=0)"
            if len(s_rows) > 0:
                n_skip += 1
            else:
                n_fail += 1
            print(f"{status} {name}: {len(s_rows)} rows, no oracle")
            continue
        try:
            odf = con.execute(oracles[name])
            o_cols = [c[0] for c in odf.description]
            o_rows = odf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: schema mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1
            continue
        cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if cs != co:
            diffs = [(a, b) for a, b in zip(cs, co) if a != b]
            print(f"FAIL {name}: {len(diffs)} differing rows; first: spark={diffs[0][0][:120]!r} oracle={diffs[0][1][:120]!r}")
            print(f"     cols sorted: {sorted(s_cols)}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(s_rows)} rows")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
