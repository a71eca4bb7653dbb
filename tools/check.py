#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev harness only — the
Scala library never imports this). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
Runs each oracle_sql.json query in DuckDB over the same parquet tables,
loads the Spark result parquet, sorts columns by name + rows by all
columns, and compares values exactly."""
import sys, json, math, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)  # exact shortest-repr, distinguishes ties
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        s = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_rows, s_cols = s.fetchall(), [d[0] for d in s.description]
        d = con.execute(oracle[name])
        d_rows, d_cols = d.fetchall(), [dd[0] for dd in d.description]
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    sc, sr = canon(s_rows, s_cols)
    dc, dr = canon(d_rows, d_cols)
    if sc != dc:
        print(f"FAIL {name}: schema spark={sc} duck={dc}"); fails += 1; continue
    if len(sr) != len(dr):
        print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}"); fails += 1; continue
    if sr != dr:
        bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}"); fails += 1; continue
    print(f"PASS {name} ({len(sr)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
