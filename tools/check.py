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
        s_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        s_df = s_rel.df()
        s_rows = [tuple(r) for r in s_df.itertuples(index=False, name=None)]
        s_cols, s_dtypes = list(s_df.columns), [str(t) for t in s_df.dtypes]
        d_rel = con.sql(oracle[name])
        d_df = d_rel.df()
        d_rows = [tuple(r) for r in d_df.itertuples(index=False, name=None)]
        d_cols, d_dtypes = list(d_df.columns), [str(t) for t in d_df.dtypes]
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    sc, sr = canon(s_rows, s_cols)
    dc, dr = canon(d_rows, d_cols)
    if sc != dc:
        print(f"FAIL {name}: schema spark={sc} duck={dc}"); fails += 1; continue
    # Dtype-KIND-sensitive compare: the driver hashes pandas frames, so an
    # int128(HUGEINT)->float64/object column vs Spark's int64 fails its
    # gate even when stringified values agree. Integer WIDTH differences
    # (Spark int32 row_number vs DuckDB int64) are known-tolerated by the
    # driver (r4 evidence: those rows were green), so compare kinds only.
    def kind(t):
        if t.startswith(("int", "uint")): return "int"
        if t.startswith("float"): return "float"
        if t.startswith("datetime"): return "datetime"
        return t  # bool, object, ...
    s_dt = [kind(t) for _, t in sorted(zip(s_cols, s_dtypes))]
    d_dt = [kind(t) for _, t in sorted(zip(d_cols, d_dtypes))]
    if s_dt != d_dt:
        print(f"FAIL {name}: dtype spark={list(zip(sc, s_dt))} duck={list(zip(dc, d_dt))}")
        fails += 1; continue
    if len(sr) != len(dr):
        print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}"); fails += 1; continue
    if sr != dr:
        bad = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {bad}"); fails += 1; continue
    print(f"PASS {name} ({len(sr)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
