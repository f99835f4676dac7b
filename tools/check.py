#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output in
OUTDIR (written by graft.Verify), run the matching oracle SQL from
oracle_sql.json in DuckDB over the same sf tables and compare row count,
schema shape, and values (rows sorted, columns sorted by name).

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import sys, os, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s
    if isinstance(v, bytes): return v.hex()
    return v

fails, okc, skipped = [], 0, 0
for name in sorted(oracle):
    sql = oracle[name]
    res_path = os.path.join(outdir, name)
    if not os.path.isdir(res_path):
        fails.append((name, "NO SPARK OUTPUT")); continue
    try:
        got = con.sql(f"SELECT * FROM '{res_path}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"read spark output failed: {e}")); continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle SQL failed: {str(e)[:200]}")); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"schema mismatch: spark={gc} oracle={ec}")); continue
    dt = [(c, str(got[c].dtype), str(exp[c].dtype)) for c in gc
          if str(got[c].dtype) != str(exp[c].dtype)]
    if dt:
        fails.append((name, f"dtype mismatch: {dt}")); continue
    if len(got) != len(exp):
        fails.append((name, f"row count: spark={len(got)} oracle={len(exp)}")); continue
    g = [tuple(norm(v) for v in row) for row in got[gc].itertuples(index=False)]
    e = [tuple(norm(v) for v in row) for row in exp[ec].itertuples(index=False)]
    try:
        g.sort(); e.sort()
    except TypeError:
        g = sorted(g, key=repr); e = sorted(e, key=repr)
    bad = [(a, b) for a, b in zip(g, e) if a != b]
    if bad:
        fails.append((name, f"{len(bad)}/{len(g)} rows differ; first: spark={bad[0][0]} oracle={bad[0][1]}"))
    else:
        okc += 1
        print(f"OK    {name} ({len(g)} rows)")

for name, msg in fails:
    print(f"FAIL  {name}: {msg}")
print(f"\n{okc} ok, {len(fails)} failed, {len(oracle)} total oracles")
sys.exit(1 if fails else 0)
