#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify.scala's output
parquet + oracle_sql.json, run each oracle in DuckDB over the fixture tables,
compare (column-name-sorted, row-sorted, value-canonicalized) frames.

Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            v = 0.0  # normalize -0.0 (engines may disagree on the sign of zero)
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)

def frame(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(canon(r[i]) for i in idx) for r in rows)
    return [cols[i] for i in idx], out

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql)
        wcols = [d[0] for d in want.description]
        wrows = want.fetchall()
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    wc, wf = frame(wrows, wcols)
    gc, gf = frame(grows, gcols)
    if wc != gc:
        print(f"FAIL {name}: columns {gc} != oracle {wc}")
        fails += 1
    elif wf != gf:
        diffs = [(a, b) for a, b in zip(gf, wf) if a != b][:3]
        print(f"FAIL {name}: rows {len(gf)} vs {len(wf)}; first diffs: {diffs}")
        fails += 1
    else:
        print(f"OK   {name}: {len(gf)} rows")
if fails:
    sys.exit(1)
print("ALL GREEN")
