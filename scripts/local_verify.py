#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read Verify.scala's output
parquet + oracle_sql.json, run each oracle in DuckDB over the fixture tables,
compare (column-name-sorted, row-sorted, value-canonicalized) frames — AND
column TYPES (DESCRIBE on both sides). The driver's hash is type-sensitive:
a DuckDB HUGEINT (e.g. an uncast sum(BIGINT)) vs Spark BIGINT fails the
driver even when every value matches, and str()-canonicalized values can't
see it. Round 6 shipped three such reds; the type gate catches them here.

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

# The driver's hash is insensitive to int WIDTH (Spark INTEGER vs oracle
# BIGINT is green in CORRECTNESS_r06 for 8 queries) but red the moment a
# value leaves the 64-bit int domain (HUGEINT from an uncast sum(BIGINT)).
# Mirror that: all signed/unsigned ints that fit int64 are one class;
# HUGEINT / DECIMAL / DOUBLE / everything else must match exactly.
INT64_CLASS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "UTINYINT", "USMALLINT", "UINTEGER"}

def tclass(t):
    return "INT<=64" if t in INT64_CLASS else t

def coltypes(query):
    """name -> DuckDB type string, via DESCRIBE (works for any SELECT)."""
    return {r[0]: tclass(r[1])
            for r in con.execute(f"DESCRIBE {query}").fetchall()}

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_side = f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
        wtypes = coltypes(sql)
        gtypes = coltypes(spark_side)
        want = con.execute(sql)
        wcols = [d[0] for d in want.description]
        wrows = want.fetchall()
        got = con.execute(spark_side)
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    wc, wf = frame(wrows, wcols)
    gc, gf = frame(grows, gcols)
    tdiff = [(c, gtypes.get(c), wtypes.get(c)) for c in sorted(set(wtypes) | set(gtypes))
             if gtypes.get(c) != wtypes.get(c)]
    if wc != gc:
        print(f"FAIL {name}: columns {gc} != oracle {wc}")
        fails += 1
    elif tdiff:
        print(f"FAIL {name}: column types (col, spark, oracle): {tdiff}")
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
