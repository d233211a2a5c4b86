#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: compare Verify.scala's parquet
dumps against DuckDB running the oracle SQL on the same fixture tables.

Usage: python3 scripts/oracle_check.py [sfDir] [outDir]
"""
import sys, json, glob, os, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)  # full precision repr — exact-match check
    return str(v)

fails, passes, skips = [], [], []
for name in sorted(oracle):
    pq = f"{outdir}/{name}"
    if not os.path.isdir(pq):
        skips.append(name); continue
    try:
        dd = con.execute(oracle[name]).fetchall()
        ddcols = [d[0] for d in con.description]
    except Exception as e:
        fails.append((name, f"duckdb error: {e}")); continue
    ddtypes = dict(zip(ddcols, [str(t) for t in
        con.execute("DESCRIBE " + oracle[name]).fetchall() and
        [r[1] for r in con.execute("DESCRIBE " + oracle[name]).fetchall()]]))
    sp = con.execute(f"SELECT * FROM '{pq}/*.parquet'").fetchall()
    spcols = [d[0] for d in con.description]
    if sorted(ddcols) != sorted(spcols):
        fails.append((name, f"schema: spark={sorted(spcols)} duck={sorted(ddcols)}")); continue
    sptypes = {r[0]: r[1] for r in
               con.execute(f"DESCRIBE SELECT * FROM '{pq}/*.parquet'").fetchall()}
    tmis = {c: (sptypes.get(c), ddtypes.get(c)) for c in ddcols
            if sptypes.get(c) != ddtypes.get(c)}
    if tmis:
        print(f"TYPEWARN {name}: {tmis}")
    # The driver compares with pandas sort_values, which throws
    # "unhashable type" on numpy-array cells (r13: q168/q177/q181).
    # Mirror that contract: raw LIST/ARRAY/STRUCT columns on either
    # side are a FAIL here — stringify them in the query (the q41
    # array_join / array_to_string convention).
    nested = {c: (sptypes.get(c), ddtypes.get(c)) for c in ddcols
              if any(t and ("[]" in t or "STRUCT" in t or "MAP" in t)
                     for t in (sptypes.get(c), ddtypes.get(c)))}
    if nested:
        fails.append((name, f"raw nested column(s) {nested} — the driver's "
                      "pandas compare cannot sort these; stringify per the "
                      "q41 convention")); continue
    # driver sorts columns by name; do the same, then sort rows
    dperm = sorted(range(len(ddcols)), key=lambda i: ddcols[i])
    sperm = sorted(range(len(spcols)), key=lambda i: spcols[i])
    drows = sorted(tuple(norm(r[i]) for i in dperm) for r in dd)
    srows = sorted(tuple(norm(r[i]) for i in sperm) for r in sp)
    if len(drows) != len(srows):
        fails.append((name, f"rowcount: spark={len(srows)} duck={len(drows)}")); continue
    bad = [(a, b) for a, b in zip(srows, drows) if a != b]
    if bad:
        fails.append((name, f"{len(bad)}/{len(srows)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}"))
    else:
        passes.append(name)

for n in passes: print(f"PASS {n}")
for n in skips: print(f"SKIP {n} (no spark output)")
for n, why in fails: print(f"FAIL {n}: {why}")
print(f"\n{len(passes)} pass, {len(fails)} fail, {len(skips)} skip")
sys.exit(1 if fails else 0)
