#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs DuckDB on the oracle SQL dumped by graft.Verify and compares with the
Spark result parquet, strictly: columns sorted by name, rows sorted by the
stringified tuple, exact string equality per cell (floats repr'd).
Usage: check.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in idx))
    return sorted(cols), sorted(out)

fails = []
for name, sql in sorted(oracles.items()):
    spark_dir = os.path.join(out_dir, name)
    if not os.path.isdir(spark_dir):
        fails.append((name, "no spark output"))
        continue
    try:
        o = con.execute(sql)
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    try:
        s = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
    except Exception as e:
        fails.append((name, f"spark read error: {e}"))
        continue
    oc, orw = canon(ocols, orows)
    sc, srw = canon(scols, srows)
    if oc != sc:
        fails.append((name, f"schema: spark={sc} oracle={oc}"))
        continue
    if len(orw) != len(srw):
        fails.append((name, f"rowcount: spark={len(srw)} oracle={len(orw)}"))
        continue
    bad = [(a, b) for a, b in zip(srw, orw) if a != b]
    if bad:
        fails.append((name, f"{len(bad)} differing rows; first: spark={bad[0][0]} oracle={bad[0][1]}"))
    else:
        print(f"OK   {name} ({len(srw)} rows)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracles) - len(fails)}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
