#!/usr/bin/env python3
"""Dev-side cross-check of the native SQLite sink against a real sqlite3
build (python stdlib). Not used by any shipped code path — the Scala test
suite round-trips through graft.sink.SqliteDbReader; this script pins the
on-disk format against an independent implementation:

    sbt "Test/runMain graft.sink.SqliteSampleGen /tmp/sample.db"
    python3 scripts/check_sqlite.py /tmp/sample.db
"""
import sqlite3
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sample.db"
con = sqlite3.connect(path)
cur = con.cursor()

ok = True
integrity = cur.execute("PRAGMA integrity_check").fetchall()
print("integrity_check:", integrity)
ok &= integrity == [("ok",)]

tables = cur.execute(
    "SELECT name, rootpage FROM sqlite_master ORDER BY name").fetchall()
print("tables:", tables)

for name, _ in tables:
    n = cur.execute(f'SELECT count(*) FROM "{name}"').fetchone()[0]
    print(f"  {name}: {n} rows")

if any(t[0] == "demo" for t in tables):
    sample = cur.execute(
        "SELECT * FROM demo WHERE i IN (1, 5000, 10000)").fetchall()
    print("demo sample:", sample)
    ok &= sample[0] == (1, "row-1", 1 / 3.0, b"\x01\x02\x03")
    agg = cur.execute("SELECT sum(i) FROM demo").fetchone()[0]
    print("sum(i):", agg)
    ok &= agg == 10000 * 10001 // 2
if any(t[0] == "big" for t in tables):
    lens = cur.execute("SELECT length(s) FROM big").fetchall()
    print("big lens:", lens)
    ok &= lens == [(50000,), (None,)]

print("RESULT:", "OK" if ok else "MISMATCH")
sys.exit(0 if ok else 1)
