#!/usr/bin/env python3
"""Aggregate-hash correctness compare for results too large to materialize
(dev tool only — the shipped Scala library has no Python dependency).

The plain tools/check.py pulls both sides into pandas; at sf10 a query
like q24_range_join produces hundreds of millions of rows and the COMPARE
— not the operator — becomes the bottleneck. Here nothing corpus-sized
ever leaves DuckDB: both sides reduce to (row_count, sum-of-row-hashes)
INSIDE the engine, an order-independent fingerprint, and only the two
64/128-bit aggregates are compared. Schema (column names + types) is
still compared exactly, so this is the same gate minus per-cell diffs.

Usage: python3 tools/agghash_check.py <sfDir> <verifyOutDir> [q1,q2,...]
"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{pat}'")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fails = 0
for q, sql in sorted(oracle.items()):
    if only is not None and q not in only:
        continue
    spark_dir = os.path.join(out, q)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {q}: no spark output"); fails += 1; continue
    try:
        con.sql(f"CREATE OR REPLACE VIEW _o AS ({sql})")
        con.sql(f"CREATE OR REPLACE VIEW _s AS SELECT * FROM '{spark_dir}/*.parquet'")
        osch = sorted([(r[0], r[1]) for r in con.sql("DESCRIBE _o").fetchall()])
        ssch = sorted([(r[0], r[1]) for r in con.sql("DESCRIBE _s").fetchall()])
    except Exception as e:
        print(f"FAIL {q}: setup error {e}"); fails += 1; continue
    if osch != ssch:
        print(f"FAIL {q}: schema oracle={osch} spark={ssch}"); fails += 1; continue
    cols = ", ".join(f'"{c}"' for c, _ in osch)
    def agg(view):
        # hash() is per-row over the name-sorted columns; sum is
        # order-independent and overflow-free (UBIGINT sums to HUGEINT)
        return con.sql(
            f"SELECT count(*), sum(hash({cols})) FROM {view}").fetchone()
    try:
        on, oh = agg("_o")
        sn, sh = agg("_s")
    except Exception as e:
        print(f"FAIL {q}: agg error {e}"); fails += 1; continue
    if on != sn:
        print(f"FAIL {q}: rows oracle={on} spark={sn}"); fails += 1
    elif oh != sh:
        print(f"FAIL {q}: row-hash sum mismatch over {on} rows"); fails += 1
    else:
        print(f"OK   {q}: {on} rows, agg-hash match")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
