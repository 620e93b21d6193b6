#!/usr/bin/env python3
"""Time each DuckDB oracle at a given SF with a per-query wall cap (dev
tool): identifies oracles whose DuckDB spelling doesn't scale, so they can
be re-spelled equivalently before a full check.py pass.

Usage: python3 tools/time_oracles.py <sfDir> <oracleSqlJson> [capSec] [only,names]
"""
import json, sys, glob, os, time, multiprocessing as mp

def run_one(sf, sql, q, out):
    import duckdb
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{pat}'")
    t0 = time.time()
    try:
        n = len(con.sql(sql).fetchall())
        out.put((q, time.time() - t0, n, None))
    except Exception as e:
        out.put((q, time.time() - t0, -1, str(e)[:200]))

if __name__ == "__main__":
    sf, oj = sys.argv[1], sys.argv[2]
    cap = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    oracle = json.load(open(oj))
    for q, sql in sorted(oracle.items()):
        if only and q not in only:
            continue
        out = mp.Queue()
        p = mp.Process(target=run_one, args=(sf, sql, q, out))
        t0 = time.time()
        p.start()
        p.join(cap)
        if p.is_alive():
            p.terminate(); p.join()
            print(f"TIMEOUT {q}: > {cap:.0f}s", flush=True)
        else:
            q2, dt, n, err = out.get()
            print(f"{'ERR ' if err else 'ok  '} {q2}: {dt:6.1f}s rows={n} {err or ''}",
                  flush=True)
