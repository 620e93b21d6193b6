#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tool only — the
shipped Scala library has no Python dependency).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [q1,q2,...]

For each query in <verifyOutDir>/oracle_sql.json (optionally restricted to
the comma-separated third arg, for scoped scaled-SF certification runs):
run the oracle in DuckDB against <sfDir>/*.parquet views, load the Spark
parquet result, sort columns by name + rows by all columns, and diff."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver testdata ships single files; ScaleUp output is a Spark
    # directory of part files — both are one table
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
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {q}: oracle error {e}"); fails += 1; continue
    sdf = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    o, s = norm(odf), norm(sdf)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {q}: cols oracle={list(o.columns)} spark={list(s.columns)}"); fails += 1; continue
    if len(o) != len(s):
        print(f"FAIL {q}: rows oracle={len(o)} spark={len(s)}"); fails += 1; continue
    # The driver's result hash is TYPE-sensitive: a dtype divergence
    # (e.g. Spark decimal128 vs oracle DOUBLE) is value-identical here
    # but hash-red on the driver. Fail on dtype mismatch by default;
    # GRAFT_CHECK_LAX=1 restores the old values-only compare.
    lax = os.environ.get("GRAFT_CHECK_LAX") == "1"
    dtype_mismatch = [(c, str(o[c].dtype), str(s[c].dtype)) for c in o.columns
                      if str(o[c].dtype) != str(s[c].dtype)]
    if dtype_mismatch and not lax:
        print(f"FAIL {q}: dtype mismatch (oracle vs spark): {dtype_mismatch}")
        fails += 1; continue
    try:
        pd.testing.assert_frame_equal(o, s, check_dtype=not lax, check_exact=True)
        note = f" (dtype diff: {dtype_mismatch})" if dtype_mismatch else ""
        print(f"OK   {q}: {len(o)} rows{note}")
    except AssertionError as e:
        print(f"FAIL {q}: value mismatch: {str(e)[:400]}")
        fails += 1
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
