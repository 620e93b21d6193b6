#!/usr/bin/env python3
"""v16_knn_join certification at scaled SFs: cell-sharded oracle replay.

The v16 DuckDB twin is a within-cell kNN self-join: after the global IVF
build (CTEs e -> seeds -> a0 -> refined -> corpus), every downstream row
depends ONLY on vectors of one cell (pairs join USING (cell); the bound
and rank windows partition by vec_id, and a vec_id lives in exactly one
cell). A monolithic run must stream the full Sigma|cell|^2 pair bill
through one pipeline — at sf10 that is ~2.5e9 pairs twice, which DuckDB
executes on ~2 effective cores (the probe pipeline is one hash join) and
tens of GB of window state. Sharding by cell makes the replay
embarrassingly parallel and memory-bounded: the global corpus is
materialized ONCE (cheap: |corpus| x 16 centroid dots), then each cell's
top-3 result is computed independently and reduced to the same
order-independent (count, sum-of-row-hashes) fingerprint
tools/agghash_check.py uses, accumulated across cells in Python. The
Spark side is fingerprinted identically from the Verify dump. Column
order inside hash() is name-sorted (nbr_id, rnk, sim, vec_id) to match
agghash_check exactly.

Usage: python3 tools/v16_cell_check.py <sfDir> <verifyOutDir> [workers]
"""
import json, os, sys, glob
import multiprocessing as mp
import duckdb

SF, OUT = sys.argv[1], sys.argv[2]
WORKERS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
CORPUS = os.path.join(OUT, "_v16_corpus.parquet")

# hash columns in name-sorted order == agghash_check's sorted DESCRIBE
FINGERPRINT = """
SELECT count(*), sum(hash(nbr_id, rnk, sim, vec_id)) FROM ({q})
"""

# The per-cell replay is the SHIPPED twin's bound->rk->select tail, textually
# extracted from oracle_sql.json (same discipline as the corpus CTE chain in
# build_corpus) so the harness can never drift from the shipped v16 oracle.
# The only edits are mechanical: the global corpus CTE chain is replaced by a
# single-cell scan of the materialized corpus parquet, and the final global
# ORDER BY is dropped (fingerprints are order-independent).
PER_CELL = None  # loaded lazily (per process, so spawn-start workers work too)


def load_per_cell():
    # Lazy + idempotent: called in the parent AND at the top of each
    # worker task. Under fork-start pools the workers inherit the parent's
    # PER_CELL; under spawn (macOS/Windows default) module globals are NOT
    # inherited, so each worker re-derives it from oracle_sql.json.
    global PER_CELL
    if PER_CELL is not None:
        return
    sql = json.load(open(os.path.join(OUT, "oracle_sql.json")))["v16_knn_join"]
    cut = sql.index(",\nbound AS MATERIALIZED")
    tail = sql[cut + 2:].rstrip()
    order = "ORDER BY vec_id, rnk"
    assert tail.endswith(order), "v16 oracle tail changed shape; re-derive"
    PER_CELL = ("WITH corpus AS (SELECT * FROM '{corpus}' "
                "WHERE cell = {cell}),\n" + tail[: -len(order)].rstrip())


def build_corpus():
    """Materialize the GLOBAL IVF build (the oracle's e->corpus CTE chain,
    textually extracted from oracle_sql.json so the build can never drift
    from the shipped twin) into a parquet the per-cell workers share."""
    sql = json.load(open(os.path.join(OUT, "oracle_sql.json")))["v16_knn_join"]
    cut = sql.index(",\nbound AS MATERIALIZED")
    ctes = sql[:cut]  # "WITH e AS ..., corpus AS MATERIALIZED (...)"
    con = duckdb.connect()
    for p in glob.glob(os.path.join(SF, "*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{pat}'")
    con.sql(f"COPY ({ctes} SELECT * FROM corpus) TO '{CORPUS}' (FORMAT PARQUET)")
    cells = con.sql(
        f"SELECT cell, count(*) FROM '{CORPUS}' GROUP BY 1 ORDER BY 2 DESC"
    ).fetchall()
    con.close()
    return cells


def run_cell(cell):
    load_per_cell()
    con = duckdb.connect(config={"threads": max(1, 32 // WORKERS)})
    n, h = con.sql(
        FINGERPRINT.format(q=PER_CELL.format(corpus=CORPUS, cell=cell))
    ).fetchone()
    con.close()
    return cell, n, (0 if h is None else int(h))


def main():
    load_per_cell()
    cells = build_corpus()
    print(f"corpus built: {len(cells)} cells, sizes "
          f"{[c[1] for c in cells[:4]]}...{[c[1] for c in cells[-2:]]}",
          flush=True)
    total_n, total_h = 0, 0
    with mp.Pool(WORKERS) as pool:
        for cell, n, h in pool.imap_unordered(run_cell, [c[0] for c in cells]):
            total_n += n
            total_h += h
            print(f"  cell {cell}: {n} rows", flush=True)
    con = duckdb.connect()
    spark_glob = os.path.join(OUT, "v16_knn_join", "*.parquet")
    sn, sh = con.sql(
        FINGERPRINT.format(q=f"SELECT * FROM '{spark_glob}'")).fetchone()
    sh = 0 if sh is None else int(sh)
    # same schema gate as agghash_check: name-sorted (name, dtype) pairs
    ssch = sorted((r[0], r[1]) for r in
                  con.sql(f"DESCRIBE SELECT * FROM '{spark_glob}'").fetchall())
    osch = sorted((r[0], r[1]) for r in con.sql(
        "DESCRIBE " + PER_CELL.format(corpus=CORPUS, cell=0)).fetchall())
    if osch != ssch:
        print(f"FAIL v16_knn_join: schema oracle={osch} spark={ssch}")
        sys.exit(1)
    if (total_n, total_h) != (sn, sh):
        print(f"FAIL v16_knn_join: oracle=({total_n},{total_h}) "
              f"spark=({sn},{sh})")
        sys.exit(1)
    print(f"OK   v16_knn_join: {sn} rows, agg-hash match (cell-sharded)")


if __name__ == "__main__":
    main()
