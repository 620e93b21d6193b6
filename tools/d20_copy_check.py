#!/usr/bin/env python3
"""d20_allpairs certification at scaled SFs: copy-sharded oracle replay.

The monolithic d20 oracle at sf10 pushes the naive verification join's
full inverted-index pair stream plus the prefix/cand materializations
through one DuckDB pipeline (>100 GB resident, killed before OOM). The
ScaleUp corpus gives an exact decomposition instead: replica documents
are Caesar-cipher images with DISJOINT cross-copy vocabularies, so no
shingle hash — and therefore no candidate pair and no intersection —
ever crosses a copy boundary. That makes the whole join copy-local,
EXCEPT the document-frequency table feeding the rarest-first prefix
order, which is global by definition. So the harness:

  1. materializes the shingle build `g` (with a shard column) and the
     GLOBAL dfreq once, to parquet;
  2. CHECKS the disjointness invariant (zero hashes spanning >1 shard —
     with global dfreq in hand it is the only assumption, so it is
     verified, not assumed). NOTE the shard is the ROTATION CLASS
     `(doc_id // stride) % 26`, not the copy: the ScaleUp cipher rotates
     the alphabet by copy index mod 26, so at K > 26 copies i and i+26
     share a vocabulary — and form REAL cross-copy duplicate pairs —
     while different rotation classes stay disjoint. The first run of
     this harness keyed on the raw copy and the invariant check caught
     exactly that (707,538 spanning hashes at sf10);
  3. replays prefix -> candidates -> merge-count verification per copy
     against the global dfreq, reducing each copy to the same
     order-independent (count, sum-of-row-hashes) fingerprint
     tools/agghash_check.py uses, accumulated in Python;
  4. fingerprints the Spark Verify dump identically and compares.

Usage: python3 tools/d20_copy_check.py <sfDir> <verifyOutDir> <stride> [workers]
"""
import os, sys, glob
import multiprocessing as mp
import duckdb

SF, OUT, STRIDE = sys.argv[1], sys.argv[2], int(sys.argv[3])
WORKERS = int(sys.argv[4]) if len(sys.argv) > 4 else 8
G = os.path.join(OUT, "_d20_g.parquet")
DF = os.path.join(OUT, "_d20_df.parquet")

FINGERPRINT = "SELECT count(*), sum(hash(doc_a, doc_b, inter, jacc, n_a, n_b)) FROM ({q})"

PER_COPY = """
WITH g AS (SELECT * FROM '{g}' WHERE cp = {cp}),
inv AS (SELECT doc_id, unnest(sh) AS h FROM g),
prefix AS MATERIALIZED (
  SELECT doc_id, h FROM (
    SELECT i.doc_id, i.h, g.n_sh,
      row_number() OVER (PARTITION BY i.doc_id ORDER BY d.df, i.h) AS pos
    FROM inv i JOIN '{df}' d USING (h) JOIN g USING (doc_id))
  WHERE pos <= n_sh - ((n_sh + 4) // 5) + 1),
cand AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM prefix x JOIN prefix y ON x.h = y.h AND x.doc_id < y.doc_id),
-- per-pair list_intersect on the sorted sets: the pair-x-shared-gram
-- inverted-index group-by spelling needed >43 GB per shard (OOM-killed);
-- this streams one row per candidate instead
ints AS (
  SELECT c.doc_a, c.doc_b,
    len(list_intersect(ga.sh, gb.sh)) AS inter,
    ga.n_sh AS n_a, gb.n_sh AS n_b
  FROM cand c
  JOIN g ga ON ga.doc_id = c.doc_a
  JOIN g gb ON gb.doc_id = c.doc_b)
SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  floor(inter / CAST(n_a + n_b - inter AS DOUBLE)
    * 10000.0 + 0.5) / 10000.0 AS jacc
FROM ints
WHERE inter / CAST(n_a + n_b - inter AS DOUBLE) >= 0.2
"""


def build():
    con = duckdb.connect()
    p = os.path.join(SF, "documents.parquet")
    pat = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pat}'")
    con.sql(f"""
      COPY (
        SELECT doc_id, (doc_id // {STRIDE}) % 26 AS cp, sh, len(sh) AS n_sh
        FROM (
          SELECT doc_id,
            list_sort(list_distinct(list_transform(
              CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                ELSE CAST([] AS VARCHAR[]) END,
              gm -> CAST(md5_number_lower(gm) & 4611686018427387903 AS BIGINT)))) AS sh
          FROM (SELECT doc_id,
                  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS t
                FROM documents))
      ) TO '{G}' (FORMAT PARQUET)""")
    con.sql(f"""
      COPY (SELECT h, count(*) AS df
            FROM (SELECT doc_id, unnest(sh) AS h FROM '{G}') GROUP BY h)
      TO '{DF}' (FORMAT PARQUET)""")
    cross = con.sql(f"""
      SELECT count(*) FROM (
        SELECT h FROM (SELECT cp, unnest(sh) AS h FROM '{G}')
        GROUP BY h HAVING count(DISTINCT cp) > 1)""").fetchone()[0]
    if cross != 0:
        print(f"FAIL d20_allpairs: {cross} shingle hashes span copies — "
              "copy sharding unsound on this dataset")
        sys.exit(1)
    cps = [r[0] for r in
           con.sql(f"SELECT DISTINCT cp FROM '{G}' ORDER BY cp").fetchall()]
    con.close()
    return cps


def run_copy(cp):
    # hard memory cap + disk spill: a shard that outgrows its budget goes
    # out-of-core instead of taking the OOM killer (and the pool) down
    con = duckdb.connect(config={
        "threads": max(1, 32 // WORKERS),
        "memory_limit": "16GB",
        "temp_directory": os.path.join(OUT, f"_d20_tmp_{cp}")})
    n, h = con.sql(FINGERPRINT.format(
        q=PER_COPY.format(g=G, df=DF, cp=cp))).fetchone()
    con.close()
    return cp, n, (0 if h is None else int(h))


def main():
    cps = build()
    print(f"g + global dfreq built; disjointness OK; {len(cps)} copies",
          flush=True)
    tn, th = 0, 0
    with mp.Pool(WORKERS) as pool:
        for cp, n, h in pool.imap_unordered(run_copy, cps):
            tn += n
            th += h
    con = duckdb.connect()
    spark_glob = os.path.join(OUT, "d20_allpairs", "*.parquet")
    sn, sh = con.sql(FINGERPRINT.format(
        q=f"SELECT * FROM '{spark_glob}'")).fetchone()
    sh = 0 if sh is None else int(sh)
    ssch = sorted((r[0], r[1]) for r in
                  con.sql(f"DESCRIBE SELECT * FROM '{spark_glob}'").fetchall())
    osch = sorted((r[0], r[1]) for r in con.sql(
        "DESCRIBE " + PER_COPY.format(g=G, df=DF, cp=0)).fetchall())
    if osch != ssch:
        print(f"FAIL d20_allpairs: schema oracle={osch} spark={ssch}")
        sys.exit(1)
    if (tn, th) != (sn, sh):
        print(f"FAIL d20_allpairs: oracle=({tn},{th}) spark=({sn},{sh})")
        sys.exit(1)
    print(f"OK   d20_allpairs: {sn} rows, agg-hash match (copy-sharded)")


if __name__ == "__main__":
    main()
