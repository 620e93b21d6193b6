#!/usr/bin/env python3
"""Regenerate CORRECTNESS_zipf.json: the realistic-vocabulary dedup board.

The driver testdata's ~30-word vocabulary is the dedup algorithms'
pathological regime; the published economics (d20 prefix pruning, d19 OPH
recall) are measured on tools/ZipfCorpus's deterministic 50k-word Zipfian
corpus instead. This tool makes that certification a committed per-round
artifact rather than PLANS.md prose: it generates the standing corpus,
runs the dedup family through graft.Verify, replays every DuckDB oracle
with tools/check.py, runs tools/DedupEconomics, and writes one JSON board.

One-liner (from the repo root, after sbt compile):

    python3 tools/zipf_board.py            # 5000 docs, the standard board
    python3 tools/zipf_board.py 500        # quick variant

Exit 1 if any query fails its oracle replay.
"""
import json, os, re, subprocess, sys

NDOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
QUERIES = ("d1_exact_dedup,d2_ngram_jaccard,d3_minhash_lsh,d8_span_dedup,"
           "d9_containment,d12_lsh_eval,d13_threshold_sweep,"
           "d18_span_dedup32,d19_oph_minhash,d20_allpairs,d21_exactsubstr")
CORPUS = f"/tmp/zipf_board_{NDOCS}"
VOUT = f"/tmp/zipf_board_verify_{NDOCS}"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, **kw):
    print("+ " + " ".join(args), flush=True)
    return subprocess.run(args, cwd=ROOT, check=True, **kw)


def main():
    run(["tools/run_main.sh", "graft.tools.ZipfCorpus", CORPUS, str(NDOCS)])
    run(["tools/run_main.sh", "graft.Verify", CORPUS, VOUT, QUERIES])
    chk = subprocess.run(
        ["python3", "tools/check.py", CORPUS, VOUT, QUERIES],
        cwd=ROOT, capture_output=True, text=True)
    print(chk.stdout, end="", flush=True)
    rows = {}
    for line in chk.stdout.splitlines():
        m = re.match(r"(OK|FAIL)\s+(\S+?):\s*(?:(\d+) rows)?", line)
        if m:
            rows[m.group(2)] = {
                "ok": m.group(1) == "OK",
                "rows": int(m.group(3)) if m.group(3) else None}
    econ_out = run(["tools/run_main.sh", "graft.tools.DedupEconomics",
                    CORPUS], capture_output=True, text=True)
    econ_line = [l for l in econ_out.stdout.splitlines()
                 if l.startswith("{")][-1]
    board = {
        "corpus": {"generator": "graft.tools.ZipfCorpus", "n_docs": NDOCS,
                   "vocab": 50000, "seed": 42, "dir": CORPUS,
                   "regenerate": f"python3 tools/zipf_board.py {NDOCS}"},
        "queries": {q: rows.get(q, {"ok": False, "rows": None})
                    for q in QUERIES.split(",")},
        "economics": json.loads(econ_line),
    }
    ok = all(v["ok"] for v in board["queries"].values())
    board["all_ok"] = ok
    with open(os.path.join(ROOT, "CORRECTNESS_zipf.json"), "w") as f:
        json.dump(board, f, indent=1)
        f.write("\n")
    print(("ALL OK" if ok else "FAILURES") + " -> CORRECTNESS_zipf.json",
          flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
