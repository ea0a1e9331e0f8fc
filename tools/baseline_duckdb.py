#!/usr/bin/env python3
"""Single-node local baseline for BASELINE.md: time the headline queries'
DuckDB oracle SQL (the exact same semantics the Spark plans compute)
at a given scale factor. The reference itself is pandas notebooks with no
published figures; DuckDB is a *stronger* single-node baseline than
pandas (vectorized, parallel), so matching it is a conservative claim.

Usage: tools/baseline_duckdb.py [sf_dir] [oracle_sql.json] [reps]
"""
import sys, os, json, time, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

MASK = (1 << 64) - 1


def data_fp(sf_dir):
    """Python twin of graft.DataFp.of — FNV-1a over every LEAF file
    under each sorted top-level *.parquet entry, recursing into
    directory entries with name-sorted children and mixing each leaf's
    (basename, size, mtime-millis) — so a DuckDB baseline artifact
    carries the SAME fingerprint as the Spark Bench artifact it pairs
    with (BASELINE.md round-10 rule). The r12 version only statted
    top-level entries; that matched the Scala walk only because the
    testdata layout happened to be flat single-file parquet (ADVICE
    r12) — a directory-style dataset now fingerprints identically too."""
    h = 1469598103934665603

    def mix_byte(b):
        nonlocal h
        h = ((h ^ (b & 0xFF)) * 1099511628211) & MASK

    def mix_long(x):
        for i in range(8):
            mix_byte((x >> (8 * i)) & 0xFF)

    def walk(p):
        if os.path.isdir(p):
            for child in sorted(os.listdir(p)):
                walk(os.path.join(p, child))
        else:
            for c in os.path.basename(p):
                mix_byte(ord(c))
            st = os.stat(p)
            mix_long(st.st_size)
            mix_long(st.st_mtime_ns // 1_000_000)

    for name in sorted(e for e in os.listdir(sf_dir) if e.endswith(".parquet")):
        walk(os.path.join(sf_dir, name))
    return f"{h:016x}"
HEADLINE = ["q01_agg", "q03_join_agg", "q05_window", "q10_corr",
            "dd_minhash", "sim_brute_topk", "tx_quality", "st_window_agg",
            "dd_winnow_pairs", "sim_ivfpq_topk"]  # ivfpq has no oracle -> skipped

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sql_path = sys.argv[2] if len(sys.argv) > 2 else "target/verify/oracle_sql.json"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracle = json.load(open(sql_path))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    out = {}
    for q in HEADLINE:
        if q not in oracle:
            continue
        times = []
        for _ in range(reps):
            t0 = time.time()
            con.execute(oracle[q]).fetchall()
            times.append(time.time() - t0)
        out[q] = min(times)
    print(json.dumps({"baseline": "duckdb", "sf": sf, "reps": reps,
                      "data_fp": data_fp(sf),
                      "queries": {k: round(v, 3) for k, v in out.items()},
                      "total": round(sum(out.values()), 3)}))

if __name__ == "__main__":
    main()
