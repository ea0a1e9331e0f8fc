#!/usr/bin/env python3
"""Streaming DuckDB oracle compare for giant per-row outputs.

Usage: tools/oracle_except.py [sf_dir] [verify_out_dir] query ...

oracle_check.py replicates the driver's compare exactly (pandas
cell-loop) but materializes both sides in RAM and walks every cell in
Python — infeasible past ~20M rows. The sf100 probe's per-row surfaces
(q25/q28/q54 at 600M rows) need the same EXACT-equality verdict
streamed inside DuckDB instead:

  rows   : COUNT(*) equality,
  schema : sorted column-name equality,
  values : (mine EXCEPT ALL oracle) UNION ALL (oracle EXCEPT ALL mine)
           must be empty, columns projected in sorted-name order on
           both sides.

DuckDB set operations use IS NOT DISTINCT semantics, so NULL==NULL and
NaN==NaN — the same missing-vs-missing tolerance oracle_check.cmp_cell
applies. The one compare this is STRICTER about is NULL-vs-NaN in a
double column (cmp_cell blurs them because the two fetch paths render
NULL doubles differently; here both sides stay native) — a probe query
whose output legitimately mixes them should go through oracle_check.

Honors ORACLE_DUCKDB_MEM / ORACLE_DUCKDB_TMP / ORACLE_DUCKDB_THREADS
like oracle_check.py.
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    argv = list(sys.argv[1:])
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out = argv[1] if len(argv) > 1 else "target/verify"
    only = argv[2:]
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    if os.environ.get("ORACLE_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['ORACLE_DUCKDB_THREADS'])}")
    if os.environ.get("ORACLE_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['ORACLE_DUCKDB_MEM']}'")
    if os.environ.get("ORACLE_DUCKDB_TMP"):
        os.makedirs(os.environ["ORACLE_DUCKDB_TMP"], exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['ORACLE_DUCKDB_TMP']}'")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in only if only else sorted(oracle):
        if name not in oracle:
            print(f"FAIL {name}: no oracle sql")
            n_fail += 1
            continue
        sql = oracle[name]
        mine = f"{out}/{name}/*.parquet"
        try:
            mcols = [r[0] for r in con.execute(
                f"DESCRIBE SELECT * FROM '{mine}'").fetchall()]
            rcols = [r[0] for r in con.execute(
                f"DESCRIBE ({sql})").fetchall()]
            if sorted(mcols) != sorted(rcols):
                print(f"FAIL {name}: columns mine={sorted(mcols)} ref={sorted(rcols)}")
                n_fail += 1
                continue
            proj = ", ".join(f'"{c}"' for c in sorted(mcols))
            nm = con.execute(f"SELECT COUNT(*) FROM '{mine}'").fetchone()[0]
            nr = con.execute(f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
            if nm != nr:
                print(f"FAIL {name}: rows mine={nm} ref={nr}")
                n_fail += 1
                continue
            diff = con.execute(f"""
                SELECT * FROM (
                  (SELECT {proj} FROM '{mine}' EXCEPT ALL SELECT {proj} FROM ({sql}))
                  UNION ALL
                  (SELECT {proj} FROM ({sql}) EXCEPT ALL SELECT {proj} FROM '{mine}')
                ) LIMIT 3""").fetchall()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if diff:
            print(f"FAIL {name}: value diffs, sample rows: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({nm} rows, streamed)", flush=True)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
