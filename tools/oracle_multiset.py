#!/usr/bin/env python3
"""Constant-memory DuckDB oracle compare for surfaces too large even for
oracle_except.py's EXCEPT ALL (which builds hash tables of BOTH sides —
at q36_melt's 1.8B rows that spills past this box's free disk).

Verdict = rows + schema + an ORDER-INDEPENDENT multiset fingerprint:
  SUM(CAST(hash(struct_pack(cols...)) AS HUGEINT))  over each side,
one streaming scan per side, no joins, no sorts, O(1) memory. Both
sides are evaluated by the SAME DuckDB process (the Spark dump is read
back as parquet), so value rendering/typing is engine-consistent; the
only lossy step is the 64-bit row hash, whose accidental-collision
mass at n=2^31 rows is ~n^2/2^64 per-pair cancellation — and a
cancellation would additionally have to keep COUNT(*) equal. This is a
row-level exact-multiset check for engineering purposes, not an
adversarial MAC.

Columns are projected in sorted-name order and CAST to the Spark
dump's types on the oracle side (DuckDB sums/integers often arrive as
HUGEINT/DECIMAL where Spark wrote BIGINT/DOUBLE).

Usage: tools/oracle_multiset.py <sf_dir> <verify_out_dir> query ...
Honors ORACLE_DUCKDB_MEM / ORACLE_DUCKDB_TMP / ORACLE_DUCKDB_THREADS.
"""
import sys, os, json, re
import duckdb


def strip_trailing_order_by(sql):
    """Drop the outermost query's trailing ORDER BY: the fingerprint is
    order-independent, but DuckDB executes an inner ORDER BY even under
    an aggregate-only parent (measured r13: q36_melt's 1.8B-row sort
    spilled ~50 GB of temp for a verdict that never looks at order).
    Only a clause at the very end of the statement is stripped ([^)]*$
    cannot cross a subquery boundary), and never when a LIMIT — or its
    standard-SQL spellings OFFSET / FETCH FIRST, which equally make the
    result set order-dependent — hangs off it (that would change the
    result set)."""
    m = re.search(r"\sORDER\s+BY[^)]*$", sql, re.IGNORECASE)
    if m and not re.search(r"\b(LIMIT|OFFSET|FETCH)\b", m.group(0), re.IGNORECASE):
        return sql[:m.start()]
    return sql

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
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
    for name in only:
        sql = oracle.get(name)
        if not sql:
            print(f"FAIL {name}: no oracle sql")
            n_fail += 1
            continue
        sql = strip_trailing_order_by(sql)
        mine = f"{out}/{name}/*.parquet"
        try:
            mdesc = con.execute(f"DESCRIBE SELECT * FROM '{mine}'").fetchall()
            mtypes = {r[0]: r[1] for r in mdesc}
            rcols = [r[0] for r in con.execute(f"DESCRIBE ({sql})").fetchall()]
            if sorted(mtypes) != sorted(rcols):
                print(f"FAIL {name}: columns mine={sorted(mtypes)} ref={sorted(rcols)}")
                n_fail += 1
                continue
            cols = sorted(mtypes)
            mproj = ", ".join(f'"{c}"' for c in cols)
            rproj = ", ".join(f'CAST("{c}" AS {mtypes[c]}) AS "{c}"' for c in cols)
            agg = ("SELECT COUNT(*) AS n, "
                   "SUM(CAST(hash(struct_pack(" +
                   ", ".join(f'"{c}" := "{c}"' for c in cols) +
                   ")) AS HUGEINT)) AS fp FROM ")
            nm, fm = con.execute(
                agg + f"(SELECT {mproj} FROM '{mine}')").fetchone()
            nr, fr = con.execute(
                agg + f"(SELECT {rproj} FROM ({sql}))").fetchone()
            if nm != nr:
                print(f"FAIL {name}: rows mine={nm} ref={nr}")
                n_fail += 1
            elif fm != fr:
                print(f"FAIL {name}: multiset fingerprint mine={fm} ref={fr}")
                n_fail += 1
            else:
                print(f"PASS {name} ({nm} rows, multiset)", flush=True)
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
