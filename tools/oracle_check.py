#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: tools/oracle_check.py [sf_dir] [verify_out_dir] [query ...]

Reads verify_out_dir/<name>/*.parquet (written by graft.Verify), runs
verify_out_dir/oracle_sql.json in DuckDB over sf_dir's tables, sorts
columns by name and rows by all columns, and compares values exactly.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    if (a is None) != (b is None):
        return False
    return a == b

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "target/verify"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no verify output")
            n_fail += 1
            continue
        try:
            mine = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
            ref = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(mine.columns) != sorted(ref.columns):
            print(f"FAIL {name}: columns mine={sorted(mine.columns)} ref={sorted(ref.columns)}")
            n_fail += 1
            continue
        if len(mine) != len(ref):
            print(f"FAIL {name}: rows mine={len(mine)} ref={len(ref)}")
            n_fail += 1
            continue
        mine, ref = norm(mine), norm(ref)
        bad = []
        for c in mine.columns:
            mv, rv = mine[c].tolist(), ref[c].tolist()
            for i, (a, b) in enumerate(zip(mv, rv)):
                if not cmp_cell(a, b):
                    bad.append((c, i, a, b))
                    if len(bad) > 3:
                        break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, first: {bad[:3]}")
            n_fail += 1
        else:
            # dtype check is advisory (driver may compare schemas)
            dt = [(c, str(mine[c].dtype), str(ref[c].dtype))
                  for c in mine.columns if str(mine[c].dtype) != str(ref[c].dtype)]
            note = f"  [dtype diff: {dt}]" if dt else ""
            print(f"PASS {name} ({len(mine)} rows){note}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
