#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness compare.

Usage: tools/oracle_check.py [--pyarrow] [sf_dir] [verify_out_dir] [query ...]

Reads verify_out_dir/<name>/*.parquet (written by graft.Verify), runs
verify_out_dir/oracle_sql.json in DuckDB over sf_dir's tables, sorts
columns by name and rows by all columns, and compares values exactly.

--pyarrow reads the Spark side via pyarrow -> pandas instead of DuckDB,
replicating the driver's actual read path: pandas datetime64[ns] tops
out at 2262-04-11, so timestamps outside that window coerce differently
than DuckDB's fetch and hash-diverge even when values are equal (the
round-5 st_scd2 FAIL class). Run BOTH modes before claiming green.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def is_missing(x):
    if x is None:
        return True
    try:
        return isinstance(x, float) and math.isnan(x)
    except TypeError:
        return False

def cmp_cell(a, b):
    # None vs NaN: the DuckDB fetch renders NULL doubles as NaN while
    # pyarrow renders them as None — the driver treats both as missing
    # (q100 hash-matched r5 with exactly this split), so we do too.
    if is_missing(a) and is_missing(b):
        return True
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
    argv = list(sys.argv[1:])
    use_pyarrow = "--pyarrow" in argv
    if use_pyarrow:
        argv.remove("--pyarrow")
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    out = argv[1] if len(argv) > 1 else "target/verify"
    only = set(argv[2:])
    con = duckdb.connect()
    # big-SF knobs: a spill-heavy oracle query (pagerank's unrolled CTE
    # chain, triangle self-joins) can exceed free disk at sf10 when a
    # concurrent JVM squeezes DuckDB's default 80%-of-RAM limit down.
    # preserve_insertion_order=false lets DuckDB stream instead of
    # buffering (the compare sorts anyway); the env knobs let a re-run
    # pick an explicit limit / temp location.
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
            if use_pyarrow:
                import pyarrow.parquet as pq
                import pandas as pd
                import datetime
                mine = pd.concat(
                    [pq.read_table(f).to_pandas() for f in sorted(files)],
                    ignore_index=True)
                # parquet DATE comes back as datetime.date objects where
                # DuckDB's fetch gives midnight Timestamps (hash-equal to
                # the driver, per r5); align the representation
                for c in mine.columns:
                    if mine[c].dtype == object and mine[c].map(
                            lambda x: isinstance(x, datetime.date) or x is None).all() \
                            and mine[c].notna().any():
                        mine[c] = pd.to_datetime(mine[c])
            else:
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
