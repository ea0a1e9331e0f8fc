#!/usr/bin/env python3
"""Staged DuckDB replay of q132_cannibalization's oracle for big SFs.

The single-statement oracle (SparkEntry.oracleSql["q132_cannibalization"])
is what the driver runs at sf0.01. At sf100 (600M lineitem) DuckDB spills
>41 GB of statement-lifetime temp and dies on this box even with the
`li AS NOT MATERIALIZED` hint and regardless of thread count — measured:
each pipeline ALONE is clean (`top` 53 s / `weekly` 72 s, zero spill at
4 threads / 25 GB), but once `weekly` is multi-referenced inside one
statement DuckDB's CTE materialization stops pushing the top-20
semi-join below weekly's aggregation, so it aggregates all 600M rows by
(pk, week) — ~450M groups — before filtering. Same oracle-ENGINE
resource-pathology class as q98_pagerank (see SURVEY §5 round-9 note),
same remedy: run the IDENTICAL computation one statement per stage so
each pipeline plans alone (pushdown intact) and its temp is freed
before the next, then compare against graft's Verify dump exactly like
tools/oracle_check.py does. Every expression is copied verbatim from
the oracle SQL — same units rounding, same dec2d readout split, same
±0.2 relation thresholds, same tiebreaks — so a PASS here is the same
evidence as a single-statement PASS, just replayed resource-bounded.

Usage: tools/oracle_q132_staged.py [sf_dir] [verify_out_dir]
"""
import sys, os, math
import duckdb


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf100"
    out = sys.argv[2] if len(sys.argv) > 2 else "target/sf100probe/v_small"
    db = os.environ.get("ORACLE_STAGED_DB", "target/ducktmp_staged/q132.duckdb")
    os.makedirs(os.path.dirname(db), exist_ok=True)
    if os.path.exists(db):
        os.remove(db)
    con = duckdb.connect(db)
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_DUCKDB_MEM', '40GB')}'")
    if os.environ.get("ORACLE_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['ORACLE_DUCKDB_THREADS'])}")
    if os.environ.get("ORACLE_DUCKDB_TMP"):
        os.makedirs(os.environ["ORACLE_DUCKDB_TMP"], exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['ORACLE_DUCKDB_TMP']}'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")

    # stage 1: the oracle's `top` CTE, verbatim (li inlined — single use
    # per stage keeps the agg pipeline streaming over the scan)
    con.execute("""CREATE TABLE t_top AS
      WITH li AS NOT MATERIALIZED (
        SELECT l_partkey AS pk, date_trunc('week', l_shipdate) AS wk,
          CAST(ROUND(l_quantity) AS BIGINT) AS units
        FROM lineitem)
      SELECT pk FROM (
        SELECT pk, SUM(units) AS tot, ROW_NUMBER() OVER (ORDER BY SUM(units) DESC, pk) AS rn
        FROM li GROUP BY pk) WHERE rn <= 20""")
    print("stage t_top done", flush=True)

    # stage 2: the oracle's `weekly` CTE, verbatim, against t_top —
    # single-statement planning keeps the top-20 semi-join below the
    # (pk, wk) aggregation
    con.execute("""CREATE TABLE t_weekly AS
      WITH li AS NOT MATERIALIZED (
        SELECT l_partkey AS pk, date_trunc('week', l_shipdate) AS wk,
          CAST(ROUND(l_quantity) AS BIGINT) AS units
        FROM lineitem)
      SELECT pk, wk, CAST(SUM(units) AS BIGINT) AS u
      FROM li WHERE pk IN (SELECT pk FROM t_top) GROUP BY 1, 2""")
    print("stage t_weekly done", flush=True)

    # stage 3: spine/series/g/c + final projection, verbatim — all
    # bounded surfaces (20 parts x |weeks|)
    ref = con.execute("""
      WITH spine AS (
        SELECT t.pk, s.wk
        FROM t_top t, (SELECT unnest(generate_series((SELECT MIN(wk) FROM t_weekly),
          (SELECT MAX(wk) FROM t_weekly), INTERVAL 1 WEEK)) AS wk) s),
      series AS (
        SELECT spine.pk, spine.wk, COALESCE(t_weekly.u, 0) AS u
        FROM spine LEFT JOIN t_weekly ON spine.pk = t_weekly.pk AND spine.wk = t_weekly.wk),
      g AS (
        SELECT a.pk AS pk_a, b.pk AS pk_b, CAST(COUNT(*) AS BIGINT) AS n_weeks,
          (CAST((SUM(CAST(a.u AS HUGEINT))) // 4294967296 AS DOUBLE) * CAST(4294967296 AS DOUBLE) + CAST((SUM(CAST(a.u AS HUGEINT))) % 4294967296 AS DOUBLE)) AS sx,
          (CAST((SUM(CAST(b.u AS HUGEINT))) // 4294967296 AS DOUBLE) * CAST(4294967296 AS DOUBLE) + CAST((SUM(CAST(b.u AS HUGEINT))) % 4294967296 AS DOUBLE)) AS sy,
          (CAST((SUM(CAST(a.u AS HUGEINT) * CAST(a.u AS HUGEINT))) // 4294967296 AS DOUBLE) * CAST(4294967296 AS DOUBLE) + CAST((SUM(CAST(a.u AS HUGEINT) * CAST(a.u AS HUGEINT))) % 4294967296 AS DOUBLE)) AS sxx,
          (CAST((SUM(CAST(b.u AS HUGEINT) * CAST(b.u AS HUGEINT))) // 4294967296 AS DOUBLE) * CAST(4294967296 AS DOUBLE) + CAST((SUM(CAST(b.u AS HUGEINT) * CAST(b.u AS HUGEINT))) % 4294967296 AS DOUBLE)) AS syy,
          (CAST((SUM(CAST(a.u AS HUGEINT) * CAST(b.u AS HUGEINT))) // 4294967296 AS DOUBLE) * CAST(4294967296 AS DOUBLE) + CAST((SUM(CAST(a.u AS HUGEINT) * CAST(b.u AS HUGEINT))) % 4294967296 AS DOUBLE)) AS sxy
        FROM series a JOIN series b ON a.wk = b.wk AND a.pk < b.pk
        GROUP BY 1, 2),
      c AS (
        SELECT pk_a, pk_b, n_weeks,
          (CAST(n_weeks AS DOUBLE) * sxy - sx * sy) /
          (SQRT(CAST(n_weeks AS DOUBLE) * sxx - sx * sx) *
           SQRT(CAST(n_weeks AS DOUBLE) * syy - sy * sy)) AS r
        FROM g)
      SELECT pk_a, pk_b, n_weeks, r,
        CASE WHEN r <= CAST(-0.2 AS DOUBLE) THEN 'substitute'
             WHEN r >= CAST(0.2 AS DOUBLE) THEN 'complement'
             ELSE 'independent' END AS relation
      FROM c ORDER BY pk_a, pk_b""").fetchdf()
    mine = con.execute(
        f"SELECT * FROM '{out}/q132_cannibalization/*.parquet'").fetchdf()

    # same compare discipline as oracle_check.norm/cmp_cell
    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

    if sorted(mine.columns) != sorted(ref.columns) or len(mine) != len(ref):
        print(f"FAIL q132_cannibalization: shape mine={mine.shape} ref={ref.shape}")
        sys.exit(1)
    mine, ref = norm(mine), norm(ref)
    bad = []
    for c in mine.columns:
        for i, (a, b) in enumerate(zip(mine[c].tolist(), ref[c].tolist())):
            ok = (a == b) or (isinstance(a, float) and isinstance(b, float)
                              and math.isnan(a) and math.isnan(b))
            if not ok:
                bad.append((c, i, a, b))
                if len(bad) > 3:
                    break
    if bad:
        print(f"FAIL q132_cannibalization: first diffs {bad[:3]}")
        sys.exit(1)
    print(f"PASS q132_cannibalization ({len(mine)} rows, staged replay)")
    con.close()
    os.remove(db)


if __name__ == "__main__":
    main()
