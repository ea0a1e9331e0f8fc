#!/usr/bin/env python3
"""Staged DuckDB replay of the q07/q33 exact-quantile oracles for decades
where the single-statement twin is oracle-ENGINE-infeasible: the one-shot
SQL computes each order statistic via ROW_NUMBER() over a 600M-row
unpartitioned sort, FOUR of them for q07 — DuckDB grinds >45 min at
sf100. Same discipline as oracle_pagerank_staged.py: IDENTICAL final
expressions, the heavy rank selection replaced by a bucket-refinement
that sorts only the rank-straddling slice.

Per (group, column, target ranks rlo/rhi):
  stage 1: COUNT + MIN/MAX                        (one scan)
  stage 2: 65536-bucket histogram over [lo, hi]   (one scan)
  stage 3: locate the buckets holding ranks rlo/rhi by prefix sums
           (pure Python over <=65536 rows)
  stage 4: ORDER BY x LIMIT .. on ONLY the straddling buckets' rows
           (their cumulative offsets give exact in-bucket ranks)
  final  : x_lo + (x_hi - x_lo) * (h - floor(h))  — bit-identical to the
           one-shot oracle's interpolation (same doubles in, same
           expression tree).

Value semantics note: width_bucket boundaries here are only a SEARCH
structure — the selected x_lo/x_hi are exact column values, so the
result equals the one-shot oracle exactly (not approximately).

Usage: tools/oracle_quantiles_staged.py <sf_dir> <verify_out_dir> [query ...]
Supports q07_quantiles (lineitem, ungrouped), q33_group_quantiles
(lineitem grouped by l_returnflag), and q60_grouped_mad (per-flag
median + median absolute deviation — the second median runs order_stat
over the expression ABS(x - median), so no 600M-row deviation table is
ever materialized, which is what blew the one-shot oracle past this
box's free disk).
"""
import sys, os, math, json
import duckdb

QS = [0.25, 0.5, 0.75]
NB = 65536


def connect(sf):
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")
    if os.environ.get("ORACLE_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['ORACLE_DUCKDB_THREADS'])}")
    if os.environ.get("ORACLE_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['ORACLE_DUCKDB_MEM']}'")
    if os.environ.get("ORACLE_DUCKDB_TMP"):
        os.makedirs(os.environ["ORACLE_DUCKDB_TMP"], exist_ok=True)
        con.execute(f"SET temp_directory='{os.environ['ORACLE_DUCKDB_TMP']}'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    return con


def order_stat(con, col, where, rank):
    """Exact rank-th smallest of `col` (1-based; any SQL expression over
    lineitem) among rows matching `where`, via histogram refinement —
    never a global sort, never a materialized derived table."""
    lo, hi, cnt = con.execute(
        f"SELECT MIN({col}), MAX({col}), COUNT(*) FROM lineitem WHERE {where}"
    ).fetchone()
    assert 1 <= rank <= cnt, (rank, cnt)
    if lo == hi:
        return lo
    # DuckDB has no width_bucket; the explicit arithmetic is only a
    # SEARCH structure and must merely be self-consistent between the
    # histogram and the slice query below
    # literals must be DOUBLE-cast: DuckDB parses short decimal literals
    # as DECIMAL and the mixed arithmetic overflows its scale inference
    lod = f"CAST({lo!r} AS DOUBLE)"
    hid = f"CAST({hi!r} AS DOUBLE)"
    bexpr = (f"LEAST(CAST(FLOOR((CAST({col} AS DOUBLE) - {lod}) / ({hid} - {lod}) "
             f"* {NB}) AS BIGINT) + 1, {NB})")
    hist = con.execute(f"""
        SELECT {bexpr} AS b, COUNT(*) AS c
        FROM lineitem WHERE {where} GROUP BY 1 ORDER BY 1""").fetchall()
    off = 0
    for b, c in hist:
        if off + c >= rank:
            # rank falls inside bucket b; in-bucket rank = rank - off
            blo = lo + (hi - lo) * (b - 1) / NB
            bhi = hi if b == NB else lo + (hi - lo) * b / NB
            # bucket membership must replicate width_bucket's half-open
            # [blo, bhi) (closed top bucket) exactly; reuse the function
            row = con.execute(f"""
                SELECT {col} FROM lineitem
                WHERE {where} AND {bexpr} = {b}
                ORDER BY {col} LIMIT 1 OFFSET {rank - off - 1}""").fetchone()
            return row[0]
        off += c
    raise AssertionError("rank not located")


def median_interp(con, expr, where):
    """h = 0.5*(cnt-1.0) median with the one-shot oracles' exact
    interpolation expression."""
    cnt = con.execute(
        f"SELECT CAST(COUNT(*) AS DOUBLE) FROM lineitem WHERE {where}"
    ).fetchone()[0]
    h = 0.5 * (cnt - 1.0)
    rlo = int(math.floor(h)) + 1
    rhi = min(rlo + 1, int(cnt))
    x_lo = order_stat(con, expr, where, rlo)
    x_hi = order_stat(con, expr, where, rhi)
    return x_lo + (x_hi - x_lo) * (h - math.floor(h))


def quantile_rows(con, col, where, label_key, label_val):
    """The one-shot oracles' exact arithmetic: h = q*(cnt-1.0),
    rlo = floor(h)+1, rhi = min(rlo+1, cnt),
    value = x_lo + (x_hi-x_lo)*(h-floor(h)) — all IEEE doubles in the
    same expression order, so staged == one-shot bit-for-bit."""
    out = []
    cnt = con.execute(
        f"SELECT CAST(COUNT(*) AS DOUBLE) FROM lineitem WHERE {where}"
    ).fetchone()[0]
    for q in QS:
        h = q * (cnt - 1.0)
        rlo = int(math.floor(h)) + 1
        rhi = min(rlo + 1, int(cnt))
        x_lo = order_stat(con, col, where, rlo)
        x_hi = order_stat(con, col, where, rhi)
        value = x_lo + (x_hi - x_lo) * (h - math.floor(h))
        out.append({label_key: label_val, "q": q, "value": value})
    return out


def compare(name, got, out_dir, key_cols):
    con2 = duckdb.connect()
    mine = con2.execute(
        f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetch_df()
    mine = mine[sorted(mine.columns)]
    # Normalize BOTH sides to native Python scalars before repr:
    # itertuples yields numpy scalars, and numpy 2.x reprs them as
    # 'np.float64(x)' while the staged reference rows hold Python
    # floats — repr compare would false-FAIL on an env upgrade.
    def native(v):
        return v.item() if hasattr(v, "item") else v
    ref_rows = []
    for r in got:
        ref_rows.append(tuple(native(r[c]) for c in sorted(r)))
    mine_rows = [tuple(native(x) for x in row)
                 for row in mine.itertuples(index=False)]
    ok = sorted(map(repr, mine_rows)) == sorted(map(repr, ref_rows))
    if not ok:
        print(f"FAIL {name}:")
        for a, b in zip(sorted(map(repr, mine_rows)), sorted(map(repr, ref_rows))):
            if a != b:
                print("  mine:", a)
                print("  ref :", b)
        return False
    print(f"PASS {name} ({len(mine_rows)} rows, staged)")
    return True


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = connect(sf)
    n_fail = 0
    if not only or "q07_quantiles" in only:
        got = (quantile_rows(con, "l_quantity", "TRUE", "col_name", "l_quantity")
               + quantile_rows(con, "l_extendedprice", "TRUE",
                               "col_name", "l_extendedprice"))
        if not compare("q07_quantiles", got, out, ["col_name", "q"]):
            n_fail += 1
    if not only or "q60_grouped_mad" in only:
        flags = [r[0] for r in con.execute(
            "SELECT DISTINCT l_returnflag FROM lineitem ORDER BY 1").fetchall()]
        got = []
        for f in flags:
            w = f"l_returnflag = '{f}'"
            med = median_interp(con, "l_extendedprice", w)
            mad = median_interp(con, f"ABS(l_extendedprice - CAST({med!r} AS DOUBLE))", w)
            got.append({"l_returnflag": f, "median": med, "mad": mad})
        if not compare("q60_grouped_mad", got, out, ["l_returnflag"]):
            n_fail += 1
    if not only or "q33_group_quantiles" in only:
        flags = [r[0] for r in con.execute(
            "SELECT DISTINCT l_returnflag FROM lineitem ORDER BY 1").fetchall()]
        got = []
        for f in flags:
            got += quantile_rows(con, "l_quantity", f"l_returnflag = '{f}'",
                                 "l_returnflag", f)
        if not compare("q33_group_quantiles", got, out,
                       ["l_returnflag", "q"]):
            n_fail += 1
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
