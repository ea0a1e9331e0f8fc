#!/usr/bin/env python3
"""Staged DuckDB replay of q98_pagerank's oracle for big SFs.

The single-statement oracle SQL (SparkEntry.oracleSql["q98_pagerank"])
is what the driver runs at sf0.01. At sf10 the co-occurrence graph is
~120M edges / 239M adjacency rows, and DuckDB retains each MATERIALIZED
iteration's spilled temp blocks until the whole statement finishes —
15 iterations x ~8 GB of spilled join/aggregate input exceeds this
box's free disk even though any single iteration fits comfortably.

This script runs the IDENTICAL computation as one statement per stage
(CREATE TABLE per CTE, DROP the previous rank table after each
iteration) so temp is freed between statements, then compares the
top-100 result against graft's Verify dump exactly like
tools/oracle_check.py does. Every expression is copied verbatim from
the oracle SQL -- same 1e-18 fixed-point contribution quantization,
same damping, same tiebreak -- so a PASS here is the same evidence as
a single-statement PASS, just replayed in a resource-bounded way.

Usage: tools/oracle_pagerank_staged.py [sf_dir] [verify_out_dir]
"""
import sys, os, math
import duckdb

ITERS = 15


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf10"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vsf10"
    db = os.environ.get("ORACLE_STAGED_DB", "target/ducktmp_staged/pr.duckdb")
    os.makedirs(os.path.dirname(db), exist_ok=True)
    if os.path.exists(db):
        os.remove(db)
    con = duckdb.connect(db)
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_DUCKDB_MEM', '40GB')}'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")

    # stage 1: the graph, expression-for-expression the oracle's CTEs
    con.execute("""CREATE TABLE items AS
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem""")
    con.execute("""CREATE TABLE ed AS
      SELECT DISTINCT a.pk AS src, b.pk AS dst
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk""")
    con.execute("DROP TABLE items")
    con.execute("""CREATE TABLE bi AS
      SELECT src, dst FROM ed UNION ALL SELECT dst AS src, src AS dst FROM ed""")
    con.execute("DROP TABLE ed")
    con.execute("CREATE TABLE deg AS SELECT src, COUNT(*) AS deg FROM bi GROUP BY src")
    con.execute("""CREATE TABLE adj AS
      SELECT b.src, b.dst, d.deg FROM bi b JOIN deg d ON b.src = d.src""")
    con.execute("CREATE TABLE nodes AS SELECT DISTINCT src AS id FROM bi")
    con.execute("DROP TABLE bi")
    # the oracle's p CTE, verbatim, so base/r_init are the same doubles
    base, r_init = con.execute(
        """SELECT (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / CAST(COUNT(*) AS DOUBLE),
                  CAST(1.0 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) FROM nodes""").fetchone()
    n = con.execute("SELECT COUNT(*) FROM nodes").fetchone()[0]
    print(f"graph: {n} nodes", flush=True)

    con.execute(f"CREATE TABLE r0 AS SELECT id, CAST({r_init!r} AS DOUBLE) AS rank FROM nodes")
    for i in range(1, ITERS + 1):
        con.execute(f"""CREATE TABLE r{i} AS
          SELECT n.id, CAST({base!r} AS DOUBLE) + 0.85 * COALESCE(s.in_sum, 0.0) AS rank
          FROM nodes n LEFT JOIN (
            SELECT a.dst AS id,
              CAST(SUM(CAST(FLOOR(r.rank / CAST(a.deg AS DOUBLE) * 1e18) AS BIGINT)) AS DOUBLE) / 1e18 AS in_sum
            FROM adj a JOIN r{i - 1} r ON a.src = r.id GROUP BY a.dst) s
          ON n.id = s.id""")
        con.execute(f"DROP TABLE r{i - 1}")
        print(f"iter {i} done", flush=True)

    ref = con.execute(
        f"SELECT id, rank FROM r{ITERS} ORDER BY rank DESC, id LIMIT 100").fetchdf()
    mine = con.execute(f"SELECT * FROM '{out}/q98_pagerank/*.parquet'").fetchdf()

    # same compare discipline as oracle_check.norm/cmp_cell
    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

    if sorted(mine.columns) != sorted(ref.columns) or len(mine) != len(ref):
        print(f"FAIL q98_pagerank: shape mine={mine.shape} ref={ref.shape}")
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
        print(f"FAIL q98_pagerank: first diffs {bad[:3]}")
        sys.exit(1)
    print(f"PASS q98_pagerank ({len(mine)} rows, staged replay, {ITERS} iters)")
    con.close()
    os.remove(db)


if __name__ == "__main__":
    main()
